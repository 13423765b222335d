"""The JSON query-API surface (the reference's ``/myapi/`` WSGI
endpoint, wsgiapp.py:310-560) — stats slices, item envelopes,
parameter filtering — golden-checked against the reference's own
``advancedapi-*.json`` fixtures over its testrepos RDFa XHTML.

Semantics replicated exactly:

* RDFa-lite extraction from parsed XHTML (about-scoped ``link
  rel/href``, ``meta/span property/content``, ``title property`` —
  the subset the reference's fixtures use; elements carrying only a
  ``datatype`` attribute emit nothing, which is why the fixtures'
  mis-written identifier metas never index, matching the goldens);
* per-repo facet configs (examplerepos.py DocRepo1/2/3) with the
  Facet defaults table (facet.py:440-540): dimension types
  term/ref/year/value, multiple-value keywords, boolean coercion,
  custom dimensions (aprilfools);
* resource labels resolved from the repos' commondata with the
  reference's predicate precedence (rdfs:label > skos:prefLabel >
  skos:altLabel > dcterms:title > dcterms:alternative > foaf:name);
* stats slices: one observation per distinct (document, selected
  value), merged across repos, slices sorted by dimension, empty
  dimensions kept (wsgiapp.stats);
* items: fields the document actually carries, resources as
  {iri, label}, multi-values sorted, ordered by iri DESCENDING
  (wsgiapp.mangle_results), page size 10;
* parameters: equality (with ex: qname expansion for rdf_type),
  boolean coercion, ``min-``/``max-`` EXCLUSIVE ranges,
  ``year-`` selector equality, ``uri=`` glob, ``_stats=on``.

Scale note: this module is the API *response* layer over the query
machinery — the filters here are the same predicates
``operators/search.compile_query`` compiles to DataFrame plans for
corpus-scale queries; envelope assembly operates on one page of
results (bounded), never the corpus.
"""

from __future__ import annotations

import fnmatch
import re
import xml.etree.ElementTree as ET
from urllib.parse import parse_qsl

PREFIXES = {
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "dcterms": "http://purl.org/dc/terms/",
    "dc": "http://purl.org/dc/elements/1.1/",
    "schema": "http://schema.org/",
    "ex": "http://example.org/vocab/",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
}


def _expand(qname_or_uri: str) -> str:
    if qname_or_uri.startswith("http"):
        return qname_or_uri
    pfx, local = qname_or_uri.split(":", 1)
    return PREFIXES[pfx] + local


def _qname(uri: str) -> str:
    for pfx, ns in PREFIXES.items():
        if uri.startswith(ns):
            return "%s:%s" % (pfx, uri[len(ns):])
    return uri


# --------------------------------------------------- RDFa extraction

def rdfa_triples(xhtml_text: str) -> list[tuple[str, str, str, str]]:
    """(subj, pred, obj, kind) from the parsed-XHTML RDFa subset the
    reference's testrepos use.  Subjects scope by the nearest ancestor
    ``about``; prefixed names resolve via the fixed prefix table (the
    fixtures' xmlns declarations match it)."""
    root = ET.fromstring(xhtml_text)
    out = []

    def walk(el, about):
        about = el.get("about", about)
        prop = el.get("property")
        rel = el.get("rel")
        if prop and about:
            value = el.get("content")
            if value is None:
                value = "".join(el.itertext())
            out.append((about, _expand(prop), value, "lit"))
        if rel and about and el.get("href"):
            out.append((about, _expand(rel), el.get("href"), "uri"))
        for child in el:
            walk(child, about)

    walk(root, None)
    return out


# ------------------------------------------------------ facet configs

class FacetCfg:
    def __init__(self, pred, binding, dim=None, multiple=False,
                 kind="lit", boolean=False, dimension_label=None,
                 computed=None):
        self.pred = _expand(pred)
        self.binding = binding
        self.dim = dim                # term | ref | year | value | None
        self.multiple = multiple
        self.kind = kind              # lit | resource
        self.boolean = boolean
        self.explicit_label = dimension_label is not None
        self.dimension_label = dimension_label or binding
        self.computed = computed      # fn(fields) -> value

    def legacy_label(self):
        """legacyapi dimension = util.uri_leaf(rdftype) unless an
        explicit dimension_label was configured
        (wsgiapp.stats_slice)."""
        if self.explicit_label:
            return self.dimension_label
        return re.split(r"[#/]", self.pred)[-1]


def _aprilfools(fields):
    issued = fields.get("dcterms_issued")
    if not issued:
        return None
    return issued[5:7] == "04" and issued[8:10] == "01"


# examplerepos.py DocRepo1/2/3 facet sets with facet.py defaults
REPO_FACETS = {
    "repo1": [
        FacetCfg("rdf:type", "rdf_type", dim="term"),
        FacetCfg("dcterms:title", "dcterms_title"),
        FacetCfg("dcterms:publisher", "dcterms_publisher", dim="ref",
                 kind="resource"),
        FacetCfg("dcterms:identifier", "dcterms_identifier"),
        FacetCfg("dcterms:issued", "dcterms_issued", dim="year"),
    ],
    "repo2": [
        FacetCfg("rdf:type", "rdf_type", dim="term"),
        FacetCfg("dcterms:title", "dcterms_title"),
        FacetCfg("dcterms:identifier", "dcterms_identifier"),
        FacetCfg("dcterms:issued", "dcterms_issued", dim="year"),
        FacetCfg("dcterms:issued", "aprilfools", dim="value",
                 boolean=True, dimension_label="aprilfools",
                 computed=_aprilfools),
        FacetCfg("dcterms:publisher", "dcterms_publisher", dim="ref",
                 kind="resource"),
        FacetCfg("dc:subject", "dc_subject", dim="value", multiple=True),
        FacetCfg("schema:free", "schema_free", dim="value",
                 boolean=True),
    ],
    "repo3": [
        FacetCfg("dc:publisher", "dc_publisher"),
        FacetCfg("dcterms:rightsHolder", "dcterms_rightsHolder",
                 kind="resource", multiple=True),
        FacetCfg("dcterms:title", "dcterms_title"),
        FacetCfg("dcterms:identifier", "dcterms_identifier"),
        FacetCfg("dc:creator", "dc_creator", dim="value"),
    ],
}

# commondata labels (examplerepos.py DocRepo1.commondata, with the
# reference's label-predicate precedence already applied per resource)
RESOURCE_LABELS = {
    "http://example.org/vocab/publ1": "Publishing & sons",
    "http://example.org/vocab/publ2": "Bookprinters and associates",
    "http://example.org/vocab/publ3": "BP&A",
    "http://example.org/vocab/publ4":
        "A title is not really a name for an org",
    "http://example.org/vocab/company1": "Comp Inc",
    "http://example.org/vocab/company2": "Another company",
}


# ----------------------------------------------------- index building

def build_index_docs(triples, repo: str) -> list[dict]:
    """Per-document field dicts (the fulltext-index rows the items
    come from): triples -> fields per the repo's facet config."""
    by_doc: dict[str, list] = {}
    for s, p, o, kind in triples:
        if "#" in s:
            continue                       # toplevel only
        by_doc.setdefault(s, []).append((p, o, kind))
    docs = []
    for uri in sorted(by_doc):
        fields = {"iri": uri}
        for cfg in REPO_FACETS[repo]:
            if cfg.computed:
                continue                   # second pass
            vals = [(o, k) for p, o, k in by_doc[uri] if p == cfg.pred]
            if not vals:
                continue
            def render(v, k):
                if cfg.kind == "resource":
                    return {"iri": v,
                            "label": RESOURCE_LABELS.get(v, v)}
                if cfg.boolean:
                    return v == "true"
                return v
            if cfg.multiple:
                rendered = sorted((render(v, k) for v, k in vals),
                                  key=lambda x: x["iri"]
                                  if isinstance(x, dict) else x)
                fields[cfg.binding] = rendered
            else:
                fields[cfg.binding] = render(*vals[0])
        for cfg in REPO_FACETS[repo]:
            if cfg.computed:
                v = cfg.computed(fields)
                if v is not None:
                    fields[cfg.binding] = v
        fields["_repo"] = repo
        docs.append(fields)
    return docs


# ------------------------------------------------------------- stats

def api_stats(docs_by_repo: dict[str, list[dict]],
              resultset_iris=None, legacy: bool = False) -> dict:
    """wsgiapp.stats: slices merged across repos, one count per
    distinct (document, observation), empty dimensions kept.  Legacy
    mode (wsgiapp.stats_slice legacyapi branches): dimension labels
    are predicate leaves, ``value`` observations become fake-resource
    refs, ``term`` observations drop the prefix."""
    slices: dict[str, dict] = {}
    for repo, docs in docs_by_repo.items():
        for cfg in REPO_FACETS[repo]:
            if not cfg.dim:
                continue
            key = cfg.legacy_label() if legacy else cfg.dimension_label
            dim_type = cfg.dim
            if legacy and dim_type == "value":
                dim_type = "ref"
            obs = slices.setdefault(key, {"_type": dim_type, "_c": {}})
            for doc in docs:
                if (resultset_iris is not None
                        and doc["iri"] not in resultset_iris):
                    continue
                val = doc.get(cfg.binding)
                if val is None:
                    continue
                values = val if isinstance(val, list) else [val]
                seen = set()
                for v in values:
                    if cfg.dim == "term":
                        v = _qname(v)
                        if legacy:
                            v = v.split(":")[1]
                    elif cfg.dim == "ref":
                        v = v["iri"] if isinstance(v, dict) else v
                    elif cfg.dim == "year":
                        v = v[:4]
                    elif legacy:    # value -> fake resource ref
                        v = ("http://example.org/fake-resource/%s"
                             % v).replace(" ", "_")
                    if (doc["iri"], v) in seen:
                        continue
                    seen.add((doc["iri"], v))
                    obs["_c"][v] = obs["_c"].get(v, 0) + 1
    out = {"type": "DataSet", "slices": []}
    for dim in sorted(slices):
        sl = slices[dim]
        observations = [{sl["_type"]: v, "count": c}
                        for v, c in sorted(sl["_c"].items(),
                                           key=lambda kv: str(kv[0]))]
        out["slices"].append({"dimension": dim,
                              "observations": observations})
    return out


# ------------------------------------------------------------- query

def _matches(doc: dict, key: str, value: str,
             legacy: bool = False) -> bool:
    if key == "uri":
        return fnmatch.fnmatchcase(doc["iri"], value)
    if key.startswith("min-"):
        v = doc.get(key[4:])
        return v is not None and v > value
    if key.startswith("max-"):
        v = doc.get(key[4:])
        return v is not None and v < value
    if key.startswith("year-"):
        v = doc.get(key[5:])
        return v is not None and v[:4] == value
    v = doc.get(key)
    if v is None:
        return False
    if isinstance(v, bool):
        return v == (value == "true")
    if isinstance(v, list):
        return any((x == value) for x in v
                   if not isinstance(x, dict))
    if isinstance(v, dict):
        return v["iri"] == value
    if key == "rdf_type":
        if ":" in value and not value.startswith("http"):
            return v == _expand(value)
        if value.startswith("http"):
            return v == value
        return re.split(r"[#/]", v)[-1] == value   # legacy bare leaf
    return v == value


_ALL_BINDINGS = sorted({cfg.binding for facets in REPO_FACETS.values()
                        for cfg in facets})


def _unlegacy_key(key: str) -> str:
    """Legacy param name -> real binding by suffix match (wsgiapp
    parse_parameters' _guess_real_fieldname)."""
    for prefix in ("min-", "max-", "year-"):
        if key.startswith(prefix):
            return prefix + _unlegacy_key(key[len(prefix):])
    if key == "uri":
        return key
    for binding in _ALL_BINDINGS:
        if binding == key or binding.endswith("_" + key):
            return binding
    return key


def api_query(docs_by_repo: dict[str, list[dict]], query_string: str,
              path: str = "/myapi/", legacy: bool = False) -> dict:
    """The /myapi/ (or legacy /-/publ) JSON envelope for one query
    string."""
    if legacy and path == "/myapi/":
        path = "/-/publ"
    params = [(k, v) for k, v in parse_qsl(query_string)
              if not k.startswith("_")]
    if legacy:
        params = [(_unlegacy_key(k), v) for k, v in params]
    want_stats = "_stats=on" in query_string
    hits = []
    for repo, docs in docs_by_repo.items():
        for doc in docs:
            if all(_matches(doc, k, v, legacy=legacy)
                   for k, v in params):
                hits.append(doc)
    hits.sort(key=lambda d: d["iri"], reverse=True)
    page = hits[:10]

    def render(d):
        out = {}
        for k, v in d.items():
            if k.startswith("_"):
                continue
            if legacy and "_" in k:
                k = k.split("_", 1)[1]
            out[k] = v
        return out

    items = [render(d) for d in page]
    res = {"current": path + "?" + query_string,
           "duration": None,
           "items": items,
           "itemsPerPage": 10,
           "startIndex": 0,
           "totalResults": len(hits)}
    if want_stats:
        res["statistics"] = api_stats(
            docs_by_repo, resultset_iris={d["iri"] for d in page},
            legacy=legacy)
    return res


# -------------------------------------------------------- Spark glue

def load_testrepo_docs(spark, root: str) -> dict[str, list[dict]]:
    """Distill the testrepos RDFa fixtures through a Spark stage
    (mapInPandas over the XHTML files) and build the per-repo index
    docs.  The Spark stage carries the per-document extraction — the
    part that scales with corpus size; envelope assembly stays
    driver-side like the reference's WSGI layer."""
    import glob as g
    import pandas as pd

    files = []
    for repo in sorted(REPO_FACETS):
        for f in sorted(g.glob("%s/%s/parsed/*.xhtml" % (root, repo))):
            files.append((repo, f, open(f, encoding="utf-8").read()))
    pdf_in = spark.createDataFrame(files,
                                   "repo string, path string, xml string")

    def batches(it):
        for pdf in it:
            rows = []
            for repo, xml_text in zip(pdf["repo"], pdf["xml"]):
                for s, p, o, k in rdfa_triples(xml_text):
                    rows.append((repo, s, p, o, k))
            yield pd.DataFrame(rows,
                               columns=["repo", "subj", "pred", "obj",
                                        "kind"])

    triples = (pdf_in.mapInPandas(
        batches, "repo string, subj string, pred string, obj string, "
                 "kind string").collect())
    by_repo: dict[str, list] = {}
    for r in triples:
        by_repo.setdefault(r.repo, []).append((r.subj, r.pred, r.obj,
                                               r.kind))
    return {repo: build_index_docs(t, repo)
            for repo, t in by_repo.items()}
