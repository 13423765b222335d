"""Full RFC distillation: plain text -> the (subj, pred, obj) triple
set the reference emits for the same document.

Re-implements the observable output of the reference's RFC repo parse
chain (sources/tech/rfc.py:455-519 ``parse`` + ``parse_header``
``:550-644`` + the RDFa render/re-parse loop) WITHOUT the XHTML
round-trip: triples are produced directly from the parsed tree, which
is exactly what SURVEY.md T2 prescribes.  Correctness is checked
triple-set-wise against the reference's distilled goldens
(test/files/repo/rfc/distilled/*.ttl) in tests/test_reference_goldens
— the P/R >= 0.95 criterion of BASELINE.json, measured on the
reference's own corpus.

Triple encoding matches :mod:`ferenda_spark.turtle`:
(subj, pred, obj) with obj = ("uri", v) | ("lit", v, lang, datatype).
"""

from __future__ import annotations

import difflib
import re

from .citations import scan_citations
from .docparsers import Node, parse_rfc_tree

DCTERMS = "http://purl.org/dc/terms/"
BIBO = "http://purl.org/ontology/bibo/"
PROV = "http://www.w3.org/ns/prov#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RFC_NS = "http://example.org/ontology/rfc/"
XSD_GYEARMONTH = "http://www.w3.org/2001/XMLSchema#gYearMonth"

GENERATOR = "ferenda.sources.tech.rfc.RFC"

# commondata analogue (sources/tech/res/extra/rfc.ttl): label -> uri
# relative to the site base.  Publishers matched on foaf:name (+ skos
# altLabel), categories on bibo:identifier — lookup_resource
# semantics (documentrepository.py:467-513): exact, then difflib>=0.8.
PUBLISHERS = {
    "Internet Engineering Task Force (IETF)": "ext/ietf",
    "IETF": "ext/ietf",
    "Internet Architecture Board (IAB)": "ext/iab",
    "IAB": "ext/iab",
    "Internet Research Task Force (IRTF)": "ext/irtf",
    "IRTF": "ext/irtf",
    "Independent Submission": "ext/independent",
    "Network Working Group": "ext/nwg",
}
CATEGORIES = {
    "Standards Track": "dataset/rfc/standard",
    "Informational": "dataset/rfc/informational",
    "Experimental": "dataset/rfc/experimental",
    "Best Current Practice": "dataset/rfc/best-current-practice",
    "Historic": "dataset/rfc/historic",
    "Unknown": "dataset/rfc/unknown",
}

_MONTHS = {m: i + 1 for i, m in enumerate(
    ("January", "February", "March", "April", "May", "June", "July",
     "August", "September", "October", "November", "December"))}


def _lookup(table: dict, label: str):
    if label in table:
        return table[label]
    close = difflib.get_close_matches(label, table.keys(), 1, 0.8)
    if close:
        return table[close[0]]
    return None


def _split_header(header_text: str):
    lines = header_text.split("\n")
    left = [x.split("   ", 1)[0].strip() for x in lines]
    right = [x.split("   ", 1)[1].strip() for x in lines if "   " in x]
    return left, right


def get_rfc_num(header_text: str) -> str | None:
    left, _ = _split_header(header_text)
    for line in left[1:]:
        if ": " not in line:
            continue
        key, val = (x.strip() for x in line.split(": ", 1))
        if key == "Request for Comments":
            return re.sub(r"\D", "", val)
    return None


def _lit(v, lang=None, dtype=None):
    return ("lit", v, lang, dtype)


def _header_triples(header_text: str, doc_uri: str, base: str,
                    rfc_base: str):
    """parse_header semantics (rfc.py:550-644); returns (triples,
    rdftype or None, has_identifier)."""
    out = []
    rdftype = None
    has_identifier = False
    left, right = _split_header(header_text)

    pub = _lookup(PUBLISHERS, left[0])
    if pub:
        out.append((doc_uri, DCTERMS + "publisher", ("uri", base + pub)))
    else:
        out.append((doc_uri, DCTERMS + "publisher", _lit(left[0])))

    for line in left[1:]:
        if line.strip() == "" or ": " not in line:
            continue
        key, value = (x.strip() for x in line.split(": ", 1))
        if key == "Request for Comments":
            value = re.sub(r"\D", "", value)
            if value:
                out.append((doc_uri, DCTERMS + "identifier",
                            _lit("RFC %s" % value)))
                has_identifier = True
        elif key == "Category":
            cat = _lookup(CATEGORIES, value)
            if cat:
                out.append((doc_uri, DCTERMS + "subject",
                            ("uri", base + cat)))
            else:
                out.append((doc_uri, DCTERMS + "subject", _lit(value)))
        elif key == "ISSN":
            out.append((doc_uri, DCTERMS + "issn", _lit(value)))
        elif key in ("Updates", "Obsoletes"):
            pred = RFC_NS + key.lower()
            for part in value.split(", "):
                m = re.search(r"\d+", part)
                if m:
                    out.append((doc_uri, pred,
                                ("uri", rfc_base + m.group(0))))
        elif key == "BCP":
            out.append((doc_uri, RFC_NS + "bcpnumber", _lit(value)))
            rdftype = RFC_NS + "BCP"
        elif key == "STD":
            # the reference types STD documents as rfc:FYI
            # (rfc.py:612-614) — replicated bug-for-bug
            out.append((doc_uri, RFC_NS + "stdnumber", _lit(value)))
            rdftype = RFC_NS + "FYI"
        elif key == "FYI":
            out.append((doc_uri, RFC_NS + "fyinumber", _lit(value)))
            rdftype = RFC_NS + "FYI"

    for line in right:
        if re.match(r"[A-Z]\. ", line):
            out.append((doc_uri, DCTERMS + "creator", _lit(line)))
        elif re.match(r"\w+ \d{4}$", line):
            month, year = line.split()
            if month in _MONTHS:
                out.append((doc_uri, DCTERMS + "issued",
                            _lit("%s-%02d" % (year, _MONTHS[month]),
                                 None, XSD_GYEARMONTH)))
            else:
                out.append((doc_uri, DCTERMS + "rightsHolder", _lit(line)))
        else:
            out.append((doc_uri, DCTERMS + "rightsHolder", _lit(line)))
    return out, rdftype, has_identifier


def _own_strings(node: Node):
    """The node's own content strings (not nested sections') in
    document order — the strings the reference's citation parser
    scans (citationparser.py:98-165 walks every str in the tree)."""
    out = []
    for c in node:
        if isinstance(c, str):
            out.append(c)
        elif isinstance(c, Node):
            if c.kind in ("section", "pagebreak"):
                continue
            for k in ("text", "title"):
                v = c.attrs.get(k)
                if v:
                    out.append(v)
            out.extend(_own_strings(c))
    return out


def _refs(node: Node, doc_uri: str, rfc_base: str):
    """Distinct dcterms:references targets from scanning the node's
    own strings with the RFC citation grammar (rfc.py:430-452)."""
    uris = []
    for s in _own_strings(node):
        for c in scan_citations(s, base=rfc_base):
            if c["kind"] == "url":
                continue  # the RFC repo's citparser has no url grammar
            uri = c["uri"]
            if uri.startswith("#"):
                uri = doc_uri + uri  # bare "Section N" -> own document
            if uri and uri not in uris:
                uris.append(uri)
    return uris


def _shorttitle(node: Node):
    """cleanup_body semantics (rfc.py:520-535): last pagebreak short
    title at this level, else first non-None from a child subtree."""
    shorttitle = None
    for c in node:
        if isinstance(c, Node) and c.kind == "pagebreak":
            shorttitle = c.attrs.get("shorttitle")
        elif isinstance(c, Node):
            short = _shorttitle(c)
            if shorttitle is None:
                shorttitle = short
    return shorttitle


def distill_rfc(text: str, basefile: str,
                base: str = "http://localhost:8000/") -> set:
    """Plain RFC text -> reference-equivalent distilled triple set."""
    rfc_base = base + "res/rfc/"
    body = parse_rfc_tree(text)
    children = list(body)

    header = children.pop(0)
    assert header.kind == "rfcheader", header.kind
    title_node = children.pop(0)
    title = title_node.attrs["title"]

    # drop the first "Table of Contents" preamble section
    # (rfc.py:479-482); positional delete — Node is a list subclass,
    # so list.remove() would drop the first *content-equal* sibling
    for i, c in enumerate(children):
        if (isinstance(c, Node) and c.kind == "preamble"
                and c.attrs.get("title") == "Table of Contents"):
            del children[i]
            break

    realid = get_rfc_num(header.attrs["text"]) or basefile
    doc_uri = rfc_base + realid

    triples = set()
    triples.add((doc_uri, PROV + "wasGeneratedBy", _lit(GENERATOR)))
    triples.add((doc_uri, DCTERMS + "title", _lit(title, "en")))
    header_triples, rdftype, has_id = _header_triples(
        header.attrs["text"], doc_uri, base, rfc_base)
    triples.update(header_triples)
    triples.add((doc_uri, RDF_TYPE, ("uri", rdftype or RFC_NS + "RFC")))
    if not has_id:
        triples.add((doc_uri, DCTERMS + "identifier",
                     _lit("RFC %s" % basefile)))

    shorttitle = _shorttitle(body)
    if shorttitle and shorttitle != title:
        triples.add((doc_uri, BIBO + "shortTitle", _lit(shorttitle, "en")))

    # preamble sections: #PS1.. in document order (PreambleSection
    # as_xhtml counter, rfc.py:37-57), typed part + title + references
    ps = 0
    for c in children:
        if not (isinstance(c, Node) and c.kind == "preamble"):
            continue
        ps += 1
        uri = doc_uri + "#PS%d" % ps
        triples.add((uri, RDF_TYPE, ("uri", BIBO + "DocumentPart")))
        triples.add((uri, DCTERMS + "title",
                     _lit(c.attrs.get("title", ""), "en")))
        for ref in _refs(c, doc_uri, rfc_base):
            triples.add((uri, DCTERMS + "references", ("uri", ref)))

    # sections (recursive): #S<ordinal>, isPartOf parent, identifier,
    # chapter, title, references — all section literals carry @en
    # (inherited xml:lang in the reference's RDFa rendering)
    def walk(node: Node, parent_uri: str):
        for c in node:
            if not (isinstance(c, Node) and c.kind == "section"):
                continue
            ordinal = c.attrs["ordinal"]
            uri = doc_uri + "#S" + ordinal
            triples.add((uri, RDF_TYPE, ("uri", BIBO + "DocumentPart")))
            triples.add((uri, DCTERMS + "title",
                         _lit(c.attrs["title"], "en")))
            triples.add((uri, DCTERMS + "isPartOf", ("uri", parent_uri)))
            triples.add((uri, BIBO + "chapter", _lit(ordinal, "en")))
            triples.add((uri, DCTERMS + "identifier",
                         _lit("RFC %s, section %s" % (basefile, ordinal),
                              "en")))
            for ref in _refs(c, doc_uri, rfc_base):
                triples.add((uri, DCTERMS + "references", ("uri", ref)))
            walk(c, uri)

    walk(body, doc_uri)
    return triples
