"""Tech-source repo instances: PEP and ECMA.

The reference ships four tech repos; rfc and w3c carry full parser
chains (golden-exact here in :mod:`ferenda_spark.rfcdistill` /
``w3cdistill``), while pep and ecma are thin repo CONFIGS with no
parse code or fixtures of their own:

* ``ferenda/sources/tech/pep.py:12-16`` — alias "pep", documents are
  the PEP text files (``pep-%(basefile)s.txt``), download-only (hg
  clone); parsing falls back to the DocumentRepository defaults, and
  the PEP preamble itself is the public RFC-2822-style header block
  (PEP / Title / Author / Status / Type / Created / Python-Version,
  per PEP 1).
* ``ferenda/sources/tech/ecma.py:11-18`` — alias "ecma",
  ``basefile_regex = "ECMA-(?P<basefile>\\d+)"``,
  ``document_url_template = ".../publications/standards/
  Ecma-%(basefile)s.htm"``, ``rdf_type = bibo:Standard``; documents
  are PDFs (the only reference fixture is a scanned-OCR PDF — the
  OCR branch is declared out of scope, so the implementable surface
  is the crawl/catalog side: basefile discovery + URI minting +
  typing).

Both restatements are pure JVM column programs (regexp extraction +
explode) — no Python in the row path, map-side only until the
caller aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

FOAF_DOCUMENT = "http://xmlns.com/foaf/0.1/Document"
BIBO_STANDARD = "http://purl.org/ontology/bibo/Standard"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
DCTERMS = "http://purl.org/dc/terms/"

_PEP_GENERATOR = "ferenda.sources.tech.pep.PEP"

# PEP 1's Created field is dd-Mon-yyyy; normalize without to_date so
# the arithmetic is locale-free and replayable as SQL in any engine
_MONTHS = ("Jan", "Feb", "Mar", "Apr", "May", "Jun",
           "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")


def _month_num(col):
    expr = F.lit(None).cast("int")
    for i, m in enumerate(_MONTHS):
        expr = F.when(col == m, F.lit(i + 1)).otherwise(expr)
    return expr


def pep_triples(docs: DataFrame, base: str = "https://example.org/",
                text_col: str = "text") -> DataFrame:
    """Distill PEP preamble headers into (subj, pred, obj) triples —
    the parse a ferenda PEP repo user gets from the
    DocumentRepository defaults over PEP text files
    (sources/tech/pep.py:12-16; header grammar per PEP 1):

    * rdf:type foaf:Document (the DocumentRepository default,
      documentrepository.py:276 — pep.py does not override it),
    * dcterms:identifier "PEP <n>",
    * dcterms:title from ``Title:``,
    * dcterms:creator one triple per comma-separated ``Author:``,
    * bibo:status from ``Status:``, dcterms:type from ``Type:``,
    * dcterms:issued ISO date normalized from Created's dd-Mon-yyyy.

    ``docs`` needs (basefile, text) where text begins with the
    preamble (headers up to the first blank line).  Everything is
    regexp_extract on the preamble slice + one explode for authors —
    map-side, shuffle-free."""
    hdr = F.regexp_extract(text_col, r"(?s)^(.*?)(?:\n\n|$)", 1)

    def field(name):
        return F.regexp_extract(hdr, r"(?m)^%s: *(.*?) *$" % name, 1)

    uri = F.concat(F.lit(base + "res/pep/"), F.col("basefile"))
    created = field("Created")
    # try_cast: a missing/malformed Created yields NULL (no issued
    # triple) instead of an ANSI cast error on the empty match
    day = F.regexp_extract(created, r"^(\d{1,2})-", 1).try_cast("int")
    mon = _month_num(F.regexp_extract(created, r"-([A-Z][a-z]{2})-", 1))
    yr = F.regexp_extract(created, r"-(\d{4})$", 1).try_cast("int")
    issued = F.when(
        day.isNotNull() & mon.isNotNull() & yr.isNotNull(),
        F.concat(yr.cast("string"), F.lit("-"),
                 F.lpad(mon.cast("string"), 2, "0"), F.lit("-"),
                 F.lpad(day.cast("string"), 2, "0")))
    d = docs.select(
        uri.alias("subj"), F.col("basefile"),
        field("Title").alias("_title"), field("Author").alias("_auth"),
        field("Status").alias("_status"), field("Type").alias("_type"),
        issued.alias("_issued"))
    one = lambda pred, obj: d.where(obj != "").select(
        "subj", F.lit(pred).alias("pred"), obj.alias("obj"))
    parts = [
        d.select("subj", F.lit(RDF_TYPE).alias("pred"),
                 F.lit(FOAF_DOCUMENT).alias("obj")),
        d.select("subj", F.lit(DCTERMS + "identifier").alias("pred"),
                 F.concat(F.lit("PEP "), F.col("basefile")).alias("obj")),
        one(DCTERMS + "title", F.col("_title")),
        one("http://purl.org/ontology/bibo/status", F.col("_status")),
        one(DCTERMS + "type", F.col("_type")),
        d.where(F.col("_issued").isNotNull()).select(
            "subj", F.lit(DCTERMS + "issued").alias("pred"),
            F.col("_issued").alias("obj")),
        (d.where(F.col("_auth") != "")
         .select("subj", F.lit(DCTERMS + "creator").alias("pred"),
                 F.explode(F.split("_auth", ", ")).alias("obj"))),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def ecma_standards(pages: DataFrame, base: str = "https://example.org/",
                   text_col: str = "text") -> DataFrame:
    """ECMA standard catalog from listing pages — the crawl surface of
    sources/tech/ecma.py: every ``ECMA-<n>`` mention (basefile_regex,
    ecma.py:17) becomes one standard with its document URL minted
    from document_url_template (ecma.py:15) and rdf:type
    bibo:Standard (ecma.py:18; overriding the foaf:Document default).

    Returns (basefile, doc_url, doc_uri, rdf_type, n_mentions) —
    one row per distinct standard, mention-counted across the
    listing corpus.  regexp_extract_all + explode + one groupBy on
    the basefile (bounded by the standard catalog, dimension-sized)."""
    ment = (pages.select(
        F.explode(F.expr(
            "regexp_extract_all(%s, 'ECMA-([0-9]+)', 1)" % text_col))
        .alias("basefile")))
    return (ment.groupBy("basefile")
            .agg(F.count(F.lit(1)).cast("long").alias("n_mentions"))
            .select(
                "basefile",
                F.concat(
                    F.lit("http://www.ecma-international.org/"
                          "publications/standards/Ecma-"),
                    F.col("basefile"), F.lit(".htm")).alias("doc_url"),
                F.concat(F.lit(base + "res/ecma/"),
                         F.col("basefile")).alias("doc_uri"),
                F.lit(BIBO_STANDARD).alias("rdf_type"),
                "n_mentions"))
