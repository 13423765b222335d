"""Faceted data + TOC + feeds + statistics — the reference's derived
analytic tables (SURVEY.md A1-A9, J1, W1-W4, O1-O2).

* :func:`faceted_data` — the central analytic (faceted_data,
  documentrepository.py:2162-2216): one row per document with facet
  columns, computed as a **pivot of the triples table** (the SPARQL
  SELECT + one OPTIONAL per facet of J1 becomes
  ``groupBy(subj).pivot(pred).agg(first(obj))``; with a fixed facet
  list this is a single shuffle).
* :func:`toc_pagesets` / :func:`toc_pages` — A2/A3 (documentrepository
  .py:2740-2880): distinct selector values per facet; per-value item
  lists sorted by the facet key (title_sortkey semantics as an explicit
  sortkey column, O2).
* :func:`news_feeds` — A4/W1 (:3206-3261, :3411-3547): per-feed
  ranking by updated desc + archive chunking into pages of 100.
* :func:`api_stats` — A5 (wsgiapp.py:310-464): per-dimension distinct
  (uri, value) observation counts.
* :func:`year_histogram` — A6 (fulltextindex.py:947-964 date_histogram).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .. import vocab

FACET_PREDS = [vocab.RDF_TYPE, vocab.DCTERMS_TITLE, vocab.DCTERMS_PUBLISHER,
               vocab.DCTERMS_ISSUED, vocab.DCTERMS_SUBJECT,
               vocab.DCTERMS_IDENTIFIER]


def faceted_data(triples: DataFrame, rdf_type: str = vocab.BIBO_DOCUMENT,
                 facet_preds=None) -> DataFrame:
    """Pivot the triples table into one row per document of the given
    rdf:type.  Column names follow the qname convention
    (g.qname(p).replace(':','_'), documentrepository.py:2256-2260).
    DISTINCT before pivot mirrors the SELECT DISTINCT of the facet
    query (J1); dropDuplicates after mirrors A1's duplicate removal."""
    preds = facet_preds or FACET_PREDS
    names = [vocab.QNAMES.get(p, p.rsplit("/", 1)[-1]) for p in preds]
    subjects = (triples
                .where((F.col("pred") == vocab.RDF_TYPE)
                       & (F.col("obj") == rdf_type))
                .select(F.col("subj").alias("uri")).distinct())
    pivoted = (triples.join(subjects, triples["subj"] == subjects["uri"],
                            "inner")
               .where(F.col("pred").isin(preds))
               .groupBy("uri")
               .pivot("pred", preds)
               .agg(F.first("obj")))
    for p, n in zip(preds, names):
        pivoted = pivoted.withColumnRenamed(p, n)
    return (pivoted
            .withColumn("year",
                        F.substring("dcterms_issued", 1, 4).cast("int"))
            .dropDuplicates(["uri"]))


def toc_pagesets(faceted: DataFrame, facets=None) -> DataFrame:
    """A2: per facet, the set of distinct selector values with counts —
    (facet, value, n_docs), sorted.  Facet selectors follow facet.py:
    year (:156-177), firstletter of titlesortkey (:220-232)."""
    facets = facets or ["year", "firstletter", "publisher"]
    sels = {
        "year": F.col("year").cast("string"),
        "firstletter": F.substring(_title_sortkey_col(F.col("dcterms_title")), 1, 1),
        "publisher": F.col("dcterms_publisher"),
    }
    # melt all facets in ONE pass (explode of (facet, value) structs)
    # instead of a union of per-facet scans: the upstream pivot is
    # expensive, and a union would recompute it once per facet.  One
    # scan + one shuffle regardless of facet count.
    pairs = F.array(*[
        F.struct(F.lit(f).alias("facet"), sels[f].alias("value"))
        for f in facets])
    return (faceted
            .select(F.explode(pairs).alias("fv"))
            .select("fv.facet", "fv.value")
            .where(F.col("value").isNotNull())
            .groupBy("facet", "value")
            .agg(F.count("*").alias("n_docs"))
            .orderBy("facet", "value"))


def _title_sortkey_col(c):
    """title_sortkey (util.py:691-705) as a pure column expression:
    lower, strip leading 'the ', drop non-alphanumerics (keeping
    Swedish letters, like the reference's \\w), drop spaces."""
    lowered = F.lower(F.trim(c))
    nothe = F.regexp_replace(lowered, r"^the ", "")
    return F.regexp_replace(nothe, r"[^a-z0-9åäöéü]", "")


def _collate_sv_col(c):
    """O1: primary-strength Swedish collation as a column — the
    deterministic stand-in for the reference's locale.strxfrm TOC
    ordering (documentrepository.py:2809-2811); the translate table is
    shared with textutil.swedish_collation_key so scalar and
    distributed sorts agree."""
    from ..textutil import SV_COLLATE_DST, SV_COLLATE_SRC
    return F.translate(F.lower(c), SV_COLLATE_SRC, SV_COLLATE_DST)


def toc_pages(faceted: DataFrame, facet: str = "year") -> DataFrame:
    """A3: group documents under each selector value, ordered within
    the group by the facet key (titlesortkey, Swedish collation)."""
    sel = {"year": F.col("year").cast("string"),
           "publisher": F.col("dcterms_publisher")}[facet]
    key = _title_sortkey_col(F.col("dcterms_title"))
    w = Window.partitionBy("value").orderBy(
        _collate_sv_col(F.col("sortkey")), "uri")
    return (faceted
            .select(sel.alias("value"), "uri", "dcterms_title",
                    key.alias("sortkey"))
            .where(F.col("value").isNotNull())
            .withColumn("pos", F.row_number().over(w)))


def news_feeds(entries: DataFrame, feed_col: str, ts_col: str,
               page_size: int = 100) -> DataFrame:
    """A4/W1: rank entries per feed by timestamp desc; archive page id
    = floor((rank-1)/page_size) (news_write_atom chunking,
    documentrepository.py:3411-3547)."""
    w = Window.partitionBy(feed_col).orderBy(F.col(ts_col).desc(),
                                             F.col("uri"))
    return (entries
            .withColumn("rank", F.row_number().over(w))
            .withColumn("archive_page",
                        F.floor((F.col("rank") - 1) / page_size)))


def api_stats(faceted: DataFrame, dimensions=None) -> DataFrame:
    """A5 (wsgiapp.py:310-464): per dimension, count of distinct
    (uri, observation) pairs per observed value."""
    dimensions = dimensions or ["rdf_type", "dcterms_publisher", "year"]
    # same single-pass melt as toc_pagesets: one scan of the faceted
    # table, one distinct+agg shuffle for all dimensions together
    pairs = F.array(*[
        F.struct(F.lit(d).alias("dimension"),
                 F.col(d).cast("string").alias("value"))
        for d in dimensions])
    return (faceted
            .select("uri", F.explode(pairs).alias("dv"))
            .select("dv.dimension", "dv.value", "uri")
            .where(F.col("value").isNotNull())
            .distinct()
            .groupBy("dimension", "value")
            .agg(F.count("*").alias("values_count"))
            .orderBy("dimension", "value"))


def year_histogram(df: DataFrame, date_col: str) -> DataFrame:
    """A6: date_histogram interval=year, min_doc_count>=1."""
    return (df.select(F.year(date_col).alias("year"))
            .groupBy("year").agg(F.count("*").alias("n"))
            .orderBy("year"))


def stats_cube(faceted: DataFrame,
               dims: tuple = ("dcterms_publisher", "year")) -> DataFrame:
    """A5 grouping-sets variant (SURVEY.md §2.5 note): the per-dimension
    stats of wsgiapp.stats expressed as one ``cube()`` — every
    dimension combination incl. grand total in a single pass/shuffle
    (map-side partial aggregation), instead of one scan per dimension."""
    return (faceted
            .cube(*[F.col(d).cast("string").alias(d) for d in dims])
            .agg(F.count("*").alias("n_docs"),
                 F.countDistinct("uri").alias("n_distinct_docs")))
