"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-construction query; ``queries()``
exposes every implemented operator from SURVEY.md §2 as
(spark, sf_dir) -> DataFrame; ``oracle_sql()`` gives the DuckDB
equivalent over the same parquet tables.

The KG queries operate on a deterministic `pages` corpus derived from
the driver's `documents` table (ferenda_spark/corpus.py): every planted
fact is a closed-form function of doc_id, so the oracle can compute the
*expected* triples in pure SQL while the Spark side recovers them by
actually parsing the generated HTML (FSM, citation scanning, entity
linking, connected components).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

# ---------------------------------------------------------------- helpers

_DOCS_CACHE: dict = {}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (id(spark), sf_dir)
    if key not in _DOCS_CACHE:
        from ferenda_spark.pipeline import parsed_docs
        _DOCS_CACHE[key] = parsed_docs(spark, sf_dir).cache()
    return _DOCS_CACHE[key]


def _triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ferenda_spark.pipeline import corpus_triples
    return corpus_triples(spark, _docs(spark, sf_dir))


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet("%s/%s.parquet" % (sf_dir.rstrip("/"), table))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG construction + faceted_data pivot at sf0.001."""
    from ferenda_spark.pipeline import flagship
    return flagship(spark, "/root/testdata/sf0.001")


# ----------------------------------------------------------- KG queries

def _q_doc_triples(spark, sf_dir):
    from ferenda_spark.operators.triples import doc_triples
    return doc_triples(_docs(spark, sf_dir))


def _q_section_triples(spark, sf_dir):
    from ferenda_spark.operators.triples import section_triples
    return section_triples(_docs(spark, sf_dir))


def _q_mention_triples(spark, sf_dir):
    from ferenda_spark.operators.triples import mention_triples
    return mention_triples(_docs(spark, sf_dir))


def _q_entity_mentions(spark, sf_dir):
    from ferenda_spark.operators.linking import (build_resources,
                                                 entity_mention_triples)
    return entity_mention_triples(_docs(spark, sf_dir),
                                  build_resources(spark))


def _q_triples_by_pred(spark, sf_dir):
    return (_triples(spark, sf_dir)
            .groupBy("pred").agg(F.count("*").alias("n")))


def _q_faceted(spark, sf_dir):
    from ferenda_spark.operators.facets import faceted_data
    return faceted_data(_triples(spark, sf_dir))


def _q_sameas_canonical(spark, sf_dir):
    from ferenda_spark.operators.canonicalize import sameas_components
    return sameas_components(_triples(spark, sf_dir))


def _q_links(spark, sf_dir):
    return (_docs(spark, sf_dir)
            .select("url", F.explode("links").alias("href")))


def _q_toc_pagesets(spark, sf_dir):
    from ferenda_spark.operators.facets import faceted_data, toc_pagesets
    return toc_pagesets(faceted_data(_triples(spark, sf_dir)))


def _q_api_stats(spark, sf_dir):
    from ferenda_spark.operators.facets import api_stats, faceted_data
    return api_stats(faceted_data(_triples(spark, sf_dir)))


def _q_extracted_docs(spark, sf_dir):
    """Metadata-extraction surface (P5): one row per parsed document."""
    return _docs(spark, sf_dir).select(
        "url", "doc_id", "doc_uri", "kind", "title", "lang",
        "identifier", "issued", "subject",
        F.col("publisher_id").cast("long").alias("publisher_id"),
        "entity_label", "same_as_id",
        F.size("sections").alias("n_parts"))


# ---------------------------------------------------- relational queries

def _q_pricing_summary(spark, sf_dir):
    li = _read(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    return (li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum("l_quantity").alias("sum_qty"),
                 F.sum(dec("l_extendedprice")).cast("double")
                 .alias("sum_base_price"),
                 F.sum(dec("l_extendedprice")
                       * (F.lit(1) - dec("l_discount"))).cast("double")
                 .alias("sum_disc_price"),
                 F.count("*").alias("count_order")))


def _q_top_revenue_orders(spark, sf_dir):
    o = _read(spark, sf_dir, "orders")
    li = _read(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    return (o.where(F.col("o_orderstatus") == "O")
            .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderkey", "o_orderdate")
            .agg(F.sum(dec("l_extendedprice")
                       * (F.lit(1) - dec("l_discount"))).cast("double")
                 .alias("revenue"))
            .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
            .limit(10))


def _q_latest_event_per_user(spark, sf_dir):
    from pyspark.sql import Window
    ev = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(),
                                              F.col("event_id").desc())
    return (ev.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("user_id", "event_id", "event_type", "value"))


def _q_feed_archive_pages(spark, sf_dir):
    from ferenda_spark.operators.facets import news_feeds
    ev = (_read(spark, sf_dir, "events")
          .withColumn("uri", F.col("event_id")))
    fed = news_feeds(ev, feed_col="event_type", ts_col="ts", page_size=100)
    return (fed.groupBy("event_type", "archive_page")
            .agg(F.count("*").alias("n"),
                 F.min("event_id").alias("min_event")))


def _q_event_type_user_stats(spark, sf_dir):
    ev = _read(spark, sf_dir, "events")
    return (ev.groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("n_users"),
                 F.count("*").alias("n_events")))


def _q_events_month_histogram(spark, sf_dir):
    ev = _read(spark, sf_dir, "events")
    return (ev.select(F.date_format("ts", "yyyy-MM").alias("month"))
            .groupBy("month").agg(F.count("*").alias("n")))


def _q_customers_without_orders(spark, sf_dir):
    c = _read(spark, sf_dir, "customer")
    o = _read(spark, sf_dir, "orders")
    return (c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
            .select("c_custkey", "c_name"))


def _q_search_documents(spark, sf_dir):
    from ferenda_spark.operators.search import compile_query
    docs = _read(spark, sf_dir, "documents")
    return compile_query(docs, q="spark merge", boosts={"text": 1.0},
                         page=0, page_size=20, id_col="doc_id",
                         text_fields=("text",)).select("doc_id", "score")


def _q_autocomplete_titles(spark, sf_dir):
    from ferenda_spark.operators.facets import faceted_data
    from ferenda_spark.operators.search import autocomplete
    fd = faceted_data(_triples(spark, sf_dir))
    return (autocomplete(fd, "Document 1", "dcterms_title", limit=15)
            .select("uri", "dcterms_title"))


def _q_dedup_exact(spark, sf_dir):
    from ferenda_spark.operators.dedup import exact_duplicates
    return exact_duplicates(_read(spark, sf_dir, "documents"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "kg_doc_triples": _q_doc_triples,
        "kg_section_triples": _q_section_triples,
        "kg_mention_triples": _q_mention_triples,
        "kg_entity_mentions": _q_entity_mentions,
        "kg_triples_by_pred": _q_triples_by_pred,
        "kg_faceted_data": _q_faceted,
        "kg_sameas_canonical": _q_sameas_canonical,
        "kg_links": _q_links,
        "kg_toc_pagesets": _q_toc_pagesets,
        "kg_api_stats": _q_api_stats,
        "kg_extracted_docs": _q_extracted_docs,
        "tpch_pricing_summary": _q_pricing_summary,
        "top_revenue_orders": _q_top_revenue_orders,
        "latest_event_per_user": _q_latest_event_per_user,
        "feed_archive_pages": _q_feed_archive_pages,
        "event_type_user_stats": _q_event_type_user_stats,
        "events_month_histogram": _q_events_month_histogram,
        "customers_without_orders": _q_customers_without_orders,
        "search_documents": _q_search_documents,
        "autocomplete_titles": _q_autocomplete_titles,
        "dedup_exact": _q_dedup_exact,
    }


# ------------------------------------------------------------ oracle SQL

# closed-form spec of the synthetic corpus (ferenda_spark/corpus.py)
_F_CTE = """
f AS (
  SELECT doc_id, text, lang, source,
         (CASE WHEN doc_id % 10 < 3 THEN 'https://hot.example.org/'
               ELSE 'https://example.org/' END)
           || 'docs/' || source || '/' || doc_id AS url,
         'https://example.org/res/doc/' || doc_id AS doc_uri,
         'Document ' || doc_id AS title,
         source || '-' || doc_id AS identifier,
         'https://example.org/res/org/pub' || (doc_id % 7) AS publisher_uri,
         strftime(DATE '2020-01-01' + INTERVAL ((doc_id * 37) % 1461) DAY,
                  '%Y-%m-%d') AS issued,
         'topic' || (doc_id % 11) AS subject,
         'https://example.org/res/entity/' || (doc_id % 50) AS entity_uri,
         CASE WHEN doc_id % 4 <> 0
              THEN 'https://example.org/res/doc/' || (doc_id - 1) END
           AS sameas_uri,
         1 + doc_id % 3 AS n_sections
  FROM documents
),
secs AS (
  SELECT *, unnest(generate_series(1, n_sections)) AS s FROM f
),
subs AS (SELECT * FROM secs WHERE (doc_id + s) % 2 = 1)
"""

_DOC_TRIPLES = """
doc_triples AS (
  SELECT doc_uri AS subj,
         'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS pred,
         'http://purl.org/ontology/bibo/Document' AS obj,
         CAST(NULL AS VARCHAR) AS obj_datatype,
         CAST(NULL AS VARCHAR) AS obj_lang, url AS context FROM f
  UNION ALL SELECT doc_uri, 'http://purl.org/dc/terms/title', title,
         NULL, lang, url FROM f
  UNION ALL SELECT doc_uri, 'http://purl.org/dc/terms/identifier',
         identifier, NULL, NULL, url FROM f
  UNION ALL SELECT doc_uri, 'http://purl.org/dc/terms/publisher',
         publisher_uri, NULL, NULL, url FROM f
  UNION ALL SELECT doc_uri, 'http://purl.org/dc/terms/issued', issued,
         'http://www.w3.org/2001/XMLSchema#date', NULL, url FROM f
  UNION ALL SELECT doc_uri, 'http://purl.org/dc/terms/subject', subject,
         NULL, NULL, url FROM f
  UNION ALL SELECT doc_uri, 'http://www.w3.org/ns/prov#wasGeneratedBy',
         'ferenda_spark.WebPageRepo', NULL, NULL, url FROM f
  UNION ALL SELECT doc_uri, 'http://xmlns.com/foaf/0.1/page', url,
         NULL, NULL, url FROM f
  UNION ALL SELECT doc_uri, 'http://www.w3.org/2002/07/owl#sameAs',
         sameas_uri, NULL, NULL, url FROM f WHERE sameas_uri IS NOT NULL
)
"""

_SEC_TRIPLES = """
sec_triples AS (
  SELECT doc_uri || '#S' || s AS subj,
         'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS pred,
         'http://purl.org/ontology/bibo/DocumentPart' AS obj,
         CAST(NULL AS VARCHAR) AS obj_datatype,
         CAST(NULL AS VARCHAR) AS obj_lang, url AS context FROM secs
  UNION ALL SELECT doc_uri || '#S' || s, 'http://purl.org/dc/terms/title',
         'Section ' || s, NULL, lang, url FROM secs
  UNION ALL SELECT doc_uri || '#S' || s, 'http://purl.org/dc/terms/isPartOf',
         doc_uri, NULL, NULL, url FROM secs
  UNION ALL SELECT doc_uri || '#S' || s, 'http://purl.org/ontology/bibo/chapter',
         CAST(s AS VARCHAR), NULL, NULL, url FROM secs
  UNION ALL SELECT doc_uri || '#S' || s || '.1',
         'http://www.w3.org/1999/02/22-rdf-syntax-ns#type',
         'http://purl.org/ontology/bibo/DocumentPart', NULL, NULL, url FROM subs
  UNION ALL SELECT doc_uri || '#S' || s || '.1',
         'http://purl.org/dc/terms/title',
         'Subsection ' || s || '.1', NULL, lang, url FROM subs
  UNION ALL SELECT doc_uri || '#S' || s || '.1',
         'http://purl.org/dc/terms/isPartOf',
         doc_uri || '#S' || s, NULL, NULL, url FROM subs
  UNION ALL SELECT doc_uri || '#S' || s || '.1',
         'http://purl.org/ontology/bibo/chapter',
         s || '.1', NULL, NULL, url FROM subs
)
"""

_MENTION_TRIPLES = """
mention_triples AS (
  SELECT doc_uri || '#S' || s AS subj,
         'http://purl.org/dc/terms/references' AS pred,
         'https://example.org/res/rfc/' || (100 + (doc_id * 7 + s) % 900)
           AS obj,
         CAST(NULL AS VARCHAR) AS obj_datatype,
         CAST(NULL AS VARCHAR) AS obj_lang, url AS context FROM secs
  UNION ALL SELECT doc_uri || '#S' || s || '.1',
         'http://purl.org/dc/terms/references',
         'https://example.org/res/rfc/' || (100 + (doc_id * 11 + s) % 900)
           || '#S' || s, NULL, NULL, url FROM subs
)
"""

_ENTITY_TRIPLES = """
entity_triples AS (
  SELECT doc_uri AS subj, 'http://schema.org/mentions' AS pred,
         entity_uri AS obj, CAST(NULL AS VARCHAR) AS obj_datatype,
         CAST(NULL AS VARCHAR) AS obj_lang, url AS context FROM f
)
"""

_ALL_TRIPLES_WITH = ("WITH " + _F_CTE + ", " + _DOC_TRIPLES + ", "
                     + _SEC_TRIPLES + ", " + _MENTION_TRIPLES + ", "
                     + _ENTITY_TRIPLES + """,
all_triples AS (
  SELECT * FROM doc_triples UNION ALL SELECT * FROM sec_triples
  UNION ALL SELECT * FROM mention_triples
  UNION ALL SELECT * FROM entity_triples
)""")

_FACETED_WITH = _ALL_TRIPLES_WITH + """,
faceted AS (
  SELECT doc_uri AS uri,
         'http://purl.org/ontology/bibo/Document' AS rdf_type,
         title AS dcterms_title, publisher_uri AS dcterms_publisher,
         issued AS dcterms_issued, subject AS dcterms_subject,
         identifier AS dcterms_identifier,
         CAST(substr(issued, 1, 4) AS INT) AS year
  FROM f
)"""


def oracle_sql() -> dict[str, str]:
    return {
        "kg_doc_triples":
            "WITH " + _F_CTE + ", " + _DOC_TRIPLES
            + " SELECT * FROM doc_triples",
        "kg_section_triples":
            "WITH " + _F_CTE + ", " + _SEC_TRIPLES
            + " SELECT * FROM sec_triples",
        "kg_mention_triples":
            "WITH " + _F_CTE + ", " + _MENTION_TRIPLES
            + " SELECT * FROM mention_triples",
        "kg_entity_mentions":
            "WITH " + _F_CTE + ", " + _ENTITY_TRIPLES
            + " SELECT * FROM entity_triples",
        "kg_triples_by_pred":
            _ALL_TRIPLES_WITH
            + " SELECT pred, COUNT(*) AS n FROM all_triples GROUP BY pred",
        "kg_faceted_data":
            _FACETED_WITH + " SELECT * FROM faceted",
        "kg_sameas_canonical": "WITH " + _F_CTE + """,
            verts AS (
              SELECT DISTINCT v FROM (
                SELECT doc_id AS v FROM f WHERE doc_id % 4 <> 0
                UNION ALL
                SELECT doc_id - 1 FROM f WHERE doc_id % 4 <> 0))
            SELECT 'https://example.org/res/doc/' || v AS uri,
                   'https://example.org/res/doc/' || (v - (v % 4))
                     AS canonical_uri
            FROM verts""",
        "kg_links": "WITH " + _F_CTE + """
            SELECT url, (CASE WHEN (doc_id + k) % 10 < 3
                         THEN 'https://hot.example.org/'
                         ELSE 'https://example.org/' END)
                   || 'docs/' || source || '/' || (doc_id + k) AS href
            FROM f, (VALUES (1), (2)) AS offs(k)""",
        "kg_toc_pagesets": _FACETED_WITH + """
            SELECT facet, value, n_docs FROM (
              SELECT 'year' AS facet, CAST(year AS VARCHAR) AS value,
                     COUNT(*) AS n_docs FROM faceted GROUP BY 2
              UNION ALL
              SELECT 'firstletter',
                     substr(regexp_replace(regexp_replace(
                       lower(trim(dcterms_title)), '^the ', ''),
                       '[^a-z0-9]', '', 'g'), 1, 1),
                     COUNT(*) FROM faceted GROUP BY 2
              UNION ALL
              SELECT 'publisher', dcterms_publisher, COUNT(*)
              FROM faceted GROUP BY 2)""",
        "kg_api_stats": _FACETED_WITH + """
            SELECT dimension, value, COUNT(*) AS values_count FROM (
              SELECT DISTINCT 'rdf_type' AS dimension, rdf_type AS value,
                     uri FROM faceted
              UNION ALL SELECT DISTINCT 'dcterms_publisher',
                     dcterms_publisher, uri FROM faceted
              UNION ALL SELECT DISTINCT 'year', CAST(year AS VARCHAR),
                     uri FROM faceted)
            GROUP BY dimension, value""",
        "kg_extracted_docs": "WITH " + _F_CTE + """
            SELECT url, doc_id, doc_uri,
                   CASE WHEN doc_id % 5 = 4 THEN 'rfc' ELSE 'html' END
                     AS kind,
                   title, lang, identifier, issued, subject,
                   doc_id % 7 AS publisher_id,
                   'Entity ' || (doc_id % 50) AS entity_label,
                   CASE WHEN doc_id % 4 <> 0 THEN doc_id - 1 END
                     AS same_as_id,
                   CAST(n_sections + (CASE WHEN doc_id % 2 = 0
                        THEN CEIL(n_sections / 2.0)
                        ELSE FLOOR(n_sections / 2.0) END) AS INT) AS n_parts
            FROM f""",
        "tpch_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   SUM(l_quantity) AS sum_qty,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                     AS DOUBLE) AS sum_base_price,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                       * (1 - CAST(l_discount AS DECIMAL(18,2))))
                     AS DOUBLE) AS sum_disc_price,
                   COUNT(*) AS count_order
            FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
            GROUP BY l_returnflag, l_linestatus""",
        "top_revenue_orders": """
            SELECT o_orderkey, o_orderdate,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                       * (1 - CAST(l_discount AS DECIMAL(18,2))))
                     AS DOUBLE) AS revenue
            FROM orders JOIN lineitem ON l_orderkey = o_orderkey
            WHERE o_orderstatus = 'O'
            GROUP BY o_orderkey, o_orderdate
            ORDER BY revenue DESC, o_orderkey LIMIT 10""",
        "latest_event_per_user": """
            SELECT user_id, event_id, event_type, value FROM (
              SELECT *, ROW_NUMBER() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC)
                AS rn FROM events) WHERE rn = 1""",
        "feed_archive_pages": """
            SELECT event_type, archive_page, COUNT(*) AS n,
                   MIN(event_id) AS min_event FROM (
              SELECT event_type, event_id,
                     CAST(FLOOR((ROW_NUMBER() OVER (
                       PARTITION BY event_type
                       ORDER BY ts DESC, event_id) - 1) / 100) AS BIGINT)
                       AS archive_page
              FROM events)
            GROUP BY event_type, archive_page""",
        "event_type_user_stats": """
            SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
                   COUNT(*) AS n_events
            FROM events GROUP BY event_type""",
        "events_month_histogram": """
            SELECT strftime(ts, '%Y-%m') AS month, COUNT(*) AS n
            FROM events GROUP BY 1""",
        "customers_without_orders": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)""",
        "search_documents": """
            SELECT doc_id,
                   (CASE WHEN lower(text) LIKE '%spark%' THEN 1.0 ELSE 0.0 END
                    + CASE WHEN lower(text) LIKE '%merge%' THEN 1.0 ELSE 0.0 END)
                     AS score
            FROM documents
            WHERE lower(text) LIKE '%spark%' AND lower(text) LIKE '%merge%'
            ORDER BY score DESC, doc_id LIMIT 20""",
        "autocomplete_titles": _FACETED_WITH + """
            SELECT uri, dcterms_title FROM faceted
            WHERE lower(dcterms_title) LIKE 'document 1%'
            ORDER BY dcterms_title, uri LIMIT 15""",
        "dedup_exact": """
            SELECT md5(substr(text, 1, 40)) AS text_md5,
                   COUNT(*) AS n_docs, MIN(doc_id) AS canonical_doc_id
            FROM documents GROUP BY 1""",
    }
