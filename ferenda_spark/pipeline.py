"""End-to-end DAG assembly: pages -> parsed docs -> triples ->
canonicalized triples -> derived tables (SURVEY.md §3.1 restated)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .corpus import load_pages, pages_from_documents
from .operators.canonicalize import rewrite_canonical, sameas_components
from .operators.extract import extract_pages
from .operators.facets import faceted_data
from .operators.linking import build_resources, entity_mention_triples
from .operators.triples import all_triples, with_doc_metadata


def parsed_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_doc_metadata(extract_pages(load_pages(spark, sf_dir)))


def corpus_triples(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """doc + section + mention + entity-link triples."""
    resources = build_resources(spark)
    return all_triples(docs).unionByName(
        entity_mention_triples(docs, resources))


def canonical_triples(spark: SparkSession, docs: DataFrame,
                      mapping: DataFrame | None = None) -> DataFrame:
    """Full KG rewritten through the sameAs canonical mapping.

    ``mapping`` is the materialized canonicalization stage table when
    the caller has one (production shape: connected components runs
    once per ingest and is persisted; every downstream query joins
    against the stored mapping instead of re-running the fixpoint).
    Without it the mapping is derived inline from the same triples."""
    t = corpus_triples(spark, docs)
    if mapping is None:
        mapping = sameas_components(t)
    return rewrite_canonical(t, mapping)


def staged_flagship(spark: SparkSession, sf_dir: str,
                    store_dir: str) -> DataFrame:
    """The flagship DAG as a CHAIN of resumable checkpointed stages
    (north rule: every stage checkpoints with lineage so the run
    resumes mid-DAG): pages -[parse]-> parsed docs -[triples]->
    doc/section/mention triples.

    * each stage is a :func:`operators.incremental.run_stage` call
      with its OWN input fingerprint (md5(html) for parse, md5(text)
      for triples), so a change anywhere reprocesses exactly the
      affected documents in exactly the affected stages;
    * a kill between stages costs only the unfinished stage — the
      finished stage's entries anti-join selects zero rows on rerun
      (pinned by test_staged_flagship_resumes_between_stages);
    * triple rows keep (url, input_fingerprint) columns: per-row
      lineage back to the exact page bytes that produced them (the
      counters view is operators.incremental.stage_counters)."""
    from pyspark.sql import functions as F

    from .corpus import partition_by_url_prefix
    from .operators.incremental import run_stage
    from .operators.triples import all_triples

    # north-rule layout: range-partition the crawl on a url prefix so
    # hot domains are SPLIT across a bounded partition run (sampled
    # range boundaries) instead of hashed into one partition
    pages = partition_by_url_prefix(load_pages(spark, sf_dir))

    def parse_t(todo):
        return (extract_pages(todo)
                .join(todo.select("url", "input_fingerprint"), "url"))

    parsed = run_stage(pages, store_dir, "parse", parse_t)

    def triples_t(todo):
        t = all_triples(with_doc_metadata(todo))
        lineage = todo.select(F.col("url"), "input_fingerprint")
        return t.join(lineage, t["context"] == lineage["url"])

    return run_stage(parsed.drop("input_fingerprint"), store_dir,
                     "triples", triples_t, source_col="text")


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The headline analytic: full KG construction then the faceted
    pivot (documents per publisher/year — ferenda's faceted_data).

    The parse stage is materialized once before the triples fan-out
    (doc/section/mention/entity branches would otherwise each re-run
    the Python parse); the cluster analogue is each stage writing to
    and reading back an Iceberg table."""
    docs = parsed_docs(spark, sf_dir).localCheckpoint()
    triples = corpus_triples(spark, docs)
    return faceted_data(triples)


def staged_flagship_atomic(spark: SparkSession, sf_dir: str,
                           store_dir: str):
    """:func:`staged_flagship` with every stage checkpoint upgraded to
    the single-commit snapshot protocol (north rule: "every stage
    checkpoints ... so the DAG is resumable mid-run", through real
    atomic commits): a kill anywhere loses at most the uncommitted
    stage batch, reruns reprocess exactly the pending inputs of
    exactly the affected stages, and each stage table carries
    time-travelable per-batch history (snaptable.history()).

    Returns ``(triples_df, parse_table, triples_table)``."""
    from pyspark.sql import functions as F

    from .operators.extract import extract_pages
    from .operators.incremental import run_stage_atomic
    from .operators.triples import all_triples, with_doc_metadata

    pages = load_pages(spark, sf_dir)

    def parse_t(todo):
        return (extract_pages(todo)
                .join(todo.select("url", "input_fingerprint"), "url"))

    parsed, ptab, _ = run_stage_atomic(pages, store_dir, "parse",
                                       parse_t)

    def triples_t(todo):
        t = all_triples(with_doc_metadata(todo))
        lineage = todo.select(F.col("url"), "input_fingerprint")
        return t.join(lineage, t["context"] == lineage["url"])

    out, ttab, _ = run_stage_atomic(parsed.drop("input_fingerprint"),
                                    store_dir, "triples", triples_t,
                                    source_col="text")
    return out, ptab, ttab
