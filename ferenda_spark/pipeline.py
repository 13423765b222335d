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


def canonical_triples(spark: SparkSession, docs: DataFrame) -> DataFrame:
    t = corpus_triples(spark, docs)
    mapping = sameas_components(t)
    return rewrite_canonical(t, mapping)


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
