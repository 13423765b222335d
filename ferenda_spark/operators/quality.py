"""Data-quality / status operators.

* ``resource_validation`` — the reference's sub-resource checks
  (render_xhtml_validate, documentrepository.py:1609-1625; SURVEY.md
  T3): no duplicate ``@about`` per document, at most ``max_resources``
  URI-addressable sub-resources per document.  Spark restatement: one
  aggregation over the triples table, grouped by document context —
  a single shuffle on the context key, no Python.

* ``repo_status`` — get_status / frontpage counts
  (documentrepository.py:3549-3626, rfc.py:699-719; SURVEY.md A7):
  per-repo-kind document/error/part counts over the parsed stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .. import vocab


def resource_validation(triples: DataFrame,
                        max_resources: int = 1000) -> DataFrame:
    """Per document context: number of distinct sub-resources, number
    of duplicated ``@about`` subjects (same subject typed more than
    once — render_xhtml_validate's first check), and whether the doc
    exceeds ``max_resources`` (decorators.py:299-303)."""
    typed = triples.where(F.col("pred") == vocab.RDF_TYPE)
    per_subj = (typed.groupBy("context", "subj")
                .agg(F.count("*").alias("n_typed")))
    return (per_subj.groupBy("context")
            .agg(F.count("*").alias("n_resources"),
                 F.sum(F.when(F.col("n_typed") > 1, 1).otherwise(0))
                 .alias("n_duplicate_abouts"))
            .withColumn("over_limit",
                        F.col("n_resources") > F.lit(max_resources)))


def repo_status(parsed: DataFrame) -> DataFrame:
    """Per document kind (the repo analogue): doc / error / part /
    link counts — the frontpage + get_status counters."""
    return (parsed.groupBy("kind")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0))
                 .alias("n_errors"),
                 F.sum(F.size("sections")).alias("n_parts"),
                 F.sum(F.size("links")).alias("n_links")))


def profile_table(df: DataFrame, columns: list = None) -> DataFrame:
    """One-pass data profiling — per-column row count, null count,
    exact distinct count, lexicographic min/max (values rendered as
    strings so one schema fits every column type): the statistics
    table warehouse catalogs (Iceberg `ANALYZE`, Delta column stats)
    maintain for CBO join ordering, partition pruning, and data-
    quality monitoring, restated as a DataFrame program.

    Shape: one explode of the row into (column, value) pairs — a
    map-side UDTF-shaped stack — then a single groupBy(column).
    min/max/counts partial-aggregate map-side, but EXACT NDV makes
    the shuffle carry the per-partition-distinct (column, value)
    pairs — corpus-sized in the worst case, which is precisely why
    production profiling at 10^12 rows swaps ``countDistinct`` for
    ``approx_count_distinct`` (HLL: constant-size partials, same
    plan otherwise) or feeds :func:`ferenda_spark.operators.
    sketches.hll_registers` per column.  Exact NDV is kept here
    because the driver oracle demands determinism."""
    cols = columns or df.columns
    pairs = df.select(F.explode(F.array(*[
        F.struct(F.lit(c).alias("column"),
                 F.col(c).cast("string").alias("value"))
        for c in cols])).alias("kv")).select("kv.column", "kv.value")
    return (pairs.groupBy("column")
            .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
                 F.sum(F.col("value").isNull().cast("long"))
                 .cast("long").alias("n_nulls"),
                 F.countDistinct("value").cast("long")
                 .alias("n_distinct"),
                 F.min("value").alias("min_val"),
                 F.max("value").alias("max_val")))


def calibration_bins(scored: DataFrame, n_bins: int = 10,
                     score_col: str = "score",
                     label_col: str = "label") -> DataFrame:
    """Reliability diagram + expected-calibration-error terms for a
    [0,1]-scored binary classifier — the acceptance gate for the
    quality/spam/language classifiers that decide what a web corpus
    keeps (a filter whose 0.9 means 60% precision silently skews the
    corpus; ECE is the standard audit, Guo et al., ICML 2017).

    ``scored``: one row per example with ``score`` ∈ [0,1] and
    integral ``label`` ∈ {0,1}.  Returns one row per non-empty
    equal-width bin:

    (bin, n, n_pos, mean_score, frac_pos, gap) where ``gap`` =
    |frac_pos − mean_score| is the bin's calibration error; ECE =
    Σ n/N · gap is one further trivial aggregate for the caller.

    Scale shape: ONE groupBy on the bin id (≤ n_bins groups, map-side
    partials do all the work).  Exactness: mean_score divides a SUM
    of doubles — associativity-safe only if callers feed scores that
    are exact binary fractions (k/2^m, e.g. model logits quantized
    to 1/256); frac_pos and gap are exact IEEE divisions of longs.
    """
    b = F.least(F.floor(F.col(score_col) * n_bins).cast("long"),
                F.lit(int(n_bins) - 1))
    per = (scored
           .groupBy(b.alias("bin"))
           .agg(F.count(F.lit(1)).cast("long").alias("n"),
                F.sum(F.col(label_col).cast("long")).cast("long")
                .alias("n_pos"),
                F.sum(F.col(score_col)).alias("sum_score")))
    mean_score = F.col("sum_score") / F.col("n")
    frac_pos = F.col("n_pos").cast("double") / F.col("n")
    return per.select(
        "bin", "n", "n_pos",
        mean_score.alias("mean_score"),
        frac_pos.alias("frac_pos"),
        F.abs(frac_pos - mean_score).alias("gap"))
