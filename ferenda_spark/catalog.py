"""Stage-table catalog: partitioned parquet tables with the layout
and semantics the production deployment gets from Iceberg (SURVEY.md
S3/S5/S6/S7, X9/X11).

Every pipeline stage writes its output through here: the triples sink
partitions by a bounded hash bucket of the document context (the
sandbox stand-in for Iceberg's url-prefix/warc_ts partition spec —
bounded cardinality, balanced, prunable on equality), writes are
atomic-by-replace (S5's write-if-different idempotence comes from the
outputs being deterministic functions of inputs), ``merge_upsert``
is the conditional-ingest MERGE (S2/I5), and ``dump_nt`` is the
whole-dataset N-Triples dump (S7, relate_all_teardown
documentrepository.py:1787-1806) with a stable sort for byte-stable
output (O3).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

N_BUCKETS = 64  # production: Iceberg `bucket(N, url)` / days(warc_ts)


def stage_path(store_dir: str, table: str) -> str:
    return os.path.join(store_dir, table)


def write_stage(df: DataFrame, store_dir: str, table: str,
                partition_by: tuple = (), mode: str = "overwrite") -> str:
    """Write a stage table (optionally partitioned); returns its path."""
    path = stage_path(store_dir, table)
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
    return path


def read_stage(spark: SparkSession, store_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(stage_path(store_dir, table))


def write_triples(triples: DataFrame, store_dir: str,
                  table: str = "triples",
                  mode: str = "overwrite") -> str:
    """The triple sink (S6): partition by a bounded hash bucket of the
    named-graph context so per-document graphs stay co-located and the
    partition count is independent of corpus size."""
    bucketed = triples.withColumn(
        "context_bucket", F.abs(F.hash("context")) % N_BUCKETS)
    return write_stage(bucketed, store_dir, table,
                       partition_by=("context_bucket",), mode=mode)


def merge_upsert(spark: SparkSession, store_dir: str, table: str,
                 new_df: DataFrame, key_cols: tuple) -> DataFrame:
    """MERGE semantics (S2/I5): rows of the existing table whose key
    doesn't appear in ``new_df`` survive; new rows replace matching
    keys.  Returns the merged frame (caller writes it; production is a
    single atomic Iceberg MERGE INTO)."""
    path = stage_path(store_dir, table)
    try:
        existing = spark.read.parquet(path)
    except Exception:
        return new_df
    keys = list(key_cols)
    kept = existing.join(new_df.select(*keys).distinct(), keys,
                         "left_anti")
    return kept.unionByName(new_df)


def _nt_escape(s):
    return (s.replace("\\", "\\\\").replace('"', '\\"')
            .replace("\n", "\\n").replace("\r", "\\r")
            .replace("\t", "\\t"))


def nt_lines(triples: DataFrame) -> DataFrame:
    """(line: string) N-Triples serialization.  Objects are IRIs when
    they look like absolute http(s) IRIs and carry no datatype/lang
    (exact for this engine's triple tables: every literal with IRI
    shape would carry a datatype); literals get @lang / ^^datatype."""
    obj_is_iri = (F.col("obj").rlike(r"^https?://\S+$")
                  & F.col("obj_datatype").isNull()
                  & F.col("obj_lang").isNull())
    # JVM-side escaping chain (backslash first)
    def esc_col(c):
        c = F.regexp_replace(c, r"\\", r"\\\\")
        c = F.regexp_replace(c, '"', '\\\\"')
        c = F.regexp_replace(c, "\n", "\\\\n")
        c = F.regexp_replace(c, "\r", "\\\\r")
        c = F.regexp_replace(c, "\t", "\\\\t")
        return c
    lit = F.concat(F.lit('"'), esc_col(F.col("obj")), F.lit('"'))
    lit = F.when(F.col("obj_lang").isNotNull(),
                 F.concat(lit, F.lit("@"), F.col("obj_lang"))) \
        .when(F.col("obj_datatype").isNotNull(),
              F.concat(lit, F.lit("^^<"), F.col("obj_datatype"),
                       F.lit(">"))) \
        .otherwise(lit)
    obj_term = F.when(obj_is_iri,
                      F.concat(F.lit("<"), F.col("obj"), F.lit(">"))) \
        .otherwise(lit)
    return triples.select(
        F.concat(F.lit("<"), F.col("subj"), F.lit("> <"), F.col("pred"),
                 F.lit("> "), obj_term, F.lit(" .")).alias("line"))


def dump_nt(triples: DataFrame, path: str) -> int:
    """S7: whole-dataset N-Triples dump, sorted (subj, pred, obj) for
    byte-stable output; single file like the reference's dump.nt (the
    coalesce is the explicit single-writer choice — at 100 TB one
    would drop it and emit per-partition files)."""
    lines = nt_lines(triples.orderBy("subj", "pred", "obj")).coalesce(1)
    lines.write.mode("overwrite").text(path)
    return lines.count()
