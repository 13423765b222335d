"""Resumable-batch machinery: per-stage checkpoint `entries` table +
anti-join work selection + per-partition lineage counters.

The reference's incremental contract (SURVEY.md §2.9, X1/I1-I5):
`DocumentStore.needed` skips documents whose output is newer than the
input (documentstore.py:324-357); `DocumentEntry` records per-(action,
basefile) status/duration (documententry.py:27-104).  Spark
restatement:

* each stage writes its outputs *and* an entries batch
  ``(url, stage, input_fingerprint, success, ts, duration_s, error)``;
* on (re)start the stage's work set = inputs **anti-joined** against
  successful entries on (url, input_fingerprint) — a kill mid-run
  costs only the partitions whose entries batch never committed;
* fingerprint = md5(html) (download_is_different semantics,
  documentrepository.py:1010-1015) so changed pages reprocess and
  unchanged ones don't (I5);
* ``lastdownload``-style watermark = max(warc_ts) (I2).

The sandbox store is parquet-append per stage (Iceberg's atomic commit
is the production analogue, noted in session.py); commits are
idempotent because outputs are deterministic functions of inputs (S5).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

ENTRIES_SCHEMA = ("url string, stage string, input_fingerprint string, "
                  "success string, ts timestamp, duration_s double, "
                  "error string")


def fingerprinted(pages: DataFrame,
                  source_col: str = "html") -> DataFrame:
    """+ input_fingerprint = md5 of the stage's input payload —
    ``html`` for the download->parse stage; downstream stages
    fingerprint their own input column (e.g. the parsed ``text``), so
    every stage of a chain gets change detection against ITS input."""
    return pages.withColumn("input_fingerprint",
                            F.md5(F.col(source_col).cast("binary")))


def pending_work(pages_fp: DataFrame, entries: DataFrame | None,
                 stage: str) -> DataFrame:
    """needed-semantics work selection: anti-join inputs against
    successful checkpoint entries for this stage."""
    if entries is None:
        return pages_fp
    done = (entries
            .where((F.col("stage") == stage)
                   & (F.col("success") == "true"))
            .select("url", "input_fingerprint"))
    return pages_fp.join(done, ["url", "input_fingerprint"], "left_anti")


def read_entries(spark: SparkSession, store_dir: str) -> DataFrame | None:
    path = os.path.join(store_dir, "entries")
    try:
        return spark.read.parquet(path)
    except Exception:
        return None


def write_entries(results: DataFrame, store_dir: str, stage: str,
                  duration_s: float) -> None:
    """Append one entries batch for the rows just processed; `error`
    column (nullable) marks quarantined rows (success='false')."""
    path = os.path.join(store_dir, "entries")
    err = F.col("error") if "error" in results.columns \
        else F.lit(None).cast("string")
    (results
     .select("url", "input_fingerprint",
             err.alias("error"))
     # stages whose output has several rows per input (e.g. triples)
     # still get ONE entry per (url, fingerprint) checkpoint row
     .distinct()
     .withColumn("stage", F.lit(stage))
     .withColumn("success",
                 F.when(F.col("error").isNull(), "true").otherwise("false"))
     .withColumn("ts", F.current_timestamp())
     .withColumn("duration_s", F.lit(float(duration_s)))
     .select("url", "stage", "input_fingerprint", "success", "ts",
             "duration_s", "error")
     .write.mode("append").parquet(path))


def watermark(pages: DataFrame) -> "object":
    """I2: lastdownload cursor = max(warc_ts)."""
    return pages.agg(F.max("warc_ts")).first()[0]


def stage_counters(results: DataFrame) -> DataFrame:
    """A10/north-rule lineage: per-partition row/error counters."""
    return (results
            .withColumn("partition_id", F.spark_partition_id())
            .groupBy("partition_id")
            .agg(F.count("*").alias("rows"),
                 F.sum(F.when(F.col("error").isNotNull(), 1)
                       .otherwise(0)).alias("errors")))


def run_stage(pages: DataFrame, store_dir: str, stage: str,
              transform, output_name: str | None = None,
              source_col: str = "html") -> DataFrame:
    """Checkpointed stage execution: select pending work, transform,
    write outputs + entries atomically-enough (outputs first, entries
    last — a crash between the two re-does at most one batch, which is
    idempotent).

    The transform runs ONCE: the batch is materialized with
    ``localCheckpoint`` before the output write, so the entries batch
    is derived from the materialized blocks instead of re-executing the
    transform DAG (which would double every stage's cost at scale).  On
    a cluster the production analogue is reading back the Iceberg
    snapshot's added files; the checkpoint is the single-JVM stand-in."""
    spark = pages.sparkSession
    fp = fingerprinted(pages, source_col)
    entries = read_entries(spark, store_dir)
    todo = pending_work(fp, entries, stage)
    t0 = time.time()
    out = transform(todo).localCheckpoint()
    out_path = os.path.join(store_dir, output_name or stage)
    out.write.mode("append").parquet(out_path)
    done = out.select("url", "input_fingerprint", *(
        ["error"] if "error" in out.columns else []))
    write_entries(done, store_dir, stage, time.time() - t0)
    return spark.read.parquet(out_path)


def run_stage_atomic(pages: DataFrame, store_dir: str, stage: str,
                     transform, source_col: str = "html",
                     retry_errors: bool = False):
    """:func:`run_stage` with the checkpoint protocol upgraded to a
    single atomic snapshot commit (snaptable.py): the output table IS
    the entries table — pending work anti-joins against the distinct
    ``(url, input_fingerprint)`` pairs already in the committed
    outputs.  Because there is only ONE commit, the crash window of
    the two-write protocol (outputs landed, entries not) disappears: a
    kill anywhere before the metadata publish leaves the table
    byte-identical and the whole batch simply re-runs, with no
    duplicate output rows ever visible.  Downstream stages can consume
    exactly the delta via ``table.incremental(spark, prev, new)``.

    Quarantined rows (``error`` non-null) count as processed by
    default: a permanently-poisoned page must NOT re-run — and
    re-commit an identical quarantine row — on every resume, or a
    scheduled rerun loop grows the table and its snapshot history
    without bound.  ``retry_errors=True`` opts into re-attempting them
    (transient-failure recovery), accepting one new quarantine row per
    retry; either way a page whose CONTENT changes reprocesses, since
    the fingerprint differs.

    Safe under CONCURRENT drivers: the commit is conditional on the
    snapshot version the todo set was anti-joined against
    (``append(expected_version=...)``), so a second driver that raced
    the same pending batch gets :class:`CommitConflict` instead of
    silently committing duplicate ``(url, input_fingerprint)`` rows —
    it then re-anti-joins its already-computed output against the new
    head and commits only the genuinely-unclaimed remainder (usually
    nothing).  One caveat under ``retry_errors=True``: a retry row that
    loses such a race is dropped for this run (the competing driver's
    row — success or quarantine — stands) and is re-attempted on the
    next scheduled rerun.

    Returns ``(full_output_df, table, snapshot-or-None)`` —
    ``snapshot`` is None when there was no pending work (no empty
    commits)."""
    from ..snaptable import CommitConflict, SnapshotError, SnapshotTable

    spark = pages.sparkSession
    tab = SnapshotTable(os.path.join(store_dir, stage + "_snap"))
    fp = fingerprinted(pages, source_col)
    keys = ["url", "input_fingerprint"]
    base_version = tab.version()
    if base_version:
        prior = tab.read(spark)
        if retry_errors and "error" in prior.columns:
            prior = prior.where(F.col("error").isNull())
        done = prior.select(*keys).distinct()
        todo = fp.join(done, keys, "left_anti")
    else:
        todo = fp
    out = transform(todo).localCheckpoint()
    if out.count() == 0:
        return (tab.read(spark) if base_version else out), tab, None
    for _ in range(20):
        try:
            snap = (tab.append(out, expected_version=base_version)
                    if base_version
                    else tab.create(out, stats_cols=("url",)))
            return tab.read(spark), tab, snap
        except (CommitConflict, SnapshotError):
            # a concurrent driver committed first: keep only the rows
            # whose (url, fingerprint) it did NOT already claim
            committed = tab.read(spark).select(*keys).distinct()
            out = (out.join(committed, keys, "left_anti")
                   .localCheckpoint())
            base_version = tab.version()
            if out.count() == 0:
                return tab.read(spark), tab, None
    raise CommitConflict(
        "gave up after 20 conditional-commit retries under %s"
        % tab.path)


def prov_triples(stage_runs: DataFrame) -> DataFrame:
    """PROV-O provenance triples for pipeline stage runs — the
    lineage block that makes a 100 TB derived corpus auditable:
    every output artifact says which activity generated it, what
    that activity used, and when it ran (W3C PROV-O: Entity /
    Activity / used / wasGeneratedBy / wasDerivedFrom).  The
    reference tracks the same facts in per-doc entry files
    (documententry.py's parse/generate timestamps); at pipeline
    scale they become queryable triples next to the data.

    ``stage_runs``: (stage, source, started, ended, n_out) — one row
    per stage execution, the shape run_stage_atomic's bookkeeping
    already produces.  Map-only: a fixed number of triples per run
    row, no shuffle.  Returns (subj, pred, obj).
    """
    P = "http://www.w3.org/ns/prov#"
    act = F.concat(F.lit("urn:activity:"), F.col("stage"),
                   F.lit(":"), F.col("source"))
    ent = F.concat(F.lit("urn:artifact:"), F.col("stage"),
                   F.lit(":"), F.col("source"))
    inp = F.concat(F.lit("urn:artifact:input:"), F.col("source"))
    t = lambda s, p, o: stage_runs.select(  # noqa: E731
        s.alias("subj"), F.lit(p).alias("pred"), o.alias("obj"))
    return (t(ent, P + "wasGeneratedBy", act)
            .unionByName(t(ent, P + "wasDerivedFrom", inp))
            .unionByName(t(act, P + "used", inp))
            .unionByName(t(act, P + "startedAtTime", F.col("started")))
            .unionByName(t(act, P + "endedAtTime", F.col("ended")))
            .unionByName(t(ent, "https://example.org/ns#rowCount",
                           F.col("n_out").cast("string"))))
