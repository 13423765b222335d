#!/usr/bin/env python
"""spark-submit entrypoint for the flagship KG-construction DAG
(north rule: "run via spark-submit --py-files on a multi-executor
cluster").  Usage::

    sh scripts/make_pyfiles.sh
    spark-submit --master <cluster-or-local[N]> \
        --py-files dist/ferenda_spark.zip \
        scripts/submit_flagship.py --sf <pages dir> --out <store dir>

The session comes from spark-submit's own conf (getOrCreate) — the
library never overrides master/memory settings handed down by the
launcher.  The job materializes the canonical triples to the store
(bucketed parquet; on a cluster the same writer targets an Iceberg
table) plus the per-partition lineage counters, then prints one JSON
line with row counts and wall time so submissions are scriptable."""

import argparse
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", required=True, help="pages/documents dir")
    ap.add_argument("--out", required=True, help="store dir (writable)")
    ap.add_argument("--triples-table", default="canonical_triples")
    ap.add_argument("--staged", action="store_true",
                    help="run the parse->triples chain through atomic "
                         "snapshot-commit stages (resumable mid-run: "
                         "re-submitting after a kill reprocesses only "
                         "the pending inputs of the unfinished stage)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    spark = SparkSession.builder.appName(
        "ferenda-spark-flagship").getOrCreate()

    from ferenda_spark import catalog, pipeline
    t0 = time.time()
    if args.staged:
        triples, ptab, ttab = pipeline.staged_flagship_atomic(
            spark, args.sf, args.out)
        n = triples.count()
        extra = {"parse_snapshots": len(ptab.history()),
                 "triples_snapshots": len(ttab.history())}
    else:
        docs = pipeline.parsed_docs(spark, args.sf).localCheckpoint()
        triples = pipeline.canonical_triples(spark, docs)
        catalog.write_triples(triples, args.out, args.triples_table)
        back = catalog.read_stage(spark, args.out, args.triples_table)
        n = back.count()
        extra = {}
    wall = time.time() - t0
    print(json.dumps({
        "job": "flagship-staged" if args.staged else "flagship",
        "sf": args.sf, "out": args.out,
        "triples": n, "wall_sec": round(wall, 2),
        "triples_per_sec": round(n / wall, 1),
        "master": spark.sparkContext.master,
        "default_parallelism": spark.sparkContext.defaultParallelism,
        **extra,
    }))
    spark.stop()
    return 0 if n > 0 else 1


if __name__ == "__main__":
    sys.exit(main())
