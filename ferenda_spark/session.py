"""SparkSession factory with the scale-oriented defaults the pipeline
assumes: Arrow-batched pandas UDFs, AQE (incl. skew-join handling),
and a shuffle-partition count sized to the local core count.

On a real cluster this is `spark-submit --py-files ferenda_spark.zip`
with the same configs; Iceberg catalog configs would be added here
(the sandbox has no Iceberg runtime jar, so tables are partitioned
parquet via ferenda_spark.catalog with the same layout/semantics).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "ferenda_spark", master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or "local[%d]" % cpus
    if shuffle_partitions is None:
        n = master[master.find("[") + 1:master.find("]")]
        shuffle_partitions = cpus if n == "*" else max(int(n), 1)
    b = (SparkSession.builder.appName(app).master(master)
         .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
         .config("spark.sql.adaptive.skewJoin.enabled", "true")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.driver.memory",
                 os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
         .config("spark.ui.enabled", "false"))
    return b.getOrCreate()
