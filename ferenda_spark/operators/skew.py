"""Explicit skew mitigation (north rule: hot domains/entities handled
with explicit key salting, AQE, and repartition-by-range on url
prefix).

The session enables AQE's runtime skew-join split (session.py), which
covers sort-merge joins whose skew is visible in shuffle statistics;
``catalog.dump_nt`` carries the repartition-by-range shape.  This
module is the EXPLICIT salting path for the case AQE cannot fix: a
shuffle join against a dimension that is too large to broadcast,
where one join key (a hot domain, a mega-entity) owns a large share
of the fact side — AQE can split the fact partition, but every split
still collides on the same dimension row's reducer when the engine
falls back to a shuffle join.  Salting rewrites the join key itself:

* fact rows get a per-row salt in ``[0, n_salts)`` — a row-position
  disambiguator (monotonically_increasing_id) mixed into xxhash64, so
  EXACT-DUPLICATE fact rows still spread across salts (a content-only
  hash would send a hot key's duplicate rows to one reducer — the
  heavy-duplicate case salting exists for).  Any salt value is
  correct for any row (the dimension is replicated to every salt), so
  the join result is deterministic even though the salt isn't;
* the dimension is replicated ``n_salts`` ways (a broadcast-sized
  range crossJoin, cost = n_salts * |dim|);
* the equi-join runs on ``(key, salt)``, spreading a hot key over
  ``n_salts`` reducers.

Result equality with the plain join is guaranteed (every fact row
still meets exactly one replica of its dimension row) and pinned by
tests/test_spark_ops.py.  The corpus plants a hot domain (~30%% of
urls, corpus.py:30-46) so the driver query exercises real skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(fact: DataFrame, dim: DataFrame, key: str,
                n_salts: int = 16, how: str = "inner") -> DataFrame:
    """Equi-join ``fact`` (skewed on ``key``) with ``dim`` (unique per
    ``key``, too big to broadcast) via key salting.  ``how`` may be
    ``inner`` or ``left`` (fact-preserving)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left, got %r" % how)
    spark = fact.sparkSession
    salt = F.pmod(
        F.xxhash64(F.monotonically_increasing_id(),
                   *[F.col(c) for c in fact.columns]),
        F.lit(n_salts)).cast("int")
    f = fact.withColumn("__salt", salt)
    salts = spark.range(n_salts).select(
        F.col("id").cast("int").alias("__salt"))
    d = dim.crossJoin(F.broadcast(salts))
    return f.join(d, [key, "__salt"], how).drop("__salt")


def distinct_count_by_key(df: DataFrame, key: str,
                          value: str) -> DataFrame:
    """Exact per-key distinct count in two shuffles with no hot
    reducer: the first distinct shuffles on (key, value) — a hot key's
    rows spread across all of its values' partitions — and only the
    already-reduced pairs meet the per-key aggregation.  This is the
    salt-free equivalent of two-phase salted aggregation (the salt IS
    the value), and the shape countDistinct cannot always reach when
    several distinct aggregates share one grouping."""
    return (df.select(key, value).distinct()
            .groupBy(key)
            .agg(F.count("*").alias("n_distinct")))
