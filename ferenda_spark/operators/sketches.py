"""Probabilistic sketches as DataFrame programs — Count-Min, Bloom,
HyperLogLog registers — the streaming-summary family a 100 TB corpus
pipeline needs when exact per-key state no longer fits (heavy-hitter
monitoring, have-I-crawled-this membership, distinct-host cardinality).

All three are *mergeable* by construction: register tables combine by
groupBy-max / union-distinct / groupBy-sum, so shards sketch
independently and a final tiny reduce combines them — the map-side-
combine shape that makes sketches the right tool at scale.

Engine portability: every hash is the md5-prefix integer (the
portable_bucket contract from training.py) and every emitted column is
an integer; the float *estimates* (HLL harmonic mean, CMS bias
correction) are deliberately left to the consumer (tested in pytest),
so the driver-facing tables are bit-exact across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _h(col, salt: str):
    """Portable 32-bit hash: first 8 md5 hex digits of salt:key."""
    return F.conv(F.substring(
        F.md5(F.concat(F.lit(salt + ":"), col.cast("string"))),
        1, 8), 16, 10).cast("long")


def cms_counts(items: DataFrame, key_col: str = "token",
               weight_col: str | None = None,
               depth: int = 4, width: int = 256) -> DataFrame:
    """Count-Min Sketch (Cormode & Muthukrishnan 2005): ``depth``
    independent hash rows of ``width`` counters; a key's estimate is
    the MIN over rows of its counter (always an over-estimate).

    Returns the dense register table (sketch_row, col, n) — at most
    depth*width rows regardless of input size.  Shape: one map-side
    explode of ``depth`` literals + one groupBy on (row, col); partial
    aggregation does the heavy lifting, the shuffle moves at most
    depth*width*partitions rows."""
    w = (F.col(weight_col).cast("long") if weight_col
         else F.lit(1).cast("long"))
    rows = items.select(F.col(key_col).alias("k"), w.alias("w"))
    out = None
    for d in range(depth):
        r = rows.select(F.lit(d).alias("sketch_row"),
                        (_h(F.col("k"), "cms%d" % d) % width).alias("col"),
                        "w")
        out = r if out is None else out.unionByName(r)
    return (out.groupBy("sketch_row", "col")
            .agg(F.sum("w").cast("long").alias("n")))


def cms_estimate(sketch: DataFrame, keys: DataFrame,
                 key_col: str = "token",
                 depth: int = 4, width: int = 256) -> DataFrame:
    """Point queries against a CMS register table: min over the
    ``depth`` counters each key hashes to.  The sketch is at most
    depth*width rows — broadcast."""
    out = None
    for d in range(depth):
        r = keys.select(F.col(key_col).alias("k"),
                        F.lit(d).alias("sketch_row"),
                        (_h(F.col(key_col), "cms%d" % d) % width)
                        .alias("col"))
        out = r if out is None else out.unionByName(r)
    return (out.join(F.broadcast(sketch), ["sketch_row", "col"], "left")
            .groupBy(F.col("k").alias(key_col))
            .agg(F.min(F.coalesce("n", F.lit(0))).alias("estimate")))


def bloom_bits(keys: DataFrame, key_col: str = "url",
               k: int = 3, m: int = 4096) -> DataFrame:
    """Bloom filter as a bit-position table: ``k`` hash positions per
    key, distinct — at most ``m`` rows total.  Mergeable by
    union-distinct."""
    out = None
    for i in range(k):
        r = keys.select((_h(F.col(key_col), "bloom%d" % i) % m)
                        .alias("bit"))
        out = r if out is None else out.unionByName(r)
    return out.distinct()


def bloom_probe(bits: DataFrame, keys: DataFrame,
                key_col: str = "url",
                k: int = 3, m: int = 4096) -> DataFrame:
    """Membership probe: ``maybe_seen`` iff ALL ``k`` positions are
    set (false positives possible at the standard (1-e^{-kn/m})^k
    rate, never false negatives).  The bit table is <= m rows —
    broadcast; the probe side never shuffles."""
    out = None
    for i in range(k):
        r = keys.select(F.col(key_col).alias("key"),
                        (_h(F.col(key_col), "bloom%d" % i) % m)
                        .alias("bit"))
        out = r if out is None else out.unionByName(r)
    hits = (out.join(F.broadcast(bits), "bit", "left_semi")
            .groupBy("key").agg(F.count(F.lit(1)).alias("n_set")))
    return (keys.select(F.col(key_col).alias("key")).distinct()
            .join(hits, "key", "left")
            .select(F.col("key").alias(key_col),
                    (F.coalesce("n_set", F.lit(0)) == k)
                    .alias("maybe_seen")))


def hll_registers(items: DataFrame, group_col: str, key_col: str,
                  m: int = 64) -> DataFrame:
    """HyperLogLog register table per group (Flajolet et al. 2007):
    register = hash mod m, rank = 1 + trailing-zero count of the
    remaining bits, register value = MAX rank.  Emitted as integers
    (group, register, max_rank) — m rows per group, mergeable by
    groupBy-max; the harmonic-mean estimate stays consumer-side
    (see tests) so no float crosses the engine boundary.

    Trailing zeros portably: ``bit_count(x XOR (x - 1)) - 1`` for
    x != 0 (x XOR x-1 sets exactly tz+1 low bits); x == 0 (all 24
    remaining bits zero) pins rank to 25."""
    h = _h(F.col(key_col), "hll")
    reg = (h % m).alias("register")
    # integer div, not floor(double division) — the div/`//` pin
    rest = (h - (h % m)) / F.lit(m)
    rest = rest.cast("long")
    rank = (F.when(rest == 0, F.lit(25))
            .otherwise(F.bit_count(
                rest.bitwiseXOR(rest - 1)))).alias("rank")
    return (items.select(F.col(group_col).alias("grp"), reg, rank)
            .groupBy("grp", "register")
            .agg(F.max("rank").cast("int").alias("max_rank"))
            .select(F.col("grp").alias(group_col), "register",
                    "max_rank"))


def log_histogram(items: DataFrame, value_col: str,
                  sub_bits: int = 5) -> DataFrame:
    """Log-linear histogram of a non-negative integer column — the
    HdrHistogram bucket scheme (Tene's High Dynamic Range histogram;
    same family as t-digest/KLL but DETERMINISTIC and integer-only,
    so shards sketch independently, merge by groupBy-sum, and two
    engines agree bit-for-bit).  Buckets: values with bit-length
    <= ``sub_bits`` are exact; above that, a bucket keeps the top
    ``sub_bits`` bits (relative width 2^-(sub_bits-1)), so the bucket
    count for a 64-bit range is ~64 * 2^sub_bits — a fixed-size
    summary regardless of corpus size, the property that makes
    quantiles over 10^12 rows a map-side-combine + tiny reduce.

    Bit-length portably: length of the base-2 string (Spark ``conv``,
    DuckDB ``bin``) — no float log2 whose last-ulp could flip a
    bucket boundary between engines; v = 0 is pinned to (0, 0).

    Returns (bl, lo, hi, n): bit-length, inclusive value bounds, and
    row count per non-empty bucket."""
    v = F.col(value_col).cast("long")
    bl = F.when(v <= 0, F.lit(0)).otherwise(
        F.length(F.conv(v, 10, 2))).cast("int")
    return (items.where(v >= 0)
            .select(v.alias("_v"), bl.alias("bl"),
                    F.greatest(bl - sub_bits, F.lit(0)).alias("_s"))
            # column-valued shift counts need the SQL form (the
            # pyspark wrappers take a literal int only)
            .withColumn("lo",
                        F.expr("shiftleft(shiftright(_v, _s), _s)"))
            .withColumn("hi",
                        F.col("lo") + F.expr("shiftleft(1L, _s)") - 1)
            .groupBy("bl", "lo", "hi")
            .agg(F.count(F.lit(1)).alias("n")))


def histogram_quantiles(hist: DataFrame, qs: list[float]) -> DataFrame:
    """Quantile estimates from a :func:`log_histogram` table: for
    each q, the lower bound of the first bucket whose cumulative
    count reaches ``ceil(q * N)`` (rank semantics; est is always an
    actually-bucketed value, error bounded by the bucket's relative
    width).  The cumulative window runs over the BUCKET table (fixed
    size), never the data — the quantile step costs nothing at scale.

    Returns (q, target_rank, est) per requested quantile."""
    from pyspark.sql import Window
    spark = hist.sparkSession
    cum = hist.withColumn(
        "_cum", F.sum("n").over(
            Window.orderBy("lo")
            .rowsBetween(Window.unboundedPreceding, 0)))
    total = hist.agg(F.sum("n").alias("_N"))
    qdf = spark.createDataFrame([(float(q),) for q in qs], "q double")
    tgt = (qdf.crossJoin(total)
           .select("q", F.ceil(F.col("q") * F.col("_N"))
                   .cast("long").alias("target_rank")))
    return (tgt.join(cum, cum["_cum"] >= tgt["target_rank"])
            .groupBy("q", "target_rank")
            .agg(F.min("lo").alias("est")))


def kmv_sketch(items: DataFrame, group_col: str, key_col: str,
               k: int = 32) -> DataFrame:
    """K-Minimum-Values distinct sketch per group (Bar-Yossef et al.
    2002; Beyer et al. 2007 "On synopses for distinct-value
    estimation"): keep the k smallest distinct 32-bit key hashes; the
    unbiased estimate (k-1) * 2^32 / kth_min stays consumer-side so
    the emitted table is all-integer (the module's portability
    contract).  KMV is the sketch that, unlike HLL, also supports SET
    OPERATIONS: the union sketch is the bottom-k of the merged rows,
    and intersection/Jaccard ride the same k rows
    (:func:`kmv_compare`) — which is why Theta-sketch engines
    (DataSketches) build on it.

    Scale shape: hashing is map-side; dedup of (group, hv) is one
    shuffle with map-side partial aggregation; the bottom-k runs as
    TWO bounded windows — first within (group, hv % 16) salt lanes
    (caps any single sort partition; bottom-k(global) is a subset of
    the union of per-lane bottom-ks), then over the <= 16k survivors
    per group.  No unbounded collect_set, no full-group sort.

    Returns (group, rank, hv), rank 1..k ascending — mergeable by
    re-ranking the union (groupBy-free: two sketches concat + window).
    """
    from pyspark.sql import Window
    hv = _h(F.col(key_col), "kmv")
    d = (items.select(F.col(group_col).alias("grp"), hv.alias("hv"))
         .groupBy("grp", "hv").agg(F.lit(1).alias("_one")))
    lane = Window.partitionBy("grp", F.col("hv") % 16).orderBy("hv")
    cand = (d.withColumn("_r", F.row_number().over(lane))
            .where(F.col("_r") <= k))
    final = Window.partitionBy("grp").orderBy("hv")
    return (cand.withColumn("rank", F.row_number().over(final))
            .where(F.col("rank") <= k)
            .select(F.col("grp").alias(group_col),
                    F.col("rank").cast("int").alias("rank"), "hv"))


def kmv_compare(items: DataFrame, group_col: str, key_col: str,
                grp_a: str, grp_b: str, k: int = 32) -> DataFrame:
    """Distinct-set comparison of two groups from their KMV sketches
    (the Theta-sketch a-priori pattern): take the bottom-k of the
    UNION of the two sketches, flag which of those k hashes each side
    contains, and emit the integer tallies the consumer turns into
    estimates (Jaccard ~= n_both/k', distinct-union ~= (k'-1)*2^32 /
    kth_min).  ``est_jaccard_permille`` is pinned to integer ``div``
    so no float crosses the engine boundary.

    Everything after the two sketches is sketch-sized (<= 2k rows):
    the unions, joins and the final 1-row aggregate are
    driver-trivial at any corpus scale — this is exactly why a
    crawl pipeline compares 10^12-URL sets by sketch, not by join.

    Returns ONE row (k_used, kth_min, n_both, n_only_a, n_only_b,
    est_jaccard_permille)."""
    from pyspark.sql import Window
    sk = kmv_sketch(items, group_col, key_col, k=k)
    a = sk.where(F.col(group_col) == grp_a).select("hv")
    b = sk.where(F.col(group_col) == grp_b).select("hv")
    merged = (a.withColumn("_in_a", F.lit(1))
              .unionByName(b.withColumn("_in_a", F.lit(0)))
              .groupBy("hv")
              .agg(F.max("_in_a").alias("in_a"),
                   F.min("_in_a").alias("_min"))
              .withColumn("in_b", (F.col("_min") == 0).cast("int"))
              .withColumn("_r", F.row_number().over(
                  Window.orderBy("hv")))
              .where(F.col("_r") <= k))
    return (merged.agg(
        F.count("*").cast("int").alias("k_used"),
        F.max("hv").alias("kth_min"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long")
         .alias("n_both"),
        F.sum(F.col("in_a") * (1 - F.col("in_b"))).cast("long")
         .alias("n_only_a"),
        F.sum((1 - F.col("in_a")) * F.col("in_b")).cast("long")
         .alias("n_only_b"))
        .withColumn("est_jaccard_permille",
                    F.expr("1000 * n_both div k_used")))


def ams_f2(items: DataFrame, key_col: str = "token",
           n_estimators: int = 16, group_size: int = 4) -> DataFrame:
    """AMS tug-of-war sketch for the second frequency moment F2 =
    sum_k count(k)^2 (Alon, Matias & Szegedy 1996): each estimator
    keeps X_i = sum_k sign_i(k) * count(k) with a +-1 hash sign;
    X_i^2 is an unbiased F2 estimate, variance drops by averaging
    ``group_size`` estimators and the median over groups gives the
    standard (eps, delta) guarantee.  F2 is the self-join size /
    skew statistic a shuffle planner wants before joining on a key.

    Scale shape: ONE token-keyed groupBy builds the count table
    (map-side combined — the only data-sized exchange), then a
    ``n_estimators``-way explode over the vocab-sized count table and
    a 16-row aggregate.  Signs are the portable md5-prefix hash, all
    accumulators exact longs, the group mean is integer ``div`` —
    engine-exact.  The exact F2 (one more 1-row aggregate over the
    same count table, joined broadcast) rides along so the row
    reports its own relative error.

    Returns one row per estimator group: (group_id, sum_sq,
    estimate_f2, exact_f2, err_permille)."""
    counts = (items.groupBy(F.col(key_col).alias("k"))
              .agg(F.count(F.lit(1)).cast("long").alias("cnt")))
    est = counts.select(
        "k", "cnt",
        F.explode(F.sequence(F.lit(0), F.lit(n_estimators - 1)))
        .alias("est"))
    h = F.conv(F.substring(
        F.md5(F.concat(F.lit("ams"), F.col("est").cast("string"),
                       F.lit(":"), F.col("k").cast("string"))),
        1, 8), 16, 10).cast("long")
    sign = F.lit(1) - F.lit(2) * (h % 2)
    x = (est.select("est", (sign * F.col("cnt")).alias("sx"))
         .groupBy("est")
         .agg(F.sum("sx").cast("long").alias("x")))
    groups = (x.groupBy(F.expr("est div %d" % group_size)
                        .cast("long").alias("group_id"))
              .agg(F.sum(F.col("x") * F.col("x")).cast("long")
                   .alias("sum_sq")))
    exact = counts.agg(F.sum(F.col("cnt") * F.col("cnt"))
                       .cast("long").alias("exact_f2"))
    out = (groups.crossJoin(F.broadcast(exact))
           .withColumn("estimate_f2",
                       F.expr("sum_sq div %d" % group_size)
                       .cast("long")))
    err = F.expr("abs(estimate_f2 - exact_f2) * 1000 div exact_f2")
    return out.select("group_id", "sum_sq", "estimate_f2", "exact_f2",
                      err.cast("long").alias("err_permille"))
