"""Log-linear histogram sketch: exactness below the sub-bucket width,
bucket-bound invariants, mergeability, and the quantile error bound —
the properties the single closed-form driver oracle doesn't sweep."""

import pytest

from pyspark.sql import functions as F

from ferenda_spark.operators.sketches import (histogram_quantiles,
                                              log_histogram)
from ferenda_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="tests-loghist", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _vals(spark, vals):
    return spark.createDataFrame([(int(v),) for v in vals], "v long")


def test_small_values_are_exact(spark):
    """Values with bit-length <= sub_bits get singleton buckets."""
    rows = log_histogram(_vals(spark, [0, 1, 2, 3, 7, 7]), "v",
                         sub_bits=3).collect()
    got = {(r.lo, r.hi): r.n for r in rows}
    assert got == {(0, 0): 1, (1, 1): 1, (2, 2): 1, (3, 3): 1,
                   (7, 7): 2}


def test_bucket_bounds_contain_value_and_width_bound(spark):
    """Every value lands in [lo, hi] and bucket relative width is
    <= 2^-(sub_bits-1) for values above the exact range."""
    import random
    rng = random.Random(7)
    vals = [rng.randrange(1, 10 ** 12) for _ in range(500)]
    hist = log_histogram(_vals(spark, vals), "v", sub_bits=5).collect()
    assert sum(r.n for r in hist) == 500
    for r in hist:
        assert r.lo <= r.hi
        if r.bl > 5:
            assert (r.hi - r.lo + 1) / r.lo <= 2 ** -4
    # bucket membership: recompute each value's bucket and find it
    buckets = {(r.bl, r.lo, r.hi) for r in hist}
    for v in vals:
        bl = v.bit_length()
        s = max(bl - 5, 0)
        lo = (v >> s) << s
        assert (bl, lo, lo + (1 << s) - 1) in buckets


def test_merge_equals_union(spark):
    """sketch(A) ++ sketch(B) groupBy-summed == sketch(A ∪ B)."""
    a, b = [3, 99, 1047, 65536], [99, 12, 1 << 40]
    ha = log_histogram(_vals(spark, a), "v")
    hb = log_histogram(_vals(spark, b), "v")
    merged = (ha.unionByName(hb).groupBy("bl", "lo", "hi")
              .agg(F.sum("n").alias("n")))
    direct = log_histogram(_vals(spark, a + b), "v")
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, direct.collect()))


def test_quantile_rank_semantics_and_error(spark):
    """On 1..1000 the p50 estimate is the lower bound of rank-500's
    bucket: within one bucket width of the exact percentile."""
    vals = list(range(1, 1001))
    hist = log_histogram(_vals(spark, vals), "v", sub_bits=5)
    got = {r.q: (r.target_rank, r.est)
           for r in histogram_quantiles(hist, [0.5, 0.99]).collect()}
    rank50, est50 = got[0.5]
    assert rank50 == 500
    # exact value 500, bucket width at bl=9 is 2^4
    assert est50 <= 500 <= est50 + 16
    rank99, est99 = got[0.99]
    assert rank99 == 990
    assert est99 <= 990 <= est99 + 32
