"""Search field collapsing and two-proportion z-test — closed-form
checks."""

import math

import pytest

from ferenda_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="tests-collapse-ztest", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_collapse_keeps_best_per_site(spark):
    from ferenda_spark.operators.search import collapse_results
    results = spark.createDataFrame(
        [("q", "d1", 9.0), ("q", "d2", 8.0), ("q", "d3", 7.0),
         ("q", "d4", 6.0)],
        "query string, item string, score double")
    sites = spark.createDataFrame(
        [("d1", "sA"), ("d2", "sA"), ("d3", "sB"), ("d4", "sB")],
        "item string, site string")
    out = sorted(collapse_results(results, sites).collect(),
                 key=lambda r: r.rank)
    assert [(r.item, r.site, r.rank) for r in out] == \
        [("d1", "sA", 1), ("d3", "sB", 2)]
    assert all(r.n_site_results == 2 for r in out)


def test_collapse_k2_and_tiebreak(spark):
    from ferenda_spark.operators.search import collapse_results
    results = spark.createDataFrame(
        [("q", "b", 5.0), ("q", "a", 5.0), ("q", "c", 5.0)],
        "query string, item string, score double")
    sites = spark.createDataFrame(
        [("a", "s"), ("b", "s"), ("c", "s")],
        "item string, site string")
    out = sorted(collapse_results(results, sites, k=2).collect(),
                 key=lambda r: r.rank)
    assert [r.item for r in out] == ["a", "b"]   # item tiebreak


def test_ztest_known_value(spark):
    """n_a=n_b=100, x_a=60, x_b=40: pooled p=0.5, z = 0.2 /
    sqrt(0.25 * 0.02) = 2.828427."""
    from ferenda_spark.operators.quality import two_proportion_ztest
    rows = ([("A", True)] * 60 + [("A", False)] * 40
            + [("B", True)] * 40 + [("B", False)] * 60)
    subj = spark.createDataFrame(rows, "cohort string, converted boolean")
    r = two_proportion_ztest(subj).collect()[0]
    assert (r.cohort_a, r.cohort_b) == ("A", "B")
    assert (r.n_a, r.n_b, r.x_a, r.x_b) == (100, 100, 60, 40)
    assert math.isclose(r.z, 0.2 / math.sqrt(0.5 * 0.5 * 0.02),
                        rel_tol=1e-6)


def test_ztest_degenerate_null(spark):
    """Everyone converts: pooled p = 1, variance 0, z NULL."""
    from ferenda_spark.operators.quality import two_proportion_ztest
    subj = spark.createDataFrame(
        [("A", True), ("A", True), ("B", True)],
        "cohort string, converted boolean")
    assert two_proportion_ztest(subj).collect()[0].z is None
