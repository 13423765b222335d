"""AMS F2 sketch, Spearman rho, Kendall tau — closed-form checks
on hand-built inputs."""

import pytest

from ferenda_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="tests-stats-correlation", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _vals(spark, rows):
    return spark.createDataFrame(
        rows, "g string, x long, y long, id long")


def test_ams_f2_exact_column(spark):
    """The exact_f2 column is sum of squared counts; estimates are
    finite longs and each group row carries its own error."""
    from ferenda_spark.operators.sketches import ams_f2
    toks = spark.createDataFrame(
        [("a",)] * 3 + [("b",)] * 2 + [("c",)],
        "token string")
    out = ams_f2(toks).collect()
    assert len(out) == 4
    for r in out:
        assert r.exact_f2 == 9 + 4 + 1
        assert r.estimate_f2 >= 0
        assert r.err_permille >= 0


def test_ams_f2_unbiased_on_unique_stream(spark):
    """A stream of n distinct singletons has F2 = n; every X_i is a
    sum of n independent +-1 signs, so X_i^2 averages to n — the
    median-of-means estimate lands within a small constant factor
    (deterministic given the md5 signs; pinned here)."""
    from ferenda_spark.operators.sketches import ams_f2
    toks = spark.createDataFrame(
        [("t%d" % i,) for i in range(256)], "token string")
    rows = ams_f2(toks).collect()
    assert all(r.exact_f2 == 256 for r in rows)
    ests = sorted(r.estimate_f2 for r in rows)
    med = (ests[1] + ests[2]) // 2
    assert 256 // 4 <= med <= 256 * 4


def test_spearman_perfect_and_reversed(spark):
    """Identical orderings give rho = +1e6; exactly reversed give
    -1e6 (tie-free closed form is exact)."""
    from ferenda_spark.operators.quality import spearman_rho
    rows = ([("up", i, 10 * i, i) for i in range(5)]
            + [("down", i, -10 * i, i + 100) for i in range(5)])
    out = {r["group"]: r for r in
           spearman_rho(_vals(spark, rows), "g", "x", "y",
                        "id").collect()}
    assert out["up"].rho_micro == 1000000
    assert out["up"].sum_d_sq == 0
    assert out["down"].rho_micro == -1000000


def test_spearman_singleton_null(spark):
    from ferenda_spark.operators.quality import spearman_rho
    out = spearman_rho(_vals(spark, [("s", 1, 1, 1)]),
                       "g", "x", "y", "id").collect()
    assert out[0].rho_micro is None


def test_kendall_counts(spark):
    """y = (1,3,2) against x = (1,2,3): pairs (1,2) and (1,3)
    concordant, (2,3) discordant -> tau = (2-1)/3 = 333333 micro."""
    from ferenda_spark.operators.quality import kendall_tau
    rows = [("g", 1, 1, 1), ("g", 2, 3, 2), ("g", 3, 2, 3)]
    out = kendall_tau(_vals(spark, rows), "g", "x", "y",
                      "id").collect()
    r = out[0]
    assert (r.n, r.n_concordant, r.n_discordant) == (3, 2, 1)
    assert r.tau_micro == 333333


def test_kendall_reversed_negative(spark):
    """Fully reversed ordering: every pair discordant, tau = -1e6
    (the sign-then-divide construction keeps engines in agreement
    below zero)."""
    from ferenda_spark.operators.quality import kendall_tau
    rows = [("g", i, -i, i) for i in range(6)]
    out = kendall_tau(_vals(spark, rows), "g", "x", "y",
                      "id").collect()
    assert out[0].tau_micro == -1000000
    assert out[0].n_concordant == 0
