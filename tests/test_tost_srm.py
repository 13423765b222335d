"""TOST equivalence and sample-ratio-mismatch guardrail —
closed-form checks."""

import pytest

from ferenda_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="tests-tost-srm", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _subjects(spark, na, xa, nb, xb):
    rows = ([("A", True)] * xa + [("A", False)] * (na - xa)
            + [("B", True)] * xb + [("B", False)] * (nb - xb))
    return spark.createDataFrame(rows,
                                 "cohort string, converted boolean")


def test_tost_equivalent_when_rates_match(spark):
    """50% vs 51% on n=1000 each is inside a 10% margin with room:
    both one-sided z's clear 1.645."""
    from ferenda_spark.operators.quality import tost_equivalence
    r = tost_equivalence(
        _subjects(spark, 1000, 500, 1000, 510)).collect()[0]
    assert r.equivalent
    assert r.z_lower > 1.644854 and r.z_upper < -1.644854


def test_tost_not_equivalent_when_far_apart(spark):
    """70% vs 30%: difference 0.4 >> margin; upper test fails."""
    from ferenda_spark.operators.quality import tost_equivalence
    r = tost_equivalence(
        _subjects(spark, 200, 140, 200, 60)).collect()[0]
    assert r.equivalent is False
    assert r.z_upper > 0              # diff - margin still positive


def test_srm_detects_bias(spark):
    from ferenda_spark.operators.quality import srm_check
    ok = spark.createDataFrame(
        [("A",)] * 500 + [("B",)] * 505, "cohort string")
    bad = spark.createDataFrame(
        [("A",)] * 600 + [("B",)] * 400, "cohort string")
    r_ok = srm_check(ok).collect()[0]
    r_bad = srm_check(bad).collect()[0]
    assert not r_ok.srm
    assert r_bad.srm
    assert r_bad.chi2 == pytest.approx(40.0, abs=1e-6)
