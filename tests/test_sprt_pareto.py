"""SPRT sequential test and Pareto frontier — closed-form checks."""

import datetime
import math

import pytest

from ferenda_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="tests-sprt-pareto", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _obs(spark, rows):
    base = datetime.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [(g, base + datetime.timedelta(minutes=i), i, s)
         for i, (g, s) in enumerate(rows)],
        "grp string, ts timestamp, event_id long, success boolean")


def test_sprt_accepts_h1_on_streak(spark):
    """A run of successes crosses the upper barrier: with
    C1 = floor(1e6*ln(1.5)) per success, ln(19)*1e6 needs 8
    successes."""
    from ferenda_spark.operators.events import sprt
    need = math.ceil(math.log(19) / math.log(1.5))
    rows = [("a", True)] * (need + 3)
    out = sprt(_obs(spark, rows), 0.4, 0.6).collect()
    assert len(out) == 1
    r = out[0]
    assert r.decision == "accept_h1"
    assert r.n == need                        # stops at FIRST crossing
    assert r.k == need


def test_sprt_accepts_h0_and_continue(spark):
    from ferenda_spark.operators.events import sprt
    rows = ([("lo", False)] * 12               # failure streak -> H0
            + [("mix", True), ("mix", False)] * 3)  # oscillates
    out = {r.grp: r for r in
           sprt(_obs(spark, rows), 0.4, 0.6).collect()}
    assert out["lo"].decision == "accept_h0"
    assert out["mix"].decision == "continue"
    assert out["mix"].n == 6


def test_pareto_frontier(spark):
    """Frontier of (cost, value): (1, 5) and (3, 9) survive; (2, 4)
    is dominated by (1,5); (3, 9) duplicates both survive; (4, 9)
    dominated by (3, 9) on cost."""
    from ferenda_spark.operators.training import pareto_selection
    items = spark.createDataFrame(
        [("g", 1, 1, 5), ("g", 2, 2, 4), ("g", 3, 3, 9),
         ("g", 4, 3, 9), ("g", 5, 4, 9)],
        "source string, doc_id long, cost long, value long")
    out = sorted(r.id for r in
                 pareto_selection(items).collect())
    assert out == [1, 3, 4]


def test_pareto_groups_independent(spark):
    from ferenda_spark.operators.training import pareto_selection
    items = spark.createDataFrame(
        [("a", 1, 1, 1), ("b", 2, 9, 9)],
        "source string, doc_id long, cost long, value long")
    out = sorted(r.id for r in pareto_selection(items).collect())
    assert out == [1, 2]
