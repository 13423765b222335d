"""Stopword induction and as-of KG diff — closed-form checks."""

import datetime

import pytest

from ferenda_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="tests-stopwords-asof", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_stopword_induction_flags(spark):
    """'the' (1x in every doc: df 1000, VMR 0) flags; 'burst'
    (all in one doc: rare df, bursty) does not."""
    from ferenda_spark.operators.textstats import stopword_induction
    docs = spark.createDataFrame(
        [(i, "the filler%d" % i + " burst" * (20 if i == 0 else 0))
         for i in range(20)],
        "doc_id long, text string")
    out = {r.term: r for r in
           stopword_induction(docs, min_total=10).collect()}
    assert out["the"].is_stopword
    assert out["the"].df_permille == 1000
    assert out["the"].vmr_milli == 0
    assert not out["burst"].is_stopword
    assert out["burst"].df_permille == 50


def _facts(spark, rows):
    return spark.createDataFrame(
        rows, "subject string, predicate string, object string, "
              "valid_from date, valid_to date")


def test_asof_diff_statuses(spark):
    from ferenda_spark.operators.temporal import asof_diff
    d = datetime.date
    rows = [
        ("e1", "p", "old", d(2020, 1, 1), d(2021, 1, 1)),   # removed
        ("e1", "p", "cur", d(2020, 6, 1), d(2023, 1, 1)),   # kept
        ("e2", "p", "new", d(2021, 6, 1), d(2023, 1, 1)),   # added
        ("e3", "p", "gone", d(2019, 1, 1), d(2019, 6, 1)),  # neither
    ]
    out = {(r.subject, r.object): r.status for r in
           asof_diff(_facts(spark, rows),
                     d(2020, 7, 1), d(2022, 1, 1)).collect()}
    assert out[("e1", "old")] == "removed"
    assert out[("e1", "cur")] == "kept"
    assert out[("e2", "new")] == "added"
    assert ("e3", "gone") not in out


def test_asof_diff_half_open(spark):
    """A fact ending exactly at T is NOT valid at T ([from, to))."""
    from ferenda_spark.operators.temporal import asof_diff
    d = datetime.date
    rows = [("e", "p", "x", d(2020, 1, 1), d(2021, 1, 1))]
    out = asof_diff(_facts(spark, rows),
                    d(2021, 1, 1), d(2021, 6, 1)).collect()
    assert out == []
