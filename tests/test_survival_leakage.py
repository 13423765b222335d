"""Kaplan-Meier survival, time-to-event subjects, train/eval near-dup
leakage, and contiguous sequence mining — closed-form / hand-computed
checks for the paths the driver oracles replay only at corpus scale
(textbook KM arithmetic, censoring edges, planted cross-split
duplicates, full-death zero propagation)."""

import pytest

from pyspark.sql import functions as F

from ferenda_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="tests-survival", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


# ------------------------------------------------------- Kaplan-Meier

def test_km_textbook_example(spark):
    """The classic 10-subject example: deaths at t=1,2,2,5, censored
    at 3,4 and four censored at 6 — hand-computed product limit."""
    from ferenda_spark.operators.events import kaplan_meier
    subj = spark.createDataFrame(
        [(1, False), (2, False), (2, False), (3, True), (4, True),
         (5, False), (6, True), (6, True), (6, True), (6, True)],
        "t long, censored boolean")
    rows = {r.t: r for r in kaplan_meier(subj).collect()}
    assert set(rows) == {1, 2, 5}
    # t=1: n=10, d=1 -> S = 0.9
    assert rows[1].n_risk == 10 and rows[1].n_deaths == 1
    assert rows[1].survival == pytest.approx(0.9, abs=1e-6)
    # t=2: n=9, d=2 -> S = 0.9 * 7/9 = 0.7
    assert rows[2].n_risk == 9 and rows[2].n_deaths == 2
    assert rows[2].survival == pytest.approx(0.7, abs=1e-6)
    # t=5: after censoring at 3,4 n=5, d=1 -> S = 0.7 * 4/5 = 0.56
    assert rows[5].n_risk == 5 and rows[5].n_deaths == 1
    assert rows[5].survival == pytest.approx(0.56, abs=1e-6)


def test_km_full_death_step_is_exact_zero(spark):
    """When the entire at-risk set dies the curve hits exactly 0 (the
    flag-propagated branch, never ln(0))."""
    from ferenda_spark.operators.events import kaplan_meier
    subj = spark.createDataFrame(
        [(1, False), (2, False), (2, False)], "t long, censored boolean")
    rows = {r.t: r for r in kaplan_meier(subj).collect()}
    assert rows[2].n_risk == 2 and rows[2].n_deaths == 2
    assert rows[2].survival == 0.0


def test_time_to_event_censoring(spark):
    """A user converting inside the window is a death at the truncated
    hour; converting after the window or never is censored AT the
    window bound."""
    from ferenda_spark.operators.events import time_to_event
    rows = [
        # u1: first event at 00:00, purchase 5.4h later -> death t=5
        (1, "2024-01-01 00:00:00", "view"),
        (1, "2024-01-01 05:24:00", "purchase"),
        # u2: purchase 80h later -> censored at 72
        (2, "2024-01-01 00:00:00", "view"),
        (2, "2024-01-04 08:00:00", "purchase"),
        # u3: never purchases -> censored at 72
        (3, "2024-01-01 00:00:00", "click"),
        (3, "2024-01-02 00:00:00", "view"),
    ]
    ev = (spark.createDataFrame(rows, "user_id long, ts_s string, "
                                "event_type string")
          .select("user_id", F.col("ts_s").cast("timestamp").alias("ts"),
                  "event_type"))
    out = {r.user_id: r for r in
           time_to_event(ev, followup_hours=72).collect()}
    assert out[1].t == 5 and out[1].censored is False
    assert out[2].t == 72 and out[2].censored is True
    assert out[3].t == 72 and out[3].censored is True


# ----------------------------------------------------- split leakage

def test_split_leakage_planted_cross_split_duplicate(spark):
    """Plant an exact duplicate between a train doc (id 0, md5 bucket
    < 8000) and a test doc (id 1, bucket >= 9000): the test doc must
    be reported leaked with n_train_dups = 1; an intra-train
    duplicate (ids 5, 6) must NOT be reported."""
    from ferenda_spark.operators.training import split_leakage
    dup = ("the quick brown fox jumps over the lazy dog again and "
           "again until the corpus repeats itself verbatim") * 3
    other = ("completely different content about maritime law and "
             "harbor dues assessed on cargo tonnage in ports") * 3
    docs = spark.createDataFrame(
        [(0, dup), (1, dup), (5, other), (6, other),
         (9, "unique text about volcanic rock formations and basalt "
             "columns in iceland photographed at dawn " * 3)],
        "doc_id long, text string")
    out = split_leakage(docs).collect()
    assert len(out) == 1
    r = out[0]
    assert r.doc_id == 1 and r.split == "test"
    assert r.canonical_doc_id == 0 and r.n_train_dups == 1


# --------------------------------------------------- sequence mining

def test_event_sequences_hand_counts(spark):
    """Two users with known streams: trigram counts and distinct-user
    support computed by hand; min_count filters singletons."""
    from ferenda_spark.operators.events import event_sequences
    rows = []
    # u1: a b c a b c  -> abc x2, bca, cab
    for i, t in enumerate("abcabc"):
        rows.append((1, i, "2024-01-01 00:%02d:00" % i, t))
    # u2: a b c        -> abc x1
    for i, t in enumerate("abc"):
        rows.append((2, 100 + i, "2024-01-01 01:%02d:00" % i, t))
    ev = (spark.createDataFrame(
        rows, "user_id long, event_id long, ts_s string, event_type string")
        .select("user_id", "event_id",
                F.col("ts_s").cast("timestamp").alias("ts"), "event_type"))
    out = {(r.step_1, r.step_2, r.step_3): r
           for r in event_sequences(ev, min_count=2).collect()}
    assert set(out) == {("a", "b", "c")}
    assert out[("a", "b", "c")].n_occurrences == 3
    assert out[("a", "b", "c")].n_users == 2
