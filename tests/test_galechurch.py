"""Gale-Church alignment — the non-diagonal beads the planted driver
corpus (provably 1-1) can't exercise: merges, 2-2 swaps, deletions,
and the Spark grouping surface."""

import pytest

from ferenda_spark.operators.linking import _gc_align
from ferenda_spark.session import get_spark


def test_two_to_one_merge():
    """Two 30-char sentences against one 60-char sentence merge:
    the 2-1 bead at delta 0 (2.42) beats two distorted 1-1s."""
    assert _gc_align([30, 30, 60], [60, 60]) == [
        (0, 2, 0, 1), (2, 1, 1, 1)]


def test_two_two_swap():
    """Crossed lengths [30,60] vs [60,30]: one 2-2 bead (prior cost
    4.51, delta 0) beats two mismatched 1-1s (2 x 2.57)."""
    assert _gc_align([30, 60], [60, 30]) == [(0, 2, 0, 2)]


def test_empty_sides_are_insertions():
    assert _gc_align([40], []) == [(0, 1, 0, 0)]
    assert _gc_align([], [25, 25]) == [(0, 0, 0, 1), (0, 0, 1, 1)]


def test_identical_lengths_stay_diagonal():
    assert _gc_align([20, 25, 30], [20, 25, 30]) == [
        (0, 1, 0, 1), (1, 1, 1, 1), (2, 1, 2, 1)]


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="tests-galechurch", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_spark_grouping_and_bead_labels(spark):
    from ferenda_spark.operators.linking import galechurch_align
    rows = [(1, "a", 0, 30), (1, "a", 1, 30), (1, "b", 0, 60),
            (2, "a", 0, 20), (2, "b", 0, 20), (2, "b", 1, 20)]
    df = spark.createDataFrame(
        rows, "pair_id long, side string, sent_id long, n_chars long")
    out = galechurch_align(df).orderBy("pair_id", "bead_id").collect()
    by_pair = {}
    for r in out:
        by_pair.setdefault(r.pair_id, []).append(
            (r.a_start, r.n_a, r.b_start, r.n_b, r.bead))
    assert by_pair[1] == [(0, 2, 0, 1, "2-1")]
    assert by_pair[2] == [(0, 1, 0, 2, "1-2")]
