"""Sums truth finding and Hilbert-curve layout keys — closed-form
checks."""

import pytest

from ferenda_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="tests-truthfinder-hilbert", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_truthfinder_majority_wins(spark):
    """3 sources say 'x', 1 says 'y' for e1: x wins with higher
    belief; source s4 (the liar) also asserts e2 alone, whose claim
    still surfaces as winner (it's unopposed)."""
    from ferenda_spark.operators.fusion import truthfinder_sums
    claims = spark.createDataFrame(
        [("e1", "p", "x", "s1"), ("e1", "p", "x", "s2"),
         ("e1", "p", "x", "s3"), ("e1", "p", "y", "s4"),
         ("e2", "p", "z", "s4")],
        "subject string, predicate string, object string, "
        "source string")
    out = {(r.subject, r.object): r for r in
           truthfinder_sums(claims, rounds=2).collect()}
    assert out[("e1", "x")].is_winner
    assert not out[("e1", "y")].is_winner
    assert out[("e1", "x")].belief_micro > out[("e1", "y")].belief_micro
    assert out[("e2", "z")].is_winner
    assert out[("e1", "x")].n_sources == 3


def test_truthfinder_trust_feedback(spark):
    """The iterative step: s_maj agrees with the majority on claim A,
    so its trust exceeds the contrarian's and breaks the 1-vs-1 tie
    on claim B in favor of the majority-aligned source."""
    from ferenda_spark.operators.fusion import truthfinder_sums
    claims = spark.createDataFrame(
        [("a", "p", "v", "s_maj"), ("a", "p", "v", "s2"),
         ("a", "p", "w", "s_bad"),
         ("b", "p", "good", "s_maj"), ("b", "p", "bad", "s_bad")],
        "subject string, predicate string, object string, "
        "source string")
    out = {(r.subject, r.object): r for r in
           truthfinder_sums(claims, rounds=2).collect()}
    assert out[("b", "good")].belief_micro \
        > out[("b", "bad")].belief_micro
    assert out[("b", "good")].is_winner


def test_hilbert_bijective_and_adjacent(spark):
    """The defining Hilbert properties on the full 16x16 grid:
    hvalue is a bijection onto 0..255 and consecutive curve cells
    are grid neighbors (Manhattan distance exactly 1) — which no
    Z-order curve satisfies."""
    from ferenda_spark.operators.store import hilbert_keys
    n = 16
    grid = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)],
        "x long, y long")
    rows = hilbert_keys(grid, "x", "y", bits=4,
                        bucket_bits=2).collect()
    assert sorted(r.hvalue for r in rows) == list(range(n * n))
    pos = {r.hvalue: (r.x, r.y) for r in rows}
    for i in range(n * n - 1):
        (x1, y1), (x2, y2) = pos[i], pos[i + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1
    assert all(r.hbucket == r.hvalue >> 6 for r in rows)


def test_hilbert_locality_beats_zorder(spark):
    """The reason the layout exists: average Manhattan jump between
    consecutive curve positions is exactly 1.0 for Hilbert; Z-order
    pays > 1 on its long diagonal jumps."""
    from ferenda_spark.operators.store import hilbert_keys, zorder_keys
    n = 16
    grid = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)],
        "x long, y long")
    hp = {r.hvalue: (r.x, r.y) for r in
          hilbert_keys(grid, "x", "y", bits=4).collect()}
    zp = {r.zvalue: (r.x, r.y) for r in
          zorder_keys(grid, "x", "y", bits=4).collect()}

    def avg_jump(pos):
        return sum(abs(pos[i][0] - pos[i + 1][0])
                   + abs(pos[i][1] - pos[i + 1][1])
                   for i in range(len(pos) - 1)) / (len(pos) - 1)

    assert avg_jump(hp) == 1.0
    assert avg_jump(zp) > 1.0
