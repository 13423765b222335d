"""SimRank: textbook first-iteration values, recursion depth effects,
hub cut, and threshold pruning."""

import pytest

from ferenda_spark.operators.graphs import simrank
from ferenda_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="tests-simrank", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _e(spark, pairs):
    return spark.createDataFrame(pairs, "doc_a long, doc_b long")


def test_first_iteration_cocited_pair(spark):
    """a and b both cited by {u, v}: s1(a,b) = C/4 * (s0(u,u) +
    s0(v,v)) = C/2 = 0.25."""
    e = _e(spark, [(10, 1), (10, 2), (11, 1), (11, 2)])
    got = {(r.node_a, r.node_b): r.sim
           for r in simrank(e, iterations=1).collect()}
    assert got == {(1, 2): 0.25}


def test_second_iteration_reaches_structural_pairs(spark):
    """c and d are cited by a and b respectively; a,b share citers,
    so s(c,d) becomes positive only at iteration 2 — the recursion
    co-citation cannot express."""
    e = _e(spark, [(10, 1), (10, 2), (11, 1), (11, 2),
                   (1, 3), (2, 4)])
    one = {(r.node_a, r.node_b): r.sim
           for r in simrank(e, iterations=1).collect()}
    assert (3, 4) not in one
    two = {(r.node_a, r.node_b): r.sim
           for r in simrank(e, iterations=2).collect()}
    # s2(3,4) = C/(1*1) * s1(1,2) = 0.5 * 0.25
    assert two[(3, 4)] == pytest.approx(0.125)
    # scores stay in (0, 1]
    assert all(0 < v <= 1 for v in two.values())


def test_hub_cut_blocks_pair_generation(spark):
    """With max_indegree=1 the co-cited pair (indegree 2 each) never
    forms."""
    e = _e(spark, [(10, 1), (10, 2), (11, 1), (11, 2)])
    assert simrank(e, iterations=1, max_indegree=1).count() == 0


def test_min_sim_prunes_weak_pairs(spark):
    e = _e(spark, [(10, 1), (10, 2), (11, 1), (11, 2),
                   (1, 3), (2, 4)])
    got = {(r.node_a, r.node_b): r.sim
           for r in simrank(e, iterations=2, min_sim=0.2).collect()}
    assert got == {(1, 2): 0.25}
