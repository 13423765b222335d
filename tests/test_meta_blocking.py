"""Meta-blocking edge cases the closed-form oracle doesn't exercise:
block purging bounds, CBS weights, and the weighted-node-pruning rule
actually DROPPING a weak edge between two strong nodes."""

import pytest

from ferenda_spark.operators.dedup import meta_blocking_pairs
from ferenda_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="tests-metablocking", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_cbs_counts_shared_blocks(spark):
    """Identical docs share every 2-gram block; a doc sharing only a
    prefix shares fewer."""
    d = _docs(spark, ["a b c", "a b c", "a b x"])
    got = {(r.doc_a, r.doc_b): r.cbs
           for r in meta_blocking_pairs(d, max_block=20).collect()}
    # (0,1) share {a b, b c}; (0,2)/(1,2) share {a b}; all kept (the
    # weak node 2's mean is 1, so WNP retains its best edges)
    assert got == {(0, 1): 2, (0, 2): 1, (1, 2): 1}


def test_wnp_drops_weak_edge_between_strong_nodes(spark):
    """X-Y and Z-W are strong (3 shared blocks); X-Z share one block
    only.  Means: X=Z=2, so cbs=1 < both thresholds -> dropped."""
    d = _docs(spark, ["a b c d i j",    # X
                      "a b c d",        # Y
                      "e f g h i j",    # Z
                      "e f g h"])       # W
    got = {(r.doc_a, r.doc_b): r.cbs
           for r in meta_blocking_pairs(d, max_block=20).collect()}
    assert got == {(0, 1): 3, (2, 3): 3}


def test_block_purging_caps_hot_keys(spark):
    """With max_block=2, a 2-gram occurring in 3 docs is purged, so
    no pairs survive; at max_block=3 the pairs reappear."""
    d = _docs(spark, ["p q", "p q", "p q"])
    assert meta_blocking_pairs(d, max_block=2).count() == 0
    assert meta_blocking_pairs(d, max_block=3).count() == 3


def test_singleton_blocks_yield_no_pairs(spark):
    d = _docs(spark, ["u v w", "x y z"])
    assert meta_blocking_pairs(d, max_block=20).count() == 0
