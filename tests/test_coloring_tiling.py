"""Graph coloring properness and TextTiling valley detection —
closed-form checks."""

import pytest

from ferenda_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="tests-coloring-tiling", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_coloring_is_proper(spark):
    """K4 plus a pendant: every edge gets two distinct colors, all
    vertices colored within 8 rounds, K4 needs 4 rounds (one vertex
    per round — it's a clique)."""
    from ferenda_spark.operators.graphs import greedy_coloring
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges.append((3, 9))
    e = spark.createDataFrame(edges, "src long, dst long")
    out = {r.node: r.color for r in
           greedy_coloring(e, rounds=8).collect()}
    assert all(c is not None for c in out.values())
    for a, b in edges:
        assert out[a] != out[b]
    assert len({out[v] for v in range(4)}) == 4   # clique = 4 colors


def test_coloring_independent_set_semantics(spark):
    """A star: the hub conflicts with every leaf, so hub and leaves
    never share a color; leaves are mutually independent and may
    share one."""
    from ferenda_spark.operators.graphs import greedy_coloring
    e = spark.createDataFrame([(0, i) for i in range(1, 6)],
                              "src long, dst long")
    out = {r.node: r.color for r in
           greedy_coloring(e, rounds=8).collect()}
    assert all(out[0] != out[i] for i in range(1, 6))
    assert len({out[i] for i in range(1, 6)}) == 1


def test_texttiling_finds_topic_shift(spark):
    """40 tokens of topic A then 40 of topic B (window 20): gap 0
    is A~A (sim 1000), gap 1 is the A|B cut (sim 0, full-depth
    valley), gap 2 is B~B."""
    from ferenda_spark.operators.textstats import texttiling
    text = ("apple " * 40) + ("rocket " * 40)
    docs = spark.createDataFrame([(1, text)],
                                 "doc_id long, text string")
    out = {r.gap_idx: r for r in texttiling(docs).collect()}
    assert out[0].sim_milli == 1000
    assert out[1].sim_milli == 0
    assert out[1].is_boundary and out[1].depth == 2000
    assert not out[0].is_boundary
    assert not out[2].is_boundary


def test_texttiling_uniform_doc_no_boundary(spark):
    from ferenda_spark.operators.textstats import texttiling
    docs = spark.createDataFrame([(1, "word " * 100)],
                                 "doc_id long, text string")
    out = texttiling(docs).collect()
    assert all(not r.is_boundary for r in out)
