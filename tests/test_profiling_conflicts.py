"""Inclusion-dependency discovery (SINDY shape), temporal
functional-predicate conflicts, and community conductance —
closed-form checks on hand-built inputs (the driver oracles exercise
the planted synthetic corpus; these pin semantics on tables small
enough to verify by hand)."""

import datetime

import pytest

from ferenda_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="tests-profiling-conflicts", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


# --------------------------------------------------- inclusion deps

def test_inclusion_deps_matrix(spark):
    """x = {1,2}, y = {1,2,3}, z = {3,9}: x ⊆ y holds, y ⊄ x
    (2 of 3 shared), z shares one value with y, none with x."""
    from ferenda_spark.operators.extract import inclusion_deps
    rows = spark.createDataFrame(
        [(1, 1, 3), (2, 2, 9), (1, 3, 3)],
        "x long, y long, z long")
    out = {(r.lhs, r.rhs): r for r in
           inclusion_deps(rows, ["x", "y", "z"]).collect()}
    assert len(out) == 6
    assert out[("x", "y")].holds
    assert out[("x", "y")].n_shared_values == 2
    assert not out[("y", "x")].holds
    assert out[("y", "x")].n_lhs_values == 3
    assert out[("y", "x")].n_shared_values == 2
    assert out[("z", "y")].n_shared_values == 1
    assert not out[("z", "y")].holds
    assert out[("z", "x")].n_shared_values == 0
    assert out[("x", "z")].n_shared_values == 0


def test_inclusion_deps_ignores_nulls(spark):
    """NULLs don't count as values: x = {1} ⊆ y = {1} even though
    x has a NULL row (standard IND semantics)."""
    from ferenda_spark.operators.extract import inclusion_deps
    rows = spark.createDataFrame(
        [(1, 1), (None, 1)], "x long, y long")
    out = {(r.lhs, r.rhs): r for r in
           inclusion_deps(rows, ["x", "y"]).collect()}
    assert out[("x", "y")].holds
    assert out[("x", "y")].n_lhs_values == 1


# ----------------------------------------------- interval conflicts

def _facts(spark, rows):
    return spark.createDataFrame(
        rows, "subject string, predicate string, object string, "
              "valid_from date, valid_to date")


def test_interval_conflicts_basic(spark):
    """Overlapping different objects conflict once; disjoint or
    same-object intervals don't."""
    from ferenda_spark.operators.temporal import interval_conflicts
    d = datetime.date
    rows = [
        ("e1", "employer", "acme", d(2020, 1, 1), d(2020, 6, 1)),
        ("e1", "employer", "biz", d(2020, 4, 1), d(2020, 9, 1)),
        ("e1", "employer", "corp", d(2021, 1, 1), d(2021, 2, 1)),
        ("e2", "employer", "acme", d(2020, 1, 1), d(2020, 6, 1)),
        ("e2", "employer", "acme", d(2020, 2, 1), d(2020, 7, 1)),
    ]
    out = interval_conflicts(_facts(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.subject, r.obj_a, r.obj_b) == ("e1", "acme", "biz")
    assert r.overlap_from == d(2020, 4, 1)
    assert r.overlap_to == d(2020, 6, 1)


def test_interval_conflicts_half_open(spark):
    """[Jan, Apr) then [Apr, Jul): touching endpoints do NOT
    overlap under half-open semantics."""
    from ferenda_spark.operators.temporal import interval_conflicts
    d = datetime.date
    rows = [
        ("e1", "p", "a", d(2020, 1, 1), d(2020, 4, 1)),
        ("e1", "p", "b", d(2020, 4, 1), d(2020, 7, 1)),
    ]
    assert interval_conflicts(_facts(spark, rows)).count() == 0


# ----------------------------------------------------- conductance

def test_conductance_two_cliques_one_bridge(spark):
    """Two triangles joined by one edge: each community has
    vol = 2*3 + 1 = 7, cut = 1, 2m = 14 -> phi = 1000//7 = 142."""
    from ferenda_spark.operators.graphs import conductance
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"),
         ("x", "y"), ("y", "z"), ("x", "z"),
         ("c", "x")], "doc_a string, doc_b string")
    comms = spark.createDataFrame(
        [("a", 1), ("b", 1), ("c", 1),
         ("x", 2), ("y", 2), ("z", 2)], "node string, label long")
    out = {r.community: r for r in
           conductance(edges, comms).collect()}
    for c in (1, 2):
        assert out[c].n_nodes == 3
        assert out[c].volume == 7
        assert out[c].cut_edges == 1
        assert out[c].conductance_permille == 1000 // 7


def test_conductance_isolated_community_reported_null(spark):
    """A community whose members have NO incident edges must still
    appear in the output, with volume 0 and NULL conductance — not be
    silently dropped (the r4 advice finding: degree comes from the
    edge table, so an inner join lost edge-less communities)."""
    from ferenda_spark.operators.graphs import conductance
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("a", "d")],
        "doc_a string, doc_b string")
    comms = spark.createDataFrame(
        [("a", 1), ("b", 1), ("c", 1), ("d", 1),
         ("lonely1", 2), ("lonely2", 2)],
        "node string, label long")
    out = {r.community: r for r in
           conductance(edges, comms).collect()}
    assert 2 in out, "edge-less community dropped from output"
    assert out[2].n_nodes == 2
    assert out[2].volume == 0
    assert out[2].cut_edges == 0
    assert out[2].conductance_permille is None


def test_conductance_whole_graph_null(spark):
    """A single community covering the whole graph has cut = 0 and
    min(vol, 2m - vol) = 0 -> NULL conductance, not a crash."""
    from ferenda_spark.operators.graphs import conductance
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "doc_a string, doc_b string")
    comms = spark.createDataFrame(
        [("a", 1), ("b", 1), ("c", 1)], "node string, label long")
    out = conductance(edges, comms).collect()
    assert len(out) == 1
    assert out[0].cut_edges == 0
    assert out[0].conductance_permille is None
