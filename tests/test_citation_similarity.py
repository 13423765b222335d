"""Co-citation / bibliographic coupling edge cases the closed-form
driver oracles don't exercise: hub cuts, min_common filtering, Salton
normalization against TRUE (uncut) degrees, duplicate-edge collapse."""

import pytest

from pyspark.sql import functions as F

from ferenda_spark.operators.graphs import biblio_coupling, cocitation
from ferenda_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="tests-citesim", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _e(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_cocitation_basic_and_salton(spark):
    """d1 and d2 both cite {a, b}; a is additionally cited by d3.
    Pair (a, b): n_common=2, in-degrees cited(a)=3, cited(b)=2 ->
    salton = 2/sqrt(6)."""
    e = _e(spark, [("d1", "a"), ("d1", "b"),
                   ("d2", "a"), ("d2", "b"),
                   ("d3", "a"), ("d3", "c")])
    rows = cocitation(e, min_common=2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.node_a, r.node_b, r.n_common) == ("a", "b", 2)
    assert r.salton == pytest.approx(2 / 6 ** 0.5, abs=1e-6)


def test_cocitation_min_common_drops_single_wedges(spark):
    e = _e(spark, [("d1", "a"), ("d1", "b"),
                   ("d2", "b"), ("d2", "c")])
    assert cocitation(e, min_common=2).count() == 0
    got = {(r.node_a, r.node_b)
           for r in cocitation(e, min_common=1).collect()}
    assert got == {("a", "b"), ("b", "c")}


def test_cocitation_hub_cut_excludes_wide_citers(spark):
    """A citing doc with out-degree > max_fanout generates no wedges,
    but its edges still count in the in-degree normalizer."""
    hub = [("hub", "t%d" % i) for i in range(5)]
    e = _e(spark, hub + [("d1", "t0"), ("d1", "t1"),
                         ("d2", "t0"), ("d2", "t1")])
    rows = cocitation(e, max_fanout=4, min_common=2).collect()
    assert len(rows) == 1
    r = rows[0]
    # n_common counts only d1/d2 wedges; cited(t0)=cited(t1)=3 (hub
    # edges still in the normalizer)
    assert (r.node_a, r.node_b, r.n_common) == ("t0", "t1", 2)
    assert r.salton == pytest.approx(2 / 3, abs=1e-6)


def test_cocitation_duplicate_edges_and_self_loops_collapse(spark):
    e = _e(spark, [("d1", "a"), ("d1", "a"), ("d1", "b"),
                   ("d2", "a"), ("d2", "b"), ("a", "a")])
    rows = cocitation(e, min_common=2).collect()
    assert len(rows) == 1
    assert rows[0].n_common == 2


def test_coupling_basic_and_salton(spark):
    """d1 and d2 share references {x, y}; d1 also cites z.
    refs(d1)=3, refs(d2)=2 -> salton = 2/sqrt(6)."""
    e = _e(spark, [("d1", "x"), ("d1", "y"), ("d1", "z"),
                   ("d2", "x"), ("d2", "y")])
    rows = biblio_coupling(e, min_common=2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.node_a, r.node_b, r.n_common) == ("d1", "d2", 2)
    assert r.salton == pytest.approx(2 / 6 ** 0.5, abs=1e-6)


def test_coupling_hub_cut_drops_ubiquitous_reference(spark):
    """A reference cited by everyone (in-degree > max_fanout) is cut
    from wedge generation — pairs must share a DISCRIMINATIVE ref."""
    ubiq = [("d%d" % i, "spec") for i in range(6)]
    e = _e(spark, ubiq + [("d0", "x"), ("d1", "x")])
    rows = biblio_coupling(e, max_fanout=4, min_common=1).collect()
    assert {(r.node_a, r.node_b, r.n_common) for r in rows} == {
        ("d0", "d1", 1)}
    # out-degrees stay TRUE: refs(d0)=refs(d1)=2
    assert rows[0].salton == pytest.approx(0.5, abs=1e-6)


def test_coupling_vs_cocitation_duality(spark):
    """coupling(E) == cocitation(E reversed) up to column naming."""
    pairs = [("d1", "x"), ("d1", "y"), ("d2", "x"), ("d2", "y"),
             ("d3", "y"), ("d3", "z"), ("d4", "x"), ("d4", "z")]
    e = _e(spark, pairs)
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    a = {(r.node_a, r.node_b, r.n_common, r.salton)
         for r in biblio_coupling(e, min_common=1).collect()}
    b = {(r.node_a, r.node_b, r.n_common, r.salton)
         for r in cocitation(rev, min_common=1).collect()}
    assert a == b
