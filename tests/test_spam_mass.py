"""Spam-mass semantics: an untrusted component's rank is 100%
unexplained (mass 1.0), trust-reachable nodes drop below 1, and the
|seeds| output normalization equals re-running PPR with scaled seeds."""

import pytest

from pyspark.sql import functions as F

from ferenda_spark.operators.graphs import (personalized_pagerank,
                                            spam_mass)
from ferenda_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="tests-spammass", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "doc_a long, doc_b long")


def _seeds(spark, nodes):
    return spark.createDataFrame([(n,) for n in nodes], "node long")


def test_untrusted_component_has_full_mass(spark):
    """Two disjoint directed triangles; only the first is seeded.
    Every node of the unseeded triangle: rel_spam_mass == 1.0."""
    e = _edges(spark, [(0, 1), (1, 2), (2, 0),
                       (10, 11), (11, 12), (12, 10)])
    rows = {r.node: r for r in
            spam_mass(e, _seeds(spark, [0])).collect()}
    assert set(rows) == {0, 1, 2, 10, 11, 12}
    for n in (10, 11, 12):
        assert rows[n].rel_spam_mass == pytest.approx(1.0)
        assert rows[n].trust_r == 0.0
    # the seeded triangle is trust-covered: all well below 1
    for n in (0, 1, 2):
        assert rows[n].rel_spam_mass < 1.0
    # the seed itself holds more trust than global rank -> negative
    assert rows[0].rel_spam_mass < 0


def test_seed_count_normalization_is_ppr_linearity(spark):
    """trust_r with two seeds == PPR score / 2 (linearity in seed
    mass), checked against a direct PPR run."""
    e = _edges(spark, [(0, 1), (1, 2), (2, 0), (0, 2)])
    seeds = _seeds(spark, [0, 1])
    got = {r.node: r.trust_r
           for r in spam_mass(e, seeds).collect()}
    ppr = {r.node: r.score
           for r in personalized_pagerank(
               e, seeds, iterations=3, alpha=0.5).collect()}
    for n, t in got.items():
        assert t == pytest.approx(round(ppr.get(n, 0.0) / 2, 6))


def test_ranks_positive_and_mass_bounded_above(spark):
    """PR restart mass keeps every pagerank_r > 0, so the mass is
    defined everywhere and never exceeds 1."""
    e = _edges(spark, [(i, (i + 1) % 7) for i in range(7)])
    rows = spam_mass(e, _seeds(spark, [3])).collect()
    assert len(rows) == 7
    for r in rows:
        assert r.pagerank_r > 0
        assert r.rel_spam_mass <= 1.0
