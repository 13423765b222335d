"""Compaction-plan binning, Dunning LLR collocations, and sampled
harmonic centrality — hand-computed checks for bin boundaries, the
xlx identity, and per-seed shortest distances."""

import math

import pytest

from pyspark.sql import functions as F

from ferenda_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="tests-compaction", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_compaction_plan_bins_and_keeps(spark):
    """Files 100+400+300 fill bin 0 (cum 0/100/500 < 1000), the next
    small file starts bin 1; a 5000-byte file is kept with bin -1 and
    does not advance the small cumulative sum."""
    from ferenda_spark.operators.store import compaction_plan
    files = spark.createDataFrame(
        [("a", 1, 100), ("a", 2, 400), ("a", 3, 5000), ("a", 4, 300),
         ("a", 5, 600), ("a", 6, 200), ("b", 1, 50)],
        "source string, file_id long, size_bytes long")
    out = {(r.source, r.file_id): r
           for r in compaction_plan(files, key_cols=["source"],
                                    target_bytes=1000,
                                    small_threshold=1000).collect()}
    assert out[("a", 1)].action == "rewrite" and out[("a", 1)].bin == 0
    assert out[("a", 2)].bin == 0          # preceding small = 100
    assert out[("a", 3)].action == "keep" and out[("a", 3)].bin == -1
    assert out[("a", 4)].bin == 0          # preceding small = 500
    assert out[("a", 5)].bin == 0          # preceding small = 800
    assert out[("a", 6)].bin == 1          # preceding small = 1400
    assert out[("b", 1)].bin == 0          # partitions independent


def test_llr_matches_hand_computation(spark):
    """One repeated bigram in a tiny corpus: the 9-term xlx identity
    computed by hand must match, and margins must be exact."""
    from ferenda_spark.operators.textstats import llr_collocations
    # corpus bigrams: (new york) x3, (york city) x3, (city new) x2
    docs = spark.createDataFrame(
        [("new york city new york city new york city",)], "text string")
    out = {(r.w1, r.w2): r
           for r in llr_collocations(docs, min_count=3, top_n=10)
           .collect()}
    assert set(out) == {("new", "york"), ("york", "city")}
    r = out[("new", "york")]
    assert r.n_xy == 3 and r.n_left == 3 and r.n_right == 3

    def xlx(x):
        return x * math.log(x) if x > 0 else 0.0
    n, nl, nr, nt = 3, 3, 3, 8
    expected = 2.0 * (xlx(n) + xlx(nl - n) + xlx(nr - n)
                      + xlx(nt - nl - nr + n)
                      - xlx(nl) - xlx(nt - nl) - xlx(nr)
                      - xlx(nt - nr) + xlx(nt))
    assert r.llr == pytest.approx(expected, abs=1e-5)


def test_harmonic_centrality_vs_brute_force(spark):
    """Path graph 0->1->2->3 plus shortcut 0->2, seeds {0, 1}: per
    (seed, node) shortest distances computed by hand."""
    from ferenda_spark.operators.graphs import harmonic_centrality
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (0, 2)], "doc_a long, doc_b long")
    seeds = spark.createDataFrame([(0,), (1,)], "node long")
    out = {r.node: r for r in
           harmonic_centrality(edges, seeds, max_hops=3).collect()}
    # node 1: d(0,1)=1                      -> 1.0
    # node 2: d(0,2)=1 (shortcut), d(1,2)=1 -> 2.0
    # node 3: d(0,3)=2, d(1,3)=2            -> 1.0
    assert out[1].n_seeds_reaching == 1
    assert out[1].harmonic == pytest.approx(1.0)
    assert out[2].n_seeds_reaching == 2
    assert out[2].harmonic == pytest.approx(2.0)
    assert out[3].n_seeds_reaching == 2
    assert out[3].harmonic == pytest.approx(1.0)
    # seeds never count themselves: node 0 unreached
    assert 0 not in out
