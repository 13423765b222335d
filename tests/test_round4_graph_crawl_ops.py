"""Clustering coefficient, crawler-trap scoring, n-gram novelty,
sliding distinct actives — closed-form checks on hand-built inputs
(the driver oracles exercise the planted synthetic corpus; these pin
the semantics on graphs/URLs/streams small enough to verify by hand).
"""

import pytest

from pyspark.sql import functions as F

from ferenda_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="tests-round4-graph-crawl", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


# ------------------------------------------- clustering coefficient

def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "node_a string, node_b string")


def test_clustering_coeff_k4(spark):
    """K4: every node has degree 3 and sits on C(3,2) = 3 triangles,
    so C(v) = 1 exactly (1000 permille)."""
    from ferenda_spark.operators.graphs import clustering_coefficient
    nodes = ["a", "b", "c", "d"]
    pairs = [(x, y) for i, x in enumerate(nodes)
             for y in nodes[i + 1:]]
    out = {r.node: r for r in
           clustering_coefficient(_edges(spark, pairs)).collect()}
    assert set(out) == set(nodes)
    for v in nodes:
        assert out[v].degree == 3
        assert out[v].triangles == 3
        assert out[v].coeff_permille == 1000


def test_clustering_coeff_triangle_plus_pendant(spark):
    """Triangle a-b-c with pendant d on a: a has deg 3, one triangle
    -> C = 2/6 = 333 permille; b, c stay at 1000; d (deg 1) is 0."""
    from ferenda_spark.operators.graphs import clustering_coefficient
    pairs = [("a", "b"), ("b", "c"), ("a", "c"), ("a", "d")]
    out = {r.node: r for r in
           clustering_coefficient(_edges(spark, pairs)).collect()}
    assert out["a"].degree == 3 and out["a"].triangles == 1
    assert out["a"].coeff_permille == 333
    assert out["b"].coeff_permille == 1000
    assert out["c"].coeff_permille == 1000
    assert out["d"].degree == 1 and out["d"].triangles == 0
    assert out["d"].coeff_permille == 0


def test_clustering_coeff_dedupes_and_ignores_direction(spark):
    """Parallel/reversed/self edges collapse: the triangle counted
    from a multigraph equals the simple-graph answer."""
    from ferenda_spark.operators.graphs import clustering_coefficient
    pairs = [("a", "b"), ("b", "a"), ("a", "b"),
             ("b", "c"), ("c", "a"), ("a", "a")]
    out = {r.node: r for r in
           clustering_coefficient(_edges(spark, pairs)).collect()}
    assert all(out[v].triangles == 1 for v in "abc")
    assert all(out[v].degree == 2 for v in "abc")
    assert all(out[v].coeff_permille == 1000 for v in "abc")


def test_clustering_coeff_networkx_free_random_check(spark):
    """Deterministic pseudo-random graph vs a brute-force triangle
    count computed in Python (no networkx in container)."""
    from ferenda_spark.operators.graphs import clustering_coefficient
    import itertools
    nodes = ["n%02d" % i for i in range(12)]
    pairs = []
    for i, x in enumerate(nodes):
        for j in range(i + 1, len(nodes)):
            if (i * 7 + j * 13) % 3 == 0:  # deterministic sparsifier
                pairs.append((x, nodes[j]))
    adj = {v: set() for v in nodes}
    for x, y in pairs:
        adj[x].add(y)
        adj[y].add(x)
    exp_tri = {v: 0 for v in nodes}
    for v in nodes:
        for x, y in itertools.combinations(sorted(adj[v]), 2):
            if y in adj[x]:
                exp_tri[v] += 1
    out = {r.node: r for r in
           clustering_coefficient(_edges(spark, pairs)).collect()}
    for v in nodes:
        d = len(adj[v])
        if d == 0:
            assert v not in out
            continue
        assert out[v].degree == d
        assert out[v].triangles == exp_tri[v], v
        want = 2000 * exp_tri[v] // (d * (d - 1)) if d > 1 else 0
        assert out[v].coeff_permille == want


# ------------------------------------------------- trap detection

def _urls(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


def test_trap_detection_signals(spark):
    from ferenda_spark.operators.crawl import trap_detection
    out = {r.url: r for r in trap_detection(_urls(spark, [
        "https://example.org/docs/src1/42",
        "https://example.org/a/b/a/b/a/b/c/item1",
        "https://example.org/archive/2020/3/14/item2",
        "https://example.org/page?a=1&b=2&c=3&d=4&e=5",
        "https://example.org/",
    ])).collect()}
    benign = out["https://example.org/docs/src1/42"]
    assert (benign.path_depth, benign.dup_segments, benign.has_calendar,
            benign.n_params, benign.trap_score, benign.is_trap) \
        == (3, 0, 0, 0, 0, 0)
    loop = out["https://example.org/a/b/a/b/a/b/c/item1"]
    assert loop.path_depth == 8 and loop.dup_segments == 4
    assert loop.trap_score == 2 * 2 + 3 * 4 and loop.is_trap == 1
    cal = out["https://example.org/archive/2020/3/14/item2"]
    assert cal.has_calendar == 1 and cal.trap_score == 2
    assert cal.is_trap == 0
    params = out["https://example.org/page?a=1&b=2&c=3&d=4&e=5"]
    assert params.n_params == 5 and params.trap_score == 2
    root = out["https://example.org/"]
    assert root.path_depth == 0 and root.trap_score == 0


def test_trap_detection_fragment_and_no_calendar_on_big_numbers(spark):
    """#fragment is not a query; 4-digit non-year numbers (2101+)
    don't fire the calendar signal."""
    from ferenda_spark.operators.crawl import trap_detection
    out = {r.url: r for r in trap_detection(_urls(spark, [
        "https://example.org/a/b#sec?fake=1",
        "https://example.org/archive/2101/3/",
        "http://example.org/x?one=1#frag",
    ])).collect()}
    assert out["https://example.org/a/b#sec?fake=1"].n_params == 0
    assert out["https://example.org/archive/2101/3/"].has_calendar == 0
    assert out["http://example.org/x?one=1#frag"].n_params == 1


# ------------------------------------------------- n-gram novelty

def test_ngram_novelty_first_doc_fully_novel(spark):
    from ferenda_spark.operators.textstats import ngram_novelty
    docs = spark.createDataFrame([
        (1, "the quick brown fox jumps"),
        (2, "the quick brown cat sits"),   # shares 1 trigram
        (3, "the quick brown fox jumps"),  # exact dup of 1
        (4, "xy"),                          # < 3 tokens -> dropped
    ], "doc_id long, text string")
    out = {r.doc_id: r for r in ngram_novelty(docs, n=3).collect()}
    assert out[1].n_ngrams == 3 and out[1].n_novel == 3
    assert out[1].novelty_permille == 1000
    # doc 2 trigrams: "the quick brown" (seen), "quick brown cat",
    # "brown cat sits" -> 2/3 novel
    assert out[2].n_ngrams == 3 and out[2].n_novel == 2
    assert out[2].novelty_permille == 666
    assert out[3].n_novel == 0 and out[3].novelty_permille == 0
    assert 4 not in out


def test_ngram_novelty_within_doc_repeat_counts_once(spark):
    """Distinct trigram set per doc: an internally repeated trigram
    is one ngram, novel iff this doc is its global first."""
    from ferenda_spark.operators.textstats import ngram_novelty
    docs = spark.createDataFrame([
        (10, "a b c a b c a b c"),
    ], "doc_id long, text string")
    row = ngram_novelty(docs, n=3).collect()[0]
    # trigrams: abc, bca, cab (each thrice) -> 3 distinct, all novel
    assert row.n_ngrams == 3 and row.n_novel == 3


# ------------------------------------------------ sliding distinct

def test_sliding_distinct_window_semantics(spark):
    from ferenda_spark.operators.events import sliding_distinct
    rows = [
        ("u1", "2024-01-01 10:00:00"),
        ("u2", "2024-01-01 11:00:00"),
        ("u1", "2024-01-05 09:00:00"),
        ("u3", "2024-01-08 09:00:00"),   # day 1 falls out of 7d window
        ("u1", "2024-01-20 09:00:00"),   # isolated far day
    ]
    ev = spark.createDataFrame(rows, "user_id string, ts_s string") \
        .select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    out = {r.day: r for r in sliding_distinct(ev, 7).collect()}
    assert set(out) == {"2024-01-01", "2024-01-05",
                        "2024-01-08", "2024-01-20"}
    assert out["2024-01-01"].n_active_1d == 2
    assert out["2024-01-01"].n_active_7d == 2
    # Jan 5 window covers Jan 1-5: u1 (twice, counted once) + u2
    assert out["2024-01-05"].n_active_1d == 1
    assert out["2024-01-05"].n_active_7d == 2
    # Jan 8 window covers Jan 2-8: u1 (Jan 5) + u3
    assert out["2024-01-08"].n_active_7d == 2
    assert out["2024-01-20"].n_active_7d == 1
