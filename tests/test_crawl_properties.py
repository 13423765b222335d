"""Property tests (hypothesis) for the session-6 graph/interval/sketch
operators against brute-force pure-Python models: random functional
redirect graphs (chains, trees into cycles), random interval sets,
random BFS graphs and random Bloom/CMS streams — the input shapes the
planted corpus can't enumerate."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from ferenda_spark.session import get_spark

_SETTINGS = dict(max_examples=12, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="crawl-props", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


# --------------------------------------------------------- redirects

def _walk(succ, x, limit=64):
    """Pure-Python chain walk: (final, hops, resolved)."""
    hops, cur = 0, x
    seen = set()
    while cur in succ:
        if cur in seen or hops >= limit:
            return None  # cycle (or absurd chain): unresolved
        seen.add(cur)
        cur = succ[cur]
        hops += 1
    return cur, hops


@given(st.dictionaries(st.integers(0, 15), st.integers(0, 15),
                       min_size=1, max_size=16)
       .filter(lambda d: any(k != v for k, v in d.items())))
@settings(**_SETTINGS)
def test_resolve_redirects_matches_walk(spark, succ):
    from ferenda_spark.operators.crawl import resolve_redirects
    succ = {k: v for k, v in succ.items() if k != v}  # drop self-loops
    if not succ:
        return
    df = spark.createDataFrame(
        [("n%d" % k, "n%d" % v) for k, v in succ.items()],
        "src_url string, dst_url string")
    got = {r.src_url: r for r in
           resolve_redirects(df, max_doubling=5).collect()}
    assert set(got) == {"n%d" % k for k in succ}
    for k in succ:
        want = _walk(succ, k)
        row = got["n%d" % k]
        if want is None:
            assert not row.resolved
        else:
            fin, hops = want
            assert row.resolved
            assert (row.final_url, row.hops) == ("n%d" % fin, hops)


# --------------------------------------------------------- intervals

@given(st.lists(st.tuples(st.integers(0, 2), st.integers(0, 50),
                          st.integers(0, 20)),
                min_size=1, max_size=25))
@settings(**_SETTINGS)
def test_coalesce_intervals_matches_bruteforce(spark, triples):
    from ferenda_spark.operators.temporal import coalesce_intervals
    rows = [("e%d" % e, s, s + length) for e, s, length in triples]
    df = spark.createDataFrame(
        rows, "entity string, valid_from long, valid_to long")
    got = sorted(
        (r.entity, r.valid_from, r.valid_to, r.n_merged)
        for r in coalesce_intervals(df, "entity").collect())

    # brute force: sort per key, sweep
    want = []
    by_e = {}
    for e, s, t in rows:
        by_e.setdefault(e, []).append((s, t))
    for e, ivs in by_e.items():
        ivs.sort()
        cur_s, cur_t, n = ivs[0][0], ivs[0][1], 1
        for s, t in ivs[1:]:
            if s <= cur_t:
                cur_t = max(cur_t, t)
                n += 1
            else:
                want.append((e, cur_s, cur_t, n))
                cur_s, cur_t, n = s, t, 1
        want.append((e, cur_s, cur_t, n))
    assert got == sorted(want)


# --------------------------------------------------------------- BFS

@given(st.lists(st.tuples(st.integers(0, 11), st.integers(0, 11)),
                min_size=1, max_size=30),
       st.sets(st.integers(0, 11), min_size=1, max_size=3))
@settings(**_SETTINGS)
def test_bfs_matches_bruteforce(spark, edges, seeds):
    from ferenda_spark.operators.graphs import bfs_distances
    e_df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    s_df = spark.createDataFrame([(s,) for s in seeds], "node long")
    max_hops = 4
    got = {r.node: r.dist for r in
           bfs_distances(e_df, s_df, max_hops=max_hops).collect()}

    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for h in range(1, max_hops + 1):
        nxt = set()
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = h
                    nxt.add(v)
        frontier = nxt
    assert got == dist


# ------------------------------------------------------------- bloom

@given(st.sets(st.text("ab", min_size=1, max_size=6), min_size=1,
               max_size=30),
       st.sets(st.text("ab", min_size=1, max_size=6), min_size=1,
               max_size=30))
@settings(**_SETTINGS)
def test_bloom_membership_superset(spark, members, probes):
    from ferenda_spark.operators.sketches import bloom_bits, bloom_probe
    m_df = spark.createDataFrame([(x,) for x in members], "url string")
    p_df = spark.createDataFrame([(x,) for x in probes], "url string")
    bits = bloom_bits(m_df, k=3, m=1024)
    got = {r.url: r.maybe_seen
           for r in bloom_probe(bits, p_df, k=3, m=1024).collect()}
    for x in probes & members:
        assert got[x]          # no false negatives, ever
