"""Sketch-family semantics (CMS over-estimate bound, HLL estimate
accuracy, Bloom no-false-negatives) and HTML-table / disambiguation
edge cases — the properties the register-table oracles can't express."""

import math

import pytest

from pyspark.sql import functions as F

from ferenda_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="tests-sketches", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_cms_point_estimates_never_undercount(spark):
    from ferenda_spark.operators.sketches import cms_counts, cms_estimate
    rows = [("w%d" % (i % 17),) for i in range(400)]
    items = spark.createDataFrame(rows, "token string")
    sketch = cms_counts(items, depth=4, width=64)
    keys = spark.createDataFrame([("w%d" % i,) for i in range(17)],
                                 "token string")
    est = {r.token: r.estimate
           for r in cms_estimate(sketch, keys, depth=4,
                                 width=64).collect()}
    true = {}
    for (t,) in rows:
        true[t] = true.get(t, 0) + 1
    for t, n in true.items():
        assert est[t] >= n                       # CMS never undercounts
        assert est[t] <= n + 400                 # and is bounded
    # total register mass per row equals the stream length
    per_row = (sketch.groupBy("sketch_row").agg(F.sum("n").alias("s"))
               .collect())
    assert all(r.s == 400 for r in per_row)


def test_cms_absent_key_small_estimate(spark):
    from ferenda_spark.operators.sketches import cms_counts, cms_estimate
    items = spark.createDataFrame([("x%d" % i,) for i in range(50)],
                                  "token string")
    sketch = cms_counts(items, depth=4, width=256)
    keys = spark.createDataFrame([("never-seen",)], "token string")
    est = cms_estimate(sketch, keys, depth=4, width=256).collect()[0]
    assert est.estimate <= 2   # collisions only; min-over-rows shrinks


def test_hll_estimate_within_tolerance(spark):
    from ferenda_spark.operators.sketches import hll_registers
    n_true = 3000
    items = spark.createDataFrame(
        [("g", "key%d" % i) for i in range(n_true)],
        "source string, token string")
    regs = {r.register: r.max_rank
            for r in hll_registers(items, "source", "token",
                                   m=64).collect()}
    m = 64
    # standard HLL estimate with the m=64 alpha; registers absent
    # from the table are zero
    s = sum(2.0 ** -regs.get(j, 0) for j in range(m))
    alpha = 0.709
    est = alpha * m * m / s
    assert abs(est - n_true) / n_true < 0.25     # ~1.04/sqrt(64)=13%
    # mergeability: two half-streams groupBy-max to the same registers
    h1 = hll_registers(items.where(F.col("token") < "key2"),
                       "source", "token", m=64)
    h2 = hll_registers(items.where(F.col("token") >= "key2"),
                       "source", "token", m=64)
    merged = {r.register: r.max_rank
              for r in (h1.unionByName(h2)
                        .groupBy("source", "register")
                        .agg(F.max("max_rank").alias("max_rank"))
                        .collect())}
    assert merged == regs


def test_bloom_no_false_negatives(spark):
    from ferenda_spark.operators.sketches import bloom_bits, bloom_probe
    seen = spark.createDataFrame([("u%d" % i,) for i in range(200)],
                                 "url string")
    bits = bloom_bits(seen, k=3, m=4096)
    got = {r.url: r.maybe_seen
           for r in bloom_probe(bits, seen, k=3, m=4096).collect()}
    assert all(got.values())                     # every member found
    fresh = spark.createDataFrame([("v%d" % i,) for i in range(200)],
                                  "url string")
    fp = sum(1 for r in bloom_probe(bits, fresh, k=3,
                                    m=4096).collect() if r.maybe_seen)
    # (1 - e^{-kn/m})^k ~ 0.04% at n=200, k=3, m=4096; allow slack
    assert fp <= 5


def test_html_tables_th_td_and_nested(spark):
    from ferenda_spark.operators.extract import html_table_cells
    html = (b"<html><body><table>"
            b"<tr><th>K</th><td>V</td></tr>"
            b"<tr><td>K2</td><td><b>V2</b> x</td></tr>"
            b"</table><p>no cells here</p>"
            b"<table><tr><td>T2</td></tr></table></body></html>")
    pages = spark.createDataFrame([("u", html)],
                                  "url string, html binary")
    got = sorted(html_table_cells(pages).collect(),
                 key=lambda r: (r.table_idx, r.row_idx, r.col_idx))
    assert [(r.table_idx, r.row_idx, r.col_idx, r.cell)
            for r in got] == [
        (0, 0, 0, "K"), (0, 0, 1, "V"),
        (0, 1, 0, "K2"), (0, 1, 1, "V2 x"),
        (1, 0, 0, "T2")]


def test_disambiguation_overlap_and_tie(spark):
    from ferenda_spark.operators.linking import disambiguate_by_context
    mentions = spark.createDataFrame(
        [(1, ["a", "b", "z"]), (2, ["q"])],
        "mention_id long, context_tokens array<string>")
    candidates = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (2, 11)],
        "mention_id long, entity_id long")
    profiles = spark.createDataFrame(
        [(10, ["a"]), (11, ["a", "b"])],
        "entity_id long, profile_tokens array<string>")
    got = {r.mention_id: r for r in
           disambiguate_by_context(mentions, candidates,
                                   profiles).collect()}
    assert got[1].entity_id == 11 and got[1].overlap == 2
    # zero-overlap tie -> lowest entity id
    assert got[2].entity_id == 10 and got[2].overlap == 0
    assert got[2].n_candidates == 2


def test_sitemap_diff_statuses(spark):
    from ferenda_spark.operators.crawl import sitemap_diff
    old = spark.createDataFrame(
        [("a", "d1"), ("b", "d1"), ("c", None)],
        "loc string, lastmod string")
    new = spark.createDataFrame(
        [("a", "d2"), ("c", None), ("d", "d1")],
        "loc string, lastmod string")
    got = {r.loc: r.status for r in sitemap_diff(old, new).collect()}
    assert got == {"a": "changed", "b": "removed",
                   "c": "unchanged",       # NULL-safe compare
                   "d": "added"}


def test_neighbor_agg_path_counts(spark):
    from ferenda_spark.operators.graphs import neighbor_feature_agg
    # 1 -> 2 -> 3, 1 -> 3; feature(v) = 10*v
    edges = spark.createDataFrame([(1, 2), (2, 3), (1, 3)],
                                  "doc_a long, doc_b long")
    feats = spark.createDataFrame([(1, 10), (2, 20), (3, 30)],
                                  "node long, feature long")
    got = {r.node: r for r in
           neighbor_feature_agg(edges, feats).collect()}
    assert (got[1].h1_n, got[1].h1_sum) == (2, 50)
    # 2-hop from 1: via 2 -> 3 (one path) only; 3 has no out-edges
    assert (got[1].h2_n, got[1].h2_sum) == (1, 30)
    assert (got[2].h1_n, got[2].h2_n) == (1, 0)   # zero-filled hop 2


def test_kmv_estimate_and_jaccard(spark):
    """KMV: (k-1)*2^32/kth_min within tolerance of the true distinct
    count; kmv_compare's Jaccard estimate within ~2/sqrt(k) of truth
    on two half-overlapping key sets."""
    from ferenda_spark.operators.sketches import kmv_compare, kmv_sketch
    k = 64
    a = {"key%04d" % i for i in range(0, 2000)}
    b = {"key%04d" % i for i in range(1000, 3000)}   # true J = 1/3
    items = spark.createDataFrame(
        [("a", x) for x in a] + [("b", x) for x in b],
        "source string, token string")
    sk = kmv_sketch(items, "source", "token", k=k)
    rows = sk.collect()
    assert {r.source for r in rows} == {"a", "b"}
    for g, n_true in (("a", 2000), ("b", 2000)):
        hs = sorted(r.hv for r in rows if r.source == g)
        assert len(hs) == k and hs == sorted(set(hs))
        est = (k - 1) * 2.0 ** 32 / hs[-1]
        assert abs(est - n_true) / n_true < 0.5    # ~1/sqrt(64)=12.5%
    cmp_ = kmv_compare(items, "source", "token", "a", "b",
                       k=k).collect()[0]
    assert cmp_.k_used == k
    assert cmp_.n_both + cmp_.n_only_a + cmp_.n_only_b == k
    assert abs(cmp_.n_both / k - 1 / 3) < 2 / (k ** 0.5)


def test_kmv_mergeable_and_small_group_exact(spark):
    """Union of two shard sketches re-ranked = sketch of the union;
    a group with < k distinct keys keeps ALL of them (exact mode)."""
    from pyspark.sql import Window
    from ferenda_spark.operators.sketches import kmv_sketch
    items = spark.createDataFrame(
        [("g", "t%03d" % i) for i in range(500)] +
        [("tiny", "x%d" % i) for i in range(5)],
        "source string, token string")
    k = 32
    full = kmv_sketch(items, "source", "token", k=k)
    tiny = sorted((r.rank, r.hv) for r in full.collect()
                  if r.source == "tiny")
    assert len(tiny) == 5 and [r for r, _ in tiny] == [1, 2, 3, 4, 5]
    s1 = kmv_sketch(items.where(F.col("token") < "t250"),
                    "source", "token", k=k)
    s2 = kmv_sketch(items.where(F.col("token") >= "t250"),
                    "source", "token", k=k)
    merged = (s1.select("source", "hv")
              .unionByName(s2.select("source", "hv")).distinct()
              .withColumn("rank", F.row_number().over(
                  Window.partitionBy("source").orderBy("hv")))
              .where(F.col("rank") <= k))
    want = {(r.source, r.rank, r.hv) for r in full.collect()
            if r.source == "g"}
    got = {(r.source, r.rank, r.hv) for r in merged.collect()
           if r.source == "g"}
    assert got == want
