"""Unit tests for phrase search, SymSpell fuzzy lookup, h-index,
and edge reciprocity (round-4 session 16)."""

import pytest

from ferenda_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="tests-round4-search-graph", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="module")
def docs(spark):  # noqa: F811
    return spark.createDataFrame(
        [(0, "the batch batch batch stream"),
         (1, "a batch  batch"),
         (2, "no match here"),
         (3, "batch"),
         (4, "")],
        "doc_id long, text string")


class TestPhraseSearch:
    def test_overlapping_runs_each_count(self, spark, docs):  # noqa: F811
        from ferenda_spark.operators.search import phrase_search
        rows = {r["doc_id"]: r for r in
                phrase_search(docs, "batch batch").collect()}
        # "batch batch batch" = 2 overlapping occurrences
        assert rows[0]["n_occurrences"] == 2
        assert rows[0]["first_pos"] == 2
        assert rows[1]["n_occurrences"] == 1
        assert set(rows) == {0, 1}

    def test_phrase_longer_than_doc(self, spark, docs):  # noqa: F811
        from ferenda_spark.operators.search import phrase_search
        out = phrase_search(docs, "batch batch batch batch").collect()
        assert out == []

    def test_single_token_phrase(self, spark, docs):  # noqa: F811
        from ferenda_spark.operators.search import phrase_search
        rows = {r["doc_id"]: r["n_occurrences"]
                for r in phrase_search(docs, "batch").collect()}
        assert rows == {0: 3, 1: 2, 3: 1}

    def test_empty_phrase_raises(self, spark, docs):  # noqa: F811
        from ferenda_spark.operators.search import phrase_search
        with pytest.raises(ValueError):
            phrase_search(docs, "   ")


class TestFuzzyLookup:
    @pytest.fixture(scope="class")
    def vocab(self, spark):  # noqa: F811
        return spark.createDataFrame(
            [("batch", 100), ("match", 50), ("hatch", 10),
             ("stream", 5)], "term string, freq long")

    def test_matches_naive_levenshtein(self, spark, vocab):  # noqa: F811
        """Delete-key join must agree with the brute-force
        definition: best (distance, -freq, term) candidate at
        levenshtein <= 1."""
        import pyspark.sql.functions as F
        from pyspark.sql import Window

        from ferenda_spark.operators.search import fuzzy_lookup
        qs = spark.createDataFrame(
            [("bach",), ("batchx",), ("zatch",), ("qqqq",),
             ("batch",), ("stream",), ("streams",), ("xstream",)],
            "query string")
        got = {(r["query"], r["term"], r["distance"])
               for r in fuzzy_lookup(vocab, qs).collect()}
        brute = (qs.crossJoin(vocab)
                 .withColumn("d", F.levenshtein("query", "term"))
                 .where(F.col("d") <= 1))
        w = Window.partitionBy("query").orderBy(
            F.col("d"), F.col("freq").desc(), F.col("term"))
        want = {(r["query"], r["term"], r["d"]) for r in
                brute.withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") == 1).collect()}
        assert got == want
        assert ("qqqq",) not in {(q,) for q, _, _ in got}

    def test_frequency_breaks_distance_ties(self, spark, vocab):  # noqa: F811
        from ferenda_spark.operators.search import fuzzy_lookup
        qs = spark.createDataFrame([("zatch",)], "query string")
        [r] = fuzzy_lookup(vocab, qs).collect()
        # batch/match/hatch all distance 1; batch has highest freq
        assert r["term"] == "batch" and r["freq"] == 100


class TestHIndex:
    def test_textbook_values(self, spark):  # noqa: F811
        from ferenda_spark.operators.graphs import h_index
        items = spark.createDataFrame(
            # g1 scores 10,8,5,4,3 -> h=4; g2 scores 1,1,1 -> h=1
            # g3 single score 9 -> h=1; g4 zeros -> h=0
            [("g1", 10), ("g1", 8), ("g1", 5), ("g1", 4), ("g1", 3),
             ("g2", 1), ("g2", 1), ("g2", 1),
             ("g3", 9), ("g4", 0), ("g4", 0)],
            "group string, score long")
        got = {r["group"]: (r["h_index"], r["n_items"], r["max_score"])
               for r in h_index(items).collect()}
        assert got == {"g1": (4, 5, 10), "g2": (1, 3, 1),
                       "g3": (1, 1, 9), "g4": (0, 2, 0)}

    def test_tie_blocks_are_order_invariant(self, spark):  # noqa: F811
        from ferenda_spark.operators.graphs import h_index
        items = spark.createDataFrame(
            [("g", 3)] * 5, "group string, score long")
        [r] = h_index(items).collect()
        assert r["h_index"] == 3  # 5 items with score 3 -> h = 3


class TestReciprocity:
    def test_mutual_and_oneway(self, spark):  # noqa: F811
        from ferenda_spark.operators.graphs import reciprocity
        e = spark.createDataFrame(
            [("a", "b"), ("b", "a"), ("a", "c"), ("c", "c"),
             ("a", "b")],  # dup + self-loop are ignored
            "src string, dst string")
        got = {r["node"]: (r["n_out"], r["n_reciprocated"],
                           r["reciprocity_permille"])
               for r in reciprocity(e).collect()}
        assert got == {"a": (2, 1, 500), "b": (1, 1, 1000)}


class TestBnodeCanonicalize:
    ROWS = [
        ("g1", "doc1", "author", "_:x1"),
        ("g1", "_:x1", "name", '"Alice"'),
        ("g1", "_:x1", "aff", "_:y1"),
        ("g1", "_:y1", "name", '"Org"'),
        ("g1", "_:z1", "member", "_:y1"),
        ("g1", "_:z1", "name", '"Bob"'),
    ]

    def _canon(self, spark, rows, **kw):
        from ferenda_spark.operators.rdfio import bnode_canonicalize
        q = spark.createDataFrame(
            rows, "context string, subj string, pred string, obj string")
        return bnode_canonicalize(q, **kw).collect()

    def test_rename_invariance(self, spark):  # noqa: F811
        """Same structure under a bnode renaming -> identical
        (canon_label, hash) assignment."""
        ren = {"_:x1": "_:qq", "_:y1": "_:w", "_:z1": "_:a0"}
        g2 = [("g2", ren.get(s, s), p, ren.get(o, o))
              for _, s, p, o in self.ROWS]
        out = self._canon(spark, self.ROWS + g2)
        by_graph = {}
        for r in out:
            by_graph.setdefault(r["context"], {})[
                r["canon_label"]] = r["hash"]
        assert by_graph["g1"] == by_graph["g2"]
        assert all(r["n_hash_ties"] == 0 for r in out)

    def test_automorphic_twins_flagged(self, spark):  # noqa: F811
        """Two structurally identical sibling bnodes can't be split
        by any number of WL rounds -> equal hashes, ties flagged."""
        rows = [("g", "doc", "tag", "_:p"), ("g", "doc", "tag", "_:q")]
        out = self._canon(spark, rows)
        assert {r["n_hash_ties"] for r in out} == {1}
        assert len({r["hash"] for r in out}) == 1
        # labels still total and deterministic (original-name order)
        assert {r["canon_label"] for r in out} == {"c14n0", "c14n1"}

    def test_graphs_are_isolated(self, spark):  # noqa: F811
        """A bnode name reused across graphs is two distinct nodes."""
        rows = [("ga", "doc", "p", "_:b"), ("ga", "_:b", "name", '"A"'),
                ("gb", "doc", "p", "_:b"), ("gb", "_:b", "name", '"B"')]
        out = self._canon(spark, rows)
        hashes = {r["context"]: r["hash"] for r in out}
        assert hashes["ga"] != hashes["gb"]

    def test_chain_depth_needs_rounds(self, spark):  # noqa: F811
        """A 4-bnode chain anchored only at the far end: the two
        middle nodes have isomorphic 1-neighborhoods (one in-edge,
        one out-edge, all-blinded), so 1 round ties them; round 2
        propagates the anchor and splits them."""
        rows = [("g", "_:a", "next", "_:b"), ("g", "_:b", "next", "_:c"),
                ("g", "_:c", "next", "_:d"),
                ("g", "_:d", "name", '"end"')]
        shallow = self._canon(spark, rows, rounds=1)
        deep = self._canon(spark, rows, rounds=3)
        assert any(r["n_hash_ties"] > 0 for r in shallow)
        assert all(r["n_hash_ties"] == 0 for r in deep)


class TestZonemapPrune:
    def test_disjoint_files_pruned(self, spark):  # noqa: F811
        from ferenda_spark.operators.store import (zonemap_prune,
                                                   zonemap_stats)
        df = spark.createDataFrame(
            [("f1", 10), ("f1", 90), ("f2", 200), ("f2", 250),
             ("f3", 100), ("f3", 150)],
            "file_id string, v long")
        out = {r["file_id"]: (r["pruned"], r["min_value"],
                              r["max_value"])
               for r in zonemap_prune(
                   zonemap_stats(df, "file_id", "v"), 120, 220)
               .collect()}
        # f1 [10,90] disjoint -> pruned; f2 [200,250] and f3
        # [100,150] both overlap [120,220]
        assert out == {"f1": (1, 10, 90), "f2": (0, 200, 250),
                       "f3": (0, 100, 150)}

    def test_boundary_touch_is_overlap(self, spark):  # noqa: F811
        from ferenda_spark.operators.store import (zonemap_prune,
                                                   zonemap_stats)
        df = spark.createDataFrame([("f", 100), ("f", 120)],
                                   "file_id string, v long")
        [r] = zonemap_prune(zonemap_stats(df, "file_id", "v"),
                            120, 220).collect()
        assert r["overlaps"] == 1  # closed interval: max == lo


class TestDecayedCounts:
    def test_integer_halving(self, spark):  # noqa: F811
        from ferenda_spark.operators.events import decayed_counts
        rows = [(1, "2020-01-29 10:00:00"),   # ref day: weight 1.0
                (1, "2020-01-22 09:00:00"),   # 7 days: 1/2
                (1, "2020-01-08 08:00:00"),   # 21 days: 1/8
                (2, "2020-01-28 00:00:00")]   # 1 day: still 1.0
        e = spark.createDataFrame(rows, "user_id long, ts string") \
            .selectExpr("user_id", "cast(ts as timestamp) ts")
        got = {r["user_id"]: (r["n_events"], r["decayed_micro"],
                              r["last_day"])
               for r in decayed_counts(e, half_life_days=7).collect()}
        assert got[1] == (3, 1000000 + 500000 + 125000, "2020-01-29")
        assert got[2] == (1, 1000000, "2020-01-28")

    def test_shift_is_capped(self, spark):  # noqa: F811
        from ferenda_spark.operators.events import decayed_counts
        e = spark.createDataFrame(
            [(1, "2020-01-01 00:00:00"), (1, "3020-01-01 00:00:00")],
            "user_id long, ts string") \
            .selectExpr("user_id", "cast(ts as timestamp) ts")
        [r] = decayed_counts(e, half_life_days=7).collect()
        assert r["decayed_micro"] == 1000000  # ancient event -> 0


class TestBhFdr:
    def test_step_up_rejects_below_largest_passing_rank(self, spark):  # noqa: F811
        """Classic BH shape: a p that individually FAILS its
        threshold is still rejected when a later rank passes."""
        from ferenda_spark.operators.quality import bh_fdr
        # m=4, alpha=0.25 (250000 micro): thresholds 62500, 125000,
        # 187500, 250000.  p2=130000 fails rank-2 individually but
        # p3=150000 passes rank 3 -> ranks 1..3 all rejected.
        t = spark.createDataFrame(
            [("a", 10000), ("b", 130000), ("c", 150000),
             ("d", 900000)], "test_id string, p_micro long")
        got = {r["test_id"]: (r["rank"], r["rejected"])
               for r in bh_fdr(t, alpha_micro=250000).collect()}
        assert got == {"a": (1, 1), "b": (2, 1), "c": (3, 1),
                       "d": (4, 0)}

    def test_no_rejections(self, spark):  # noqa: F811
        from ferenda_spark.operators.quality import bh_fdr
        t = spark.createDataFrame(
            [("a", 900000), ("b", 990000)],
            "test_id string, p_micro long")
        assert all(r["rejected"] == 0
                   for r in bh_fdr(t, alpha_micro=50000).collect())


class TestTemplateClusters:
    def test_copy_invariance_and_structure_sensitivity(self, spark):  # noqa: F811
        from ferenda_spark.operators.cleaning import template_clusters
        p = spark.createDataFrame(
            [("a", "<html><body><div><h1>One</h1><p>x</p></div></body></html>"),
             ("b", "<HTML><body><div><h1>Two!</h1><p>longer copy</p></div></body></html>"),
             ("c", "<html><body><span>z</span></body></html>")],
            "url string, html string")
        out = sorted(template_clusters(p).collect(),
                     key=lambda r: r["example_id"])
        assert [(r["n_pages"], r["example_id"]) for r in out] == \
            [(2, "a"), (1, "c")]  # a+b same template (case-folded)

    def test_closing_tags_ignored(self, spark):  # noqa: F811
        from ferenda_spark.operators.cleaning import template_signature
        p = spark.createDataFrame(
            [("a", "<div><p>x</p></div>"), ("b", "<div><p>unclosed")],
            "url string, html string")
        sigs = {r["url"]: r["signature"]
                for r in template_signature(p).collect()}
        assert sigs["a"] == sigs["b"]


class TestDateNormalize:
    def _run(self, spark, text):
        from ferenda_spark.operators.extract import date_normalize
        d = spark.createDataFrame([("u", text)], "url string, text string")
        return sorted((r["form"], r["mention"], r["iso_date"])
                      for r in date_normalize(d).collect())

    def test_both_forms_and_abbreviations(self, spark):  # noqa: F811
        got = self._run(
            spark, "Published January 5, 2020; updated 7 Mar 2021.")
        assert got == [("dmy", "7 mar 2021", "2021-03-07"),
                       ("mdy", "january 5, 2020", "2020-01-05")]

    def test_no_false_positives(self, spark):  # noqa: F811
        # bare numbers / out-of-range days / years out of window
        got = self._run(spark, "32 Jan 2020 and May 5, 1850 and 12 34")
        assert got == []

    def test_zero_padding(self, spark):  # noqa: F811
        got = self._run(spark, "Sep 9, 2020")
        assert got == [("mdy", "sep 9, 2020", "2020-09-09")]


class TestMinePathRules:
    def test_confidence_and_fanout_guard(self, spark):  # noqa: F811
        from ferenda_spark.operators.rules import mine_path_rules
        t = spark.createDataFrame(
            [("a", "author", "y1"), ("y1", "aff", "o1"),
             ("a", "works_at", "o1"),
             ("b", "author", "y2"), ("y2", "aff", "o2"),
             ("b", "works_at", "o2"),
             ("c", "author", "y3"), ("y3", "aff", "o3")],
            "subj string, pred string, obj string")
        [r] = mine_path_rules(t).collect()
        assert (r["body_p1"], r["body_p2"], r["head_pred"]) == \
            ("author", "aff", "works_at")
        assert (r["support"], r["n_body_pairs"],
                r["confidence_permille"]) == (2, 3, 666)
        # hub guard: chain nodes above the fanout cap contribute no
        # paths -> rule disappears at max_fanout=0
        assert mine_path_rules(t, max_fanout=0).collect() == []


class TestWarcRevisit:
    def test_revisit_points_at_original(self, spark):  # noqa: F811
        from ferenda_spark.operators.crawl import warc_revisit
        c = spark.createDataFrame(
            [("u", "2024-01-01", "dA"), ("u", "2024-01-02", "dA"),
             ("u", "2024-01-03", "dB"), ("u", "2024-01-04", "dA"),
             ("v", "2024-01-01", "dA")],  # same digest, other URL
            "url string, warc_ts string, digest string")
        out = {(r["url"], r["warc_ts"]):
               (r["record_type"], r["refers_to_ts"])
               for r in warc_revisit(c).collect()}
        assert out[("u", "2024-01-01")] == ("response", None)
        assert out[("u", "2024-01-02")] == ("revisit", "2024-01-01")
        assert out[("u", "2024-01-03")] == ("response", None)
        assert out[("u", "2024-01-04")] == ("revisit", "2024-01-01")
        # revisit scope is per-URL: v's dA is its own response
        assert out[("v", "2024-01-01")] == ("response", None)


class TestHeadingOutline:
    def test_nearest_smaller_level_parent(self, spark):  # noqa: F811
        from ferenda_spark.operators.extract import heading_outline
        p = spark.createDataFrame(
            [("u", "<h1>A</h1><h2>B</h2><h3>C</h3><h2>D</h2>"
                   "<h1>E</h1><h3>F</h3>"),
             ("v", "<h3>Orphan</h3>")],
            "url string, html string")
        out = {(r["url"], r["pos"]): (r["level"], r["title"],
                                      r["parent_pos"])
               for r in heading_outline(p).collect()}
        assert out[("u", 0)] == (1, "A", None)
        assert out[("u", 2)] == (3, "C", 1)
        assert out[("u", 3)] == (2, "D", 0)   # skips sibling h3
        assert out[("u", 5)] == (3, "F", 4)   # new h1 resets scope
        assert out[("v", 0)] == (3, "Orphan", None)

    def test_case_preserved_and_attrs_ignored(self, spark):  # noqa: F811
        from ferenda_spark.operators.extract import heading_outline
        p = spark.createDataFrame(
            [("u", '<H2 class="x">MiXeD Case</H2>')],
            "url string, html string")
        [r] = heading_outline(p).collect()
        assert (r["level"], r["title"]) == (2, "MiXeD Case")


class TestMoreLikeThis:
    def test_rarity_weighting_and_df_cap(self, spark):  # noqa: F811
        from ferenda_spark.operators.search import more_like_this
        d = spark.createDataFrame(
            [(1, "rare shared common"), (2, "rare other common"),
             (3, "shared x common"), (4, "common y z")],
            "doc_id long, text string")
        seeds = spark.createDataFrame([(1,)], "doc_id long")
        out = {r["doc_id"]: (r["n_shared_terms"], r["score_micro"])
               for r in more_like_this(d, seeds, max_df=3,
                                       top_k=5).collect()}
        # 'common' df=4 > cap -> dropped; rare/shared df=2 each
        assert out == {2: (1, 500000), 3: (1, 500000)}

    def test_seed_excluded(self, spark):  # noqa: F811
        from ferenda_spark.operators.search import more_like_this
        d = spark.createDataFrame(
            [(1, "a b"), (2, "a b")], "doc_id long, text string")
        seeds = spark.createDataFrame([(1,), (2,)], "doc_id long")
        out = more_like_this(d, seeds, max_df=10, top_k=5).collect()
        assert all(r["seed_id"] != r["doc_id"] for r in out)
        assert len(out) == 2


class TestNeymanAllocation:
    def test_zero_variance_starves_allocation(self, spark):  # noqa: F811
        from ferenda_spark.operators.training import neyman_allocation
        r = spark.createDataFrame(
            [("a", 10), ("a", 10), ("a", 10),
             ("b", 0), ("b", 100), ("b", 200), ("b", 300),
             ("c", 50), ("c", 60)],
            "source string, n_chars long")
        got = {x["stratum"]: (x["sigma_floor"], x["alloc_n"])
               for x in neyman_allocation(r, 10).collect()}
        assert got["a"] == (0, 0)          # homogeneous -> nothing
        assert got["b"][1] == 10           # all budget to high-spread
        assert sum(v[1] for v in got.values()) == 10

    def test_allocation_sums_to_budget(self, spark):  # noqa: F811
        from ferenda_spark.operators.training import neyman_allocation
        r = spark.createDataFrame(
            [("s%d" % (i % 7), (i * 13) % 97) for i in range(200)],
            "source string, n_chars long")
        out = neyman_allocation(r, 37).collect()
        assert sum(x["alloc_n"] for x in out) == 37


class TestKatz:
    def test_attenuated_walk_counting(self, spark):  # noqa: F811
        from ferenda_spark.operators.graphs import katz_centrality
        e = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("a", "c")],
            "src string, dst string")
        got = {r["node"]: r["katz_micro"]
               for r in katz_centrality(e, rounds=3).collect()}
        # c: two length-1 walks (1M) + one length-2 walk a->b->c
        # (250k); b: one length-1 walk (500k); a: no in-walks
        assert got == {"a": 1000000, "b": 1500000, "c": 2250000}

    def test_multigraph_edges_count_multiply(self, spark):  # noqa: F811
        from ferenda_spark.operators.graphs import katz_centrality
        e = spark.createDataFrame(
            [("a", "b"), ("a", "b")], "src string, dst string")
        got = {r["node"]: r["katz_micro"]
               for r in katz_centrality(e, rounds=1).collect()}
        assert got["b"] == 2000000  # 1M base + 2 * 500k


class TestBreadcrumbs:
    def test_trail_and_parents(self, spark):  # noqa: F811
        from ferenda_spark.operators.extract import breadcrumb_trails
        p = spark.createDataFrame(
            [("u", '<nav class="x breadcrumb y"><a href="/">Home</a>'
                   ' &gt; <a href="/a">A</a></nav>'),
             ("v", "<nav><a href='/z'>not-crumbs</a></nav>"),
             ("w", "no nav at all")],
            "url string, html string")
        out = [(r["url"], r["pos"], r["href"], r["label"],
                r["parent_href"])
               for r in breadcrumb_trails(p)
               .orderBy("url", "pos").collect()]
        assert out == [("u", 0, "/", "Home", None),
                       ("u", 1, "/a", "A", "/")]


class TestCodeDetection:
    def test_code_vs_prose(self, spark):  # noqa: F811
        from ferenda_spark.operators.textstats import code_detection
        d = spark.createDataFrame(
            [(0, "int main() {\n    return 0;\n}"),
             (1, "four lines\nof plain\nprose text\nhere")],
            "doc_id long, text string")
        got = {r["doc_id"]: (r["n_braces"], r["n_semicolons"],
                             r["n_indented"], r["is_code"])
               for r in code_detection(d).collect()}
        assert got[0] == (2, 1, 1, 1)
        assert got[1] == (0, 0, 0, 0)

    def test_tab_indent_counts(self, spark):  # noqa: F811
        from ferenda_spark.operators.textstats import code_detection
        d = spark.createDataFrame(
            [(0, "\tx\n\ty")], "doc_id long, text string")
        [r] = code_detection(d).collect()
        assert r["n_indented"] == 2


class TestGraphDiff:
    def test_change_types(self, spark):  # noqa: F811
        from ferenda_spark.operators.rdfio import graph_diff
        old = spark.createDataFrame(
            [("s1", "p", "a"), ("s1", "p", "b"),   # modified
             ("s2", "p", "a"),                     # unchanged
             ("s3", "p", "a")],                    # removed
            "subj string, pred string, obj string")
        new = spark.createDataFrame(
            [("s1", "p", "a"), ("s1", "p", "c"),
             ("s2", "p", "a"),
             ("s4", "p", "x")],                    # added
            "subj string, pred string, obj string")
        got = {r["subj"]: (r["n_added"], r["n_removed"],
                           r["n_unchanged"], r["change_type"])
               for r in graph_diff(old, new).collect()}
        assert got == {"s1": (1, 1, 1, "modified"),
                       "s2": (0, 0, 1, "unchanged"),
                       "s3": (0, 1, 0, "removed"),
                       "s4": (1, 0, 0, "added")}

    def test_canonicalized_diff_ignores_bnode_renames(self, spark):  # noqa: F811
        """graph_diff ∘ bnode_canonicalize: the same structure under
        different bnode names diffs as unchanged."""
        import pyspark.sql.functions as F

        from ferenda_spark.operators.rdfio import (bnode_canonicalize,
                                                   graph_diff)

        def canon(rows):
            q = spark.createDataFrame(
                rows, "context string, subj string, pred string, "
                      "obj string")
            m = bnode_canonicalize(q).select(
                "context", F.col("bnode"), F.col("canon_label"))
            for side in ("subj", "obj"):
                q = (q.join(m.withColumnRenamed("bnode", side)
                            .withColumnRenamed("canon_label",
                                               "_c_" + side),
                            ["context", side], "left")
                     .withColumn(side, F.coalesce("_c_" + side, side))
                     .drop("_c_" + side))
            return q.select("subj", "pred", "obj")
        a = [("g", "doc", "author", "_:x"), ("g", "_:x", "name", '"A"')]
        b = [("g", "doc", "author", "_:zz"), ("g", "_:zz", "name", '"A"')]
        out = graph_diff(canon(a), canon(b)).collect()
        assert all(r["change_type"] == "unchanged" for r in out)


class TestVoidStats:
    def test_counts_and_partitions(self, spark):  # noqa: F811
        from ferenda_spark.catalog import void_stats
        t = spark.createDataFrame(
            [("s1", "p1", "o1"), ("s1", "p1", "o2"),
             ("s2", "p2", "o1")],
            "subj string, pred string, obj string")
        rows = {(r["subj"], r["pred"]): r["obj"]
                for r in void_stats(t, "d").collect()}
        V = "http://rdfs.org/ns/void#"
        assert rows[("d", V + "triples")] == "3"
        assert rows[("d", V + "distinctSubjects")] == "2"
        assert rows[("d", V + "distinctObjects")] == "2"
        assert rows[("d", V + "properties")] == "2"
        # one partition node per predicate, carrying its count
        import hashlib
        p1 = "d#prop-" + hashlib.md5(b"p1").hexdigest()
        assert rows[(p1, V + "property")] == "p1"
        assert rows[(p1, V + "triples")] == "2"


class TestRrfFusion:
    def test_fusion_prefers_items_in_both(self, spark):  # noqa: F811
        from ferenda_spark.operators.search import rrf_fusion
        r = spark.createDataFrame(
            [("q", "a", 1, "r1"), ("q", "b", 2, "r1"),
             ("q", "b", 1, "r2"), ("q", "c", 2, "r2")],
            "query string, item string, rank long, ranking string")
        out = {x["item"]: (x["n_rankings"], x["rrf_micro"], x["rank"])
               for x in rrf_fusion(r, k=60, top_k=10).collect()}
        # b appears in both rankings -> wins despite never being #1
        # everywhere: 1/62 + 1/61 > 1/61
        assert out["b"][0] == 2
        assert out["b"][2] == 1
        assert out["a"] == (1, 1000000 // 61, 2)
        assert out["c"] == (1, 1000000 // 62, 3)


class TestGeoJoin:
    def test_matches_naive_join_across_cells(self, spark):  # noqa: F811
        """Grid-bucketed join must equal the brute-force pair set,
        including pairs straddling cell boundaries and negative
        coordinates."""
        import pyspark.sql.functions as F

        from ferenda_spark.operators.cleaning import geo_join
        pts = [(i, (i * 61) % 700 - 300, (i * 97) % 700 - 350)
               for i in range(60)]
        p = spark.createDataFrame(
            pts, "point_id long, lat_micro long, lon_micro long")
        got = {(r["id_a"], r["id_b"], r["dist_sq_micro"])
               for r in geo_join(p, radius_micro=100).collect()}
        b = p.toDF("pid", "la", "lo")
        brute = (b.alias("a").join(b.alias("b"),
                                   F.col("a.pid") < F.col("b.pid"))
                 .select(F.col("a.pid").alias("x"),
                         F.col("b.pid").alias("y"),
                         ((F.col("a.la") - F.col("b.la"))
                          * (F.col("a.la") - F.col("b.la"))
                          + (F.col("a.lo") - F.col("b.lo"))
                          * (F.col("a.lo") - F.col("b.lo")))
                         .alias("d2"))
                 .where(F.col("d2") <= 100 * 100))
        want = {(r["x"], r["y"], r["d2"]) for r in brute.collect()}
        assert got == want and len(want) > 0


class TestMadOutliers:
    def test_robust_to_contamination(self, spark):  # noqa: F811
        from ferenda_spark.operators.quality import mad_outliers
        r = spark.createDataFrame(
            [("g", 10), ("g", 11), ("g", 12), ("g", 11), ("g", 1000)],
            "group string, value long")
        got = {x["value"]: x["is_outlier"]
               for x in mad_outliers(r).collect()}
        assert got[1000] == 1
        assert got[10] == 0 and got[12] == 0

    def test_zero_mad_flags_any_deviation(self, spark):  # noqa: F811
        from ferenda_spark.operators.quality import mad_outliers
        r = spark.createDataFrame(
            [("g", 5), ("g", 5), ("g", 5), ("g", 6)],
            "group string, value long")
        got = {x["value"]: x["is_outlier"]
               for x in mad_outliers(r).collect()}
        assert got == {5: 0, 6: 1}
