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
