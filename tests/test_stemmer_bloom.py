"""S-stemmer rules, term burstiness, Bloom file-skipping —
closed-form checks on hand-built inputs."""

import pytest

from ferenda_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="tests-stemmer-bloom", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_s_stemmer_rules(spark):
    """Every rule and exception from Harman 1991."""
    from ferenda_spark.operators.textstats import s_stemmer
    words = ["studies", "queries", "tables", "hashes", "rows",
             "focus", "class", "trees", "toes", "scan"]
    docs = spark.createDataFrame([(1, " ".join(words))],
                                 "doc_id long, text string")
    out = {r.token: (r.stem, r.rule) for r in
           s_stemmer(docs).collect()}
    assert out["studies"] == ("study", "ies")
    assert out["queries"] == ("query", "ies")
    assert out["tables"] == ("table", "es")
    assert out["hashes"] == ("hashe", "es")      # documented S-stem
    assert out["rows"] == ("row", "s")
    assert out["focus"] == ("focus", "none")     # -us guard
    assert out["class"] == ("class", "none")     # -ss guard
    assert out["scan"] == ("scan", "none")
    # ELSE-IF cascade (Harman's spec): -ees/-oes block the es arm,
    # but the word then falls through to the bare-s arm
    assert out["trees"] == ("tree", "s")
    assert out["toes"] == ("toe", "s")


def test_burstiness_poisson_vs_bursty(spark):
    """'flat' appears once in each of 4 docs (VMR < 1 -> 0 after
    floor at N=4: (4*4-16)*1000//(4*4) = 0); 'burst' appears 4 times
    in one doc: (4*16-16)*1000//(4*4) = 3000."""
    from ferenda_spark.operators.textstats import burstiness
    docs = spark.createDataFrame(
        [(1, "flat burst burst burst burst"), (2, "flat x"),
         (3, "flat y"), (4, "flat z")],
        "doc_id long, text string")
    out = {r.term: r for r in burstiness(docs, min_total=4).collect()}
    assert out["flat"].vmr_milli == 0
    assert out["flat"].n_docs == 4
    assert out["burst"].vmr_milli == 3000
    assert out["burst"].n_docs == 1


def test_bloom_skipping_no_false_negatives(spark):
    """Present keys always scan at least their true file; absent
    keys never report matches."""
    from ferenda_spark.operators.store import bloom_file_skipping
    rows = spark.createDataFrame(
        [(i // 10, "key%d" % i) for i in range(100)],
        "file_id long, url string")
    probes = spark.createDataFrame(
        [("key5",), ("key55",), ("nope1",), ("nope2",)],
        "probe string")
    out = {r.probe: r for r in
           bloom_file_skipping(rows, probes).collect()}
    assert len(out) == 4
    for p in ("key5", "key55"):
        assert out[p].n_matching == 1
        assert out[p].n_scanned >= 1          # never skips the truth
        assert out[p].n_false_positive == out[p].n_scanned - 1
    for p in ("nope1", "nope2"):
        assert out[p].n_matching == 0
        assert out[p].n_false_positive == out[p].n_scanned
    assert all(r.n_files == 10 for r in out.values())
