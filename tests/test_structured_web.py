"""Microdata, hreflang alternates, contrastive pairs — the messy-HTML
edge cases (misnesting, multi-token itemprop, missing itemtype,
multi-token rel) the closed-form driver plants don't exercise."""

import pytest

from pyspark.sql import functions as F

from ferenda_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="tests-structured-web", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, h.encode("utf-8")) for u, h in rows],
        "url string, html binary")


RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def test_microdata_value_rules_and_multiprop(spark):
    """meta@content / img@src win over text; a space-separated
    itemprop emits one row per name."""
    from ferenda_spark.operators.extract import microdata_triples
    html = ('<div itemscope itemtype="https://schema.org/Book">'
            '<meta itemprop="isbn" content="123"/>'
            '<img itemprop="image thumbnail" src="/i.png"/>'
            '<span itemprop="name">A <b>Title</b></span></div>')
    rows = microdata_triples(_pages(spark, [("u", html)])).collect()
    got = {(r.pred, r.obj) for r in rows}
    assert ("https://schema.org/isbn", "123") in got
    assert ("https://schema.org/image", "/i.png") in got
    assert ("https://schema.org/thumbnail", "/i.png") in got
    assert ("https://schema.org/name", "A Title") in got
    assert (RDF_TYPE, "https://schema.org/Book") in got


def test_microdata_no_itemtype_uses_urn(spark):
    from ferenda_spark.operators.extract import microdata_triples
    html = '<p itemscope><span itemprop="k">v</span></p>'
    rows = microdata_triples(_pages(spark, [("u", html)])).collect()
    assert {(r.pred, r.obj) for r in rows} == {("urn:prop:k", "v")}


def test_microdata_two_top_items_get_distinct_ids(spark):
    from ferenda_spark.operators.extract import microdata_triples
    html = ('<div itemscope itemtype="https://s/T"><span itemprop="a">1'
            "</span></div>"
            '<div itemscope itemtype="https://s/T"><span itemprop="a">2'
            "</span></div>")
    rows = microdata_triples(_pages(spark, [("u", html)])).collect()
    ids = {r.item_id for r in rows}
    assert ids == {"u#item0", "u#item1"}


def test_microdata_malformed_html_no_crash(spark):
    from ferenda_spark.operators.extract import microdata_triples
    pages = _pages(spark, [
        ("a", "<div itemscope><span itemprop='x'>ok"),  # unclosed
        ("b", "\x00\xff garbage < > <"),
        ("c", "")])
    rows = microdata_triples(pages).collect()
    assert {(r.url, r.obj) for r in rows} == {("a", "ok")}


def test_hreflang_multi_token_rel_and_missing_attrs(spark):
    """rel="alternate nofollow" still counts; stylesheet alternates
    and links missing hreflang/href don't."""
    from ferenda_spark.operators.extract import hreflang_alternates
    html = ('<head>'
            '<link rel="alternate nofollow" hreflang="fr" href="/fr"/>'
            '<link rel="alternate stylesheet" href="/s.css"/>'
            '<link rel="alternate" hreflang="de"/>'
            '<link rel="canonical" hreflang="en" href="/en"/>'
            "</head>")
    rows = hreflang_alternates(_pages(spark, [("u", html)])).collect()
    assert [(r.hreflang, r.href) for r in rows] == [("fr", "/fr")]


def test_contrastive_pairs_labels_split(spark):
    """Identical docs label positive; a banding near-miss labels
    hard_negative — and every candidate gets exactly one label."""
    from ferenda_spark.operators.training import contrastive_pairs
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "alpha beta gamma delta epsilon zeta"),
         (3, "alpha beta gamma delta epsilon DIFFERENT")],
        "doc_id long, text string")
    rows = contrastive_pairs(docs, threshold=0.9).collect()
    by_pair = {(r.doc_a, r.doc_b): r.label for r in rows}
    assert by_pair[(1, 2)] == "positive"
    for (a, b), lab in by_pair.items():
        if (a, b) != (1, 2):
            assert lab == "hard_negative"
    assert all(r.label in ("positive", "hard_negative") for r in rows)


def test_publication_dates_rejects_invalid_and_handles_empty(spark):
    from ferenda_spark.operators.extract import publication_dates
    docs = spark.createDataFrame([
        ("u", "posted 2020-03-15, rev 2021-01-02, bogus 2020-13-40 "
              "and 2020-02-30-ish is fine (day 30 matches the "
              "charset), but 2020-00-10 is not"),
        ("v", ""),
        ("w", None)], "url string, text string")
    out = {r.url: r for r in publication_dates(docs).collect()}
    assert out["u"].pub_date == "2020-02-30"  # charset-valid by design
    assert out["u"].last_date == "2021-01-02"
    assert out["u"].n_dates == 3
    assert out["v"].n_dates == 0 and out["v"].pub_date is None
    assert out["w"].pub_date is None


def test_publication_dates_embedded_in_longer_tokens(spark):
    """Word-boundary anchors: digits glued on either side must not
    produce a match."""
    from ferenda_spark.operators.extract import publication_dates
    docs = spark.createDataFrame(
        [("u", "id 12020-01-01 and 2020-01-019 but ok 1999-12-31.")],
        "url string, text string")
    r = publication_dates(docs).collect()[0]
    assert r.n_dates == 1 and r.pub_date == "1999-12-31"
