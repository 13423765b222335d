"""Asymmetric containment and domain-suffix blocklist edge cases."""

import pytest

from ferenda_spark.operators.crawl import blocklist_filter
from ferenda_spark.operators.dedup import containment_pairs
from ferenda_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="tests-contain-block", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_excerpt_contained_but_not_reverse(spark):
    """A 5-token prefix of a 12-token doc: containment 1.0 one way,
    well under threshold the other way; Jaccard would miss both."""
    big = "a b c d e f g h i j k l"
    docs = spark.createDataFrame([(1, big), (2, "a b c d e")],
                                 "doc_id long, text string")
    got = {(r.doc_a, r.doc_b): (r.n_common, r.containment)
           for r in containment_pairs(docs, n=3,
                                      threshold=0.5).collect()}
    # doc 2 has 3 shingles, all inside doc 1's 10
    assert got == {(2, 1): (3, 1.0)}
    low = {(r.doc_a, r.doc_b): r.containment
           for r in containment_pairs(docs, n=3,
                                      threshold=0.0).collect()}
    assert low[(1, 2)] == pytest.approx(0.3)


def test_containment_hot_shingle_guard_consistent(spark):
    """A shingle present in > max_shingle_freq docs is dropped from
    numerator AND denominator."""
    docs = spark.createDataFrame(
        [(i, "x y z") for i in range(4)] + [(99, "x y z p q r")],
        "doc_id long, text string")
    rows = containment_pairs(docs, n=3, threshold=0.9,
                             max_shingle_freq=3).collect()
    # "x y z" is in 5 docs -> guarded away; nothing else is shared
    assert rows == []


def test_blocklist_suffix_depth_and_specificity(spark):
    urls = spark.createDataFrame(
        [("https://a.b.spam.test/x",), ("https://spam.test/y",),
         ("https://notspam.test/z",), ("https://ok.net/w",)],
        "url string")
    bl = spark.createDataFrame([("spam.test",), ("b.spam.test",)],
                               "domain string")
    got = {r.url: (r.blocked, r.matched_suffix)
           for r in blocklist_filter(urls, bl).collect()}
    # deepest host matches BOTH rules -> the longer one is reported
    assert got["https://a.b.spam.test/x"] == (True, "b.spam.test")
    assert got["https://spam.test/y"] == (True, "spam.test")
    # "notspam.test" must NOT match "spam.test" (label boundary)
    assert got["https://notspam.test/z"] == (False, None)
    assert got["https://ok.net/w"] == (False, None)
