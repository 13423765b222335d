"""DUST-rule mining edge cases: single-value groups are not
experiments, partial significance ppm, query-less URLs ignored,
host scoping."""

import pytest

from ferenda_spark.operators.crawl import param_significance
from ferenda_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="tests-paramsig", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _urls(spark, rows):
    return spark.createDataFrame(rows, "url string, content_hash string")


def test_session_id_droppable_page_significant(spark):
    rows = [("https://a.org/x?page=%d&sid=%s" % (p, s),
             "h%d" % p)
            for p in (1, 2) for s in ("u", "v")]
    got = {r.param: r for r in
           param_significance(_urls(spark, rows)).collect()}
    assert got["sid"].droppable and got["sid"].significance_ppm == 0
    assert not got["page"].droppable
    assert got["page"].significance_ppm == 1000000
    assert got["page"].n_groups == 2 and got["page"].n_varying == 2


def test_single_value_groups_are_not_experiments(spark):
    """A param seen with only one value per residual group yields no
    evidence at all — absent from the output."""
    rows = [("https://a.org/x?only=1", "h1"),
            ("https://a.org/y?only=1", "h2")]
    assert param_significance(_urls(spark, rows)).count() == 0


def test_partial_significance_fraction(spark):
    """`v` varies content on path /x but not on /y: 1 of 2
    experiments -> significance 0.5, not droppable."""
    rows = [("https://a.org/x?v=1", "hx1"), ("https://a.org/x?v=2", "hx2"),
            ("https://a.org/y?v=1", "hy"), ("https://a.org/y?v=2", "hy")]
    got = {r.param: r for r in
           param_significance(_urls(spark, rows)).collect()}
    assert got["v"].n_groups == 2 and got["v"].n_varying == 1
    assert got["v"].significance_ppm == 500000
    assert not got["v"].droppable


def test_queryless_urls_ignored_and_host_scoped(spark):
    """No query -> no rows; the same param name on two hosts is two
    independent verdicts."""
    rows = [("https://a.org/x", "h0"),
            ("https://a.org/p?s=1", "same"), ("https://a.org/p?s=2", "same"),
            ("https://b.org/p?s=1", "h1"), ("https://b.org/p?s=2", "h2")]
    got = {(r.host, r.param): r.droppable
           for r in param_significance(_urls(spark, rows)).collect()}
    assert got == {("a.org", "s"): True, ("b.org", "s"): False}
