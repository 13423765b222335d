"""jusText-style main-content extraction — DOM segmentation and
smoothing edge cases (nested blocks, mixed content, whitespace-only
blocks, all-boilerplate pages, threshold boundaries) the closed-form
driver plants don't exercise."""

import pytest

from ferenda_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="tests-content-blocks", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, h.encode("utf-8")) for u, h in rows],
        "url string, html binary")


def _blocks(spark, html):
    from ferenda_spark.operators.cleaning import content_blocks
    return (content_blocks(_pages(spark, [("u", html)]))
            .orderBy("block_id").collect())


GOOD = " ".join("w%d" % i for i in range(25))


def test_nested_block_yields_only_leaf(spark):
    rows = _blocks(spark, "<div><p>inner text</p></div>")
    assert [(r.tag, r.text) for r in rows] == [("p", "inner text")]


def test_mixed_content_in_nonleaf_is_dropped(spark):
    """Text directly inside a container that also holds block
    children belongs to no block (jusText segmentation)."""
    rows = _blocks(spark, "<div>stray <p>kept</p></div>")
    assert [r.text for r in rows] == ["kept"]


def test_whitespace_only_block_emits_no_row(spark):
    rows = _blocks(spark, "<p>  \n </p><p>real</p>")
    assert [(r.block_id, r.text) for r in rows] == [(0, "real")]


def test_inline_markup_stays_in_block(spark):
    rows = _blocks(spark, "<p>a <b>bold</b> <span>word</span></p>")
    assert [r.text for r in rows] == ["a bold word"]


def test_link_density_boundary_not_bad_at_third(spark):
    """link_permille uses integer floor division: 1 link char out of
    3 = 333 permille, which is NOT > the 333 threshold."""
    from ferenda_spark.operators.cleaning import (classify_blocks,
                                                  content_blocks)
    rows = (classify_blocks(content_blocks(
        _pages(spark, [("u", "<p><a href='/'>a</a> bc</p>")])))
        .collect())
    assert rows[0].link_permille == 250      # 1 of "a bc"(4 chars)
    assert rows[0].label_cf == "short"


def test_short_between_two_goods_becomes_good(spark):
    from ferenda_spark.operators.cleaning import (classify_blocks,
                                                  content_blocks,
                                                  smooth_blocks)
    html = "<p>%s</p><p>mid</p><p>%s</p>" % (GOOD, GOOD)
    rows = (smooth_blocks(classify_blocks(content_blocks(
        _pages(spark, [("u", html)]))))
        .orderBy("block_id").collect())
    assert [r.label for r in rows] == ["good", "good", "good"]


def test_all_boilerplate_page_keeps_row(spark):
    from ferenda_spark.operators.cleaning import main_content
    html = ('<div><a href="/">x</a></div>'
            '<div><a href="/">y</a></div>')
    rows = main_content(_pages(spark, [("u", html)])).collect()
    assert len(rows) == 1
    assert rows[0].n_good == 0 and rows[0].main_text == ""
    assert rows[0].n_blocks == 2


def test_near_at_page_edge_without_good_neighbor_falls_bad(spark):
    from ferenda_spark.operators.cleaning import (classify_blocks,
                                                  content_blocks,
                                                  smooth_blocks)
    rows = (smooth_blocks(classify_blocks(content_blocks(
        _pages(spark, [("u", "<p>five words sit right here</p>")])))))
    r = rows.collect()[0]
    assert r.label_cf == "near" and r.label == "bad"
