"""OpenGraph / Twitter-card extraction and card resolution — the
attribute-soup edge cases (og-in-name, property+name on one tag,
missing content, body-placed metas, article:/fb: extension
namespaces) the closed-form driver plants don't exercise."""

import pytest

from ferenda_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="tests-social-meta", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, h.encode("utf-8")) for u, h in rows],
        "url string, html binary")


def _tags(spark, html, url="u"):
    from ferenda_spark.operators.extract import social_meta_tags
    return social_meta_tags(_pages(spark, [(url, html)])).collect()


def test_og_in_name_attribute_is_accepted(spark):
    """Much of the wild web writes <meta name="og:title"> — the
    extractor must accept the prefix from either attribute."""
    rows = _tags(spark, '<meta name="og:title" content="T"/>')
    assert [(r.ns, r.prop, r.content) for r in rows] == [
        ("og", "og:title", "T")]


def test_property_wins_over_name_on_one_tag(spark):
    rows = _tags(spark, '<meta property="og:title" '
                        'name="twitter:title" content="T"/>')
    assert [(r.ns, r.prop) for r in rows] == [("og", "og:title")]


def test_missing_content_and_noise_metas_skipped(spark):
    rows = _tags(spark,
                 '<meta property="og:title"/>'
                 '<meta name="viewport" content="w"/>'
                 '<meta charset="utf-8"/>'
                 '<meta property="og:type" content="article"/>')
    assert [(r.prop, r.pos) for r in rows] == [("og:type", 0)]


def test_body_metas_and_extension_namespaces(spark):
    """Metas outside <head> still count (FB's crawler scans the whole
    doc); article:/fb: map into the og namespace."""
    rows = _tags(spark,
                 '<head><meta property="og:title" content="A"/></head>'
                 '<body><meta property="article:tag" content="x"/>'
                 '<meta property="fb:app_id" content="1"/></body>')
    assert [(r.ns, r.prop, r.pos) for r in rows] == [
        ("og", "og:title", 0), ("og", "article:tag", 1),
        ("og", "fb:app_id", 2)]


def test_empty_content_kept(spark):
    """content="" is present-but-empty, not missing — OG consumers
    see an empty title, so the extractor must too."""
    rows = _tags(spark, '<meta property="og:title" content=""/>')
    assert [(r.prop, r.content) for r in rows] == [("og:title", "")]


def test_resolve_precedence_og_first_wins(spark):
    from ferenda_spark.operators.extract import (resolve_page_cards,
                                                 social_meta_tags)
    html = ('<meta name="twitter:title" content="TW"/>'
            '<meta property="og:title" content="OG1"/>'
            '<meta property="og:title" content="OG2"/>'
            '<meta name="twitter:image" content="ti.png"/>')
    cards = resolve_page_cards(
        social_meta_tags(_pages(spark, [("u", html)]))).collect()
    got = {r.field: (r.content, r.src_ns) for r in cards}
    # og beats the EARLIER twitter tag; first og occurrence wins
    assert got["title"] == ("OG1", "og")
    # no og:image -> twitter fallback
    assert got["image"] == ("ti.png", "twitter")
    assert set(got) == {"title", "image"}


def test_resolve_unmapped_props_dropped(spark):
    from ferenda_spark.operators.extract import (resolve_page_cards,
                                                 social_meta_tags)
    html = ('<meta property="og:locale" content="en_US"/>'
            '<meta property="og:site_name" content="S"/>')
    cards = resolve_page_cards(
        social_meta_tags(_pages(spark, [("u", html)]))).collect()
    assert {r.field: r.content for r in cards} == {"site_name": "S"}
