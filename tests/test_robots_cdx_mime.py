"""robots.txt group selection, SURT/CDX keys, magic-byte MIME —
the edge cases the closed-form driver corpus doesn't plant."""

import pytest

from ferenda_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="tests-robots-cdx", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _robots(spark, host, txt):
    return spark.createDataFrame(
        [(host, txt)], "host string, robots_txt string")


def test_robots_exact_group_shadows_star(spark):
    from ferenda_spark.operators.crawl import parse_robots
    txt = ("User-agent: *\nDisallow: /a\n\n"
           "User-agent: MyBot\nDisallow: /b\n")
    rows = parse_robots(_robots(spark, "h", txt),
                        agent="mybot").collect()
    assert [(r.path_prefix, r.allow) for r in rows] == [("/b", False)]


def test_robots_multiple_matching_groups_combine(spark):
    """RFC 9309: two groups naming the same agent merge their rules."""
    from ferenda_spark.operators.crawl import parse_robots
    txt = ("User-agent: bot\nDisallow: /a\n\n"
           "User-agent: bot\nAllow: /a/ok\nCrawl-delay: 3\n")
    rows = (parse_robots(_robots(spark, "h", txt), agent="bot")
            .orderBy("rule_no").collect())
    assert [(r.path_prefix, r.allow) for r in rows] == [
        ("/a", False), ("/a/ok", True)]


def test_robots_stacked_user_agents_share_group(spark):
    """Consecutive User-agent lines head ONE group."""
    from ferenda_spark.operators.crawl import parse_robots
    txt = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
    rows = parse_robots(_robots(spark, "h", txt), agent="b").collect()
    assert [(r.path_prefix, r.allow) for r in rows] == [("/x", False)]


def test_robots_empty_disallow_is_no_rule(spark):
    """``Disallow:`` with no value means allow-all — emits nothing."""
    from ferenda_spark.operators.crawl import parse_robots
    txt = "User-agent: *\nDisallow:\n"
    assert parse_robots(_robots(spark, "h", txt)).count() == 0


def test_robots_meta_delay_min_and_sitemaps(spark):
    from ferenda_spark.operators.crawl import robots_host_meta
    txt = ("Sitemap: https://h/s1.xml\n"
           "User-agent: bot\nCrawl-delay: 5\n\n"
           "User-agent: bot\nCrawl-delay: 1.5\n"
           "Sitemap: https://h/s2.xml\n")
    rows = (robots_host_meta(_robots(spark, "h", txt), agent="bot")
            .orderBy("sitemap_no").collect())
    assert [r.sitemap for r in rows] == [
        "https://h/s1.xml", "https://h/s2.xml"]
    assert all(r.crawl_delay_ms == 1500 for r in rows)


def test_robots_no_match_no_star_yields_nothing(spark):
    from ferenda_spark.operators.crawl import (parse_robots,
                                               robots_host_meta)
    txt = "User-agent: other\nDisallow: /\n"
    df = _robots(spark, "h", txt)
    assert parse_robots(df, agent="bot").count() == 0
    r = robots_host_meta(df, agent="bot").collect()[0]
    assert r.crawl_delay_ms is None and r.sitemap is None


def test_surt_key_subdomain_contiguity(spark):
    """Subdomains of one registrable domain sort adjacently."""
    import pyspark.sql.functions as F
    from ferenda_spark.operators.crawl import surt_key
    df = spark.createDataFrame(
        [("https://a.example.org/p",),
         ("https://example.org/",),
         ("https://zzz.other.com/q",),
         ("https://b.example.org/p?x=1",)], "url string")
    keys = sorted(r.surt for r in df.select(
        surt_key(F.col("url")).alias("surt")).collect())
    assert keys == ["com,other,zzz)/q", "org,example)/",
                    "org,example,a)/p", "org,example,b)/p?x=1"]


def test_surt_key_non_url_passthrough(spark):
    import pyspark.sql.functions as F
    from ferenda_spark.operators.crawl import surt_key
    df = spark.createDataFrame([("not a url",)], "url string")
    assert df.select(surt_key(F.col("url")).alias("s")
                     ).collect()[0].s == "not a url"


def test_cdx_index_collapses_noise(spark):
    from ferenda_spark.operators.crawl import cdx_index
    df = spark.createDataFrame(
        [("https://WWW.Example.org:443/p?utm_source=x", "t1", "d1"),
         ("https://example.org/p", "t2", "d1"),
         ("https://example.org/p/", "t3", "d2")],
        "url string, warc_ts string, digest string")
    rows = cdx_index(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_captures, r.n_versions, r.first_ts, r.last_ts) == (
        3, 2, "t1", "t3")


def test_sniff_mime_magic_bytes(spark):
    import pyspark.sql.functions as F
    from ferenda_spark.operators.multimodal import sniff_mime
    cases = [
        (b"\xff\xd8\xff\xe0junk", "image/jpeg"),
        (b"\x89PNG\r\n\x1a\x0a...", "image/png"),
        (b"GIF87a;", "image/gif"),
        (b"RIFF\x24\x00\x00\x00WAVEfmt", "audio/wav"),
        (b"RIFF\x24\x00\x00\x00WEBPVP8", "image/webp"),
        (b"%PDF-1.7", "application/pdf"),
        (b"\x1f\x8b\x08\x00", "application/gzip"),
        (b"PK\x03\x04zip", "application/zip"),
        (b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1doc", "application/x-ole-storage"),
        (b"<?xml version", "application/xml"),
        (b"<!DOCTYPE html>", "text/html"),
        (b"<html><body>", "text/html"),
        (b"\x00\x01\x02", "application/octet-stream"),
        (b"", "application/octet-stream"),
    ]
    df = spark.createDataFrame(
        [(i, b) for i, (b, _) in enumerate(cases)],
        "i int, blob binary")
    got = {r.i: r.mime for r in df.select(
        "i", sniff_mime(F.col("blob")).alias("mime")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)
