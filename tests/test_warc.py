"""WARC ingestion (ferenda_spark/warc.py): writer/reader roundtrip in
both shipped layouts, HTTP splitting, record-type filtering, and the
file-granular Spark read path."""

import zlib

import pytest

from ferenda_spark.session import get_spark
from ferenda_spark.warc import (build_warc, iter_warc, pages_from_warc,
                                read_warc, warc_records)


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="warc-tests", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s

RECS = [
    {"warc_type": "warcinfo", "url": "urn:x-info",
     "warc_ts": "2024-01-01T00:00:00Z", "payload": b"software: test"},
    {"warc_type": "response", "url": "https://ex.org/a",
     "warc_ts": "2024-01-01T00:00:01Z", "payload": b"<html>A</html>",
     "http_status": 200, "content_type": "text/html"},
    {"warc_type": "response", "url": "https://ex.org/gone",
     "warc_ts": "2024-01-01T00:00:02Z", "payload": b"nope",
     "http_status": 404, "content_type": "text/html"},
    {"warc_type": "response", "url": "https://ex.org/img",
     "warc_ts": "2024-01-01T00:00:03Z", "payload": b"\x89PNG...",
     "http_status": 200, "content_type": "image/png"},
    {"warc_type": "request", "url": "https://ex.org/a",
     "warc_ts": "2024-01-01T00:00:04Z",
     "payload": b"GET /a HTTP/1.1\r\n"},
]


@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip_layouts(gz):
    data = build_warc(RECS, gzip_per_record=gz)
    got = list(iter_warc(data))
    assert [r["warc_type"] for r in got] == [
        "warcinfo", "response", "response", "response", "request"]
    assert [r["url"] for r in got] == [r["url"] for r in RECS]
    assert [r["warc_ts"] for r in got] == [r["warc_ts"] for r in RECS]
    assert got[1]["http_status"] == 200
    assert got[1]["content_type"] == "text/html"
    assert got[1]["payload"] == b"<html>A</html>"
    assert got[2]["http_status"] == 404
    # payload bytes survive exactly, including binary image content
    assert got[3]["payload"] == b"\x89PNG..."
    # non-response records carry no HTTP status
    assert got[0]["http_status"] is None


def test_gz_members_are_independent():
    """The .warc.gz layout is one gzip member per record — a reader
    may start at any member boundary (Common-Crawl's split model)."""
    data = build_warc(RECS[:3], gzip_per_record=True)
    # decompressing ONLY the first member yields record 1's bytes and
    # leaves the rest as unused trailing data (a reader can therefore
    # resume at any member boundary)
    d = zlib.decompressobj(16 + zlib.MAX_WBITS)
    first = d.decompress(data)
    assert first.startswith(b"WARC/1.0")
    assert b"urn:x-info" in first and b"ex.org/a" not in first
    assert d.unused_data[:2] == b"\x1f\x8b"


def test_garbage_raises():
    with pytest.raises(ValueError):
        list(iter_warc(b"HTTP/1.1 200 OK\r\n\r\nnot a warc"))


def test_spark_read_and_pages(spark, tmp_path):
    (tmp_path / "seg-0.warc").write_bytes(build_warc(RECS))
    (tmp_path / "seg-1.warc.gz").write_bytes(
        build_warc([{"warc_type": "response", "url": "https://ex.org/b",
                     "warc_ts": "2024-01-02T00:00:00Z",
                     "payload": b"<html>B</html>", "http_status": 200,
                     "content_type": "text/html; charset=utf-8"}],
                    gzip_per_record=True))
    recs = read_warc(spark, str(tmp_path))
    assert recs.count() == 6
    pages = pages_from_warc(recs).collect()
    # only 200 text/html responses survive (charset parameter allowed)
    assert sorted(r.url for r in pages) == ["https://ex.org/a",
                                            "https://ex.org/b"]
    by_url = {r.url: r for r in pages}
    assert bytes(by_url["https://ex.org/a"].html) == b"<html>A</html>"
    assert str(by_url["https://ex.org/b"].warc_ts) == \
        "2024-01-02 00:00:00"
    assert by_url["https://ex.org/a"].text is None
    # schema matches the engine's input table (corpus.PAGES_SCHEMA)
    from ferenda_spark.corpus import PAGES_SCHEMA
    want = [c.split()[0] for c in PAGES_SCHEMA.split(", ")]
    assert [f.name for f in pages_from_warc(recs).schema.fields] == want


def test_records_dataframe_shape(spark):
    df = spark.createDataFrame(
        [("f0", bytearray(build_warc(RECS)))],
        "path string, content binary")
    out = warc_records(df)
    rows = sorted(out.collect(), key=lambda r: r.record_idx)
    assert [r.record_idx for r in rows] == [0, 1, 2, 3, 4]
    assert rows[1].http_status == 200 and rows[1].warc_file == "f0"
