"""Perceptual dHash: byte-level kernel on handcrafted rasters,
undecodable-blob quarantine, the banding pigeonhole recall guarantee,
and planted-pair recovery on the synthesized corpus."""

import pytest

from ferenda_spark.operators.multimodal import (DHASH_H, DHASH_W,
                                                dhash_hamming_pairs,
                                                gray_dhash_bytes,
                                                image_dhash,
                                                synth_gray_blobs)
from ferenda_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="tests-dhash", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _blob(w, h, px):
    return b"GRAY" + bytes([w, h]) + bytes(px)


def test_kernel_handcrafted():
    """3x2 raster, rows [5,9,1] and [7,7,8]: bits are (5>9)=0,
    (9>1)=1 at positions 0,1 and (7>7)=0, (7>8)=0 at 2,3 -> 0b10."""
    assert gray_dhash_bytes(_blob(3, 2, [5, 9, 1, 7, 7, 8])) == 2


def test_kernel_monotone_rows():
    """Strictly decreasing row -> all bits set; increasing -> none."""
    dec = gray_dhash_bytes(_blob(4, 1, [9, 7, 5, 3]))
    inc = gray_dhash_bytes(_blob(4, 1, [3, 5, 7, 9]))
    assert dec == 0b111 and inc == 0


def test_kernel_quarantines_bad_input():
    assert gray_dhash_bytes(b"JUNK" + bytes(10)) is None
    assert gray_dhash_bytes(_blob(9, 7, [0] * 62)) is None   # truncated
    assert gray_dhash_bytes(b"") is None


def test_image_dhash_drops_undecodable(spark):
    docs = spark.createDataFrame(
        [(0, _blob(3, 1, [1, 2, 3])), (1, b"nope")],
        "doc_id long, content binary")
    rows = image_dhash(docs).collect()
    assert [(r.doc_id, r.dhash) for r in rows] == [(0, 0)]


def test_planted_pairs_recovered(spark):
    """Every (2k, 2k+1) pair sits at Hamming <= 2 < bands=4, so the
    pigeonhole guarantee makes banding recall exactly 1.0."""
    docs = spark.range(100).withColumnRenamed("id", "doc_id")
    h = image_dhash(synth_gray_blobs(docs))
    assert h.count() == 100
    pairs = {(r.doc_a, r.doc_b): r.distance
             for r in dhash_hamming_pairs(h).collect()}
    for k in range(50):
        assert (2 * k, 2 * k + 1) in pairs
        assert pairs[(2 * k, 2 * k + 1)] <= 2


def test_raster_dims_match_module_constants(spark):
    docs = spark.range(3).withColumnRenamed("id", "doc_id")
    blob = bytes(synth_gray_blobs(docs).collect()[0].content)
    assert blob[:4] == b"GRAY"
    assert (blob[4], blob[5]) == (DHASH_W, DHASH_H)
    assert len(blob) == 6 + DHASH_W * DHASH_H
