"""EXIF TIFF/IFD kernel and image-text pair mining — hand-built
byte streams (both endiannesses, truncation, garbage) and hand-built
HTML (nesting, missing attrs, stoplist)."""

import struct

import pytest

from ferenda_spark.operators.multimodal import (ALT_STOPLIST,
                                                exif_meta_bytes)
from ferenda_spark.session import get_spark


def _tiff(endian, entries, data=b""):
    """Assemble a TIFF block: header + one IFD + trailing data."""
    e = "<" if endian == b"II" else ">"
    out = endian + struct.pack(e + "HI", 42, 8)
    out += struct.pack(e + "H", len(entries))
    for tag, typ, cnt, val in entries:
        out += struct.pack(e + "HHI", tag, typ, cnt) + val
    out += struct.pack(e + "I", 0)
    return out + data


def _jpeg(tiff):
    payload = b"Exif\x00\x00" + tiff
    return (b"\xff\xd8\xff\xe1" + struct.pack(">H", len(payload) + 2)
            + payload + b"\xff\xd9")


def test_exif_little_endian_inline():
    t = _tiff(b"II", [
        (0x0100, 4, 1, struct.pack("<I", 640)),
        (0x0101, 4, 1, struct.pack("<I", 480)),
        (0x0112, 3, 1, struct.pack("<HH", 6, 0)),
    ])
    m = exif_meta_bytes(_jpeg(t))
    assert (m["width"], m["height"], m["orientation"]) == (640, 480, 6)
    assert m["x_resolution"] is None


def test_exif_big_endian_offset_values():
    """MM byte order with RATIONAL + ASCII at offsets (the layout
    real cameras emit)."""
    # header 8 + count 2 + 3*12 + next 4 = 50; rational at 50,
    # ascii at 58
    dt = b"2021:05:04 03:02:01\x00"
    t = _tiff(b"MM", [
        (0x0112, 3, 1, struct.pack(">HH", 8, 0)),
        (0x011A, 5, 1, struct.pack(">I", 50)),
        (0x0132, 2, 20, struct.pack(">I", 58)),
    ], data=struct.pack(">II", 300, 2) + dt)
    m = exif_meta_bytes(_jpeg(t))
    assert m["orientation"] == 8
    assert m["x_resolution"] == 150
    assert m["datetime_original"] == "2021:05:04 03:02:01"
    assert m["width"] is None


def test_exif_garbage_and_truncation():
    assert exif_meta_bytes(b"") is None
    assert exif_meta_bytes(b"\x89PNG\r\n\x1a\n") is None
    assert exif_meta_bytes(b"\xff\xd8\xff\xd9") is None        # no APP1
    good = _jpeg(_tiff(b"II", [(0x0112, 3, 1,
                                struct.pack("<HH", 3, 0))]))
    assert exif_meta_bytes(good)["orientation"] == 3
    for cut in range(len(good)):          # no crash at any truncation
        m = exif_meta_bytes(good[:cut])
        assert m is None or isinstance(m, dict)


def test_exif_skips_other_segments():
    """APP0 (JFIF) before APP1 must be walked over, not mistaken."""
    app0 = b"\xff\xe0" + struct.pack(">H", 8) + b"JFIF\x00\x00"
    t = _tiff(b"II", [(0x0112, 3, 1, struct.pack("<HH", 2, 0))])
    payload = b"Exif\x00\x00" + t
    b = (b"\xff\xd8" + app0 + b"\xff\xe1"
         + struct.pack(">H", len(payload) + 2) + payload + b"\xff\xd9")
    assert exif_meta_bytes(b)["orientation"] == 2


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="tests-exif-alt", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_image_text_pairs_gate(spark):
    from ferenda_spark.operators.multimodal import image_text_pairs
    html = (b"<html><body>"
            b'<div><img src="a.jpg" alt="a red bicycle"></div>'
            b'<img src="b.jpg" alt="logo">'
            b'<img src="c.jpg" alt="stock photo">'
            b'<img src="d.jpg">'
            b'<p><img src="e.jpg" alt="two dogs playing"></p>'
            b"</body></html>")
    pages = spark.createDataFrame([("u1", bytearray(html))],
                                  "url string, html binary")
    out = {r.img_src: r for r in image_text_pairs(pages).collect()}
    assert len(out) == 5
    assert out["a.jpg"].kept and out["a.jpg"].n_alt_words == 3
    assert not out["b.jpg"].kept            # 1 word
    assert not out["c.jpg"].kept            # stoplisted exact match
    assert "stock photo" in ALT_STOPLIST
    assert not out["d.jpg"].kept and out["d.jpg"].alt_text is None
    assert out["e.jpg"].kept
    # document order preserved
    assert [out[s].img_idx for s in
            ("a.jpg", "b.jpg", "c.jpg", "d.jpg", "e.jpg")] == list(range(5))
