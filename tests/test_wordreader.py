"""WordReader parity vs the reference's own fixtures and test
assertions (/root/reference/test/testWordReader.py): content-based
filetype detection, docx -> word/document.xml with the expected root
tag and text, mislabeled .doc resolving to docx, and the .doc branch
behaving like the reference's skip-when-no-antiword."""

import os
import xml.etree.ElementTree as ET

import pytest

from ferenda_spark.wordreader import (ExternalToolMissing, W_NS,
                                      detect_wordfile_type, docx_text,
                                      read_word)

FIXDIR = "/root/reference/test/files/wordreader"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXDIR), reason="reference fixtures not present")


def _data(name):
    return open(os.path.join(FIXDIR, name), "rb").read()


def test_docx_root_and_text():
    """testWordReader.test_docx: root element is w:document and the
    marker sentence is present."""
    kind, xml_bytes = read_word(_data("sample.docx"))
    assert kind == "docx"
    root = ET.fromstring(xml_bytes)
    assert root.tag == "{%s}document" % W_NS
    assert ("simple document in OOXML (.docx) format"
            in docx_text(_data("sample.docx")))


def test_mislabeled_doc_detected_as_docx():
    """testWordReader.test_mislabeled: a .docx mislabeled as .doc is
    detected by content."""
    data = _data("mislabeled.doc")
    assert detect_wordfile_type(data) == "docx"
    kind, _ = read_word(data)
    assert kind == "docx"
    assert "mis-labeled as a .doc file" in docx_text(data)


def test_legacy_doc_detection_and_tool_stub():
    """testWordReader.test_doc: the reference skips when antiword is
    absent; detection still identifies the OLE container, and the
    conversion raises the declared tool-missing error."""
    data = _data("sample.doc")
    assert detect_wordfile_type(data) == "doc"
    with pytest.raises(ExternalToolMissing):
        read_word(data)


def test_docx_breaks_and_tabs_separate_text():
    """w:br/w:tab contribute at their document position — text around
    a break must not run together."""
    from ferenda_spark.wordreader import W_NS, docx_xml_text
    xml = ("""<w:document xmlns:w="%s"><w:body><w:p>
        <w:r><w:t>Line one</w:t></w:r><w:r><w:br/></w:r>
        <w:r><w:t>Line two</w:t><w:tab/><w:t>after tab</w:t></w:r>
        </w:p></w:body></w:document>""" % W_NS).encode()
    text = docx_xml_text(xml)
    assert "Line one\nLine two after tab" == text


def test_spark_word_stage_quarantines_doc(request):
    """extract_word_blobs: docx rows yield text, .doc rows carry the
    quarantine error, garbage is flagged — one mapInPandas stage."""
    from ferenda_spark.session import get_spark
    from ferenda_spark.wordreader import extract_word_blobs
    spark = get_spark(app="wordreader-tests", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    rows = [("u:docx", bytearray(_data("sample.docx"))),
            ("u:mislabeled", bytearray(_data("mislabeled.doc"))),
            ("u:doc", bytearray(_data("sample.doc"))),
            ("u:junk", bytearray(b"not a word file"))]
    docs = spark.createDataFrame(rows, "url string, blob binary")
    got = {r.url: (r.filetype, r.error)
           for r in extract_word_blobs(docs).collect()}
    assert got["u:docx"] == ("docx", None)
    assert got["u:mislabeled"] == ("docx", None)
    assert got["u:doc"] == ("doc", "antiword unavailable")
    assert got["u:junk"][0] == "unknown"
