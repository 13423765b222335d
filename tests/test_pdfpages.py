"""PDF layout model + analyzer vs the reference's own fixtures and
its testPDFAnalyze/testPDFReader assertions: every concrete number the
reference asserts over lipsum.xml reproduces, and the pdf2xml textbox
model matches test_basic's structure over the cached sample
intermediate."""

import os

import pytest

from ferenda_spark.pdfpages import PdfAnalyzer, parse_pdf2xml

PDFA = "/root/reference/test/files/pdfanalyze"
PDFR = "/root/reference/test/files/pdfreader/intermediate"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(PDFA), reason="reference fixtures not present")


@pytest.fixture(scope="module")
def lipsum():
    return PdfAnalyzer(parse_pdf2xml(
        open(PDFA + "/lipsum.xml", encoding="utf-8").read()))


def test_documents(lipsum):
    assert lipsum.documents == [(0, 3, "main")]


def test_vcounters(lipsum):
    v = lipsum.count_vertical_margins(0, 3)
    assert set(v) == {"bottommargin", "topmargin", "pageheight"}
    assert max(v["pageheight"]) == 1262
    assert v["bottommargin"][76] == 22
    assert v["topmargin"][1167] == 3     # pagenumbers on 3 pages


def test_hcounters(lipsum):
    h = lipsum.count_horizontal_margins(0, 3)
    assert set(h) == {"leftmargin", "rightmargin", "leftmargin_even",
                      "rightmargin_even", "pagewidth"}
    assert set(h["leftmargin"]) == {135, 775, 778}
    assert list(h["leftmargin_even"]) == [108]
    assert h["rightmargin"].most_common(1)[0][0] == 784


def test_stylecounters(lipsum):
    assert dict(lipsum.count_styles(1, 2)) == {
        ("Comic Sans MS", 14): 5922,
        ("Cambria,Bold", 14): 133,
        ("Cambria,Bold", 17): 128,
        ("Cambria,Bold", 19): 61}


def test_analyze_hmargins(lipsum):
    h = lipsum.count_horizontal_margins(0, 3)
    assert lipsum.analyze_horizontal_margins(h) == {
        "leftmargin": 135, "leftmargin_even": 108, "pagewidth": 892,
        "rightmargin": 780, "rightmargin_even": 760}


def test_analyze_vmargins(lipsum):
    v = lipsum.count_vertical_margins(0, 3)
    assert lipsum.analyze_vertical_margins(v) == {
        "bottommargin": 1149, "pageheight": 1262, "topmargin": 53}
    # doubled threshold finds the real (wordy) header zone
    lipsum.header_significance_threshold = 0.004
    try:
        assert lipsum.analyze_vertical_margins(v)["topmargin"] == 107
    finally:
        lipsum.header_significance_threshold = 0.002


def test_analyze_styles(lipsum):
    assert lipsum.analyze_styles(lipsum.count_styles(1, 3)) == {
        "default": {"family": "Comic Sans MS", "size": 14},
        "h1": {"family": "Cambria,Bold", "size": 19},
        "h2": {"family": "Cambria,Bold", "size": 17},
        "h3": {"family": "Cambria,Bold", "size": 14}}


def test_metrics_combined(lipsum):
    m = lipsum.metrics(startpage=1)
    assert m["default"] == {"family": "Comic Sans MS", "size": 14}
    assert m["pagewidth"] == 892
    assert m["scanned_source"] is False


# --------------------- pdf2xml textbox model (testPDFReader shape)

def test_sample_intermediate_model():
    pages = parse_pdf2xml(open(PDFR + "/index.xml",
                               encoding="utf-8").read())
    assert len(pages) == 1
    page = pages[0]
    assert (page.width, page.height) == (892, 1263)
    assert str(page[0]) == "Document title "
    box = page[1]           # whitespace-only box was dropped
    assert str(box) == "This is a simple document in PDF format. "
    assert [(e.tag, e.text) for e in box.elements] == [
        (None, "This is a "), ("i", "simple "), ("ib", "document"),
        (None, " in PDF format. ")]
    assert (box.font.family, box.font.size, box.font.color,
            box.font.id) == ("Cambria", 16, "#000000", "1")
    assert len(list(page.boundingbox(190, 130, 230, 460))) == 1


def test_real_world_proposition_parses():
    """The real-world intermediate (the first page of a 1997
    government proposition) parses despite the raw control characters
    pdftotext leaks into it."""
    pages = parse_pdf2xml(open(PDFR + "/prop_1997_98_44.xml",
                               encoding="utf-8").read())
    assert len(pages) == 1
    assert len(pages[0]) > 30
    assert any("personuppgifter" in str(b).lower() for b in pages[0])


def test_spark_pdf_stage(tmp_path):
    """Stage parses good documents and quarantines garbage instead of
    failing the batch."""
    from ferenda_spark.session import get_spark
    from ferenda_spark.pdfpages import pdf_textboxes
    spark = get_spark(app="pdf-tests", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    xml = open(PDFA + "/lipsum.xml", encoding="utf-8").read()
    docs = spark.createDataFrame(
        [("u1", xml), ("u2", "this is not xml at all")],
        "url string, xml string")
    rows = pdf_textboxes(docs).collect()
    good = [r for r in rows if r.url == "u1"]
    assert {r.page for r in good} == {1, 2, 3}
    assert any("Lorem ipsum" in r.text for r in good)
    assert all(r.font_family for r in good)
    bad = [r for r in rows if r.url == "u2"]
    assert len(bad) == 1 and bad[0].error and bad[0].page == -1
