"""Wiki-dump ingestion vs the reference's own mediawiki fixtures
(test/files/repo/mediawiki/downloaded/*.xml): dump parsing, category
extraction (the dcterms:subject source), link extraction, and
markup stripping incl. nested templates and the linktrail merge."""

import os

import pytest

from ferenda_spark.wikitext import (parse_dump, strip_wikitext,
                                    wiki_categories, wiki_links)

FIXDIR = "/root/reference/test/files/repo/mediawiki/downloaded"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXDIR), reason="reference fixtures not present")


def _page(relpath):
    return parse_dump(open(os.path.join(FIXDIR, relpath),
                           encoding="utf-8").read())[0]


def test_concept_page_metadata_and_text():
    rec = _page("Anskaffarfrihet.xml")
    assert rec["title"] == "Anskaffarfrihet"
    assert rec["page_id"] == 2803
    assert rec["ts"] == "2009-09-29T22:18:43Z"
    assert wiki_categories(rec["text"]) == ["Tryckfrihetsrätt"]
    text = strip_wikitext(rec["text"])
    # the three body sentences the reference's parsed golden keeps
    assert "rätt att anskaffa uppgifter" in text
    assert "Anskaffarfriheten regleras i TF 1:1 4 st." in text
    assert "Synonym: Anskaffarskydd." in text
    assert "[[" not in text and "Kategori" not in text


def test_sfs_page_markup_stripping():
    """The heavy fixture: nested {{TranslatedAct}} template, bold
    markers, numbered lists, piped links, linktrail merges, external
    links — all stripped to the plaintext the pipeline tokenizes."""
    rec = _page("SFS/1998/204.xml")
    assert rec["title"] == "SFS/1998:204"
    assert wiki_categories(rec["text"]) == ["Lagar inom IT-rätt"]
    text = strip_wikitext(rec["text"])
    assert "{{" not in text and "}}" not in text      # template gone
    assert "TranslatedAct" not in text
    assert "'''" not in text and "[[" not in text
    # linktrail: [[personuppgift]]er -> personuppgifter,
    # [[registerförfattning]]ar -> registerförfattningar
    assert "hantera personuppgifter" in text
    assert "registerförfattningar" in text
    # piped link keeps the label
    assert "fysiska personer" in text
    # external link keeps its label text
    assert "datainspektionens föreskrifter (DIFS)" in text
    links = wiki_links(rec["text"])
    assert "juridisk person" in links and "SFS/1998:1191" in links
    assert not any(t.startswith("Kategori") for t in links)


def test_dump_with_multiple_pages():
    xml = """<mediawiki><page><title>A</title><id>1</id>
      <revision><timestamp>T1</timestamp>
      <text>aa [[B]]</text></revision></page>
      <page><title>B</title><id>2</id>
      <revision><timestamp>T2</timestamp>
      <text>bb</text></revision></page></mediawiki>"""
    recs = parse_dump(xml)
    assert [(r["title"], r["page_id"]) for r in recs] == [("A", 1),
                                                          ("B", 2)]


# ----------------------------------------------- XHTML render goldens

import glob
import unicodedata
import xml.etree.ElementTree as ET

XH = "{http://www.w3.org/1999/xhtml}"
MW_DIR = "/root/reference/test/files/repo/mediawiki"


def _fixture(kind, name, ext):
    pat = "%s/%s/*%s" % (MW_DIR, kind, ext)
    for p in glob.glob(pat):
        base = p.rsplit("/", 1)[1][:-len(ext)]
        if unicodedata.normalize("NFC", base) == name:
            return p
    raise FileNotFoundError(name)


def _norm(el):
    """Comparable tree: local tag names, attrs, text/tails with the
    fixtures' pretty-print indentation discounted (whitespace-only
    text of an element-only node, and whitespace-only tails other than
    the single significant trailing space)."""
    text = el.text
    if text is not None and not text.strip() and len(el):
        text = None
    kids = []
    for c in el:
        tail = c.tail
        if tail is not None and not tail.strip() and tail != " ":
            tail = None
        kids.append((_norm(c), tail))
    return (el.tag.rsplit("}", 1)[-1], dict(el.attrib), text, kids)


@pytest.mark.parametrize("name,subject", [
    ("Anskaffarfrihet", "Tryckfrihetsrätt"),
    ("Allmän_domstol", "Processrätt"),
])
def test_render_keyword_page_matches_reference_parsed(name, subject):
    """End-to-end render golden: the reference's own downloaded wiki
    page through render_sections equals the body div of its shipped
    parsed XHTML (test/files/repo/mediawiki/parsed), including the
    keyword link scheme, the linktrail merge, the inline statute link
    and the category -> dcterms:subject extraction."""
    from ferenda_spark.wikitext import (ln_legal_linkify,
                                        make_lagen_resolver,
                                        parse_dump, render_sections)
    rec = parse_dump(open(_fixture("downloaded", name, ".xml")).read())[0]
    secs, subjects = render_sections(rec["text"],
                                     resolve=make_lagen_resolver(),
                                     linkify=ln_legal_linkify)
    assert len(secs) == 1 and secs[0][0] is None
    assert subjects == [subject]
    want = (ET.parse(_fixture("parsed", name, ".xhtml")).getroot()
            .find(XH + "body").find(XH + "div"))
    assert _norm(secs[0][1]) == _norm(want)


def test_render_sfs_commentary_structure():
    """The big SFS/1998:204 commentary page: section split at the
    == N § == headings, category subject, the 4-item ordered list and
    the external-link attributes the parsed fixture carries."""
    from ferenda_spark.wikitext import (make_lagen_resolver, parse_dump,
                                        render_sections)
    rec = parse_dump(
        open(MW_DIR + "/downloaded/SFS/1998/204.xml").read())[0]
    secs, subjects = render_sections(rec["text"],
                                     resolve=make_lagen_resolver())
    assert [h for h, _ in secs if h is not None] == ["1 §", "2 §"]
    assert subjects == ["Lagar inom IT-rätt"]
    intro = secs[0][1]
    assert len(intro.findall("ol/li")) == 4
    ext = intro.findall(".//a[@class='external text']")
    assert {a.get("rel") for a in ext} == {"nofollow"}
    # keyword link scheme + linktrail inside the intro
    hrefs = {a.get("href") for a in intro.findall(".//a")}
    assert "https://lagen.nu/begrepp/Personuppgift" in hrefs
    assert "https://lagen.nu/1998:1191" in hrefs
