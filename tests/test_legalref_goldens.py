"""Legal-reference (T8) parity against the reference's own
test/files/legalref/Simple fixtures: exact segment-by-segment match
(link spans AND minted URIs) for all twelve files."""

import glob
import os
import xml.etree.ElementTree as ET

import pytest

from ferenda_spark.legalref import scan_legal_refs

FIXDIR = "/root/reference/test/files/legalref/Simple"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXDIR), reason="reference fixtures not present")


def load_fixture(path):
    raw = open(path, encoding="iso-8859-1").read()
    idx = raw.index("<list>")
    src = raw[:idx].rstrip("\n")
    root = ET.fromstring(raw[idx:raw.index("</list>") + 7])
    exp = [("str", el.text or "") if el.tag in ("str", "unicode")
           else ("link", el.text or "", el.get("uri")) for el in root]
    return src, exp


def _fixtures():
    return sorted(os.path.basename(f)[:-4]
                  for f in glob.glob(FIXDIR + "/*.txt"))


@pytest.mark.parametrize("name", _fixtures())
def test_legalref_fixture_matches_reference_golden(name):
    src, exp = load_fixture(FIXDIR + "/%s.txt" % name)
    assert scan_legal_refs(src) == exp


def test_legalref_plain_text_untouched():
    text = "Ingen hänvisning alls i denna mening."
    assert scan_legal_refs(text) == [("str", text)]


# ------------------------- url citation + legaluri COIN goldens

URLDIR = "/root/reference/test/files/citation/url"
LEGALURIDIR = "/root/reference/test/files/legaluri"


@pytest.mark.parametrize("name", ["basic", "multiple",
                                  "query-and-fragment", "running"])
def test_url_citation_components_match_golden(name):
    """citationpatterns.url component capture incl. trailing-
    punctuation exclusion, vs test/files/citation/url goldens."""
    if not os.path.isdir(URLDIR):
        pytest.skip("url fixtures not present")
    import re as _re
    from ferenda_spark.citations import scan_url_citations
    src = open(URLDIR + "/%s.txt" % name).read().rstrip("\n")
    result = open(URLDIR + "/%s.result" % name).read()
    exp = [dict(_re.findall(r"<(\w+)>([^<]*)</\1>", b))
           for b in _re.findall(r"<url>(.*?)</url>", result, _re.S)]
    assert [c["parts"] for c in scan_url_citations(src)] == exp


@pytest.mark.parametrize("stem", ["lagrum-basic", "rattsfall-nja",
                                  "rattsfall-ad", "beslut-jk-basic"])
def test_legaluri_construct_matches_golden(stem):
    """COIN URI minting (T7): typed dict -> rinfo URI, vs the
    reference's legaluri fixtures (legaluri.py:80-140)."""
    if not os.path.isdir(LEGALURIDIR):
        pytest.skip("legaluri fixtures not present")
    import ast
    from ferenda_spark.citations import legaluri_construct
    uris = [l for l in open(LEGALURIDIR + "/%s.txt" % stem)
            .read().splitlines() if l.strip()]
    dicts = [ast.literal_eval(l) for l in
             open(LEGALURIDIR + "/%s.py" % stem).read().splitlines()
             if l.strip()]
    assert [legaluri_construct(d) for d in dicts] == uris
