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
