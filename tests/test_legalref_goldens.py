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


def load_fixture_parts(path):
    """(source, expected-segments) pairs; multi-part fixtures separate
    sections with '---' lines."""
    import re as _re
    raw = open(path, encoding="iso-8859-1").read()
    if "<list>" not in raw:
        # bare-<str/> golden (sfs-tricky-tomstrang): empty source ->
        # one empty str node
        return [("", [("str", "")])]
    idx = raw.index("<list>")
    srcs = [x.strip("\n") for x in _re.split(r"\n---\n", raw[:idx])
            if x.strip()]
    lists = _re.findall(r"<list>.*?</list>", raw[idx:], _re.S)
    assert len(srcs) == len(lists), path
    out = []
    for src, lx in zip(srcs, lists):
        root = ET.fromstring(lx)
        exp = [("str", el.text or "") if el.tag in ("str", "unicode")
               else ("link", el.text or "", el.get("uri"))
               for el in root]
        out.append((src, exp))
    return out


def load_fixture(path):
    return load_fixture_parts(path)[0]


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


# ------------------------- SFS-dir fixtures (stateless subset)

SFSDIR = "/root/reference/test/files/legalref/SFS"

# The SFS fixtures whose constructs the scanner covers, run with
# shared document state (learned law names carry across parts, latest
# definition wins; RESET: parts start fresh; NOBASE: fixtures run
# with default_law=None -> most-recent-law fallback).
#
# Every non-passing fixture is pinned below with its reason; the
# completeness test asserts PASSING + SKIPPED covers the directory
# exactly, so a new reference fixture can't silently go untested.
SFS_SKIPPED = {
    # Listed broken in the reference's OWN suite
    # (/root/reference/test/integrationLegalRef.py:142-147
    # make_closure([...]) for the Lagrum parametrization):
    "sfs-tricky-bokstavslista": "reference-broken (integrationLegalRef.py:142)",
    "sfs-tricky-eller": "reference-broken (integrationLegalRef.py:143)",
    "sfs-tricky-eller-paragrafer-stycke":
        "reference-broken (integrationLegalRef.py:144)",
    "sfs-tricky-overgangsbestammelse":
        "reference-broken (integrationLegalRef.py:145)",
    "sfs-tricky-uppdelat-lagnamn":
        "reference-broken (integrationLegalRef.py:146)",
    "sfs-tricky-vvfs": "reference-broken (integrationLegalRef.py:147)",
}

# Fixtures whose goldens follow the reference's LAGRUM parser config
# (integrationLegalRef.py:140) where it diverges from EnklaLagrum
# (:148): '2 kap. <known lawname>' splits into a chapter link plus a
# bare law-root link instead of merging.  scan_legal_refs grows a
# mode="lagrum" flag for exactly this config difference; these run
# under it while the Simple suite stays on the default.
SFS_LAGRUM_MODE = [
    "sfs-namngiven-referens-4",
    "sfs-tricky-1984-387-8",
    "sfs-regression-whitespace-3",
]
SFS_PASSING = [
    "sfs-basic-gammal-lag",
    "sfs-basic-intervall",
    "sfs-basic-kapitel-paragraf-stycke",
    "sfs-basic-kapitel-paragraf",
    "sfs-basic-kapitel-paragrafer",
    "sfs-basic-kapitel",
    "sfs-basic-kungorelse-kapitel-paragrafer",
    "sfs-basic-kungorelse",
    "sfs-basic-lag-kapitel-paragrafer-2",
    "sfs-basic-lag-kapitel-paragrafer",
    "sfs-basic-lagar",
    "sfs-basic-mening",
    "sfs-basic-paragraf-punkter",
    "sfs-basic-paragraf-stycke",
    "sfs-basic-paragraf-stycken-2",
    "sfs-basic-paragraf-stycken",
    "sfs-basic-paragraf",
    "sfs-basic-paragrafer",
    "sfs-basic-punkt",
    "sfs-basic-punktlista",
    "sfs-basic-samma-lag",
    "sfs-basic-separata-kapitel",
    "sfs-basic-stycke-punkt",
    "sfs-basic-stycke-punkter",
    "sfs-bemyndigande-elsakfs",
    "sfs-degenerate",
    "sfs-multiple-item-refs",
    "sfs-namngiven-avancerad",
    "sfs-namngiven-grundlagar",
    "sfs-namngiven-mellanslag",
    "sfs-namngiven-referens",
    "sfs-namngiven-specifik",
    "sfs-nobase-multiple",
    "sfs-nobase-simple",
    "sfs-nobase-undefined-forordning",
    "sfs-nobase-undefined-lag",
    "sfs-old-kungorelse",
    "sfs-old-stadgan",
    "sfs-paragraf-moment",
    "sfs-regression-err1",
    "sfs-regression-err2",
    "sfs-regression-i18n",
    "sfs-regression-kapitel-individuella-paragrafer",
    "sfs-regression-kapitel-paragraf-punkt",
    "sfs-regression-lag-kapitel-paragrafer",
    "sfs-regression-med-och-utan-kapitel",
    "sfs-regression-namngiven-lag",
    "sfs-regression-obestamd-form",
    "sfs-regression-verdict-2000-1366",
    "sfs-regression-verdict-2004-1853",
    "sfs-regression-whitespace-2",
    "sfs-regression-whitespace",
    "sfs-samma-forordning",
    "sfs-tricky-1982-713-5",
    "sfs-tricky-andringsnotering",
    "sfs-tricky-gammal-lag",
    "sfs-tricky-i18n",
    "sfs-tricky-komma-och",
    "sfs-tricky-lag",
    "sfs-tricky-nbsp",
    "sfs-tricky-paragraf-bokstavslista",
    "sfs-tricky-paragrafer-bokstaver",
    "sfs-tricky-paragrafer-med-enstaka-paragraftecken",
    "sfs-tricky-punkt-parantes",
    "sfs-tricky-punkt",
    "sfs-tricky-punktanvisningar",
    "sfs-tricky-radbryning-i-hanvisning",
    "sfs-tricky-sammalag",
    "sfs-tricky-stycke-forkortning",
    "sfs-tricky-stycke-punkt",
    "sfs-tricky-stycke-punkter",
    "sfs-tricky-tomstrang",
    "tricky-strange-chars",
]


def test_sfs_fixture_inventory_complete():
    """PASSING + SKIPPED must cover test/files/legalref/SFS exactly —
    a new reference fixture cannot silently go untested, and a fixed
    one cannot stay on the skip list unnoticed."""
    if not os.path.isdir(SFSDIR):
        pytest.skip("SFS fixtures not present")
    have = {os.path.basename(f)[:-4]
            for f in glob.glob(SFSDIR + "/*.txt")}
    covered = (set(SFS_PASSING) | set(SFS_SKIPPED)
               | set(SFS_LAGRUM_MODE))
    assert covered == have
    assert not set(SFS_PASSING) & set(SFS_SKIPPED)
    assert not set(SFS_LAGRUM_MODE) & (set(SFS_PASSING)
                                       | set(SFS_SKIPPED))


@pytest.mark.parametrize("name", SFS_LAGRUM_MODE)
def test_legalref_sfs_lagrum_mode_fixture_matches_golden(name):
    if not os.path.isdir(SFSDIR):
        pytest.skip("SFS fixtures not present")
    for src, exp in load_fixture_parts(SFSDIR + "/%s.txt" % name):
        assert scan_legal_refs(src, mode="lagrum") == exp


@pytest.mark.parametrize("name", SFS_PASSING)
def test_legalref_sfs_fixture_matches_reference_golden(name):
    if not os.path.isdir(SFSDIR):
        pytest.skip("SFS fixtures not present")
    kw = {"default_law": None} if "nobase" in name else {}
    state = {}
    for src, exp in load_fixture_parts(SFSDIR + "/%s.txt" % name):
        if src.startswith("RESET:"):
            state = {}
        assert scan_legal_refs(src, state=state, **kw) == exp


# ----------------- other reference families (DV/Avg/Short/Regpubl/EGLag)

LEGALREF_ROOT = "/root/reference/test/files/legalref"


def _family(dirname):
    d = os.path.join(LEGALREF_ROOT, dirname)
    if not os.path.isdir(d):
        return []
    return sorted(os.path.basename(f)[:-4]
                  for f in glob.glob(d + "/*.txt"))


def _load_with_ctx(path):
    import ast
    parts = load_fixture_parts(path)
    out = []
    for src, exp in parts:
        ctx = None
        if src.startswith("BASE:"):
            line, src = src.split("\n", 1)
            ctx = ast.literal_eval(line[5:])
        out.append((src, ctx, exp))
    return out


@pytest.mark.parametrize("name", _family("DV"))
def test_caselaw_fixture_matches_golden(name):
    """RATTSFALL grammar (court decisions incl. malformed in-the-wild
    forms) — all 7 DV fixtures exact."""
    from ferenda_spark.legalref import scan_caselaw
    for src, _, exp in _load_with_ctx(LEGALREF_ROOT + "/DV/%s.txt" % name):
        assert scan_caselaw(src) == exp


@pytest.mark.parametrize("name", _family("Avg"))
def test_avg_fixture_matches_golden(name):
    """MYNDIGHETSBESLUT grammar (agency docket numbers; authority
    inferred from dnr shape) — all 8 Avg fixtures exact."""
    from ferenda_spark.legalref import scan_avg
    for src, _, exp in _load_with_ctx(LEGALREF_ROOT + "/Avg/%s.txt" % name):
        assert scan_avg(src) == exp


@pytest.mark.parametrize("name", _family("Short"))
def test_short_abbrev_fixture_matches_golden(name):
    """KORTLAGRUM config: uppercase statute abbreviations as an extra
    lawlist (separate parser config, like the reference's)."""
    from ferenda_spark.legalref import (KAND_LAWS, SHORT_ABBREVS,
                                        scan_legal_refs)
    for src, _, exp in _load_with_ctx(LEGALREF_ROOT + "/Short/%s.txt"
                                      % name):
        assert scan_legal_refs(
            src, lawlist=dict(KAND_LAWS, **SHORT_ABBREVS)) == exp


@pytest.mark.parametrize("name", _family("Regpubl"))
def test_forarbeten_fixture_matches_golden(name):
    """FORARBETEN grammar (prop/bet/rskr/SOU/Ds, page chains,
    'a. prop.' back-refs, avsnitt context, CELEX) — all 8 exact."""
    from ferenda_spark.legalref import scan_forarbeten
    for src, ctx, exp in _load_with_ctx(LEGALREF_ROOT + "/Regpubl/%s.txt"
                                        % name):
        assert scan_forarbeten(src, base_ctx=ctx) == exp


@pytest.mark.parametrize("name", _family("EGLag"))
def test_eglag_fixture_matches_golden(name):
    """EU-legislation grammar with CELEX minting — all 6 exact."""
    from ferenda_spark.legalref import scan_eglag
    for src, _, exp in _load_with_ctx(LEGALREF_ROOT + "/EGLag/%s.txt"
                                      % name):
        assert scan_eglag(src) == exp


# --------------------------------------------- EU case law (ECJ, T8)
# Both reference fixtures are listed broken in its own suite
# (integrationLegalRef.py:151-153): they carry NO <list> golden at
# all, and their case numbers use U+2011 non-breaking hyphens that the
# reference's ASCII-'-' EBNF (res/ebnf/euratt.ebnf:8) can never match.
# The CORRECTED goldens below apply the reference's documented
# semantics (euratt.ebnf productions + eurattsfall_format_uri,
# legalref.py:1367-1390: CELEX 6<year>C<J|A|W><serial %04d>, two-digit
# years pivot at 54) to the fixtures' actual text, with the hyphen
# divergence accepted as in-the-wild input.

ECJ_CORRECTED = {
    "civilservicetrib": [
        ("str", "By order in "),
        ("link", "Case F‑23/07",
         "https://lagen.nu/ext/celex/62007CW0023"),
        ("str", " M  v EMEA"),
    ],
    "simple": [
        ("str", "In "),
        ("link", "Case C‑197/09",
         "https://lagen.nu/ext/celex/62009CJ0197"),
        ("str", " RX‑II,"),
    ],
}


@pytest.mark.parametrize("name", sorted(ECJ_CORRECTED))
def test_ecj_fixture_matches_corrected_golden(name):
    """EURATTSFALL grammar over the reference's own (golden-less)
    fixture texts, against author-corrected goldens."""
    from ferenda_spark.legalref import scan_ecj
    path = LEGALREF_ROOT + "/ECJ/%s.txt" % name
    if not os.path.isfile(path):
        pytest.skip("ECJ fixtures not present")
    src = open(path, encoding="utf-8").read().rstrip("\n")
    assert scan_ecj(src) == ECJ_CORRECTED[name]


def test_ecj_ascii_and_year_pivot():
    """ASCII-hyphen form (the EBNF's own syntax) and the 2054
    two-digit-year pivot: 55 -> 1955, 53 -> 2053; 4-digit years pass
    through."""
    from ferenda_spark.legalref import scan_ecj
    assert scan_ecj("Case T-13/55") == [
        ("link", "Case T-13/55",
         "https://lagen.nu/ext/celex/61955CA0013")]
    assert scan_ecj("C-7/53 and C-8/2001") == [
        ("link", "C-7/53", "https://lagen.nu/ext/celex/62053CJ0007"),
        ("str", " and "),
        ("link", "C-8/2001", "https://lagen.nu/ext/celex/62001CJ0008")]
