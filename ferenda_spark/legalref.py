"""Swedish legal-reference recognition (SURVEY.md T8) — a
from-scratch re-implementation of the observable semantics of the
reference's LegalRef parser for the SFS (statute) reference family
(sources/legal/se/legalref.py:64-1449), golden-checked against the
reference's own `test/files/legalref/Simple/*` fixtures.

Recognized shapes (with the reference's segmentation behavior,
including which characters each emitted link spans):

* named law + SFS number:    ``datalagen (1973:289)``        -> one link
* anonymous law + SFS:       ``lagen (1994:953)``            -> only the
  SFS number is linked (the reference's grammar treats the name as
  non-identifying)
* known bare law name:       ``brottsbalken``                -> link via
  the law-abbreviation dictionary (broadcast at scale)
* chapter/section/stycke:    ``2 kap. 3 § andra stycket <law>`` ->
  ``#K2P3S2``; a single section + non-anonymous law merges into ONE
  link spanning the whole expression, while multiple sections
  (``4 kap. 9 c § och 10 § brottsbalken``, intervals ``7 a-9 §§``)
  split into per-item links with the law linked separately.

The full reference grammar covers 13 reference types (court cases,
EU law, preparatory works …); this module implements the SFS family
— the type its own Simple fixture suite exercises — and the scanner
architecture (dictionary + regex over Arrow batches) extends to the
rest without structural change.
"""

from __future__ import annotations

import re

BASE = "https://lagen.nu/"

# Representative law-name dictionary (the reference loads a large
# abbreviation resource and broadcasts it; lookup is longest-first).
# All values are public SFS numbers.
KAND_LAWS = {
    "regeringsformen": "1974:152",
    "tryckfrihetsförordningen": "1949:105",
    "yttrandefrihetsgrundlagen": "1991:1469",
    "successionsordningen": "1810:0926",
    "brottsbalken": "1962:700",
    "rättegångsbalken": "1942:740",
    "jordabalken": "1970:994",
    "miljöbalken": "1998:808",
    "föräldrabalken": "1949:381",
    "äktenskapsbalken": "1987:230",
    "ärvdabalken": "1958:637",
    "utsökningsbalken": "1981:774",
    "socialförsäkringsbalken": "2010:110",
}

ORD_WORDS = {"första": 1, "andra": 2, "tredje": 3, "fjärde": 4,
             "femte": 5, "sjätte": 6, "sjunde": 7, "åttonde": 8,
             "nionde": 9, "tionde": 10}

_SFS = r"\d{4}:\d+"
_SEP = r"(?:\s+och\s+|\s+samt\s+|,\s*|-)"
_ITEM = r"\d+(?: [a-z](?![\wåäö]))?(?:\s*§§?)?"
_NAME_WORD = r"\b[\wåäöé-]*(?:lagen|balken|förordningen|formen)"
_PRE_NAME = r"(?:[\wåäöé]+-\s+(?:och|eller)\s+)?"


def _law_pattern(lawlist):
    kand = "|".join(sorted((re.escape(k) for k in lawlist),
                           key=len, reverse=True))
    named = (r"(?P<named>%s%s)\s*\(\s*(?P<sfs>%s)\s*\)"
             % (_PRE_NAME, _NAME_WORD, _SFS))
    return r"(?:%s|\b(?P<kand>%s)\b)" % (named, kand)


def _full_pattern(lawlist):
    kap = r"(?:(?P<kap>\d+(?: ?[a-z])?)\s+kap\.?\s+)?"
    seclist = r"(?:(?P<seclist>%s(?:%s%s)*)\s+)?" % (_ITEM, _SEP, _ITEM)
    stycke = (r"(?:(?P<stycke>(?:%s)\s+stycket)\s+)?"
              % "|".join(ORD_WORDS))
    return re.compile(kap + seclist + stycke + _law_pattern(lawlist),
                      re.UNICODE)


_DEFAULT_RE = _full_pattern(KAND_LAWS)


def _items(seclist_text: str, offset: int):
    """Split a section list into [(start, end, id, has_marker)]."""
    out = []
    for m in re.finditer(r"\d+(?: [a-z](?![\wåäö]))?(?:\s*§§?)?",
                          seclist_text):
        txt = m.group()
        has_marker = "§" in txt
        ident = re.sub(r"\s*§§?", "", txt).replace(" ", "")
        out.append((offset + m.start(), offset + m.end(), ident,
                    has_marker))
    return out


def scan_legal_refs(text: str, base: str = BASE,
                    lawlist: dict = KAND_LAWS):
    """Scan text -> segments [("str", text)] / [("link", text, uri)]
    covering the whole input, reference segmentation semantics."""
    rx = _DEFAULT_RE if lawlist is KAND_LAWS else _full_pattern(lawlist)
    segments = []
    pos = 0

    def emit_str(upto):
        nonlocal pos
        if upto > pos:
            segments.append(("str", text[pos:upto]))
            pos = upto

    def emit_link(start, end, uri):
        nonlocal pos
        emit_str(start)
        segments.append(("link", text[start:end], uri))
        pos = end

    for m in rx.finditer(text):
        kap = m.group("kap")
        seclist = m.group("seclist")
        stycke = m.group("stycke")
        named, sfs, kand = m.group("named"), m.group("sfs"), m.group("kand")
        if named is not None:
            anonymous = named in ("lagen", "förordningen")
            law_sfs = sfs
        else:
            anonymous = False
            law_sfs = lawlist[kand]
        law_uri = base + law_sfs

        kap_id = kap.replace(" ", "") if kap else None
        items = (_items(seclist, m.start("seclist")) if seclist else [])
        st_num = ORD_WORDS[stycke.split()[0]] if stycke else None

        def frag(item_id=None, with_stycke=False):
            f = ""
            if kap_id:
                f += "K" + kap_id
            if item_id:
                f += "P" + item_id
            if with_stycke and st_num:
                f += "S%d" % st_num
            return ("#" + f) if f else ""

        merged = (not anonymous) and len(items) <= 1
        if merged:
            only = items[0][2] if items else None
            emit_link(m.start(), m.end(),
                      law_uri + frag(only, with_stycke=True))
            continue

        # split mode: per-item links, law linked separately
        rest = items
        if kap_id and items and items[0][3]:
            # chapter merges into the first section link when that
            # section carries its own § marker
            s, e, ident, _ = items[0]
            emit_link(m.start("kap"), e, law_uri + frag(ident))
            rest = items[1:]
        elif kap_id:
            emit_link(m.start("kap"),
                      m.start("kap") + len(kap) + len(" kap."),
                      law_uri + frag())
        for s, e, ident, _ in rest:
            emit_link(s, e, law_uri + frag(ident))
        if anonymous:
            # only the SFS number inside the parens is linked
            emit_link(m.start("sfs"), m.end("sfs"), law_uri)
            # trailing ")" flows into the following str segment
        else:
            start = m.start("named") if named else m.start("kand")
            emit_link(start, m.end(), law_uri)
    emit_str(len(text))
    return segments
