"""Swedish legal-reference recognition (SURVEY.md T8) — a
from-scratch re-implementation of the observable semantics of the
reference's LegalRef parser for the SFS (statute) reference family
(sources/legal/se/legalref.py:64-1449), golden-checked against the
reference's own fixtures: `test/files/legalref/Simple/*` (12/12
exact) and the stateless subset of `test/files/legalref/SFS/*`
(see tests for the pinned list).

Recognized shapes, with the reference's exact segmentation (which
characters each emitted link spans):

* named law + SFS number:   ``datalagen (1973:289)``; old style
  ``(1736:0123 s. 2)`` -> SFS slug with ``_``
* anonymous law + SFS:      ``lagen/förordningen/kungörelsen (SFS)``
  -> only the SFS number is linked
* known bare law name:      ``brottsbalken`` via the broadcastable
  law-name dictionary
* chapter / section / stycke / punkt / mening expressions:
  ``2 kap. 3 a § andra stycket 11`` -> ``#K2P3aS2N11``;
  ``1 § andra stycket andra punkten`` -> ``P1S2N2``;
  ``första stycket första meningen`` -> ``S1M1``; stycke lists
  (``2 § andra och tredje styckena`` -> P2S2 + P2S3), numeric stycke
  (``18 § 2 st.`` -> S2), punkt chains (``tredje stycket 2, 3 eller
  4`` -> S3N2/S3N3/S3N4), intervals, multi-item chains, and law-less
  references resolved against ``default_law``.

Out of scope (the reference's stateful document-context features):
``samma lag`` back-references across sentences, implicit current-law
tracking beyond ``default_law``, and suppression of non-SFS number
series (VVFS etc.).
"""

from __future__ import annotations

import re

BASE = "https://lagen.nu/"
DEFAULT_LAW = "9999:999"   # the reference's test context for law-less refs

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
    "räntelagen": "1975:635",
}

ORD_WORDS = {"första": 1, "andra": 2, "tredje": 3, "fjärde": 4,
             "femte": 5, "sjätte": 6, "sjunde": 7, "åttonde": 8,
             "nionde": 9, "tionde": 10}

ANONYMOUS_NAMES = ("lagen", "förordningen", "kungörelsen",
                   "lag", "förordning", "kungörelse")

_SFS = r"\d{4}:\d+(?: s\. \d+)?"
_NAME_WORD = (r"(?:[\wåäöé-]*(?:lagen|balken|förordningen|formen"
              r"|kungörelsen|stadgan)"
              r"|(?i:lag|förordning|kungörelse))")
_PRE_NAME = r"(?:[\wåäöé]+-\s+(?:och|eller)\s+)?"


def _tok_re(lawlist):
    kand = "|".join(sorted((re.escape(k) for k in lawlist),
                           key=len, reverse=True))
    return re.compile(
        r"(?P<kap>\d+(?: ?[a-z])?\s+[Kk]ap\.?)"
        r"|(?P<chglaw>\b(?:Lag|Förordning)\s+\(\s*(?P<chgsfs>\d{4}:\d+)\s*\)\.)"
        r"|(?P<lawnamed>%s%s)\s*\(\s*(?P<sfs>%s)\s*\)"
        r"|(?P<lawkand>\b(?i:%s)s?\b)"
        r"|(?P<item>\d+(?:\s(?:[a-hj-z](?![\wåäö])|i(?=\s*§)))?(?:\s*§§?)?)"
        r"|(?P<litem>\b[a-hj-np-z]\b)"
        r"|(?P<ordword>%s)\b"
        r"|(?P<styckterm>styckena|stycket|st\.?(?![\wåäö]))"
        r"|(?P<momterm>mom\.)"
        r"|(?P<punktterm>punkterna|punkten)"
        r"|(?P<meningterm>meningarna|meningen)"
        r"|(?P<sep>och\b|eller\b|samt\b|,|-)"
        % (_PRE_NAME, _NAME_WORD, _SFS, kand, "|".join(ORD_WORDS)),
        re.UNICODE)


_DEFAULT_TOK = _tok_re(KAND_LAWS)

_WS = re.compile(r"\s+")

_KINDS = ("kap", "chglaw", "lawnamed", "lawkand", "item", "litem",
          "ordword", "styckterm", "momterm", "punktterm",
          "meningterm", "sep")


def _kind(m):
    # NOT m.lastgroup: for lawnamed matches the last participating
    # group is the nested "sfs" capture
    for g in _KINDS:
        if m.group(g) is not None:
            return g


class _Phrase:
    """One stycke qualifier: S value, optional N (punkt) and M
    (mening), with the link span it should cover."""

    def __init__(self, start, end, s=None):
        self.start, self.end = start, end
        self.s, self.n, self.m = s, None, None
        self.o = None


class _Item:
    """One section reference with qualifier phrases and a trailing
    punkt chain."""

    def __init__(self, start, end, ident, marker):
        self.start, self.end = start, end
        self.ident, self.marker = ident, marker
        self.phrases = []      # [_Phrase]
        self.nchain = []       # [(start, end, value)] punkt refs
        self.direct_n_merged = False
        self.paren_n = False   # "6)" punkt: span keeps the paren
        self.samma_end = None  # span extension for "samma lag"

    def link_end(self):
        if self.samma_end is not None:
            return self.samma_end
        if self.direct_n_merged and self.nchain:
            return self.nchain[0][1]
        if self.phrases:
            return self.phrases[0].end
        return self.end

    def s_context(self):
        if self.phrases:
            return self.phrases[-1].s
        return 1  # bare punkt after a section implies first stycke


def _parse_expression(rx, text, pos):
    """Parse one reference expression.  Returns
    (groups, law_match, end) with groups = [(kap_tuple|None, [_Item])]
    or None if no expression starts here."""
    groups, cur_kap, cur_items = [], None, []
    law = None
    end = pos
    last_item = None
    words = []        # buffered ordinal words (not yet terminated)
    committed = pos   # end of the last COMMITTED token
    pending = []      # bare numbers after separators (N-or-section)
    crossed_sep = False

    def close_group():
        nonlocal cur_kap, cur_items
        if cur_kap or cur_items:
            groups.append((cur_kap, cur_items))
        cur_kap, cur_items = None, []

    def flush_pending_as_sections():
        nonlocal pending, last_item
        for (s, e, v) in pending:
            it = _Item(s, e, v, False)
            cur_items.append(it)
            last_item = it
        pending = []

    m = rx.match(text, pos)
    if not m or _kind(m) not in ("kap", "item", "lawnamed", "lawkand",
                                 "ordword"):
        return None

    while m:
        kind = _kind(m)
        if kind == "kap":
            flush_pending_as_sections()
            close_group()
            kap_text = m.group("kap")
            kap_num = re.match(r"\d+(?: ?[a-z](?=\s))?", kap_text).group()
            cur_kap = (m.start(), m.end(), kap_num.replace(" ", ""))
            last_item = None
            committed = end = m.end()
        elif kind == "item":
            if words:
                break  # dangling ordinal words end the expression
            txt = m.group("item")
            ident = re.sub(r"\s+", "", re.sub(r"\s*§§?", "", txt))
            marker = "§" in txt
            if marker:
                flush_pending_as_sections()
                it = _Item(m.start(), m.end(), ident, marker)
                cur_items.append(it)
                last_item = it
                committed = end = m.end()
            elif (not crossed_sep and last_item is not None
                  and not pending and not last_item.nchain
                  and last_item.link_end() == committed
                  and _direct_n_ok(text, committed, m.start())):
                # bare number directly after the item/stycke phrase
                # (no separator crossed, same line): a punkt (N) ref
                n_end = m.end()
                if text[n_end:n_end + 1] == ")":
                    n_end += 1
                    last_item.paren_n = True
                last_item.nchain.append((m.start(), n_end, ident))
                last_item.direct_n_merged = True
                committed = end = n_end
            else:
                pending.append((m.start(), m.end(), ident))
                committed = end = m.end()
        elif kind == "litem":
            if (not crossed_sep and last_item is not None
                    and last_item.marker and not pending
                    and not last_item.nchain and not last_item.phrases
                    and last_item.link_end() == committed
                    and _direct_n_ok(text, committed, m.start())):
                last_item.nchain.append((m.start(), m.end(),
                                         m.group("litem")))
                last_item.direct_n_merged = True
                committed = end = m.end()
            else:
                break
        elif kind == "ordword":
            words.append((m.start(), m.end(),
                          ORD_WORDS[m.group("ordword")]))
            end = m.end()
        elif kind == "momterm":
            src = None
            if (last_item is not None and last_item.nchain
                    and last_item.direct_n_merged):
                src = last_item.nchain.pop()
                last_item.direct_n_merged = bool(last_item.nchain)
            elif pending:
                src = pending.pop()
            if src is None or last_item is None:
                break
            ph = _Phrase(src[0], m.end(), None)
            ph.o = int(src[2])
            last_item.phrases.append(ph)
            committed = end = m.end()
            words = []
        elif kind == "styckterm":
            if m.group("styckterm") in ("st.", "st"):
                # numeric stycke: "18 § 2 st." — the pending/N number
                # before the term is the stycke ordinal
                src = None
                if (last_item is not None and last_item.nchain
                        and last_item.direct_n_merged):
                    src = last_item.nchain.pop()
                    last_item.direct_n_merged = bool(last_item.nchain)
                elif pending:
                    src = pending.pop()
                if src is None or last_item is None:
                    break
                ph = _Phrase(src[0], m.end(), int(src[2]))
                last_item.phrases.append(ph)
                committed = end = m.end()
                words = []
            else:
                if not words:
                    break
                if last_item is None or pending:
                    # stycke-first reference: pseudo item with no P
                    flush_pending_as_sections()
                    it = _Item(words[0][0], words[0][0], None, False)
                    cur_items.append(it)
                    last_item = it
                for i, (ws, we, wv) in enumerate(words):
                    ph_end = m.end() if i == len(words) - 1 else we
                    last_item.phrases.append(_Phrase(ws, ph_end, wv))
                committed = end = m.end()
                words = []
        elif kind == "punktterm":
            if not words or last_item is None:
                break
            ph = (last_item.phrases[-1] if last_item.phrases
                  else None)
            if ph is None:
                ph = _Phrase(words[0][0], m.end(), None)
                last_item.phrases.append(ph)
            ph.n = words[-1][2]
            ph.end = m.end()
            committed = end = m.end()
            words = []
        elif kind == "meningterm":
            if not words or last_item is None or not last_item.phrases:
                break
            ph = last_item.phrases[-1]
            ph.m = words[-1][2]
            ph.end = m.end()
            committed = end = m.end()
            words = []
        elif kind in ("lawnamed", "lawkand"):
            if words:
                break
            law = m
            end = m.end()
            break
        elif kind == "sep":
            nxt = _next_tok(rx, text, m.end())
            while nxt is not None and _kind(nxt) == "sep":
                nxt = _next_tok(rx, text, nxt.end())
            if not nxt or _kind(nxt) in ("styckterm", "punktterm",
                                         "meningterm"):
                break
            if _kind(nxt) == "ordword" and last_item is None:
                break
            # a direct-N on a bare section (no stycke phrase) followed
            # by a bare chain links separately ("7 § 1 eller 2"); with
            # a stycke phrase the first N stays merged ("tredje
            # stycket 2, 3 eller 4")
            if (last_item is not None and last_item.direct_n_merged
                    and not last_item.phrases
                    and _kind(nxt) == "item"
                    and "§" not in nxt.group("item")):
                last_item.direct_n_merged = False
            crossed_sep = True
            m = nxt
            continue
        crossed_sep = False
        m = _next_tok(rx, text, end)
        if m is None and law is None:
            # the law may follow behind ".", ")" or the preposition
            # "i" ("32 §§ i lagen (...)", "3 § 7. körkortslagen ...")
            p2 = end
            pm = re.match(r"[.)]", text[p2:])
            if pm:
                p2 += pm.end()
            wsm = _WS.match(text, p2)
            if wsm:
                p2 = wsm.end()
            im = re.match(r"i\b", text[p2:])
            if im:
                p2 += im.end()
            nxt = _next_tok(rx, text, p2)
            if nxt is not None and _kind(nxt) in ("lawnamed",
                                                  "lawkand"):
                m = nxt
    samma_end = None
    if law is None:
        sm = re.match(r"\s+samma\s+(?:lag|förordning|balk)\b",
                      text[end:])
        if sm:
            samma_end = end + sm.end()
            end = samma_end
    close_group()
    return groups, law, end, pending, samma_end


def _direct_n_ok(text, frm, to):
    """Direct-N attaches only when on the same line as the phrase."""
    return "\n" not in text[frm:to]


def _next_tok(rx, text, pos):
    m = _WS.match(text, pos)
    if m:
        pos = m.end()
    return rx.match(text, pos)


def scan_legal_refs(text: str, base: str = BASE,
                    lawlist: dict = KAND_LAWS,
                    default_law: str = DEFAULT_LAW):
    """Scan text -> segments [("str", text)] / [("link", text, uri)]
    covering the whole input, reference segmentation semantics."""
    # two-pass name learning: a law named WITH its SFS number earlier
    # in the document ("sekretesslagen (1980:100)") makes later BARE
    # uses of that name resolvable (the reference's dynamic
    # abbreviation dictionary, legalref.py grammar extension)
    learned = {}
    learned_pos = {}
    named_rx = re.compile(r"(%s%s)\s*\(\s*(%s)\s*\)"
                          % (_PRE_NAME, _NAME_WORD, _SFS))
    for nm in named_rx.finditer(text):
        name = nm.group(1).lower()
        if name not in ANONYMOUS_NAMES and name not in lawlist:
            if name not in learned:
                learned[name] = nm.group(2).replace(" ", "_")
                learned_pos[name] = nm.end()
    if learned:
        lawlist = dict(lawlist, **learned)
    rx = _DEFAULT_TOK if lawlist is KAND_LAWS and not learned \
        else _tok_re(lawlist)
    segments = []
    pos = 0
    last_law = None   # most recent explicitly-referenced law

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

    scan_at = 0
    while scan_at < len(text):
        m = rx.search(text, scan_at)
        if not m:
            break
        if _kind(m) == "chglaw":
            emit_link(m.start(), m.end(),
                      base + default_law + "#L" + m.group("chgsfs"))
            scan_at = max(m.end(), scan_at + 1)
            continue
        if _kind(m) not in ("kap", "item", "lawnamed", "lawkand",
                            "ordword"):
            scan_at = m.end()
            continue
        parsed = _parse_expression(rx, text, m.start())
        if not parsed:
            scan_at = m.end()
            continue
        groups, law, expr_end, trailing, samma_end = parsed
        n_items = sum(len(items) for _, items in groups)
        has_anchor = law is not None or any(
            kap or any(i.marker or i.phrases for i in items)
            for kap, items in groups)
        if not has_anchor:
            scan_at = m.end()
            continue

        if law is not None:
            if law.group("lawnamed") is not None:
                anonymous = (law.group("lawnamed").lower()
                             in ANONYMOUS_NAMES)
                law_sfs = law.group("sfs").replace(" ", "_")
            else:
                anonymous = False
                name = law.group("lawkand")
                key = name.lower()
                if key not in lawlist and key.endswith("s"):
                    key = key[:-1]
                if key in learned_pos and law.start() < learned_pos[key]:
                    # a learned name applies only AFTER its defining
                    # mention; earlier uses stay plain text
                    scan_at = max(m.end(), scan_at + 1)
                    continue
                law_sfs = lawlist[key]
        else:
            anonymous = False
            if samma_end is not None and last_law is not None:
                law_sfs = last_law
                if n_items <= 1:
                    for _, items in reversed(groups):
                        if items:
                            items[-1].samma_end = samma_end
                            break
            elif default_law is not None:
                law_sfs = default_law
            elif last_law is not None:
                law_sfs = last_law
            else:
                scan_at = max(expr_end, m.end())
                continue
        law_uri = base + law_sfs
        if law is not None:
            last_law = law_sfs

        def frag(kap_id, it, ph=None, n_override=None):
            f = ""
            if kap_id:
                f += "K" + kap_id
            if it is not None and it.ident:
                f += "P" + it.ident
            s = ph.s if ph is not None else None
            n = n_override if n_override is not None else \
                (ph.n if ph is not None else None)
            m_ = ph.m if ph is not None else None
            if s is None and n is not None and (it is None
                                                or not it.phrases):
                s = 1 if it is not None else None
            if s is not None:
                f += "S%d" % s
            if n is not None:
                f += "N%s" % n
            if m_ is not None:
                f += "M%d" % m_
            if ph is not None and ph.o is not None:
                f += "O%d" % ph.o
            return ("#" + f) if f else ""

        def item_first_frag(kap_id, it):
            ph = it.phrases[0] if it.phrases else None
            if it.direct_n_merged and it.nchain:
                n = it.nchain[0][2]
                if ph is not None:
                    return frag(kap_id, it, ph, n_override=n)
                # bare N directly after the section: implied S1
                f = frag(kap_id, it)
                base_f = f[1:] if f else ""
                return "#%sS1N%s" % (base_f, n)
            return frag(kap_id, it, ph)

        def emit_item(kap_id, it, start=None):
            s = start if start is not None else it.start
            emit_link(s, it.link_end(), law_uri + item_first_frag(kap_id, it))
            for ph in it.phrases[1:]:
                emit_link(ph.start, ph.end, law_uri + frag(kap_id, it, ph))
            # punkt chain (beyond a merged direct N)
            chain = it.nchain[1:] if it.direct_n_merged else it.nchain
            for (cs, ce, cv) in chain:
                ce2 = ce + 1 if text[ce:ce + 1] == "." else ce
                sctx = it.s_context()
                f = ""
                if kap_id:
                    f += "K" + kap_id
                if it.ident:
                    f += "P" + it.ident
                if sctx is not None:
                    f += "S%d" % sctx
                f += "N%s" % cv
                emit_link(cs, ce2, law_uri + "#" + f)

        merged_law = (law is not None and not anonymous
                      and len(groups) == 1 and n_items <= 1 and not trailing
                      and (not groups or not groups[0][1]
                           or (len(groups[0][1][0].phrases) <= 1
                               and (not groups[0][1][0].nchain
                                    or (groups[0][1][0].direct_n_merged
                                        and not groups[0][1][0].paren_n
                                        and len(groups[0][1][0].nchain)
                                        == 1)))))
        if merged_law:
            kap, items = groups[0] if groups else (None, [])
            it = items[0] if items else None
            start = kap[0] if kap else (it.start if it else law.start())
            kid = kap[2] if kap else None
            f = (item_first_frag(kid, it) if it is not None
                 else frag(kid, None))
            emit_link(start, law.end(), law_uri + f)
            scan_at = max(expr_end, pos, scan_at + 1)
            continue

        last_it = None
        for kap, items in groups:
            kap_id = kap[2] if kap else None
            if kap and items and items[0].marker:
                emit_item(kap_id, items[0], start=kap[0])
                rest = items[1:]
            elif kap:
                emit_link(kap[0], kap[1], law_uri + frag(kap_id, None))
                rest = items
            else:
                rest = items
            for it in rest:
                emit_item(kap_id, it)
            if items:
                last_it = (kap_id, items[-1])

        # trailing bare numbers: punkt refs in the last item's stycke
        # context (chains that never met a § marker)
        if last_it is not None:
            kap_id, it = last_it
            for (cs, ce, cv) in trailing:
                ce2 = ce + 1 if text[ce:ce + 1] == "." else ce
                sctx = it.s_context()
                f = ""
                if kap_id:
                    f += "K" + kap_id
                if it.ident:
                    f += "P" + it.ident
                if sctx is not None:
                    f += "S%d" % sctx
                f += "N%s" % cv
                emit_link(cs, ce2, law_uri + "#" + f)

        if law is not None:
            if anonymous:
                emit_link(law.start("sfs"), law.end("sfs"),
                          base + law.group("sfs").replace(" ", "_"))
            else:
                start = (law.start("lawnamed")
                         if law.group("lawnamed") is not None
                         else law.start("lawkand"))
                emit_link(start, law.end(), law_uri)
        scan_at = max(expr_end, pos, scan_at + 1)
    emit_str(len(text))
    return segments
