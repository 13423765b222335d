"""Swedish legal-reference recognition (SURVEY.md T8) — a
from-scratch re-implementation of the observable semantics of the
reference's LegalRef parser for the SFS (statute) reference family
(sources/legal/se/legalref.py:64-1449), golden-checked against the
reference's own fixtures: `test/files/legalref/Simple/*` (12/12
exact) and the stateless subset of `test/files/legalref/SFS/*`
(72/76; see tests for the pinned list).

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
    "upphovsrättslagen": "1960:729",
    "körkortsförordningen": "1998:980",
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
        r"|(?P<parensfs>\(\s*(?P<psfs>\d{4}:\d+)\s*\))"
        r"|(?P<item>\d+(?:\s(?:[a-hj-z](?![\wåäö])|i(?=\s*§)))?(?:\s*§§?)?)"
        r"|(?P<litem>\b[a-hj-np-z]\b)"
        r"|(?P<ordword>%s)\b"
        r"|(?P<styckterm>styckena|stycket|st\.?(?![\wåäö]))"
        r"|(?P<momterm>mom\.)"
        r"|(?P<punktterm>punkterna|punkten)"
        r"|(?P<anvisn>anvisningarna)"
        r"|(?P<punktword>punkt\b)"
        r"|(?P<meningterm>meningarna|meningen)"
        r"|(?P<sep>och\b|eller\b|samt\b|,|-)"
        % (_PRE_NAME, _NAME_WORD, _SFS, kand, "|".join(ORD_WORDS)),
        re.UNICODE)


_DEFAULT_TOK = _tok_re(KAND_LAWS)

_WS = re.compile(r"\s+")

_KINDS = ("kap", "chglaw", "lawnamed", "lawkand", "parensfs", "item",
          "litem", "ordword", "styckterm", "momterm", "punktterm",
          "anvisn", "punktword", "meningterm", "sep")


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
        self.pending_punkt = None  # "anvisningarna punkt N" value
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
        for entry in pending:
            s, e, v = entry[0], entry[1], entry[2]
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
            if (pending and last_item is None and not groups
                    and cur_kap is None and not crossed_sep):
                # bare numbers straight before a chapter token with
                # only whitespace between ("…1 januari 1999\n\n7
                # kap. …"): the numbers are prose (a date, a year),
                # not sections of the following chapter — fail this
                # start so the scan resumes AT the kap token
                break
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
                pending.append((m.start(), m.end(), ident,
                                crossed_sep))
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
        elif kind == "anvisn":
            if last_item is None or not last_item.marker:
                break
            committed = end = m.end()
        elif kind == "punktword":
            if last_item is None or not last_item.marker:
                break
            nm = _next_tok(rx, text, m.end())
            if nm is None or _kind(nm) != "item" \
                    or "§" in nm.group("item"):
                break
            last_item.pending_punkt = nm.group("item")
            committed = end = nm.end()
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
                    ph = _Phrase(ws, ph_end, wv)
                    if last_item.pending_punkt is not None:
                        ph.n = last_item.pending_punkt
                        last_item.pending_punkt = None
                    last_item.phrases.append(ph)
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
        elif kind == "parensfs":
            break
        elif kind in ("lawnamed", "lawkand"):
            if words:
                break
            if (len(pending) == 1 and len(pending[0]) > 3
                    and not pending[0][3] and last_item is not None
                    and last_item.marker and not last_item.nchain
                    and not last_item.phrases):
                # a lone bare number between the section and its law,
                # separated only by whitespace (line-wrapped punkt)
                ps, pe, pv = pending[0][0], pending[0][1], pending[0][2]
                last_item.nchain.append((ps, pe, pv))
                last_item.direct_n_merged = True
                pending = []
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
                    default_law: str = DEFAULT_LAW,
                    state: dict = None, mode: str = "enkla"):
    """Scan text -> segments [("str", text)] / [("link", text, uri)]
    covering the whole input, reference segmentation semantics.

    ``state`` (optional, mutated) carries document context across
    calls — the learned law-name dictionary — so multi-part documents
    resolve names defined in earlier parts (the reference reuses one
    parser instance per document).

    ``mode`` selects between the reference's two SFS parser configs,
    which disagree on the SAME construct (integrationLegalRef.py
    runs EnklaLagrum over legalref/Simple and Lagrum over
    legalref/SFS): "enkla" (default) merges "2 kap. <known lawname>"
    into ONE link (...#K2 spanning both), "lagrum" splits it into a
    chapter link (...#K2 over "2 kap.") plus a bare law-root link
    over the name.  A lawNAMED reference (name + parenthesized SFS
    number) merges in BOTH configs — the split applies only to bare
    known-law names (lawkand)."""
    # two-pass name learning: a law named WITH its SFS number earlier
    # in the document ("sekretesslagen (1980:100)") makes later BARE
    # uses of that name resolvable (the reference's dynamic
    # abbreviation dictionary, legalref.py grammar extension)
    carried = dict(state.get("learned", {})) if state else {}
    # in-text definitions: ordered (end_pos, name, sfs); resolution at
    # position p uses the latest definition before p, else the carried
    # dict (latest-wins, forward-only — matching the reference's
    # single reused parser instance)
    defs = []
    named_rx = re.compile(r"(%s%s)\s*\(\s*(%s)\s*\)"
                          % (_PRE_NAME, _NAME_WORD, _SFS))
    for nm in named_rx.finditer(text):
        name = nm.group(1).lower()
        if name not in ANONYMOUS_NAMES and name not in lawlist:
            defs.append((nm.end(), name, nm.group(2).replace(" ", "_")))
    learned = {name: sfs for _, name, sfs in defs}
    learned.update({k: v for k, v in carried.items()
                    if k not in learned})
    if learned:
        lawlist = dict(lawlist, **learned)
    if state is not None:
        st_learned = state.setdefault("learned", {})
        for _, name, sfs in defs:
            st_learned[name] = sfs

    def resolve_learned(name, pos):
        best = None
        for (e, n, sfs) in defs:
            if n == name and e <= pos:
                best = sfs
        if best is not None:
            return best
        return carried.get(name)

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
        if _kind(m) == "parensfs":
            emit_link(m.start("psfs"), m.end("psfs"),
                      base + m.group("psfs"))
            scan_at = max(m.end(), scan_at + 1)
            continue
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
        if law is None:
            # a reference directly followed by an UNKNOWN law-shaped
            # name is no reference at all (the reference's grammar
            # fails the whole expression): "23 § okändalagen."
            um = re.match(r"\s+(%s)" % _NAME_WORD, text[expr_end:])
            if um and um.group(1).lower() not in ANONYMOUS_NAMES \
                    and um.group(1).lower() not in lawlist:
                scan_at = max(expr_end + um.end(), m.end())
                continue
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
                if key in learned:
                    got = resolve_learned(key, law.start())
                    if got is None:
                        # a learned name applies only AFTER a defining
                        # mention; earlier uses stay plain text
                        scan_at = max(m.end(), scan_at + 1)
                        continue
                    law_sfs = got
                else:
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
                      and not (mode == "lagrum"
                               and law.group("lawkand") is not None)
                      and len(groups) == 1 and n_items <= 1 and not trailing
                      and (not groups or not groups[0][1]
                           or (len(groups[0][1][0].phrases) <= 1
                               and (not groups[0][1][0].nchain
                                    or (groups[0][1][0].direct_n_merged
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
            # kap merges into its first marked item ("2 kap. 18 § 2
            # st." -> one #K2P18S2 link) UNLESS that item carries a
            # phrase continuation ("6 kap. 2 § 3 st. och 4 st." ->
            # "6 kap." links alone; sfs-regression-whitespace-3)
            if kap and items and items[0].marker \
                    and len(items[0].phrases) <= 1:
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
            for entry in trailing:
                cs, ce, cv = entry[0], entry[1], entry[2]
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
    if not segments:
        # the reference always returns at least one node — empty input
        # yields one empty <str/> (fixture sfs-tricky-tomstrang)
        segments.append(("str", text))
    return segments


# ---------------------------------------------------------- case law (DV)
# Court-decision references (the reference's RATTSFALL grammar,
# legalref.py; golden-checked vs test/files/legalref/DV/*):
#   AD 2008 nr 28 / AD 2006-73 / MD 2007-18 / MÖD 2000: 48 -> slug/year:num
#   NJA 1998 s. 14 -> nja/1998s14 (page series; the plain colon form
#   "NJA 2003:16" is NOT a valid citation)
#   HFD 2013 not. 3 / RÅ 1999 not 421 -> slug/year/not/num

_COURTS = ("NJA", "HFD", "RÅ", "MIG", "MÖD", "MD", "AD", "RH")

_CASELAW_RE = re.compile(
    r"\b(?P<court>%s)\s+(?P<year>\d{4})\s*"
    r"(?:(?P<notform>not\.?\s*(?P<notnum>\d+))"
    r"|(?P<pageform>s\.\s*(?P<page>\d+))"
    r"|(?:-?nr\s*|ref\.\s*|-|\s?:\s*)(?P<num>\d+))"
    % "|".join(_COURTS))

_COURT_SLUG = {"RÅ": "ra", "MÖD": "mod"}


def scan_caselaw(text: str, base: str = BASE):
    """Segments for court-decision citations (str/link covering the
    whole input)."""
    segments, pos = [], 0
    for m in _CASELAW_RE.finditer(text):
        court = m.group("court")
        slug = _COURT_SLUG.get(court, court.lower())
        if m.group("notform"):
            uri = "%sdom/%s/%s/not/%s" % (base, slug, m.group("year"),
                                          m.group("notnum"))
        elif m.group("pageform"):
            if court != "NJA":
                continue
            uri = "%sdom/nja/%ss%s" % (base, m.group("year"),
                                       m.group("page"))
        else:
            if court == "NJA":
                continue  # plain colon form invalid for NJA
            uri = "%sdom/%s/%s:%s" % (base, slug, m.group("year"),
                                      m.group("num"))
        if m.start() > pos:
            segments.append(("str", text[pos:m.start()]))
        segments.append(("link", text[m.start():m.end()], uri))
        pos = m.end()
    if pos < len(text):
        segments.append(("str", text[pos:]))
    return segments


# ------------------------------------------------- agency decisions (Avg)
# Docket-number (diarienummer) references after a marker word
# (the MYNDIGHETSBESLUT grammar; goldens test/files/legalref/Avg/*).
# Authority inferred from the dnr shape: three groups -> JK
# (NNNN-NN-NN); year-first -> ARN; year-last -> JO.

_DNR_RE = re.compile(r"\d{3,4}-\d{2,4}(?:-\d{2})?")
_AVG_MARKER_RE = re.compile(
    r"(?:\bdnr\s+|\bänr\s+|\bärende\s+nr\s+|;\s+)")


def _dnr_authority(dnr: str):
    parts = dnr.split("-")
    if len(parts) == 3:
        # a plain date (YYYY-MM-DD) is not a docket number
        if (len(parts[0]) == 4 and parts[0][:2] in ("19", "20")
                and int(parts[1]) <= 12 and int(parts[2]) <= 31):
            return None
        return "jk"
    if len(parts[0]) == 4 and parts[0][:2] in ("19", "20"):
        return "arn"
    if len(parts[1]) == 4 and parts[1][:2] in ("19", "20"):
        return "jo"
    return None


def scan_avg(text: str, base: str = BASE):
    """Segments for agency-decision (dnr) citations."""
    segments, pos = [], 0
    scan_at = 0
    while True:
        mk = _AVG_MARKER_RE.search(text, scan_at)
        if not mk:
            break
        p = mk.end()
        auth = None
        while True:
            dm = _DNR_RE.match(text, p)
            if not dm:
                break
            a = _dnr_authority(dm.group())
            if a is None or (auth is not None and a != auth):
                break
            auth = a
            str_end = dm.start()
            if mk.group().startswith("ärende") and p == mk.end():
                str_end = mk.start()
            if str_end > pos:
                segments.append(("str", text[pos:str_end]))
            segments.append(("link", dm.group(),
                             "%savg/%s/%s" % (base, a, dm.group())))
            pos = dm.end()
            cm = re.match(r"(?:,\s+|\s+och\s+)", text[pos:])
            if not cm:
                break
            p = pos + cm.end()
        scan_at = max(mk.end(), pos)
    if pos < len(text):
        segments.append(("str", text[pos:]))
    return segments


# Uppercase statute abbreviations (the KORTLAGRUM parser config —
# enabled by passing this as extra lawlist entries, mirroring the
# reference's separate LegalRef(LAGRUM, KORTLAGRUM, ...) instance)
SHORT_ABBREVS = {
    "rf": "1974:152", "tf": "1949:105", "ygl": "1991:1469",
    "brb": "1962:700", "rb": "1942:740", "jb": "1970:994",
    "mb": "1998:808", "fb": "1949:381", "äktb": "1987:230",
    "ub": "1981:774", "osl": "2009:400", "pul": "1998:204",
    "las": "1982:80", "mbl": "1976:580", "äb": "1958:637",
}


# -------------------------------------------- preparatory works (Regpubl)
# Prop./bet./rskr./SOU/Ds references with page fragments and page
# chains, "a. prop." back-references, avsnitt (section) references
# against a supplied base context, and CELEX numbers
# (the FORARBETEN grammar; goldens test/files/legalref/Regpubl/*).

_PUB_RE = re.compile(
    r"(?P<prop>[Pp]rop\.\s*(?P<py>\d{4}/\d{2}):(?P<pn>\d+))"
    r"|(?P<bet>bet\.\s*(?P<by>\d{4}/\d{2}):(?P<bn>[A-Za-z]*\d+[A-Za-z]*\d*))"
    r"|(?P<rskr>rskr\.\s*(?P<ry>\d{4}/\d{2}):(?P<rn>\d+))"
    r"|(?P<sou>SOU\s+(?P<sy>\d{4}):(?P<sn>\d+))"
    r"|(?P<ds>Ds\s+(?P<dy>\d{4}):(?P<dn>\d+))"
    r"|(?P<aprop>a\.\s*prop\.)"
    r"|(?P<celex>\b3(?:\d{4}|\d{2})[LR]\d{4}\b)"
    r"|(?P<avsnitt>avsnitt\s+(?P<av>\d+(?:\.\d+)*))")

_PAGE_RE = re.compile(r",?\s*s\.\s*(?P<page>\d+)")
_CHAINSEP_RE = re.compile(r"(?:\s*-\s*|,\s+|\s+och\s+)")
_BETANKANDE_RE = re.compile(r"\s+i\s+kommitténs\s+betänkande")


def scan_forarbeten(text: str, base: str = BASE, base_ctx: dict = None):
    """Segments for preparatory-work references.  ``base_ctx`` is the
    document context for avsnitt references: {'year', 'no',
    'kommittensbetankande'} of the containing proposition."""
    segments, pos = [], 0
    last_pub = None   # uri of the most recent publication

    def emit(start, end, uri):
        nonlocal pos
        if start > pos:
            segments.append(("str", text[pos:start]))
        segments.append(("link", text[start:end], uri))
        pos = end

    def page_chain(p, uri):
        """page chains after a #sid link: '-121, 141-142' / 'och 62'"""
        while True:
            cm = _CHAINSEP_RE.match(text, p)
            if not cm:
                return p
            nm = re.match(r"\d+", text[cm.end():])
            if not nm:
                return p
            s = cm.end()
            emit(s, s + nm.end(), uri + "#sid" + nm.group())
            p = s + nm.end()

    m = _PUB_RE.search(text)
    while m:
        start, end = m.start(), m.end()
        if m.group("celex"):
            num = m.group("celex")
            if len(num) == 8:  # short form 392L0100 -> 31992L0100
                num = num[0] + "19" + num[1:]
            emit(start, end, base + "ext/celex/" + num)
        elif m.group("avsnitt"):
            # chain of section numbers; a trailing "i kommitténs
            # betänkande" retargets the WHOLE chain to the betänkande
            items = [(start, end, m.group("av"))]
            p = end
            while True:
                cm = _CHAINSEP_RE.match(text, p)
                if not cm:
                    break
                nm = re.match(r"\d+(?:\.\d+)*", text[cm.end():])
                if not nm:
                    break
                items.append((cm.end(), cm.end() + nm.end(), nm.group()))
                p = cm.end() + nm.end()
            bm = _BETANKANDE_RE.match(text, p)
            if base_ctx:
                if bm:
                    target = (base + "utr/sou/"
                              + base_ctx["kommittensbetankande"])
                    items[-1] = (items[-1][0], bm.end(), items[-1][2])
                    p = bm.end()
                else:
                    target = (base + "prop/%s:%s"
                              % (base_ctx["year"], base_ctx["no"]))
                for (s, e, num) in items:
                    emit(s, e, target + "#S" + num.replace(".", "-"))
        elif m.group("aprop"):
            # "a. prop. s. 51": page of the last-referenced prop
            pm = _PAGE_RE.match(text, end)
            if pm and last_pub:
                emit(start, pm.end(), last_pub + "#sid"
                     + pm.group("page"))
                page_chain(pm.end(), last_pub)
        else:
            if m.group("prop"):
                uri = base + "prop/%s:%s" % (m.group("py"), m.group("pn"))
            elif m.group("bet"):
                uri = base + "bet/%s:%s" % (m.group("by"), m.group("bn"))
            elif m.group("rskr"):
                uri = base + "rskr/%s:%s" % (m.group("ry"), m.group("rn"))
            elif m.group("sou"):
                uri = base + "utr/sou/%s:%s" % (m.group("sy"),
                                                m.group("sn"))
            else:
                uri = base + "utr/ds/%s:%s" % (m.group("dy"),
                                               m.group("dn"))
            last_pub = uri
            pm = _PAGE_RE.match(text, end)
            if pm:
                emit(start, pm.end(), uri + "#sid" + pm.group("page"))
                page_chain(pm.end(), uri)
            else:
                emit(start, end, uri)
        m = _PUB_RE.search(text, max(pos, m.end()))
    if pos < len(text):
        segments.append(("str", text[pos:]))
    return segments


# ----------------------------------------------------- EU law (EGLag)
# Directive/regulation references with CELEX minting and article
# fragments (the EULAGSTIFTNING grammar; goldens
# test/files/legalref/EGLag/*).

_EG_MONTHS = ("januari|februari|mars|april|maj|juni|juli|augusti"
              "|september|oktober|november|december")
_EG_DIRNUM = r"(?P<dy>\d{2,4})/(?P<dn>\d+)/E?EG"
_EG_REGNUM = r"\(E?EG\)\s+nr\s+(?P<rn>\d+)/(?P<ry>\d{2,4})"
_EG_ACT_RE = re.compile(
    r"(?:artikel\s+(?P<art>\d+(?:\.\d+)?)\s+i\s+)?"
    r"(?:Europaparlamentets\s+och\s+rådets|rådets|kommissionens)\s+"
    r"(?:direktiv|förordning)\s+(?:%s|%s)"
    r"(?:\s+av\s+den\s+\d{1,2}\s+(?:%s)\s+\d{4})?"
    % (_EG_DIRNUM, _EG_REGNUM, _EG_MONTHS))
_EG_BARENUM_RE = re.compile(r"\b(?P<y>\d{2,4})/(?P<n>\d+)/E?EG\b")


def _celex(year: str, num: str, kind: str) -> str:
    if len(year) == 2:
        year = "19" + year
    return "3%s%s%04d" % (year, kind, int(num))


def scan_eglag(text: str, base: str = BASE):
    """Segments for EU directive/regulation citations."""
    links = []
    for m in _EG_ACT_RE.finditer(text):
        if m.group("dy"):
            celex = _celex(m.group("dy"), m.group("dn"), "L")
        else:
            celex = _celex(m.group("ry"), m.group("rn"), "R")
        uri = base + "ext/celex/" + celex
        if m.group("art"):
            uri += "#" + m.group("art")
        links.append((m.start(), m.end(), uri))
    covered = [(s, e) for s, e, _ in links]
    for m in _EG_BARENUM_RE.finditer(text):
        if any(s <= m.start() < e for s, e in covered):
            continue
        uri = base + "ext/celex/" + _celex(m.group("y"), m.group("n"),
                                           "L")
        links.append((m.start(), m.end(), uri))
    links.sort()
    segments, pos = [], 0
    for s, e, uri in links:
        if s < pos:
            continue
        if s > pos:
            segments.append(("str", text[pos:s]))
        segments.append(("link", text[s:e], uri))
        pos = e
    if pos < len(text):
        segments.append(("str", text[pos:]))
    return segments


# ------------------------------------------------ EU case law (ECJ)
# The EURATTSFALL grammar (reference res/ebnf/euratt.ebnf:1-14 —
# "(Case)? [CTF]-serial/year" — and eurattsfall_format_uri,
# legalref.py:1367-1390: CELEX 6<year>C<descriptor><serial %04d> with
# C->J, T->A, F->W and the 2054 two-digit-year pivot).  Both reference
# fixtures are listed broken in its own suite
# (integrationLegalRef.py:151-153: no <list> golden at all, and the
# texts use U+2011 non-breaking hyphens which the ASCII-'-' grammar
# never matches); we therefore also accept U+2011/U+2013 and assert
# corrected goldens in tests/test_legalref_goldens.py.

_ECJ_DESCRIPTOR = {"C": "J",   # Judgment of the Court
                   "T": "A",   # Court of First Instance
                   "F": "W"}   # Civil Service Tribunal
_ECJ_RE = re.compile(
    r"(?:Case\s)?(?P<dec>[CTF])[-‑–]"
    r"(?P<serial>\d+)/(?P<year>\d{2,4})")


def _ecj_celex(dec: str, serial: str, year: str) -> str:
    if len(year) == 2:
        year = ("20" if int(year) < 54 else "19") + year
    return "6%sC%s%04d" % (year, _ECJ_DESCRIPTOR[dec], int(serial))


def scan_ecj(text: str, base: str = BASE):
    """Segments for EU-court case references (Case C-176/09 etc.)."""
    segments, pos = [], 0
    for m in _ECJ_RE.finditer(text):
        if m.start() > pos:
            segments.append(("str", text[pos:m.start()]))
        uri = base + "ext/celex/" + _ecj_celex(
            m.group("dec"), m.group("serial"), m.group("year"))
        segments.append(("link", m.group(), uri))
        pos = m.end()
    if pos < len(text):
        segments.append(("str", text[pos:]))
    return segments
