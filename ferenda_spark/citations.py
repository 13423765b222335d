"""Citation recognition + URI minting.

Re-implements the observable semantics of the reference's citation
layer (SURVEY.md T4/T5):

* RFC citations (ferenda/sources/tech/rfc.py:430-452): the grammar
  ``section <S> of RFC <N>`` | ``section <S>`` | ``[RFC <N>]`` /
  ``RFC <N>``, minted as ``canonical_uri(N) + '#S' + S`` with leading
  zeros stripped from N and a trailing '.' stripped from S.
* URL citations (ferenda/citationpatterns.py:16-38): http/https/ftp
  URLs, with trailing ",).?#" punctuation excluded.

Two equivalent implementations are provided on purpose:

* :func:`scan_citations` — pure Python (used by golden tests and as the
  ``CitationParser.parse_string`` analogue, citationparser.py:65-96);
* :data:`RFC_CITATION_SQL_PATTERN` / Spark builtin recipes in
  :mod:`ferenda_spark.operators.mentions` — the production path uses
  JVM-side ``regexp_extract_all`` so citation scanning never leaves
  whole-stage codegen.
"""

from __future__ import annotations

import re

# section X of RFC N | section X | RFC N — faithful to the reference's
# pyparsing grammar (rfc.py:437-446): caseless "section", optional
# whitespace (incl. newlines) between tokens, and the section token is
# one-or-more of [0-9.] — so sentence-final "section." yields the
# degenerate Sec="." the reference also emits (rstripped to "#S")
RFC_CITATION_RE = re.compile(
    r"(?i:section)\s*(?P<sec>[0-9.]+)\s*of\s*\[?\s*RFC\s*(?P<rfc>\d+)\s*\]?"
    r"|(?i:section)\s*(?P<sec_only>[0-9.]+)"
    r"|\[?\s*RFC\s*(?P<rfc_only>\d+)\s*\]?")

URL_CITATION_RE = re.compile(
    r"\b(?P<url>(?:https?|ftp)://[^\s<>\"']+?)(?=[,.)\]?!;:]*(?:\s|$))")

# JVM-side equivalents (Spark regexp_extract_all, Java regex syntax)
RFC_FULL_SQL_PATTERN = r"(?:[Ss]ection\s+([0-9][0-9.]*)\s+of\s+)?\[?RFC\s*([0-9]+)\]?"
URL_SQL_PATTERN = r"((?:https?|ftp)://[^\s<>\"']+?)(?=[,.)\]?!;:]*(?:\s|$))"


def rfc_canonical_uri(num: str, base: str = "https://example.org/res/rfc/") -> str:
    """canonical_uri for a minted RFC target: leading zeros stripped
    (rfc.py:431-437: ``canonical_uri(parts['RFC'].lstrip('0'))``)."""
    return base + num.lstrip("0")


def rfc_uri(rfc: str | None, sec: str | None,
            base: str = "https://example.org/res/rfc/") -> str:
    """rfc_uriformatter semantics (rfc.py:430-437): RFC part then
    optional '#S<sec>' with trailing dot stripped."""
    uri = ""
    if rfc:
        uri += rfc_canonical_uri(rfc, base)
    if sec:
        uri += "#S" + sec.rstrip(".")
    return uri


def scan_citations(text: str, base: str = "https://example.org/res/rfc/"):
    """Scan a text block for RFC + URL citations; yields dicts
    ``{start, end, kind, uri}`` in document order (the
    CitationParser.parse_string splitting semantics,
    citationparser.py:65-96).  'section N' alone (no RFC) resolves
    relative to the *containing* document, so the minted uri is just
    '#S<n>' to be prefixed by the caller."""
    out = []
    for m in RFC_CITATION_RE.finditer(text):
        if m.group("sec_only"):
            kind, uri = "SecRef", "#S" + m.group("sec_only").rstrip(".")
        elif m.group("sec"):
            kind = "SecRFCRef"
            uri = rfc_uri(m.group("rfc"), m.group("sec"), base)
        else:
            kind, uri = "RFCRef", rfc_uri(m.group("rfc_only"), None, base)
        out.append({"start": m.start(), "end": m.end(), "kind": kind,
                    "uri": uri})
    for m in URL_CITATION_RE.finditer(text):
        out.append({"start": m.start("url"), "end": m.end("url"),
                    "kind": "url", "uri": m.group("url")})
    out.sort(key=lambda d: d["start"])
    return out


# --------------------------------------------------------------- eulaw
# The reference's second stock grammar (citationpatterns.py:40-76):
# Swedish-language EU-legislation references — match-first of
# article-within-act, act alone, or article alone.  Re-expressed as
# regexes with the same observable captures (Year / Ordinal /
# Association / LegalactType / ArticleID / SubarticleID).

_EULAW_MONTHS = ("januari|februari|mars|april|maj|juni|juli|augusti"
                 "|september|oktober|november|december")
_EULAW_INSTITUTION = (r"(?:Europaparlamentets och rådets|rådets"
                      r"|kommissionens)")
_EULAW_DIRECTIVE = (r"(?P<Year>\d{4}|\d{2})/(?P<Ordinal>\d+)"
                    r"/(?P<Association>EG|EEG)")
_EULAW_REGULATION = (r"\((?P<rAssociation>EG|EEG)\)\s+nr\s+"
                     r"(?P<rOrdinal>\d+)/(?P<rYear>\d{4}|\d{2})")
_EULAW_DATE = r"\d{1,2}\s+(?:%s)\s+\d{4}" % _EULAW_MONTHS
_EULAW_ACT = (r"%s\s+(?P<LegalactType>direktiv|förordning)\s+"
              r"(?:%s|%s)\s+av\s+den\s+%s"
              % (_EULAW_INSTITUTION, _EULAW_DIRECTIVE,
                 _EULAW_REGULATION, _EULAW_DATE))
_EULAW_ARTICLE = (r"artikel\s+(?P<ArticleID>\d+)"
                  r"(?:\.(?P<SubarticleID>\d+))?")

EULAW_RE = re.compile(
    "(?:%s\\s+i\\s+%s)|(?:%s)|(?:%s)"
    % (_EULAW_ARTICLE, _EULAW_ACT,
       _EULAW_ACT.replace("?P<", "?P<a_"),
       _EULAW_ARTICLE.replace("?P<", "?P<b_")))


def scan_eulaw(text: str):
    """Scan for EU-legislation references; yields
    ``{start, end, kind, parts}`` in document order, parts keyed like
    the reference grammar's named results."""
    out = []
    for m in EULAW_RE.finditer(text):
        g = {k: v for k, v in m.groupdict().items() if v is not None}
        # normalize alternative-branch and regulation captures
        # (a_Year/b_ArticleID/rYear -> Year/ArticleID/Year)
        parts = {}
        for k, v in g.items():
            k = k[2:] if k[:2] in ("a_", "b_") else k
            k = {"rYear": "Year", "rOrdinal": "Ordinal",
                 "rAssociation": "Association"}.get(k, k)
            parts[k] = v
        kind = ("ArticleLegalact" if "ArticleID" in parts
                and "LegalactType" in parts
                else "Legalact" if "LegalactType" in parts
                else "Article")
        out.append({"start": m.start(), "end": m.end(), "kind": kind,
                    "parts": parts})
    return out


def generic_uri(d: dict, base: str = "http://example.org/") -> str:
    """uriformats.generic semantics (uriformats.py:14-25): any parts
    dict -> querystring URI, insertion order preserved."""
    from urllib.parse import quote
    qs = "&".join(quote(str(k)) + "=" + quote(str(v))
                  for k, v in d.items())
    return "%s?%s" % (base, qs)


def eulaw_uri(d: dict) -> str:
    """CELEX minting for eulaw references — the reference leaves this
    unimplemented (uriformats.py:47-59 raises NotImplementedError);
    mirrored here for parity."""
    raise NotImplementedError("eulaw URI minting (parity with "
                              "uriformats.eulaw)")


# ------------------------------------------------- url component parse
# The reference's url grammar (citationpatterns.py:16-38) captures
# scheme/netloc/path/query/fragment, with trailing ",)." punctuation
# excluded from every component (delimitedList over
# url_tokens_not_at_end).  Golden-checked against
# test/files/citation/url/*.

_URL_PARTS_RE = re.compile(
    r"\b(?P<scheme>https?|ftp)://(?P<netloc>[^\s/]+)"
    r"(?P<path>/[^\s?#]*)?"
    r"(?:\?(?P<query>[^\s#]*))?"
    r"(?:\#(?P<fragment>[^\s]*))?")


def _rstrip_punct(s):
    return s.rstrip(",).") if s else s


def scan_url_citations(text: str):
    """Yield {start, end, parts} for each URL; component values have
    trailing ,). punctuation excluded (so the punctuation stays in the
    surrounding text), matching the reference grammar exactly."""
    out = []
    for m in _URL_PARTS_RE.finditer(text):
        parts = {"scheme": m.group("scheme"),
                 "netloc": _rstrip_punct(m.group("netloc"))}
        end = m.start("netloc") + len(parts["netloc"])
        for comp in ("path", "query", "fragment"):
            v = m.group(comp)
            if v is not None:
                v = _rstrip_punct(v)
                parts[comp] = v
                end = m.start(comp) + len(v)
        out.append({"start": m.start(), "end": end, "parts": parts})
    return out


# --------------------------------------------- legaluri COIN construct
# URI construction from typed property dicts (the reference's
# legaluri.construct over COIN templates, sources/legal/se/
# legaluri.py:80-140 + thirdparty/coin.py: prioritized templates
# selected by type + bound properties; SURVEY.md T7).

LEGALURI_BASE = "http://rinfo.lagrummet.se/"


def legaluri_construct(d: dict, base: str = LEGALURI_BASE) -> str:
    """Mint the canonical rinfo URI for a typed reference dict.
    Template priority: most-specific binding set first."""
    t = d.get("type")
    if t == 1:  # LAGRUM: a statute (optionally with fragment parts)
        uri = base + "publ/sfs/" + d["law"]
        frag = ""
        if "chapter" in d:
            frag += "K" + d["chapter"]
        if "section" in d:
            frag += "P" + d["section"]
        if "piece" in d:
            frag += "S" + str(d["piece"])
        return uri + ("#" + frag if frag else "")
    if t == 7:  # RATTSFALL: case-law report
        pub = d["rattsfallspublikation"]
        year = d["arsutgava"]
        if "sidnummer" in d:  # page-numbered series (NJA)
            return base + "publ/rf/%s/%s/s_%s" % (pub, year,
                                                  d["sidnummer"])
        return base + "publ/rf/%s/%s:%s" % (pub, year, d["lopnummer"])
    if t == 8:  # MYNDIGHETSBESLUT: agency decision by docket number
        return base + "publ/avg/%s/%s" % (d["myndighet"], d["dnr"])
    raise KeyError("no template for type %r" % t)
