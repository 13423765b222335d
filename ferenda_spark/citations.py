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

# section X of RFC N | section X | RFC N (optionally [RFC N])
RFC_CITATION_RE = re.compile(
    r"(?:[Ss]ection\s+(?P<sec>[0-9][0-9.]*)\s+of\s+)?\[?RFC\s*(?P<rfc>\d+)\]?"
    r"|[Ss]ection\s+(?P<sec_only>[0-9][0-9.]*)")

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
            kind, uri = "RFCRef", rfc_uri(m.group("rfc"), None, base)
        out.append({"start": m.start(), "end": m.end(), "kind": kind,
                    "uri": uri})
    for m in URL_CITATION_RE.finditer(text):
        out.append({"start": m.start("url"), "end": m.end("url"),
                    "kind": "url", "uri": m.group("url")})
    out.sort(key=lambda d: d["start"])
    return out
