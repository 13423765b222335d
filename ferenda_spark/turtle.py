"""Minimal Turtle reader — just enough to load the reference's
distilled golden graphs (test/files/repo/*/distilled/*.ttl) for
triple-set comparison without an rdflib dependency.

Supports: @prefix, IRIs, prefixed names, `a`, object lists (`,`),
predicate lists (`;`), string literals with \\-escapes, @lang tags,
^^datatype, and the abbreviated numeric/boolean literal forms
(Turtle §2.5.2: bare ``42`` / ``4.2`` / ``4e2`` / ``true`` lex to
xsd:integer / xsd:decimal / xsd:double / xsd:boolean literals, the
lexical form preserved verbatim).  Emits triples as (subj, pred, obj)
where obj is
("uri", value) or ("lit", value, lang, datatype) — the same shape
:mod:`ferenda_spark.rfcdistill` produces, so comparison is plain set
algebra (the semantics of the reference's assertEqualGraphs,
testutil.py:58-116, blank-node-free).
"""

from __future__ import annotations

import re

_TOKEN = re.compile(r"""
    (?P<iri><[^>]*>)
  | (?P<literal>"(?:[^"\\]|\\.)*")
  | (?P<langtag>@[A-Za-z][A-Za-z0-9-]*)
  | (?P<dtype>\^\^)
  | (?P<num>[+-]?(?:\d*\.\d+(?:[eE][+-]?\d+)?|\d+[eE][+-]?\d+|\d+))
  | (?P<punct>[;,.])
  | (?P<bool>\b(?:true|false)\b)
  | (?P<pname>[A-Za-z_][\w.-]*:[\w.%-]*|a\b)
  | (?P<ws>\s+|\#[^\n]*)
""", re.VERBOSE)

_UNESCAPE = {
    "\\\"": "\"", "\\\\": "\\", "\\n": "\n", "\\t": "\t", "\\r": "\r",
}

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
_XSD = "http://www.w3.org/2001/XMLSchema#"


def _num_datatype(lexical):
    """Turtle grammar: exponent -> double, dot -> decimal, else
    integer (the lexical form is preserved verbatim)."""
    if "e" in lexical or "E" in lexical:
        return _XSD + "double"
    if "." in lexical:
        return _XSD + "decimal"
    return _XSD + "integer"


def _tokens(text):
    pos = 0
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if not m:
            raise ValueError("turtle parse error at %r" % text[pos:pos + 40])
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        yield kind, m.group()


def _unescape(s):
    def sub(m):
        g = m.group()
        if g[1] in "uU":
            return chr(int(g[2:], 16))
        return _UNESCAPE.get(g, g[1])
    return re.sub(r"\\u[0-9a-fA-F]{4}|\\U[0-9a-fA-F]{8}|\\.", sub, s)


def parse_turtle(text: str):
    """Return a set of (subj, pred, obj) triples; see module doc for
    the obj encoding."""
    prefixes = {}
    triples = set()
    toks = list(_tokens(text))
    i = 0

    def resolve(kind, val):
        if kind == "iri":
            return val[1:-1]
        if val == "a":
            return RDF_TYPE
        pfx, local = val.split(":", 1)
        return prefixes[pfx] + local

    while i < len(toks):
        kind, val = toks[i]
        if val.startswith("@"):  # @prefix directive (lexed as langtag)
            # pattern: @prefix  pfx:  <iri>  .
            pfx = toks[i + 1][1].rstrip(":").split(":")[0]
            prefixes[pfx] = toks[i + 2][1][1:-1]
            i += 4
            continue
        # statement: subject  predicate-object-list  .
        subj = resolve(kind, val)
        i += 1
        while True:
            pred = resolve(*toks[i])
            i += 1
            while True:  # object list
                okind, oval = toks[i]
                if okind == "iri":
                    obj = ("uri", oval[1:-1])
                    i += 1
                elif okind == "literal":
                    lit = _unescape(oval[1:-1])
                    lang = dtype = None
                    if i + 1 < len(toks) and toks[i + 1][0] == "langtag":
                        lang = toks[i + 1][1][1:]
                        i += 2
                    elif i + 1 < len(toks) and toks[i + 1][0] == "dtype":
                        dtype = resolve(*toks[i + 2])
                        i += 3
                    else:
                        i += 1
                    obj = ("lit", lit, lang, dtype)
                elif okind == "num":
                    obj = ("lit", oval, None, _num_datatype(oval))
                    i += 1
                elif okind == "bool":
                    obj = ("lit", oval, None, _XSD + "boolean")
                    i += 1
                else:
                    obj = ("uri", resolve(okind, oval))
                    i += 1
                triples.add((subj, pred, obj))
                if toks[i][1] == ",":
                    i += 1
                    continue
                break
            if toks[i][1] == ";":
                i += 1
                if toks[i][1] == ".":  # trailing ; before .
                    i += 1
                    break
                continue
            if toks[i][1] == ".":
                i += 1
                break
        # next statement
    return triples
