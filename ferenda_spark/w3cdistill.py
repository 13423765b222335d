"""W3C-standard HTML distillation: page bytes -> the triple set the
reference's W3Standards repo emits (sources/tech/w3c.py:84-262 +
decorate_bodyparts :290-303), checked exactly against its distilled
goldens (test/files/repo/w3c/distilled/*.ttl).

This is the HTML branch of the engine (the closest analogue to
Common-Crawl pages, SURVEY.md P11): metadata from the DOM (title,
"W3C Recommendation <date>" heading, publisher), body structure from
an element-chunk FSM (numbered h1-h4 headings nest sections by
ordinal dot-count; named non-numbered h* open preamble sections).

Triple encoding matches :mod:`ferenda_spark.turtle`.
"""

from __future__ import annotations

import re

from .docparsers import Node, _analyze_sectionstart, _segments
from .fsm import StructureParser, newstate
from .htmlelements import (Element, as_plaintext, decode_html, parse_html,
                           prune)

DCTERMS = "http://purl.org/dc/terms/"
BIBO = "http://purl.org/ontology/bibo/"
PROV = "http://www.w3.org/ns/prov#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
W3C_NS = "http://example.org/ontology/w3c/"
XSD_DATE = "http://www.w3.org/2001/XMLSchema#date"

GENERATOR = "ferenda.sources.tech.w3c.W3Standards"

PREAMBLE_TITLES = ("abstract", "status of this document",
                   "table of contents", "appendices")

_HEADINGS = ("h1", "h2", "h3", "h4")

_MONTHS_FULL = ("January", "February", "March", "April", "May", "June",
                "July", "August", "September", "October", "November",
                "December")
_MONTHS = {m: i + 1 for i, m in enumerate(_MONTHS_FULL)}
_MONTHS.update({m[:3]: i + 1 for i, m in enumerate(_MONTHS_FULL)})


def w3c_sectionizer() -> StructureParser:
    """The W3Standards FSM (w3c.py:84-207) over pruned-body element
    chunks."""

    def _heading(p, chunk=None):
        el = chunk if chunk is not None else p.reader.peek()
        return isinstance(el, Element) and el.tag in _HEADINGS

    def is_preamblesection(p, chunk=None):
        if not _heading(p, chunk):
            return False
        el = chunk if chunk is not None else p.reader.peek()
        return as_plaintext(el).lower() in PREAMBLE_TITLES

    def is_preambleending(p, chunk=None):
        el = chunk if chunk is not None else p.reader.peek()
        return isinstance(el, Element) and el.tag == "hr"

    def _is_sec(n):
        def rec(p, chunk=None):
            if not _heading(p, chunk):
                return False
            el = chunk if chunk is not None else p.reader.peek()
            ordinal, _ = _analyze_sectionstart(as_plaintext(el))
            return _segments(ordinal) == n
        rec.__name__ = "is_w3csection%d" % n
        return rec

    is_section, is_subsection, is_subsubsection = (
        _is_sec(1), _is_sec(2), _is_sec(3))

    def is_header(p, chunk=None):
        return _heading(p, chunk)

    def is_other(p, chunk=None):
        return True

    def make_body(p):
        return p.make_children(Node("body"))
    make_body.newstate = "body"

    @newstate("preamblesection")
    def make_preamble_section(p):
        return p.make_children(
            Node("preamble", title=as_plaintext(p.reader.next())))

    def make_other(p):
        el = p.reader.next()
        txt = as_plaintext(el) if isinstance(el, Element) else str(el)
        return Node("p", text=txt) if txt else None

    def _make_section_factory(state):
        @newstate(state)
        def make_section(p):
            ordinal, title = _analyze_sectionstart(
                as_plaintext(p.reader.next()))
            return p.make_children(
                Node("section", ordinal=ordinal, title=title))
        return make_section

    make_section = _make_section_factory("section")
    make_subsection = _make_section_factory("subsection")
    make_subsubsection = _make_section_factory("subsubsection")

    p = StructureParser()
    p.set_recognizers(is_section, is_subsection, is_subsubsection,
                      is_preamblesection, is_preambleending, is_header,
                      is_other)
    common = ("body", "preamblesection", "section", "subsection",
              "subsubsection")
    p.set_transitions({
        ("body", is_preamblesection): (make_preamble_section,
                                       "preamblesection"),
        ("preamblesection", is_preamblesection): (False, None),
        ("preamblesection", is_preambleending): (False, None),
        ("preamblesection", is_section): (False, None),
        ("body", is_section): (make_section, "section"),
        (common, is_other): (make_other, None),
        ("section", is_subsection): (make_subsection, "subsection"),
        ("section", is_section): (False, None),
        ("subsection", is_subsubsection): (make_subsubsection,
                                           "subsubsection"),
        ("subsection", is_subsection): (False, None),
        ("subsection", is_section): (False, None),
        ("subsubsection", is_subsubsection): (False, None),
        ("subsubsection", is_subsection): (False, None),
        ("subsubsection", is_section): (False, None),
    })
    p.initial_state = "body"
    p.initial_constructor = make_body
    return p


def _find_all(node: Element, tags):
    out = []
    for c in getattr(node, "children", ()):
        if isinstance(c, Element):
            if c.tag in tags:
                out.append(c)
            out.extend(_find_all(c, tags))
    return out


def _lit(v, lang=None, dtype=None):
    return ("lit", v, lang, dtype)


def distill_w3c(raw: bytes, basefile: str,
                base: str = "http://localhost:8000/",
                lang: str = "en") -> set:
    """W3C Recommendation HTML bytes -> reference-equivalent distilled
    triple set."""
    doc_uri = base + "res/w3c/" + basefile
    root = parse_html(decode_html(raw))
    triples = set()
    triples.add((doc_uri, RDF_TYPE, ("uri", W3C_NS + "Recommendation")))
    triples.add((doc_uri, PROV + "wasGeneratedBy", _lit(GENERATOR)))
    triples.add((doc_uri, DCTERMS + "publisher", ("uri", base + "ext/w3c")))
    triples.add((doc_uri, DCTERMS + "identifier", _lit(basefile)))

    title_el = root.find("title")
    if title_el is not None:
        triples.add((doc_uri, DCTERMS + "title",
                     _lit(as_plaintext(title_el), lang)))

    # dcterms:issued from the "W3C Recommendation <d month yyyy>"
    # h2/h3 heading (w3c.py:216-241)
    for h in _find_all(root, ("h2", "h3")):
        text = " ".join(as_plaintext(h).split())
        if not re.search(r"W3C\s+Recommendation,?\s+", text):
            continue
        m = re.search(r"(\d+)[ \-](\w+),?[ \-](\d{4})", text)
        if m and m.group(2) in _MONTHS:
            triples.add((doc_uri, DCTERMS + "issued",
                         _lit("%s-%02d-%02d" % (m.group(3),
                                                _MONTHS[m.group(2)],
                                                int(m.group(1))),
                              None, XSD_DATE)))
        break

    # body structure -> PS + section triples (decorate_bodyparts
    # semantics: type + title@lang + plain-literal chapter; the W3C
    # repo does NOT remove the ToC preamble and emits no isPartOf)
    body = root.find("body")
    if body is None:  # degenerate page: metadata-only distill
        return triples
    body = prune(body)
    chunks = [c for c in body.children if isinstance(c, Element)]
    tree = w3c_sectionizer().parse(chunks)

    ps = 0
    for c in tree:
        if not isinstance(c, Node):
            continue
        if c.kind == "preamble":
            ps += 1
            uri = doc_uri + "#PS%d" % ps
            triples.add((uri, RDF_TYPE, ("uri", BIBO + "DocumentPart")))
            triples.add((uri, DCTERMS + "title",
                         _lit(c.attrs.get("title", ""), lang)))

    def walk(node: Node):
        for c in node:
            if not (isinstance(c, Node) and c.kind == "section"):
                continue
            ordinal = c.attrs["ordinal"]
            uri = doc_uri + "#S" + ordinal
            triples.add((uri, RDF_TYPE, ("uri", BIBO + "DocumentPart")))
            triples.add((uri, DCTERMS + "title",
                         _lit(c.attrs["title"], lang)))
            triples.add((uri, BIBO + "chapter", _lit(ordinal)))
            walk(c)

    walk(tree)
    return triples
