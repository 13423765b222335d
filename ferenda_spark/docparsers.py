"""Document-structure parsers built on :mod:`ferenda_spark.fsm`.

Two parser configurations mirroring the reference's exemplars
(SURVEY.md P10/P11), re-implemented from scratch:

* :func:`rfc_parser` — plain-text documents in the RFC layout
  (ferenda/sources/tech/rfc.py:133-428 semantics): a two-column header,
  a centered title, preamble sections (Abstract, Status of This Memo),
  numbered sections "N. Title" / "N.N. Title" / "N.N.N. Title",
  "o  " unordered list items, preformatted blocks, page breaks (\\f).
* :func:`heading_sectionizer` — HTML documents sectioned by numbered
  h1-h4 headings (ferenda/sources/tech/w3c.py:84-207 semantics):
  ordinal dot-count drives Section/Subsection/Subsubsection nesting.

Output is a uniform list of section dicts
``{ordinal, title, text, kind}`` plus the document preamble text —
the exploded `sections` rows of the Spark pipeline.
"""

from __future__ import annotations

import re

from .fsm import StructureParser, newstate
from .htmlelements import Element, as_plaintext
from .textutil import normalize_space

# No DOTALL and no pre-strip, exactly like the reference
# (rfc.py:356 ``^(\d[\.\d]*) +(.*[^\.])$`` on the RAW chunk): a
# multi-line chunk (wrapped list item, TOC page) or an indented line
# can never be a section heading.
_SECTION_RE = re.compile(r"^(\d[\.\d]*) +(.*[^\.])$")


def _analyze_sectionstart(chunk: str):
    """'1.2  Some Title' -> ('1.2', 'Some Title'); (None, None) if not
    a section heading (rfc.py:356-368 semantics: ordinal = leading
    digits/dots token at column 0, single-line title follows)."""
    m = _SECTION_RE.match(chunk)
    if not m:
        return None, None
    ordinal = m.group(1).rstrip(".")
    title = normalize_space(m.group(2))
    if not all(p.isdigit() for p in ordinal.split(".")):
        return None, None
    return ordinal, title


def _segments(ordinal):
    return 0 if not ordinal else len(ordinal.split("."))


class Node(list):
    """Generic tree node for parser output."""

    def __init__(self, kind, **attrs):
        super().__init__()
        self.kind = kind
        self.attrs = attrs

    def __repr__(self):  # pragma: no cover
        return "Node(%s, %r, %d children)" % (self.kind, self.attrs, len(self))


# ---------------------------------------------------------------- RFC text

def rfc_parser() -> StructureParser:
    """FSM configured for RFC-like plain text, chunked by blank-line
    paragraphs (textreader.py:159-227 readparagraph semantics)."""

    def _splitcolumns(chunk):
        # rfc.py:165-177: split each line on the first run of >=3
        # spaces into (left, right); record raw line lengths
        leftlines, rightlines, linelens = [], [], []
        for line in chunk.split("\n"):
            linelens.append(len(line))
            if "   " in line:
                left, right = line.split("   ", 1)
            else:
                left, right = line, ""
            leftlines.append(left)
            rightlines.append(right.strip())
        return leftlines, rightlines, linelens

    def is_rfcheader(p, chunk=None, lenient=True):
        # rfc.py:140-162: >=2 lines; left-only lines must be short;
        # in strict (non-lenient) mode every two-column line must be
        # right-justified to the first line's length — used to detect
        # a header continuation chunk after a spurious blank line
        chunk = chunk if chunk is not None else p.reader.peek()
        left, right, linelens = _splitcolumns(chunk)
        if len(linelens) < 2:
            return False
        targetlen = linelens[0]
        for idx, length in enumerate(linelens):
            if right[idx] == "" and length > 40:
                return False
            elif right[idx] != "" and length != targetlen and not lenient:
                return False
        return True

    def is_doctitle(p, chunk=None):
        return True

    def is_pagebreak(p, chunk=None):
        chunk = chunk if chunk is not None else p.reader.peek()
        return "\f" in chunk

    def is_header(p, chunk=None):
        chunk = chunk if chunk is not None else p.reader.peek()
        s = chunk.strip()
        return (s != "" and len(s.split("\n")) == 1
                and not s.endswith(".") and not chunk.startswith(" "))

    def _is_sec(n):
        def rec(p, chunk=None):
            chunk = chunk if chunk is not None else p.reader.peek()
            ordinal, _ = _analyze_sectionstart(chunk)
            return _segments(ordinal) == n
        rec.__name__ = "is_section%d" % n
        return rec

    is_section, is_subsection, is_subsubsection = (
        _is_sec(1), _is_sec(2), _is_sec(3))

    def is_ul_listitem(p, chunk=None):
        chunk = chunk if chunk is not None else p.reader.peek()
        return chunk.strip().startswith("o  ")

    def is_preformatted(p, chunk=None):
        chunk = chunk if chunk is not None else p.reader.peek()
        stripped = "\n".join(x[3:] for x in chunk.split("\n"))
        stripped = stripped.replace(".  ", ". ")
        return "  " in stripped or "...." in stripped or ". . . " in stripped

    def is_paragraph(p, chunk=None):
        return True

    def make_body(p):
        return p.make_children(Node("body"))
    make_body.newstate = "body"

    def make_rfcheader(p):
        # a spurious blank line can split the header in two chunks
        # (e.g. RFC 6912); the continuation is recognized by the
        # strict right-justification test (rfc.py:338-342)
        headerchunk = p.reader.next()
        try:
            if is_rfcheader(p, lenient=False):
                headerchunk += "\n" + p.reader.next()
        except StopIteration:
            pass
        return Node("rfcheader", text=headerchunk)

    def make_doctitle(p):
        return Node("doctitle", title=normalize_space(p.reader.next()))

    @newstate("preamble-section")
    def make_preamble_section(p):
        return p.make_children(Node("preamble", title=p.reader.next().strip()))

    @newstate("preamble-section")
    def make_abstract(p):
        return p.make_children(Node("preamble", title="(Abstract)"))

    def _make_section_factory(state):
        @newstate(state)
        def make_section(p):
            ordinal, title = _analyze_sectionstart(p.reader.next())
            return p.make_children(Node("section", ordinal=ordinal, title=title))
        return make_section

    make_section = _make_section_factory("section")
    make_subsection = _make_section_factory("subsection")
    make_subsubsection = _make_section_factory("subsubsection")

    @newstate("ul-list")
    def make_unordered_list(p):
        return p.make_children(Node("ul"))

    @newstate("listitem")
    def make_listitem(p):
        chunk = p.reader.next()
        item = Node("li")
        item.append(normalize_space(chunk.strip()[3:]))
        return p.make_children(item)

    def make_preformatted(p):
        return Node("pre", text=p.reader.next())

    def make_paragraph(p):
        return Node("p", text=normalize_space(p.reader.next()))

    def skip_pagebreak(p):
        # retain the running short title from the new page's header
        # line "RFC NNNN   <short title>   <date>" (rfc.py:264-271);
        # the node is dropped from text flattening but feeds
        # bibo:shortTitle (cleanup_body, rfc.py:520-535)
        chunk = p.reader.next()
        lastline = chunk.split("\n")[-1]
        parts = re.split("  +", lastline)
        if len(parts) > 2:
            return Node("pagebreak", shorttitle=parts[1])
        return None

    p = StructureParser()
    p.set_recognizers(is_pagebreak, is_rfcheader, is_doctitle,
                      is_section, is_subsection, is_subsubsection,
                      is_header, is_ul_listitem, is_preformatted,
                      is_paragraph)
    common = ("section", "subsection", "subsubsection")
    p.set_transitions({
        ("body", is_rfcheader): (make_rfcheader, "doctitle"),
        ("doctitle", is_doctitle): (make_doctitle, "preamble"),
        ("preamble", is_header): (make_preamble_section, "preamble-section"),
        ("preamble", is_paragraph): (make_abstract, "preamble-section"),
        ("preamble-section", is_paragraph): (make_paragraph, None),
        ("preamble-section", is_header): (False, None),
        ("preamble-section", is_pagebreak): (skip_pagebreak, None),
        ("preamble-section", is_section): (False, "after-preamble"),
        ("after-preamble", is_section): (make_section, "section"),
        ("section", is_subsection): (make_subsection, "subsection"),
        ("section", is_section): (False, None),
        ("subsection", is_subsubsection): (make_subsubsection, "subsubsection"),
        ("subsection", is_subsection): (False, None),
        ("subsection", is_section): (False, None),
        ("subsubsection", is_subsubsection): (False, None),
        ("subsubsection", is_subsection): (False, None),
        ("subsubsection", is_section): (False, None),
        (common, is_ul_listitem): (make_unordered_list, "ul-list"),
        ("ul-list", is_ul_listitem): (make_listitem, "listitem"),
        ("ul-list", is_paragraph): (False, None),
        ("listitem", is_paragraph): (False, None),
        (common, is_preformatted): (make_preformatted, None),
        (common, is_paragraph): (make_paragraph, None),
        (common, is_pagebreak): (skip_pagebreak, None),
    })
    p.initial_state = "body"
    p.initial_constructor = make_body
    return p


def split_paragraphs(text: str):
    """Blank-line paragraph chunking (textreader.py readparagraph:
    split on empty lines only — a form-feed line is NOT a separator,
    so page footer + \\f + next page's header stay one chunk for the
    pagebreak recognizer)."""
    out = []
    for c in re.split(r"\n[ \t]*\n", text):
        # an odd run of blank lines leaves a leading newline on the
        # chunk, which would defeat every column-0 recognizer
        c = re.sub(r"^(?:[ \t]*\n)+", "", c)
        if c.strip():
            out.append(c)
    return out


# ----------------------------------------------------------- HTML headings

_HEADINGS = ("h1", "h2", "h3", "h4")


def heading_sectionizer() -> StructureParser:
    """FSM over *element* chunks: numbered h1-h4 headings open
    Section/Subsection/Subsubsection by ordinal dot count; everything
    else becomes content of the open section (w3c.py:84-207 semantics)."""

    def _heading_ordinal(el):
        if not isinstance(el, Element) or el.tag not in _HEADINGS:
            return None, None
        return _analyze_sectionstart(as_plaintext(el))

    def _is_sec(n):
        def rec(p, chunk=None):
            el = chunk if chunk is not None else p.reader.peek()
            ordinal, _ = _heading_ordinal(el)
            return _segments(ordinal) == n
        rec.__name__ = "is_hsection%d" % n
        return rec

    is_section, is_subsection, is_subsubsection = (
        _is_sec(1), _is_sec(2), _is_sec(3))

    def is_nonsection(p, chunk=None):
        return True

    def make_body(p):
        return p.make_children(Node("body"))
    make_body.newstate = "body"

    def _make_section_factory(state):
        @newstate(state)
        def make_section(p):
            el = p.reader.next()
            ordinal, title = _heading_ordinal(el)
            return p.make_children(Node("section", ordinal=ordinal, title=title))
        return make_section

    make_section = _make_section_factory("section")
    make_subsection = _make_section_factory("subsection")
    make_subsubsection = _make_section_factory("subsubsection")

    def make_content(p):
        el = p.reader.next()
        txt = as_plaintext(el)
        if not txt:
            return None
        return Node("p", text=txt)

    p = StructureParser()
    p.set_recognizers(is_section, is_subsection, is_subsubsection,
                      is_nonsection)
    common = ("body", "section", "subsection", "subsubsection")
    p.set_transitions({
        ("body", is_section): (make_section, "section"),
        ("section", is_subsection): (make_subsection, "subsection"),
        ("section", is_section): (False, None),
        ("subsection", is_subsubsection): (make_subsubsection, "subsubsection"),
        ("subsection", is_subsection): (False, None),
        ("subsection", is_section): (False, None),
        ("subsubsection", is_subsubsection): (False, None),
        ("subsubsection", is_subsection): (False, None),
        ("subsubsection", is_section): (False, None),
        (common, is_nonsection): (make_content, None),
    })
    p.initial_state = "body"
    p.initial_constructor = make_body
    return p


# ------------------------------------------------------------- flattening

def flatten_sections(root: Node):
    """Walk the parsed tree -> (preamble_text, [section dicts]).

    Section dict: ``{ordinal, title, text}`` where text is the
    space-joined plaintext of the section's own (non-nested-section)
    content — matching the "one indexed resource per URI-addressable
    part" model (fulltextindex.py:25-297 semantics)."""
    preamble_parts, sections = [], []

    def own_text(node):
        parts = []
        for c in node:
            if isinstance(c, str):
                parts.append(c)
            elif isinstance(c, Node) and c.kind != "section":
                t = c.attrs.get("text") or c.attrs.get("title") or ""
                sub = own_text(c)
                parts.append(" ".join(x for x in (t, sub) if x))
        return " ".join(p for p in parts if p)

    def walk(node, in_section):
        for c in node:
            if isinstance(c, Node) and c.kind == "section":
                sections.append({
                    "ordinal": c.attrs["ordinal"],
                    "title": c.attrs["title"],
                    "text": own_text(c),
                })
                walk(c, True)
            elif isinstance(c, Node) and c.kind == "preamble":
                preamble_parts.append(
                    " ".join(x for x in (c.attrs.get("title", ""), own_text(c)) if x))
                walk(c, in_section)
            elif not in_section and isinstance(c, Node):
                t = c.attrs.get("text") or c.attrs.get("title") or ""
                if t and c.kind not in ("rfcheader",):
                    preamble_parts.append(t)

    walk(root, False)
    return " ".join(preamble_parts), sections


def parse_rfc_tree(text: str) -> Node:
    """Plain RFC text -> parsed body tree, with the reference's
    faux-bold backspace-overstrike cleanup applied per paragraph
    (re.sub('.\\b', ''), rfc.py:461-467; SURVEY.md P12)."""
    chunks = [re.sub(".\x08", "", c) for c in split_paragraphs(text)]
    return rfc_parser().parse(chunks)


def parse_rfc_text(text: str):
    """Plain text -> (doctitle, preamble_text, sections)."""
    body = parse_rfc_tree(text)
    title = None
    for c in body:
        if isinstance(c, Node) and c.kind == "doctitle":
            title = c.attrs["title"]
            break
    pre, secs = flatten_sections(body)
    return title, pre, secs


def parse_html_sections(body_element: Element):
    """Pruned <body> element -> (preamble_text, sections) via the
    heading FSM over the body's direct children."""
    chunks = [c for c in body_element.children if isinstance(c, Element)]
    root = heading_sectionizer().parse(chunks)
    return flatten_sections(root)
