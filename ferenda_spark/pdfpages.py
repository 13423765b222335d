"""PDF page-layout model + layout analyzer (the reference's
PDFReader/PDFAnalyzer pair re-expressed; pdfreader.py:456-1500,
pdfanalyze.py:25-556).

The pdftotext/pdftohtml conversion itself is an external poppler
binary (the reference shells out to it and caches the XML); that
conversion is out of scope here, exactly like the reference's own
tests which run from cached ``intermediate/*.xml``.  Everything
downstream is implemented from scratch and golden-checked against the
reference's fixtures:

* :func:`parse_pdf2xml` — the pdf2xml intermediate format -> pages of
  per-``<text>`` textboxes with fonts (subset prefixes stripped),
  whitespace-normalized text, and ``b``/``i``/``a`` runs flattened to
  tag-accumulated text elements (``<i><b>x</b></i>`` -> tag "ib");
* :class:`PdfAnalyzer` — margin/style analysis: character-weighted
  top/bottom-margin counters, box-count left/right-margin counters
  with odd/even page separation, header/footer zone detection by
  significance thresholds, right-margin bin-quantization, and the
  default/h1-h3 style hierarchy — the numbers asserted by the
  reference's testPDFAnalyze over lipsum.xml reproduce exactly.

Spark surface: :func:`pdf_textboxes` maps (url, pdf2xml) rows to
textbox rows in one Arrow-batched stage — the same stage shape as the
HTML parse; a 100 TB corpus of converted PDF pages streams through it
with no driver-side state.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from collections import Counter
from itertools import chain
from math import ceil, floor


def _normspace(txt: str) -> str:
    """Whitespace normalization preserving one leading/trailing space
    (pdfreader's normspace)."""
    txt = txt.replace("\n", " ").replace("\t", " ").replace("\xa0", " ")
    start = " " if txt.startswith(" ") else ""
    end = " " if txt.endswith(" ") and len(txt) > 1 else ""
    return start + " ".join(txt.split()) + end


class Font:
    def __init__(self, fid, size, family, color):
        self.id = fid
        self.size = int(size)
        if "+" in family:
            family = family.split("+", 1)[1]
        self.family = family
        self.color = color


class Textelement:
    def __init__(self, text, tag=None, uri=None):
        self.text = text
        self.tag = tag
        self.uri = uri

    def __str__(self):
        return self.text


class Textbox:
    def __init__(self, left, top, width, height, font, elements):
        self.left, self.top = left, top
        self.width, self.height = width, height
        self.right = left + width
        self.bottom = top + height
        self.font = font
        self.elements = elements

    def __len__(self):
        return len(self.elements)

    def __getitem__(self, i):
        return self.elements[i]

    def __str__(self):
        return "".join(e.text for e in self.elements)


class Page:
    def __init__(self, number, width, height):
        self.number = number
        self.width, self.height = width, height
        self.boxes: list[Textbox] = []

    def __iter__(self):
        return iter(self.boxes)

    def __len__(self):
        return len(self.boxes)

    def __getitem__(self, i):
        return self.boxes[i]

    def boundingbox(self, top=0, left=0, bottom=None, right=None):
        """Boxes fully inside the given area, nonempty text only."""
        bottom = self.height if bottom is None else bottom
        right = self.width if right is None else right
        for box in self.boxes:
            if (box.top >= top and box.left >= left
                    and box.bottom <= bottom and box.right <= right
                    and str(box).strip()):
                yield box

    def __str__(self):
        excerpt = " ".join(str(b) for b in self.boxes)
        return "Page %s (%d x %d): '%s...'" % (self.number, self.width,
                                               self.height, excerpt[:40])


def _elements(el, tag=""):
    """Flatten a <text> element's b/i/a structure into tag-accumulated
    Textelements (pdfreader._parse_xml_make_textelement cases)."""
    out = []
    if el.tag in ("b", "i"):
        tag = tag + el.tag
    uri = el.get("href") if el.tag == "a" else None
    if el.text:
        t = _normspace(el.text)
        if t:
            out.append(Textelement(t, tag or None, uri))
    for child in el:
        out.extend(_elements(child, tag))
        if child.tail:
            t = _normspace(child.tail)
            if t:
                out.append(Textelement(t, tag or None))
    return out


_XML_ILLEGAL = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f]")


def parse_pdf2xml(xml_text: str) -> list[Page]:
    # real-world pdftotext output leaks raw control characters that
    # XML 1.0 forbids (e.g. prop_1997_98_44.xml has 0x11); strip them
    # like the reference's recovering lxml parse does
    root = ET.fromstring(_XML_ILLEGAL.sub("", xml_text))
    fonts: dict[int, Font] = {}
    pages = []
    for pel in root.iter("page"):
        page = Page(int(pel.get("number")), int(pel.get("width")),
                    int(pel.get("height")))
        for el in pel:
            if el.tag == "fontspec":
                fid = int(el.get("id"))
                fonts[fid] = Font(el.get("id"), el.get("size"),
                                  el.get("family"), el.get("color"))
            elif el.tag == "text":
                elements = _elements(el)
                if not any(e.text.strip() for e in elements):
                    continue           # whitespace-only boxes drop
                page.boxes.append(Textbox(
                    int(el.get("left")), int(el.get("top")),
                    int(el.get("width")), int(el.get("height")),
                    fonts[int(el.get("font"))], elements))
        pages.append(page)
    return pages


class PdfAnalyzer:
    """Margin/style analysis over parsed pages (pdfanalyze.PDFAnalyzer
    semantics; thresholds and algorithms mirrored)."""

    twopage = True
    style_significance_threshold = 0.005
    header_significance_threshold = 0.002
    footer_significance_threshold = 0.002

    def __init__(self, pages: list[Page]):
        self.pages = pages
        self.scanned_source = False

    @property
    def documents(self):
        return [(0, len(self.pages), "main")]

    def textboxes(self, startpage, pagecount):
        for page in self.pages[startpage:startpage + pagecount]:
            for box in page:
                yield page.number, box

    # ------------------------------------------------------- counters

    def count_horizontal_margins(self, startpage, pagecount):
        counters = {"leftmargin": Counter(), "rightmargin": Counter(),
                    "pagewidth": Counter()}
        if self.twopage:
            counters["leftmargin_even"] = Counter()
            counters["rightmargin_even"] = Counter()
        for pagenumber, box in self.textboxes(startpage, pagecount):
            if self.twopage and pagenumber % 2 == 0:
                counters["leftmargin_even"][box.left] += 1
                counters["rightmargin_even"][box.right] += 1
            else:
                counters["leftmargin"][box.left] += 1
                counters["rightmargin"][box.right] += 1
        for page in self.pages[startpage:startpage + pagecount]:
            counters["pagewidth"][page.width] += 1
        return counters

    def count_vertical_margins(self, startpage, pagecount):
        counters = {"topmargin": Counter(), "bottommargin": Counter(),
                    "pageheight": Counter()}
        for _, box in self.textboxes(startpage, pagecount):
            n = len(str(box).strip())
            counters["topmargin"][box.top] += n
            counters["bottommargin"][box.bottom] += n
        for page in self.pages[startpage:startpage + pagecount]:
            counters["pageheight"][page.height] += 1
        return counters

    def count_styles(self, startpage, pagecount):
        c: Counter = Counter()
        for _, box in self.textboxes(startpage, pagecount):
            c[(box.font.family, box.font.size)] += len(str(box).strip())
        return c

    # ------------------------------------------------------- analysis

    def analyze_vertical_margins(self, vcounters):
        maxcount = (self.header_significance_threshold
                    * sum(vcounters["topmargin"].values()))
        charcount = 0
        header = maxcount
        for i in range(max(vcounters["pageheight"])):
            charcount += vcounters["topmargin"].get(i, 0)
            if charcount > maxcount:
                header = i - 1
                break
        charcount = 0
        maxcount = (self.footer_significance_threshold
                    * sum(vcounters["topmargin"].values()))
        footer = maxcount
        for i in range(max(vcounters["pageheight"]) - 1, -1, -1):
            charcount += vcounters["bottommargin"].get(i, 0)
            if charcount > maxcount:
                footer = i + 1
                break
        return {"topmargin": header, "bottommargin": footer,
                "pageheight": max(vcounters["pageheight"])}

    def analyze_horizontal_margins(self, counters):
        out = {}
        pagewidth = counters["pagewidth"].most_common(1)[0][0]
        midpage = pagewidth / 2
        l = self._filter(counters["leftmargin"], lambda x: x < midpage)
        r = self._filter(counters["rightmargin"], lambda x: x > midpage)
        if l:
            out["leftmargin"] = self._findmargin(
                l, floor, quantize=self.scanned_source)
        if r:
            out["rightmargin"] = self._findmargin(r, ceil, quantize=True)
        if self.twopage:
            le = self._filter(counters["leftmargin_even"],
                              lambda x: x < midpage)
            re_ = self._filter(counters["rightmargin_even"],
                               lambda x: x > midpage)
            if le:
                out["leftmargin_even"] = self._findmargin(
                    le, floor, quantize=self.scanned_source)
            if re_:
                out["rightmargin_even"] = self._findmargin(
                    re_, ceil, quantize=True)
        out["pagewidth"] = max(counters["pagewidth"])
        return out

    @staticmethod
    def _filter(counter, pred):
        return Counter({k: v for k, v in counter.items() if pred(k)})

    @staticmethod
    def _findmargin(counter, trunc_func=round, quantize=False):
        if not quantize:
            return counter.most_common(1)[0][0]
        binsize = 10
        lowres = Counter()
        for val in counter:
            lowres[trunc_func(val / binsize) * binsize] += counter[val]
        threshold = lowres.most_common()[0][1] * 0.8
        candidates = []
        for val, count in lowres.most_common():
            if count < threshold:
                if trunc_func is ceil:
                    return max(candidates)
                if trunc_func is floor:
                    return min(candidates)
                return sum(candidates) / len(candidates)
            candidates.append(val)
        return candidates[0]

    @staticmethod
    def _fontsize_key(fonttuple):
        family, size = fonttuple
        weight = 2 if "Bold" in family else (1 if "Italic" in family
                                             else 0)
        return (size, weight)

    @staticmethod
    def _fontdict(fonttuple):
        return {"family": fonttuple[0], "size": fonttuple[1]}

    def analyze_styles(self, styles):
        styledefs = {}
        if not styles:
            return styledefs
        ds = styles.most_common(1)[0][0]
        styledefs["default"] = self._fontdict(ds)
        significant = (sum(styles.values())
                       * self.style_significance_threshold)
        sortedstyles = sorted(styles, key=self._fontsize_key,
                              reverse=True)
        large = [x for x in sortedstyles
                 if (self._fontsize_key(x) > self._fontsize_key(ds)
                     and styles[x] > significant)]
        fnrs = next(iter([x for x in reversed(sortedstyles)
                          if (styles[x] > significant and x[0] == ds[0]
                              and x[1] <= ds[1] / 2)]), None)
        if fnrs:
            styledefs["footnoteref"] = self._fontdict(fnrs)
        for style in ("h1", "h2", "h3"):
            if large:
                styledefs[style] = self._fontdict(large.pop(0))
        return styledefs

    def metrics(self, startpage=0, pagecount=None):
        if pagecount is None:
            pagecount = len(self.pages) - startpage
        h = self.analyze_horizontal_margins(
            self.count_horizontal_margins(startpage, pagecount))
        v = self.analyze_vertical_margins(
            self.count_vertical_margins(startpage, pagecount))
        s = self.analyze_styles(self.count_styles(startpage, pagecount))
        out = dict(chain(h.items(), v.items(), s.items()))
        out["scanned_source"] = self.scanned_source
        return out


PDF_SCHEMA = ("url string, page int, box int, left int, top int, "
              "width int, height int, font_family string, "
              "font_size int, text string, error string")


def pdf_textboxes(docs, xml_col: str = "xml", url_col: str = "url"):
    """Spark stage: (url, pdf2xml) -> one row per textbox; a document
    whose XML fails to parse yields a single quarantine row (I4)
    instead of failing the batch."""
    import pandas as pd

    def batches(it):
        for pdf in it:
            rows = []
            for url, xml_text in zip(pdf[url_col], pdf[xml_col]):
                try:
                    for page in parse_pdf2xml(xml_text):
                        for i, box in enumerate(page):
                            rows.append((url, page.number, i, box.left,
                                         box.top, box.width,
                                         box.height, box.font.family,
                                         box.font.size, str(box),
                                         None))
                except Exception as e:
                    rows.append((url, -1, -1, 0, 0, 0, 0, None, 0,
                                 None, str(e)))
            yield pd.DataFrame(rows, columns=[
                "url", "page", "box", "left", "top", "width", "height",
                "font_family", "font_size", "text", "error"])

    return (docs.select(url_col, xml_col)
            .mapInPandas(batches, schema=PDF_SCHEMA))
