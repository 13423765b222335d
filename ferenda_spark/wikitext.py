"""MediaWiki dump ingestion (S8's wiki branch, re-scoped for a
training-data pipeline).

The reference's MediaWiki repo (sources/general/wiki.py) consumes a
``dumpBackup.php`` XML export and converts each page's wikitext to
XHTML via a bundled markup parser (thirdparty/mw).  Byte-level parity
with that converter is out of scope here (it is a full MediaWiki
renderer incl. template expansion); what a 100 TB text pipeline needs
from a wiki dump is implemented from scratch instead, and checked
against the reference's own downloaded fixtures
(test/files/repo/mediawiki/downloaded/*.xml):

* :func:`parse_dump` — the export XML -> page records (title, id,
  timestamp, wikitext), namespace-agnostic stdlib parsing;
* :func:`wiki_links` / :func:`wiki_categories` — ``[[target|label]]``
  link and ``[[Kategori:/Category: ...]]`` extraction (what the
  reference turns into dcterms:subject triples);
* :func:`strip_wikitext` — markup -> plaintext: nested ``{{template}}``
  removal, link -> label with the MediaWiki *linktrail* merge
  (``[[personuppgift]]er`` -> ``personuppgifter``), external links ->
  label, bold/italic quotes, heading/list markers;
* :func:`wiki_pages` — the Spark stage: one Arrow-batched mapInPandas
  over (url, xml) rows -> (url, title, page_id, ts, text, categories,
  links).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

_LINK_RE = re.compile(r"\[\[([^\[\]|]+)(?:\|([^\[\]]*))?\]\](\w*)",
                      re.UNICODE)
_EXT_LINK_RE = re.compile(r"\[(?:https?|ftp)://[^\s\]]+(?:\s+([^\]]*))?\]")
_HEADING_RE = re.compile(r"^(={1,6})\s*(.*?)\s*\1\s*$", re.M)
_LIST_RE = re.compile(r"^[\*#:;]+\s*", re.M)
_CATEGORY_PREFIXES = ("kategori:", "category:")


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def parse_dump(xml_text: str) -> list[dict]:
    """MediaWiki export XML -> [{title, page_id, ts, text}].  Accepts
    a single <page> or a <mediawiki> dump with many; namespace URIs
    vary by export version, so matching is on local names."""
    root = ET.fromstring(xml_text)
    pages = [root] if _local(root.tag) == "page" else [
        el for el in root.iter() if _local(el.tag) == "page"]
    out = []
    for page in pages:
        rec = {"title": None, "page_id": None, "ts": None, "text": None}
        for el in page.iter():
            name = _local(el.tag)
            if name == "title":
                rec["title"] = el.text
            elif name == "id" and rec["page_id"] is None:
                rec["page_id"] = int(el.text)
            elif name == "timestamp":
                rec["ts"] = el.text
            elif name == "text":
                rec["text"] = el.text or ""
        out.append(rec)
    return out


def wiki_links(text: str) -> list[str]:
    """Distinct internal link targets, in first-seen order (category
    links excluded — they are metadata, not content links)."""
    seen, out = set(), []
    for m in _LINK_RE.finditer(text):
        target = m.group(1).strip()
        if target.lower().startswith(_CATEGORY_PREFIXES):
            continue
        if target not in seen:
            seen.add(target)
            out.append(target)
    return out


def wiki_categories(text: str) -> list[str]:
    """Category names from [[Kategori:...]] / [[Category:...]] links
    (the reference emits these as dcterms:subject)."""
    out = []
    for m in _LINK_RE.finditer(text):
        target = m.group(1).strip()
        low = target.lower()
        for pfx in _CATEGORY_PREFIXES:
            if low.startswith(pfx):
                out.append(target[len(pfx):].strip())
    return out


def _strip_templates(text: str) -> str:
    """Remove {{...}} including nesting (a scanner, not a regex — the
    TranslatedAct-style templates nest braces)."""
    out, depth, i = [], 0, 0
    while i < len(text):
        if text.startswith("{{", i):
            depth += 1
            i += 2
        elif text.startswith("}}", i) and depth:
            depth -= 1
            i += 2
        else:
            if not depth:
                out.append(text[i])
            i += 1
    return "".join(out)


def strip_wikitext(text: str) -> str:
    """Wikitext -> plaintext for the token/dedup/quality pipeline."""
    t = _strip_templates(text)

    def link_sub(m):
        target, label, trail = m.group(1), m.group(2), m.group(3)
        if target.strip().lower().startswith(_CATEGORY_PREFIXES):
            return ""
        # MediaWiki linktrail: letters glued to the closing brackets
        # join the label ([[personuppgift]]er -> personuppgifter)
        return (label if label is not None else target) + (trail or "")

    t = _LINK_RE.sub(link_sub, t)
    t = _EXT_LINK_RE.sub(lambda m: m.group(1) or "", t)
    t = _HEADING_RE.sub(r"\2", t)
    t = _LIST_RE.sub("", t)
    t = t.replace("'''", "").replace("''", "")
    t = re.sub(r"[ \t]+", " ", t)
    t = re.sub(r"\n{3,}", "\n\n", t)
    return t.strip()


WIKI_SCHEMA = ("url string, title string, page_id long, ts string, "
               "text string, categories array<string>, "
               "links array<string>, error string")


def wiki_pages(docs, xml_col: str = "xml", url_col: str = "url"):
    """Spark stage: (url, export-xml) -> parsed page rows; a dump file
    with many <page> elements fans out to one row each.  A document
    whose XML fails to parse yields one quarantine row instead of
    failing the batch (I4)."""
    import pandas as pd

    def batches(it):
        for pdf in it:
            rows = []
            for url, xml_text in zip(pdf[url_col], pdf[xml_col]):
                try:
                    for rec in parse_dump(xml_text):
                        wt = rec["text"] or ""
                        rows.append((url, rec["title"], rec["page_id"],
                                     rec["ts"], strip_wikitext(wt),
                                     wiki_categories(wt),
                                     wiki_links(wt), None))
                except Exception as e:
                    rows.append((url, None, None, None, None, [], [],
                                 str(e)))
            yield pd.DataFrame(rows, columns=[
                "url", "title", "page_id", "ts", "text", "categories",
                "links", "error"])

    return (docs.select(url_col, xml_col)
            .mapInPandas(batches, schema=WIKI_SCHEMA))
