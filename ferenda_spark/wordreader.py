"""Word-document reading (S8's Word branch) — from-scratch restatement
of the reference WordReader's observable semantics
(/root/reference/ferenda/wordreader.py:1-218, tests
test/files/wordreader/*):

* filetype detection by CONTENT, not extension: an OOXML file is a zip
  containing ``word/document.xml`` (the reference's mislabeled-.doc
  case resolves to "docx"); a legacy binary .doc is an OLE compound
  file (D0 CF 11 E0 magic).
* ``.docx`` -> the ``word/document.xml`` payload (the reference writes
  exactly this XML out) and a plaintext extraction (``w:t`` runs
  joined, one line per ``w:p`` paragraph) for the pipeline's text
  column — stdlib ``zipfile``+``xml`` only, no external binaries.
* ``.doc`` -> the reference shells out to antiword (absent here); the
  :mod:`ferenda_spark.docbinary` stdlib reader extracts the text
  natively (CFB + Word97 piece table) and emits the docbook-shaped
  XML the reference's test asserts on — unparseable OLE blobs are
  quarantined per-document instead of failing the stage.

Spark surface: :func:`extract_word_blobs` maps (url, blob) rows
through detection + docx text extraction in one Arrow-batched
mapInPandas stage — the same stage shape as the HTML parse; .doc rows
are quarantined with an error instead of failing the stage (I4).
"""

from __future__ import annotations

import io
import re
import zipfile
import xml.etree.ElementTree as ET

W_NS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"

# single source of truth for the CFB magic lives in docbinary
from .docbinary import OLE_MAGIC  # noqa: E402


class ExternalToolMissing(RuntimeError):
    """Retained for API compatibility: raised only for .doc blobs the
    native reader cannot parse (the reference's analogous situation is
    antiword failing on the file)."""


def detect_wordfile_type(data: bytes) -> str:
    """'docx' | 'doc' | 'unknown' — by content, like the reference's
    fallback re-detection for mislabeled files."""
    if data[:4] == b"PK\x03\x04":
        try:
            with zipfile.ZipFile(io.BytesIO(data)) as zf:
                if "word/document.xml" in zf.namelist():
                    return "docx"
        except zipfile.BadZipFile:
            pass
    if data[:8] == OLE_MAGIC:
        return "doc"
    return "unknown"


def read_word(data: bytes) -> tuple[str, bytes]:
    """(filetype, document XML bytes) — the WordReader.read contract
    (reference wordreader.py:42-71): docx yields word/document.xml
    (root ``w:document``); doc yields docbook-shaped XML (root
    ``book``), natively extracted — same root tag and text content
    the reference's antiword path produces (testWordReader.py:41-44).
    """
    kind = detect_wordfile_type(data)
    if kind == "docx":
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            return "docx", zf.read("word/document.xml")
    if kind == "doc":
        from .docbinary import BadOleFile, doc_to_docbook
        try:
            return "doc", doc_to_docbook(data)
        except BadOleFile as e:
            raise ExternalToolMissing("unparseable .doc: %s" % e)
    raise ValueError("not a Word document")


def docx_xml_text(xml_bytes: bytes) -> str:
    """Plaintext from word/document.xml: one line per ``w:p``
    paragraph; ``w:t`` runs, ``w:br`` and ``w:tab`` contribute IN
    DOCUMENT ORDER so breaks separate the text around them."""
    root = ET.fromstring(xml_bytes)
    paras = []
    for p in root.iter("{%s}p" % W_NS):
        runs = []
        for el in p.iter():
            name = el.tag.rsplit("}", 1)[-1]
            if name == "t":
                runs.append(el.text or "")
            elif name == "br":
                runs.append("\n")
            elif name == "tab":
                runs.append("\t")
        text = "".join(runs)
        if text.strip():
            paras.append("\n".join(
                re.sub(r"[ \t]+", " ", line).strip()
                for line in text.split("\n") if line.strip()))
    return "\n".join(paras)


def docx_text(data: bytes) -> str:
    """Plaintext from a .docx blob."""
    _, xml_bytes = read_word(data)
    return docx_xml_text(xml_bytes)


WORD_SCHEMA = ("url string, filetype string, text string, error string")


def extract_word_blobs(docs, blob_col: str = "blob", url_col: str = "url"):
    """Spark stage: (url, blob) -> (url, filetype, text, error);
    unparseable .doc rows carry an error instead of failing the batch
    (per-doc quarantine, I4)."""
    import pandas as pd

    from .docbinary import doc_text

    def batches(it):
        for pdf in it:
            rows = []
            for url, blob in zip(pdf[url_col], pdf[blob_col]):
                data = bytes(blob)
                try:
                    # detect first, parse ONCE: read_word's docbook
                    # output is unused for .doc text extraction, and
                    # running it before doc_text would walk the whole
                    # CFB/piece-table twice per row
                    kind = detect_wordfile_type(data)
                    if kind == "doc":
                        from .docbinary import BadOleFile
                        try:
                            text = doc_text(data)
                        except BadOleFile as e:
                            raise ExternalToolMissing(
                                "unparseable .doc: %s" % e)
                    elif kind == "docx":
                        _, xml_bytes = read_word(data)
                        text = docx_xml_text(xml_bytes)
                    else:
                        raise ValueError("not a word document")
                    rows.append((url, kind, text, None))
                except ExternalToolMissing:
                    rows.append((url, "doc", None,
                                 "unparseable word binary"))
                except ValueError:
                    rows.append((url, "unknown", None,
                                 "not a word document"))
                except Exception as e:          # quarantine, not crash
                    rows.append((url, "error", None, str(e)))
            yield pd.DataFrame(rows, columns=["url", "filetype",
                                              "text", "error"])

    return (docs.select(url_col, blob_col)
            .mapInPandas(batches, schema=WORD_SCHEMA))


def synth_doc_blobs(docs, id_col: str = "doc_id"):
    """Every row a REAL legacy Word97 binary (docbinary.synth_doc_blob
    — OLE2 header, FAT, directory, FIB, piece table): the corpus twin
    that exercises docbinary.cfb_streams/doc_text on 100% of rows, so
    the word_docs_legacy oracle pins the .doc branch alone."""
    import pandas as pd

    from .docbinary import synth_doc_blob

    def batches(it):
        for b in it:
            rows = []
            for did in b[id_col]:
                d = int(did)
                rows.append(("https://example.org/word/%d" % d,
                             synth_doc_blob(["Word doc %d" % d,
                                             "Paragraph %d" % (d % 7)])))
            yield pd.DataFrame(rows, columns=["url", "blob"])

    return (docs.select(id_col)
            .mapInPandas(batches, "url string, blob binary"))


def synth_docx_blobs(docs, id_col: str = "doc_id"):
    """Deterministic minimal OOXML blobs keyed on ``doc_id`` — the
    corpus-synthesis twin for the Word stage (closed form, mirrored by
    the DuckDB oracle): two paragraphs per document; every 17th
    document a REAL legacy Word97 binary (docbinary.synth_doc_blob)
    carrying the same paragraphs, so the native .doc extraction runs
    end-to-end; every 34th a truncated OLE stub exercising the
    quarantine branch.  Zip members carry a fixed timestamp so blobs
    are byte-stable across runs."""
    import pandas as pd

    from .docbinary import synth_doc_blob

    def batches(it):
        for b in it:
            rows = []
            for did in b[id_col]:
                d = int(did)
                url = "https://example.org/word/%d" % d
                if d % 34 == 0:
                    rows.append((url, OLE_MAGIC + b"\x00" * 24))
                    continue
                if d % 17 == 0:
                    rows.append((url, synth_doc_blob(
                        ["Word doc %d" % d, "Paragraph %d" % (d % 7)])))
                    continue
                xml = ('<?xml version="1.0"?>'
                       '<w:document xmlns:w="%s"><w:body>'
                       '<w:p><w:r><w:t>Word doc %d</w:t></w:r></w:p>'
                       '<w:p><w:r><w:t>Paragraph %d</w:t></w:r></w:p>'
                       '</w:body></w:document>' % (W_NS, d, d % 7))
                buf = io.BytesIO()
                with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
                    zi = zipfile.ZipInfo("word/document.xml",
                                         (1980, 1, 1, 0, 0, 0))
                    zf.writestr(zi, xml)
                rows.append((url, buf.getvalue()))
            yield pd.DataFrame(rows, columns=["url", "blob"])

    return (docs.select(id_col)
            .mapInPandas(batches, "url string, blob binary"))
