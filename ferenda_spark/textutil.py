"""Scalar string/sort/number utilities.

Re-implements, from scratch, the observable semantics of the reference's
``ferenda/util.py`` scalar helpers (SURVEY.md P14/O1/O2):
``normalize_space`` (util.py:286-296), ``title_sortkey`` (util.py:691-705),
natural-sort splitting (util.py:191-245), roman numerals
(util.py:426-533), ``uri_leaf`` (util.py:600-624).  These are pure
functions used both inside Arrow/pandas UDFs and in plain pytest golden
tests; the hot paths in the Spark pipeline use the equivalent builtin
column expressions documented next to each function.
"""

from __future__ import annotations

import re

_ROMAN_VALUES = (
    ("M", 1000), ("CM", 900), ("D", 500), ("CD", 400),
    ("C", 100), ("XC", 90), ("L", 50), ("XL", 40),
    ("X", 10), ("IX", 9), ("V", 5), ("IV", 4), ("I", 1),
)
_ROMAN_RE = re.compile(
    r"^M{0,4}(CM|CD|D?C{0,3})(XC|XL|L?X{0,3})(IX|IV|V?I{0,3})$")


def normalize_space(s: str) -> str:
    """Collapse all whitespace runs (incl. NBSP) to single spaces and
    strip; semantics of the reference's util.normalize_space
    (util.py:286-296).  Spark equivalent:
    ``F.trim(F.regexp_replace(F.translate(c, '\\u00a0', ' '), r'\\s+', ' '))``.
    """
    return " ".join(s.replace("\xa0", " ").split())


def title_sortkey(s: str) -> str:
    """Lowercase, drop a leading "the ", strip all non-alphanumerics
    except spaces, collapse space; semantics of util.title_sortkey
    (util.py:691-705).  Spark: lower + regexp_replace chain."""
    s = normalize_space(s.lower())
    if s.startswith("the "):
        s = s[4:]
    # filter out all non-word characters (but not spaces)
    s = re.sub(r"[^\w ]", "", s)
    return s.replace(" ", "")


_NUMALPHA_RE = re.compile(r"(\d+)")


def split_numalpha(s: str) -> list:
    """Split a string into alternating text/int chunks for natural-order
    comparison; semantics of util.split_numalpha (util.py:229-245)."""
    return [int(p) if p.isdigit() else p for p in _NUMALPHA_RE.split(s) if p]


def natsort_key(s: str, width: int = 12) -> str:
    """A *string* natural-sort key (digit runs left-padded to fixed
    width) so natural ordering becomes plain lexicographic ordering —
    usable as a Spark column: ``regexp_replace`` can't pad, so the
    pipeline computes this in a pandas UDF only where natural order is
    required (TOC ordinals); elsewhere ordinals are split into numeric
    arrays."""
    return _NUMALPHA_RE.sub(lambda m: m.group(1).zfill(width), s)


def ordinal_sortkey(ordinal: str) -> list:
    """'1.10.2' -> [1, 10, 2]; Spark equivalent:
    ``F.transform(F.split(c, '\\.'), x -> x.cast('int'))``."""
    return [int(p) for p in ordinal.split(".") if p.isdigit()]


def to_roman(n: int) -> str:
    if not 0 < n < 5000:
        raise ValueError("number out of range (must be 1..4999)")
    out = []
    for sym, val in _ROMAN_VALUES:
        while n >= val:
            out.append(sym)
            n -= val
    return "".join(out)


def from_roman(s: str) -> int:
    if not s or not _ROMAN_RE.match(s):
        raise ValueError("not a valid roman numeral: %r" % s)
    i, n = 0, 0
    for sym, val in _ROMAN_VALUES:
        while s[i:i + len(sym)] == sym:
            n += val
            i += len(sym)
    return n


def is_roman(s: str) -> bool:
    return bool(s) and bool(_ROMAN_RE.match(s))


def uri_leaf(uri: str) -> str:
    """Last path/fragment segment of a URI ('.../foo#Bar' -> 'Bar');
    semantics of util.uri_leaf (util.py:600-624).  Spark:
    ``F.element_at(F.split(c, '[/#]'), -1)``."""
    for sep in ("#", "/", ":"):
        if sep in uri:
            leaf = uri.rsplit(sep, 1)[-1]
            if leaf:
                return leaf
    return uri


def base27encode(n: int) -> str:
    """Spreadsheet-style base-27 (space + A..Z) used by the reference
    for sub-paragraph ids (util.py:668-690 semantics)."""
    if n < 0:
        raise ValueError("negative")
    digits = ""
    while True:
        n, rem = divmod(n, 27)
        digits = (" " if rem == 0 else chr(ord("A") + rem - 1)) + digits
        if n == 0:
            return digits


def base27decode(s: str) -> int:
    n = 0
    for ch in s:
        n = n * 27 + (0 if ch == " " else ord(ch) - ord("A") + 1)
    return n


# ------------------------------------------------ Swedish collation (O1)
# The reference orders TOC entries with locale.strxfrm under a Swedish
# locale (documentrepository.py:2809-2811).  This is a deterministic,
# locale-free primary-strength sv collation key: a..z, then å < ä < ö
# (mapped to ASCII chars just above 'z' so plain string comparison
# yields Swedish order), w folded to v (traditional sv primary
# strength, CLDR sv), accented latin folded to base letters.  The SAME
# table drives the scalar function and the Spark column
# (``F.translate``), so driver-side tests and the distributed sort
# agree byte-for-byte.

SV_COLLATE_SRC = "åäöwéèêëáàâüúùíìóòôçñ"
SV_COLLATE_DST = "{|}veeeeaaayuuiiooocn"


def swedish_collation_key(s: str) -> str:
    """Primary-strength Swedish collation key; compare keys with plain
    string comparison."""
    return s.lower().translate(str.maketrans(SV_COLLATE_SRC,
                                             SV_COLLATE_DST))
