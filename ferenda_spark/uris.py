"""URI scheme: canonical document/dataset/part URIs and their inverses.

Semantics of the reference's URI layer (SURVEY.md T6/P13):

* ``canonical_uri(basefile) = {base}res/{alias}/{basefile}``
  (documentrepository.py:631-644);
* ``basefile_from_uri`` inverse by prefix strip + fragment drop
  (documentrepository.py:646-672);
* ``dataset_uri(param, value, feed) = {base}dataset/{alias}
  [?param=value] [/feed...]`` (documentrepository.py:674-707);
* part URIs ``{doc_uri}#S{ordinal}``
  (elements.py:619-620, w3c.py:290-303).

All of these are pure string composition — on the Spark side they are
``F.concat`` / ``regexp_extract`` column expressions (see
operators/triples.py); the Python versions here serve tests and
driver-side config.
"""

from __future__ import annotations

BASE = "https://example.org/"


def canonical_uri(alias: str, basefile: str, base: str = BASE) -> str:
    return "%sres/%s/%s" % (base, alias, basefile)


def basefile_from_uri(uri: str, alias: str, base: str = BASE):
    prefix = "%sres/%s/" % (base, alias)
    if not uri.startswith(prefix):
        return None
    rest = uri[len(prefix):]
    for sep in ("#", "?"):
        if sep in rest:
            rest = rest.split(sep, 1)[0]
    return rest or None


def dataset_uri(alias: str, param=None, value=None, feed=False,
                base: str = BASE) -> str:
    uri = "%sdataset/%s" % (base, alias)
    if feed:
        uri += "/feed"
    if param and value:
        uri += "?%s=%s" % (param, value)
    return uri


def part_uri(doc_uri: str, ordinal: str) -> str:
    return "%s#S%s" % (doc_uri, ordinal)
