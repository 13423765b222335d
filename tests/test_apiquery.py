"""API query surface vs the reference's own advancedapi goldens
(test/files/api/advancedapi-*.json over test/files/testrepos): exact
JSON equality for faceting, indexing, parameter/type/customfacet/
range/yearselector queries (integrationAPI.py:270-325)."""

import json
import os

import pytest

from ferenda_spark.session import get_spark

TESTREPOS = "/root/reference/test/files/testrepos"
APIDIR = "/root/reference/test/files/api"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(TESTREPOS), reason="reference fixtures not present")


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="apiquery-tests", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="module")
def docs(spark):
    from ferenda_spark.apiquery import load_testrepo_docs
    return load_testrepo_docs(spark, TESTREPOS)


def _want(name):
    return json.load(open(os.path.join(APIDIR, "advancedapi-%s.json"
                                       % name)))


def test_faceting(docs):
    from ferenda_spark.apiquery import api_stats
    assert api_stats(docs) == _want("faceting")


def test_indexing(docs):
    from ferenda_spark.apiquery import api_query
    assert api_query(docs, "uri=*/repo1/a") == _want("indexing")


def test_query_parameters(docs):
    from ferenda_spark.apiquery import api_query
    got = api_query(docs, "dc_subject=red&schema_free=true")
    assert got == _want("query-parameters")


def test_query_type(docs):
    from ferenda_spark.apiquery import api_query
    assert api_query(docs, "rdf_type=ex:OtherType") == _want("query-type")


def test_query_customfacet(docs):
    from ferenda_spark.apiquery import api_query
    got = api_query(docs, "aprilfools=true&_stats=on")
    assert got == _want("query-customfacet")


def test_query_range(docs):
    from ferenda_spark.apiquery import api_query
    got = api_query(docs,
                    "min-dcterms_issued=2012-04-01&"
                    "max-dcterms_issued=2012-04-03")
    assert got == _want("query-range")


def test_query_yearselector(docs):
    from ferenda_spark.apiquery import api_query
    got = api_query(docs, "year-dcterms_issued=2013")
    assert got == _want("query-yearselector")


# ------------------------------- legacy API (/-/publ) variants

def _want_legacy(name):
    return json.load(open(os.path.join(
        APIDIR, "advancedapi-%s.legacy.json" % name)))


def test_legacy_faceting(docs):
    from ferenda_spark.apiquery import api_stats
    assert api_stats(docs, legacy=True) == _want_legacy("faceting")


@pytest.mark.parametrize("name,qs", [
    ("indexing", "uri=*/repo1/a"),
    ("query-parameters", "subject=red&free=true"),
    ("query-type", "type=OtherType"),
    ("query-customfacet", "aprilfools=true&_stats=on"),
    ("query-range", "min-issued=2012-04-01&max-issued=2012-04-03"),
    ("query-yearselector", "year-issued=2013"),
])
def test_legacy_queries(docs, name, qs):
    from ferenda_spark.apiquery import api_query
    assert api_query(docs, qs, legacy=True) == _want_legacy(name)


# -------------------- basicapi (base/123 fixtures, incl. fulltext q=)

BASEDIR = "/root/reference/test/files/base"


@pytest.fixture(scope="module")
def base_docs(spark):
    from ferenda_spark.apiquery import load_base_docs
    return load_base_docs(spark, BASEDIR)


def _want_basic(name):
    return json.load(open(os.path.join(APIDIR,
                                       "basicapi-%s.json" % name)))


def test_basic_stats(base_docs):
    from ferenda_spark.apiquery import api_stats
    assert api_stats(base_docs) == _want_basic("stats")


def test_basic_stats_legacy(base_docs):
    from ferenda_spark.apiquery import api_stats
    assert api_stats(base_docs, legacy=True) == _want_basic(
        "stats.legacy")


def test_basic_fulltext_query(base_docs):
    """q=tail: toplevel-text hit with the highlighted match snippet."""
    from ferenda_spark.apiquery import api_query
    assert api_query(base_docs, "q=tail") == _want_basic(
        "fulltext-query")
    assert api_query(base_docs, "q=tail", legacy=True) == _want_basic(
        "fulltext-query.legacy")


def test_basic_faceted_query(base_docs):
    """Glob on a resource field's IRI."""
    from ferenda_spark.apiquery import api_query
    qs = "dcterms_publisher=*%2Fpublisher%2FA"
    assert api_query(base_docs, qs) == _want_basic("faceted-query")
    assert api_query(base_docs, qs, legacy=True) == _want_basic(
        "faceted-query.legacy")


def test_basic_complex_query(base_docs):
    """q hit on a nested sub-resource: innerhits in the modern API
    (fragment-list text shape), dropped in legacy."""
    from ferenda_spark.apiquery import api_query
    got = api_query(base_docs,
                    "q=haystack&dcterms_publisher=*%2Fpublisher%2FB")
    assert got == _want_basic("complex-query")
    got_legacy = api_query(base_docs,
                           "q=haystack&publisher=*%2Fpublisher%2FB",
                           legacy=True)
    assert got_legacy == _want_basic("complex-query.legacy")
