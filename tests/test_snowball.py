"""Snowball bootstrapped relation extraction — closed-form checks."""

import pytest

from ferenda_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="tests-snowball", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _run(spark, sents, seeds, threshold=600):
    from ferenda_spark.operators.linking import snowball_bootstrap
    sdf = spark.createDataFrame([(s,) for s in sents], "sent string")
    kdf = spark.createDataFrame(seeds, "subject string, object string")
    return snowball_bootstrap(sdf, kdf,
                              threshold_permille=threshold).collect()


def test_snowball_pattern_gate_and_reextraction(spark):
    """'hq in' is seed-consistent (conf 1000) and extracts the new
    OrgX pair; 'sued by' matches a seed subject with the WRONG
    object (conf 0) so its OrgY pair never surfaces."""
    sents = [
        "OrgA hq in CityA", "OrgB hq in CityB",
        "OrgX hq in CityX",                  # new pair, good pattern
        "OrgA sued by CityZ",                # bad pattern evidence
        "OrgY sued by CityY",                # through bad pattern only
    ]
    seeds = [("OrgA", "CityA"), ("OrgB", "CityB")]
    out = {(r.subject, r.object): r for r in
           _run(spark, sents, seeds)}
    assert ("OrgX", "CityX") in out
    assert out[("OrgX", "CityX")].confidence_permille == 1000
    assert not out[("OrgX", "CityX")].is_seed_subject
    assert ("OrgY", "CityY") not in out
    assert out[("OrgA", "CityA")].is_seed_subject


def test_snowball_mixed_pattern_confidence(spark):
    """A pattern right 2 of 3 times on seed mentions scores 666 and
    passes at threshold 600; new pairs inherit that confidence."""
    sents = [
        "OrgA near CityA", "OrgB near CityB", "OrgA near CityQ",
        "OrgN near CityN",
    ]
    seeds = [("OrgA", "CityA"), ("OrgB", "CityB")]
    out = {(r.subject, r.object): r for r in
           _run(spark, sents, seeds)}
    assert out[("OrgN", "CityN")].confidence_permille == 666
    assert out[("OrgA", "CityQ")].n_mentions == 1  # flagged, not hidden


def test_snowball_multiword_middle(spark):
    sents = ["OrgA is headquartered in CityA",
             "OrgZ is headquartered in CityZ"]
    out = {(r.subject, r.object): r for r in
           _run(spark, sents, [("OrgA", "CityA")])}
    assert out[("OrgZ", "CityZ")].confidence_permille == 1000
