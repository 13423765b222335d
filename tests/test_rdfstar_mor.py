"""RDF-star annotation parsing and merge-on-read planning —
closed-form checks."""

import pytest

from ferenda_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="tests-rdfstar-mor", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_rdfstar_parse_and_converge(spark):
    """Two docs annotating the SAME quoted triple share a stmt_id;
    a malformed line is quarantined, not dropped."""
    from ferenda_spark.operators.rdfio import rdfstar_annotations
    lines = spark.createDataFrame(
        [('<< ex:a ex:p ex:b >> ex:conf "900" .',),
         ('<< ex:a ex:p ex:b >> ex:source "crawl1" .',),
         ('<< ex:c ex:p ex:d >> ex:conf "100" .',),
         ("not a star line",)],
        "line string")
    out = rdfstar_annotations(lines).collect()
    parsed = [r for r in out if r.parsed]
    bad = [r for r in out if not r.parsed]
    assert len(parsed) == 3 and len(bad) == 1
    ids = {(r.subj, r.obj): r.stmt_id for r in parsed}
    anns = {}
    for r in parsed:
        anns.setdefault(r.stmt_id, set()).add(r.ann_pred)
    assert anns[ids[("ex:a", "ex:b")]] == {"ex:conf", "ex:source"}
    assert ids[("ex:a", "ex:b")] != ids[("ex:c", "ex:d")]
    assert bad[0].stmt_id is None


def test_mor_planning_threshold(spark):
    from ferenda_spark.operators.store import mor_planning
    files = spark.createDataFrame(
        [("f1", 100), ("f2", 100), ("f3", 100)],
        "file_id string, n_rows long")
    deletes = spark.createDataFrame(
        [("f1", 20), ("f1", 15), ("f2", 5)],
        "file_id string, n_deleted long")
    out = {r.file_id: r for r in
           mor_planning(files, deletes).collect()}
    assert out["f1"].n_deleted == 35
    assert out["f1"].deleted_permille == 350
    assert out["f1"].action == "rewrite"
    assert out["f1"].live_rows == 65
    assert out["f2"].action == "keep"
    assert out["f3"].n_deleted == 0 and out["f3"].action == "keep"
