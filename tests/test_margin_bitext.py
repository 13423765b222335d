"""Margin-based bitext mining — the hub-penalization property (the
reason the ratio margin exists: a vector cosine-close to EVERYTHING
must lose to the specific translation) plus integer-scoring edges."""

import pytest

from ferenda_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="tests-margin-bitext", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _emb(spark, rows, id_name, vec_name):
    return spark.createDataFrame(
        rows, "%s long, %s array<float>" % (id_name, vec_name))


def test_margin_beats_raw_cosine_on_hub(spark):
    """Targets: a hub ([1,1,1]) with raw cosine 0.577 to every basis
    source PLUS a perfect twin among the sources (so its backward
    neighborhood is tight), and per-source true translations at raw
    cosine 0.5547 (< the hub's).  Raw cosine would match every source
    to the hub; the margin must pick each source's true target."""
    from ferenda_spark.operators.linking import margin_bitext_pairs
    src = _emb(spark, [
        (0, [1., 0., 0., 0., 0., 0.]),
        (1, [0., 1., 0., 0., 0., 0.]),
        (2, [0., 0., 1., 0., 0., 0.]),
        (3, [1., 1., 1., 0., 0., 0.]),      # the hub's twin
    ], "src_id", "src_vec")
    tgt = _emb(spark, [
        (10, [1., 1., 1., 0., 0., 0.]),     # hub
        (11, [1., 0., 0., 1.5, 0., 0.]),    # true t0
        (12, [0., 1., 0., 0., 1.5, 0.]),    # true t1
        (13, [0., 0., 1., 0., 0., 1.5]),    # true t2
    ], "tgt_id", "tgt_vec")
    got = {r.src_id: r for r in margin_bitext_pairs(
        src, tgt, k=2, min_margin_permille=900).collect()}
    assert {s: r.tgt_id for s, r in got.items()} == {
        0: 11, 1: 12, 2: 13, 3: 10}
    # the flip is real: each basis source's raw cosine to the hub
    # (577350 micro) EXCEEDS its cosine to the chosen target
    for s in (0, 1, 2):
        assert got[s].cos_micro < 577351
    # and the hub pair that did win is the identical twin
    assert got[3].cos_micro == 1000000
    assert got[3].margin_permille > got[0].margin_permille


def test_nonpositive_cosines_dropped(spark):
    from ferenda_spark.operators.linking import margin_bitext_pairs
    src = _emb(spark, [(0, [1., 0.]), (1, [0., 1.])],
               "src_id", "src_vec")
    tgt = _emb(spark, [(10, [-1., 0.]), (11, [0., 1.])],
               "tgt_id", "tgt_vec")
    rows = margin_bitext_pairs(src, tgt, k=2,
                               min_margin_permille=0).collect()
    # src 0 has only a negative-cosine candidate: no row at all
    assert {r.src_id: r.tgt_id for r in rows} == {1: 11}


def test_threshold_filters(spark):
    from ferenda_spark.operators.linking import margin_bitext_pairs
    src = _emb(spark, [(0, [1., 0.])], "src_id", "src_vec")
    tgt = _emb(spark, [(10, [1., 0.1])], "tgt_id", "tgt_vec")
    # single pair: fwd = bwd = own cosine -> margin exactly 1000
    rows = margin_bitext_pairs(src, tgt, k=4,
                               min_margin_permille=1000).collect()
    assert len(rows) == 1 and rows[0].margin_permille == 1000
    assert margin_bitext_pairs(
        src, tgt, k=4, min_margin_permille=1001).count() == 0
