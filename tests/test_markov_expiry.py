"""Markov removal-effect attribution and snapshot expiry —
closed-form checks on hand-built streams/manifests."""

import datetime

import pytest

from ferenda_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="tests-markov-expiry", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _events(spark, rows):
    base = datetime.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [(i, base + datetime.timedelta(minutes=i), u, t)
         for i, (u, t) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, "
        "event_type string")


def test_markov_single_channel_gets_everything(spark):
    """Only 'click' ever appears on converting paths: knocking it
    out drops conversion to 0, so it takes the full 1000 share."""
    from ferenda_spark.operators.events import markov_attribution
    ev = _events(spark, [(1, "click"), (1, "purchase"),
                         (2, "view")])          # view never converts
    out = {r.channel: r for r in
           markov_attribution(ev, ["click", "view"]).collect()}
    assert out["click"].removed_conv_micro == 0
    assert out["click"].attribution_permille == 1000
    assert out["view"].attribution_permille == 0
    assert out["click"].base_conv_micro > 0


def test_markov_symmetric_channels_split_evenly(spark):
    """Two mirror-image users: click->purchase and view->purchase.
    Symmetry forces equal removal effects; shares split 500/500."""
    from ferenda_spark.operators.events import markov_attribution
    ev = _events(spark, [(1, "click"), (1, "purchase"),
                         (2, "view"), (2, "purchase")])
    out = {r.channel: r for r in
           markov_attribution(ev, ["click", "view"]).collect()}
    assert out["click"].removal_effect_micro \
        == out["view"].removal_effect_micro
    assert out["click"].attribution_permille == 500
    assert out["view"].attribution_permille == 500


def test_markov_no_conversions(spark):
    from ferenda_spark.operators.events import markov_attribution
    ev = _events(spark, [(1, "click"), (1, "view")])
    out = markov_attribution(ev, ["click", "view"]).collect()
    assert all(r.base_conv_micro == 0 for r in out)
    assert all(r.attribution_permille == 0 for r in out)


def _meta(spark):
    snaps = spark.createDataFrame(
        [("t1", s, 1000 + s) for s in range(5)],
        "tbl string, snap_id long, committed_at long")
    # file f0 only in snaps 0-1 (expired); f1 in 1-3 (reachable from
    # retained snap 2,3); f4 only in snap 4 (retained)
    manifests = spark.createDataFrame(
        [("t1", 0, "f0"), ("t1", 1, "f0"),
         ("t1", 1, "f1"), ("t1", 2, "f1"), ("t1", 3, "f1"),
         ("t1", 4, "f4")],
        "tbl string, snap_id long, file_id string")
    return snaps, manifests


def test_expire_snapshots_reachability(spark):
    """keep_last=3 retains snaps 2,3,4: f0 (only 0-1) deletes, f1
    (still referenced by 2,3) keeps, f4 keeps."""
    from ferenda_spark.operators.store import expire_snapshots
    snaps, manifests = _meta(spark)
    out = {r.file_id: r for r in
           expire_snapshots(snaps, manifests, keep_last=3).collect()}
    assert out["f0"].action == "delete"
    assert out["f0"].n_refs == 2
    assert out["f0"].n_expired_refs == 2
    assert out["f1"].action == "keep"
    assert out["f1"].n_expired_refs == 1       # the snap-1 reference
    assert out["f4"].action == "keep"
    assert out["f4"].n_expired_refs == 0


def test_expire_keep_all_when_few_snapshots(spark):
    from ferenda_spark.operators.store import expire_snapshots
    snaps, manifests = _meta(spark)
    out = expire_snapshots(snaps, manifests, keep_last=10).collect()
    assert all(r.action == "keep" for r in out)
    assert all(r.n_expired_refs == 0 for r in out)
