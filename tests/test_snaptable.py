"""Snapshot-table commit protocol: atomicity, time travel, bounds
pruning, incremental scan, copy-on-write merge, rollback, expiry."""

import json
import os
import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from ferenda_spark.session import get_spark
from ferenda_spark.snaptable import (CommitConflict, SnapshotError,
                                     SnapshotTable)


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="snaptable-tests", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="ferenda_snap_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _batch(spark, lo, hi, tag="a"):
    return (spark.range(lo, hi)
            .select(F.col("id").alias("k"),
                    F.concat(F.lit(tag + "-"), F.col("id"))
                    .alias("v")))


def _t(tmpdir):
    return SnapshotTable(os.path.join(tmpdir, "t"))


def test_create_append_read(spark, tmpdir):
    t = _t(tmpdir)
    s1 = t.create(_batch(spark, 0, 100), stats_cols=("k",))
    assert s1["snapshot_id"] == 1
    assert s1["summary"] == {"added_units": 1, "added_rows": 100,
                             "total_units": 1, "total_rows": 100}
    s2 = t.append(_batch(spark, 100, 150))
    assert s2["summary"]["total_rows"] == 150
    assert t.read(spark).count() == 150
    # time travel by snapshot id
    assert t.read(spark, snapshot_id=1).count() == 100
    # time travel by timestamp
    assert t.read(spark, as_of_ms=s1["timestamp_ms"]).count() == 100
    with pytest.raises(SnapshotError):
        t.read(spark, snapshot_id=99)
    with pytest.raises(SnapshotError):
        t.create(_batch(spark, 0, 1))


def test_crash_orphan_invisible_then_expired(spark, tmpdir):
    t = _t(tmpdir)
    t.create(_batch(spark, 0, 50), stats_cols=("k",))
    # simulate a writer that crashed after the data write, before the
    # metadata publish: the unit exists on disk but no snapshot
    # references it
    orphan = os.path.join(t.path, "data", "u-deadbeef")
    _batch(spark, 900, 950).write.parquet(orphan)
    assert t.read(spark).count() == 50          # invisible to readers
    # a FRESH unreferenced dir may belong to a live concurrent writer
    # between data write and metadata publish: the age guard keeps it
    out = t.expire(keep_last=1)
    assert out["removed_units"] == 0 and os.path.exists(orphan)
    # past the grace period it is a crashed writer's leftover
    out = t.expire(keep_last=1, orphan_grace_s=0)
    assert out["removed_units"] == 1
    assert not os.path.exists(orphan)
    assert t.read(spark).count() == 50


def test_commit_conflict(spark, tmpdir):
    t = _t(tmpdir)
    t.create(_batch(spark, 0, 10))
    meta = t._load()
    # a concurrent writer publishes v2 between our read and commit
    with open(os.path.join(t.path, "metadata", "v2.json"), "w") as fh:
        json.dump({k: v for k, v in meta.items()
                   if not k.startswith("_")}, fh)
    with pytest.raises(CommitConflict):
        t._publish(meta, meta["_version"])
    # a fresh handle sees the winner's version and can commit after it
    assert t.append(_batch(spark, 10, 20))["snapshot_id"] == 2


def test_scan_prunes_by_bounds(spark, tmpdir):
    t = _t(tmpdir)
    # three disjoint key ranges -> three units with disjoint bounds
    t.create(_batch(spark, 0, 100), stats_cols=("k",))
    t.append(_batch(spark, 100, 200))
    t.append(_batch(spark, 200, 300))
    # natural-typed bounds: keys 150..159 live only in the middle unit
    df, skipped = t.scan(spark, "k", 150, 159)
    assert skipped == 2
    assert df.count() == 10
    assert set(r.k for r in df.collect()) == set(range(150, 160))


def test_incremental_scan(spark, tmpdir):
    t = _t(tmpdir)
    s1 = t.create(_batch(spark, 0, 100), stats_cols=("k",))
    s2 = t.append(_batch(spark, 100, 180))
    s3 = t.append(_batch(spark, 180, 200))
    inc = t.incremental(spark, s1["snapshot_id"], s3["snapshot_id"])
    assert inc.count() == 100
    assert inc.agg(F.min("k"), F.max("k")).collect()[0][:] == (100, 199)
    # full history from table creation
    assert t.incremental(spark, None, s2["snapshot_id"]).count() == 180
    # a merge in the range poisons file-level "appended rows"
    t.merge(_batch(spark, 50, 60, tag="m"), ("k",))
    with pytest.raises(SnapshotError):
        t.incremental(spark, s1["snapshot_id"], 4)


def test_merge_rewrites_only_overlapping_units(spark, tmpdir):
    t = _t(tmpdir)
    t.create(_batch(spark, 0, 100), stats_cols=("k",))
    t.append(_batch(spark, 100, 200))
    t.append(_batch(spark, 200, 300))
    before = {u["unit"]: u for s in [t._current_snap(t._load())]
              for u in s["manifest"]}
    # upsert keys 120..129: bounds hit only the middle unit
    snap = t.merge(_batch(spark, 120, 130, tag="new"), ("k",))
    after = snap["manifest"]
    carried = [u for u in after if u["unit"] in before]
    # the two non-overlapping units are carried by reference (same
    # unit directories, no data movement)
    assert len(carried) == 2
    assert {u["bounds"]["k"][0] for u in carried} == {0, 200}
    assert snap["summary"]["total_rows"] == 300
    got = dict((r.k, r.v) for r in
               t.read(spark).where("k >= 118 and k <= 131").collect())
    assert got[120] == "new-120" and got[129] == "new-129"
    assert got[119] == "a-119" and got[130] == "a-130"


def test_merge_inserts_new_keys(spark, tmpdir):
    t = _t(tmpdir)
    t.create(_batch(spark, 0, 50), stats_cols=("k",))
    snap = t.merge(_batch(spark, 900, 910, tag="ins"), ("k",))
    assert snap["summary"]["total_rows"] == 60
    assert t.read(spark).where("v like 'ins-%'").count() == 10
    # empty incoming batch is a no-op commit
    snap = t.merge(_batch(spark, 0, 0), ("k",))
    assert snap["summary"]["total_rows"] == 60
    assert snap["summary"]["added_units"] == 0


def test_rollback_and_continue(spark, tmpdir):
    t = _t(tmpdir)
    s1 = t.create(_batch(spark, 0, 10), stats_cols=("k",))
    t.append(_batch(spark, 10, 20))
    t.rollback(s1["snapshot_id"])
    assert t.read(spark).count() == 10
    # new commits branch from the rolled-back snapshot with a fresh id
    s3 = t.append(_batch(spark, 50, 55))
    assert s3["snapshot_id"] == 3
    assert s3["parent_id"] == 1
    assert t.read(spark).count() == 15
    with pytest.raises(SnapshotError):
        t.rollback(99)


def test_expire_removes_undone_branch(spark, tmpdir):
    t = _t(tmpdir)
    s1 = t.create(_batch(spark, 0, 10), stats_cols=("k",))
    t.append(_batch(spark, 10, 20))
    t.rollback(s1["snapshot_id"])
    t.append(_batch(spark, 30, 35))          # snapshot 3, parent 1
    out = t.expire(keep_last=2)
    # snapshot 2 (the undone branch) is gone; its unit deleted
    assert out == {"removed_units": 1, "retained_snapshots": 2}
    assert [h["snapshot_id"] for h in t.history()] == [1, 3]
    assert t.read(spark).count() == 15
    assert t.read(spark, snapshot_id=1).count() == 10


def test_overwrite_and_empty_read(spark, tmpdir):
    t = _t(tmpdir)
    t.create(_batch(spark, 0, 10), stats_cols=("k",))
    s2 = t.overwrite(_batch(spark, 100, 103, tag="ow"))
    assert s2["summary"]["total_rows"] == 3
    assert sorted(r.k for r in t.read(spark).collect()) == [100, 101,
                                                            102]
    # prior state still addressable until expired
    assert t.read(spark, snapshot_id=1).count() == 10


def test_partitioned_writes(spark, tmpdir):
    t = _t(tmpdir)
    df = _batch(spark, 0, 40).withColumn("b", F.col("k") % 4)
    t.create(df, partition_by=("b",), stats_cols=("k",))
    unit = t._current_snap(t._load())["manifest"][0]["unit"]
    udir = os.path.join(t.path, "data", unit)
    assert sorted(d for d in os.listdir(udir)
                  if d.startswith("b=")) == ["b=0", "b=1", "b=2", "b=3"]
    got = t.read(spark)
    assert got.count() == 40 and "b" in got.columns


# --------------------------- snapshot-backed resumable stage (I1/S5)

def _pages_df(spark, rows):
    import datetime
    ts = datetime.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [(u, ts, c.encode(), c, "en") for u, c in rows],
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string")


def test_run_stage_atomic_resumes_and_deltas(spark, tmpdir):
    from ferenda_spark.operators.incremental import run_stage_atomic

    calls = spark.sparkContext.accumulator(0)

    def transform(todo):
        def bump(rows):
            for r in rows:
                calls.add(1)
                yield (r.url, r.input_fingerprint, r.text.upper())
        return spark.createDataFrame(
            todo.rdd.mapPartitions(bump),
            "url string, input_fingerprint string, out string")

    pages = _pages_df(spark, [("u1", "aa"), ("u2", "bb"), ("u3", "cc")])
    full, tab, s1 = run_stage_atomic(pages, tmpdir, "up", transform)
    assert full.count() == 3 and s1["summary"]["added_rows"] == 3
    assert calls.value == 3

    # identical rerun: zero rework, no empty commit
    full, tab, s2 = run_stage_atomic(pages, tmpdir, "up", transform)
    assert s2 is None and calls.value == 3 and full.count() == 3
    assert len(tab.history()) == 1

    # one changed page + one new page -> exactly those two reprocess,
    # and the commit's incremental delta is exactly their output
    pages2 = _pages_df(spark, [("u1", "aa"), ("u2", "BB2"),
                               ("u3", "cc"), ("u4", "dd")])
    full, tab, s3 = run_stage_atomic(pages2, tmpdir, "up", transform)
    assert calls.value == 5
    assert s3["summary"]["added_rows"] == 2
    delta = tab.incremental(spark, s1["snapshot_id"],
                            s3["snapshot_id"])
    assert {(r.url, r.out) for r in delta.collect()} == {
        ("u2", "BB2"), ("u4", "DD")}
    # the stale u2 row is still in the table (append-only outputs);
    # pending selection keys on (url, fingerprint) so it never
    # causes rework — compaction is overwrite()/merge() territory
    assert full.where("url = 'u2'").count() == 2


def test_compact_bin_packs_units(spark, tmpdir):
    t = _t(tmpdir)
    t.create(_batch(spark, 0, 30), stats_cols=("k",))
    t.append(_batch(spark, 30, 60))
    t.append(_batch(spark, 60, 90))
    snap = t.compact(spark)
    assert snap["operation"] == "compact"
    assert snap["summary"] == {"added_units": 1, "added_rows": 90,
                               "total_units": 1, "total_rows": 90}
    assert sorted(r.k for r in t.read(spark).collect()) == \
        list(range(90))
    # bounds survive compaction for future scan pruning
    assert snap["manifest"][0]["bounds"]["k"] == [0, 89]
    # already compact -> no-op, no empty commit
    assert t.compact(spark) is None
    # old units reclaimed after expiry
    out = t.expire(keep_last=1)
    assert out["removed_units"] == 3


def test_snapshot_ids_never_reused_after_expire(spark, tmpdir):
    t = _t(tmpdir)
    s1 = t.create(_batch(spark, 0, 10), stats_cols=("k",))
    s2 = t.append(_batch(spark, 10, 20))
    assert s2["snapshot_id"] == 2
    t.rollback(s1["snapshot_id"])
    t.expire(keep_last=1, orphan_grace_s=0)     # drops snapshot 2
    s3 = t.append(_batch(spark, 30, 35))
    # a caller-stored cursor of 2 must never resolve to new data
    assert s3["snapshot_id"] == 3
    with pytest.raises(SnapshotError):
        t.read(spark, snapshot_id=2)


def test_torn_publish_leaves_prior_state_readable(spark, tmpdir):
    t = _t(tmpdir)
    t.create(_batch(spark, 0, 10), stats_cols=("k",))
    # a crashed writer's half-written metadata temp file: readers and
    # future commits ignore it (only linked v<N>.json files count)
    mdir = os.path.join(t.path, "metadata")
    with open(os.path.join(mdir, ".tmp-dead"), "w") as fh:
        fh.write('{"truncat')
    assert t.read(spark).count() == 10
    assert t.append(_batch(spark, 10, 12))["snapshot_id"] == 2
    assert t.read(spark).count() == 12


def test_linkless_publish_fallback(spark, tmpdir, monkeypatch):
    """On filesystems without hard links (os.link -> EPERM) commits go
    through the O_EXCL fallback: appends work, the version-number CAS
    still detects a lost race."""
    import errno
    import ferenda_spark.snaptable as st

    def no_link(src, dst, **kw):
        raise OSError(errno.EPERM, "Operation not permitted", src)

    monkeypatch.setattr(st.os, "link", no_link)
    t = _t(tmpdir)
    t.create(_batch(spark, 0, 10), stats_cols=("k",))
    t.append(_batch(spark, 10, 15))
    assert t.read(spark).count() == 15
    assert len(t.history()) == 2
    # lost race: the next version number is already claimed
    meta = t._load()
    with open(os.path.join(t.path, "metadata", "v3.json"), "w") as fh:
        fh.write("{}")
    with pytest.raises(CommitConflict):
        t._publish(meta, expected_version=meta["_version"])


def test_torn_head_skipped_and_repaired(spark, tmpdir):
    """A torn max-version metadata file (crash residue of the O_EXCL
    fallback) must not brick reads: readers fall back one version,
    repair_torn_head removes it so writers can commit again."""
    t = _t(tmpdir)
    t.create(_batch(spark, 0, 10), stats_cols=("k",))
    t.append(_batch(spark, 10, 12))
    torn = os.path.join(t.path, "metadata", "v3.json")
    with open(torn, "w") as fh:
        fh.write('{"truncat')
    assert t.read(spark).count() == 12          # falls back to v2
    with pytest.raises(CommitConflict):         # writers are wedged
        t.append(_batch(spark, 12, 14))
    assert t.repair_torn_head() is True
    assert not os.path.exists(torn)
    assert t.repair_torn_head() is False        # idempotent
    t.append(_batch(spark, 12, 14))             # unwedged
    assert t.read(spark).count() == 14


def test_run_stage_atomic_quarantine_no_rework_loop(spark, tmpdir):
    from ferenda_spark.operators.incremental import run_stage_atomic

    def transform(todo):
        return todo.select(
            "url", "input_fingerprint",
            F.when(F.col("url") == "bad",
                   F.lit("boom")).alias("error"))

    pages = _pages_df(spark, [("ok", "aa"), ("bad", "bb")])
    full, tab, s1 = run_stage_atomic(pages, tmpdir, "q", transform)
    assert s1["summary"]["added_rows"] == 2
    # poisoned page does NOT re-run/re-commit on every resume
    full, tab, s2 = run_stage_atomic(pages, tmpdir, "q", transform)
    assert s2 is None and len(tab.history()) == 1
    assert full.where("error is not null").count() == 1
    # opting into retries re-attempts exactly the quarantined row
    full, tab, s3 = run_stage_atomic(pages, tmpdir, "q", transform,
                                     retry_errors=True)
    assert s3["summary"]["added_rows"] == 1
    assert full.where("url = 'bad'").count() == 2


def test_concurrent_drivers_no_duplicate_rows(spark, tmpdir):
    """Two drivers racing the SAME pending batch: the loser's
    conditional append conflicts, it re-anti-joins against the new
    head, and commits nothing — never duplicate (url, fp) rows."""
    from ferenda_spark.operators.incremental import run_stage_atomic

    pages = _pages_df(spark, [("a", "h1"), ("b", "h2")])

    def plain(todo):
        return todo.select("url", "input_fingerprint")

    state = {"raced": False}

    def racing(todo):
        out = todo.select("url", "input_fingerprint")
        if not state["raced"]:       # a second driver claims the whole
            state["raced"] = True    # batch between anti-join + commit
            run_stage_atomic(pages, tmpdir, "s", plain)
        return out

    full, tab, snap = run_stage_atomic(pages, tmpdir, "s", racing)
    assert snap is None                       # nothing left to commit
    assert full.count() == 2
    assert full.select("url", "input_fingerprint").distinct().count() == 2
    assert len(tab.history()) == 1            # only the racer's commit


def test_concurrent_drivers_commit_remainder(spark, tmpdir):
    """Partial overlap: the racer claims one page; the loser retries
    and commits exactly the unclaimed remainder."""
    from ferenda_spark.operators.incremental import run_stage_atomic

    pages = _pages_df(spark, [("a", "h1"), ("b", "h2")])
    sub = _pages_df(spark, [("a", "h1")])

    def plain(todo):
        return todo.select("url", "input_fingerprint")

    state = {"raced": False}

    def racing(todo):
        out = todo.select("url", "input_fingerprint")
        if not state["raced"]:
            state["raced"] = True
            run_stage_atomic(sub, tmpdir, "s", plain)
        return out

    full, tab, snap = run_stage_atomic(pages, tmpdir, "s", racing)
    assert snap["summary"]["added_rows"] == 1
    assert {r.url for r in full.select("url").collect()} == {"a", "b"}
    assert full.count() == 2                  # no duplicate for "a"


def test_as_of_follows_current_lineage(spark, tmpdir):
    """Timestamp time travel never resolves to a rolled-back branch:
    after rollback(s1), an as_of at the undone snapshot's commit time
    returns s1's state, not the orphaned s2."""
    import time as _time
    t = _t(tmpdir)
    s1 = t.create(_batch(spark, 0, 10), stats_cols=("k",))
    _time.sleep(0.01)
    s2 = t.append(_batch(spark, 10, 20))
    t.rollback(s1["snapshot_id"])
    got = t.read(spark, as_of_ms=s2["timestamp_ms"])
    assert got.count() == 10
    # by id the orphaned snapshot stays addressable until expired
    assert t.read(spark,
                  snapshot_id=s2["snapshot_id"]).count() == 20


def test_concurrent_appends_with_retry(spark, tmpdir):
    """Three writers race on the same table; losers of the CAS publish
    retry (re-reading the winner's metadata).  Every batch lands
    exactly once; orphaned data units from lost attempts are invisible
    and reclaimable."""
    import threading

    t = _t(tmpdir)
    t.create(_batch(spark, 0, 5), stats_cols=("k",))
    failures = []

    def worker(lo):
        for _ in range(20):
            try:
                SnapshotTable(t.path).append(_batch(spark, lo, lo + 5))
                return
            except CommitConflict:
                continue
        failures.append(lo)

    threads = [threading.Thread(target=worker, args=(lo,))
               for lo in (100, 200, 300)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not failures
    assert t.read(spark).count() == 20
    assert len(t.history()) == 4
    ks = sorted(r.k for r in t.read(spark).collect())
    assert ks == sorted(list(range(0, 5)) + list(range(100, 105))
                        + list(range(200, 205))
                        + list(range(300, 305)))


def test_schema_evolution_add_and_fill(spark, tmpdir):
    """Appending a frame with a NEW column widens the schema in the
    same commit; old units read back with typed NULLs; a frame
    MISSING a column fills it; a type change is rejected.  Time
    travel reads with the CURRENT schema (Iceberg's default)."""
    t = _t(tmpdir)
    t.create(_batch(spark, 0, 3))
    t.append(_batch(spark, 3, 5).withColumn("lang", F.lit("en")))
    got = {r.k: (r.v, r.lang) for r in t.read(spark).collect()}
    assert got[0] == ("a-0", None) and got[4] == ("a-4", "en")
    # frame missing 'v' and 'lang': typed NULLs fill
    t.append(spark.range(5, 6).select(F.col("id").alias("k")))
    got = {r.k: (r.v, r.lang) for r in t.read(spark).collect()}
    assert got[5] == (None, None)
    # changing an existing column's type must raise
    with pytest.raises(SnapshotError):
        t.append(spark.range(6, 7)
                 .select(F.col("id").cast("string").alias("k")))
    # time travel to the pre-evolution snapshot: current (wide) schema
    first = min(s["snapshot_id"] for s in t.history())
    old = t.read(spark, snapshot_id=first)
    assert set(old.columns) == {"k", "v", "lang"}
    assert all(r.lang is None for r in old.collect())


def test_compact_sort_clusters_units_for_pruning(spark, tmpdir):
    """Two interleaved appends each span the whole key range, so a
    narrow scan prunes nothing; a sort-clustered compaction rewrites
    them into range-disjoint units and the same scan skips one."""
    t = SnapshotTable(os.path.join(tmpdir, "t"))
    even = (spark.range(0, 10).select((F.col("id") * 2).alias("k"))
            .withColumn("v", F.col("k").cast("string")))
    odd = (spark.range(0, 10).select((F.col("id") * 2 + 1).alias("k"))
           .withColumn("v", F.col("k").cast("string")))
    t.create(even, stats_cols=("k",))
    t.append(odd)
    _, skipped = t.scan(spark, "k", 0, 4)
    assert skipped == 0                    # both units span 0..19
    t.compact(spark, sort_by="k", target_units=2)
    df, skipped = t.scan(spark, "k", 0, 4)
    assert skipped == 1                    # upper-half unit pruned
    assert sorted(r.k for r in df.collect()) == [0, 1, 2, 3, 4]
    # logical contents unchanged by the clustered rewrite
    assert t.read(spark).count() == 20


def test_tags_pin_snapshots_and_survive_expire(spark, tmpdir):
    t = _t(tmpdir)
    s1 = t.create(_batch(spark, 0, 10))
    t.create_tag("v1.0")                       # tag at snapshot 1
    t.append(_batch(spark, 10, 20))
    t.append(_batch(spark, 20, 30))
    assert t.read(spark, ref="v1.0").count() == 10
    assert t.read(spark).count() == 30
    # expire keeps the tagged snapshot even beyond keep_last
    t.expire(keep_last=1, orphan_grace_s=0)
    assert t.read(spark, ref="v1.0").count() == 10
    assert t.read(spark).count() == 30
    # tags are immutable: writing against one is rejected
    with pytest.raises(SnapshotError):
        t.append(_batch(spark, 0, 1), ref="v1.0")
    # names are unique, 'main' reserved, unknown refs error
    with pytest.raises(SnapshotError):
        t.create_branch("v1.0")
    with pytest.raises(SnapshotError):
        t.create_tag("main")
    with pytest.raises(SnapshotError):
        t.read(spark, ref="nope")
    assert t.refs()["v1.0"]["snapshot_id"] == s1["snapshot_id"]


def test_branch_writes_isolate_then_fast_forward(spark, tmpdir):
    t = _t(tmpdir)
    t.create(_batch(spark, 0, 10))
    t.create_branch("audit")
    t.append(_batch(spark, 100, 120), ref="audit")
    t.append(_batch(spark, 200, 230), ref="audit")
    # branch sees its own lineage; main is untouched
    assert t.read(spark, ref="audit").count() == 60
    assert t.read(spark).count() == 10
    # main is an ancestor of the branch head -> fast-forward legal
    head = t.fast_forward("audit")
    assert t.read(spark).count() == 60
    assert t.refs()["audit"]["snapshot_id"] == head
    # now diverge main and the branch: fast-forward must refuse
    t.append(_batch(spark, 300, 310))          # main moves past head
    with pytest.raises(SnapshotError):
        t.fast_forward("audit")
    # drop the ref; reading it then errors
    t.drop_ref("audit")
    with pytest.raises(SnapshotError):
        t.read(spark, ref="audit")


def test_branch_head_survives_expire(spark, tmpdir):
    t = _t(tmpdir)
    t.create(_batch(spark, 0, 10))
    t.create_branch("exp")
    t.append(_batch(spark, 50, 70), ref="exp")
    t.append(_batch(spark, 10, 20))            # advance main twice
    t.append(_batch(spark, 20, 30))
    t.expire(keep_last=1, orphan_grace_s=0)
    assert t.read(spark, ref="exp").count() == 30
    assert t.read(spark).count() == 30


def test_fast_forward_still_legal_after_expire(spark, tmpdir):
    """expire must retain the branch's surviving ancestor chain, or
    the fast-forward ancestry proof breaks (review finding)."""
    t = _t(tmpdir)
    t.create(_batch(spark, 0, 10))
    t.create_branch("b")
    t.append(_batch(spark, 10, 20), ref="b")
    t.append(_batch(spark, 20, 30), ref="b")
    t.expire(keep_last=1, orphan_grace_s=0)
    head = t.fast_forward("b")          # main never advanced: legal
    assert t.read(spark).count() == 30
    assert t.refs()["b"]["snapshot_id"] == head
