"""Model-based property test of the snapshot-table protocol: random
operation sequences (append / merge / overwrite / rollback / compact /
expire) run against both the real table and a pure-Python model; after
every step the table's current contents, and the contents of every
still-retained historical snapshot, must equal the model's.

This is the state-machine check that individual example tests can't
give: compaction after rollback, merges over carried units, expiry of
undone branches, etc., in arbitrary interleavings."""

import os
import shutil
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from ferenda_spark.session import get_spark
from ferenda_spark.snaptable import SnapshotTable


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="snaptable-model", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _batch_df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


# ops: (kind, lo, hi) — ranges kept tiny so each Spark job is fast;
# rollback/compact/expire take no range
_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.integers(0, 12),
                  st.integers(1, 6)),
        st.tuples(st.just("merge"), st.integers(0, 12),
                  st.integers(1, 6)),
        st.tuples(st.just("overwrite"), st.integers(0, 12),
                  st.integers(1, 6)),
        st.tuples(st.just("rollback"), st.integers(0, 100),
                  st.just(0)),
        st.tuples(st.just("compact"), st.just(0), st.just(0)),
        st.tuples(st.just("expire"), st.integers(1, 3), st.just(0)),
    ),
    min_size=1, max_size=7)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ops=_OPS)
def test_snapshot_table_matches_model(spark, ops):
    d = tempfile.mkdtemp(prefix="ferenda_snapmodel_")
    try:
        t = SnapshotTable(os.path.join(d, "t"))
        seq = [0]

        def batch(lo, n):
            seq[0] += 1
            return [(k, "b%d-%d" % (seq[0], k))
                    for k in range(lo, lo + n)]

        init = batch(0, 4)
        snap = t.create(_batch_df(spark, init), stats_cols=("k",))
        # model: current rows (list = multiset) + retained history
        current = list(init)
        history = {snap["snapshot_id"]: list(init)}

        for kind, a, b in ops:
            if kind == "append":
                rows = batch(a, b)
                snap = t.append(_batch_df(spark, rows))
                current = current + rows
            elif kind == "merge":
                rows = batch(a, b)
                keys = {k for k, _ in rows}
                snap = t.merge(_batch_df(spark, rows), ("k",))
                current = [r for r in current
                           if r[0] not in keys] + rows
            elif kind == "overwrite":
                rows = batch(a, b)
                snap = t.overwrite(_batch_df(spark, rows))
                current = list(rows)
            elif kind == "rollback":
                ids = sorted(history)
                target = ids[a % len(ids)]
                t.rollback(target)
                current = list(history[target])
                continue                     # no new snapshot
            elif kind == "compact":
                out = t.compact(spark)
                if out is not None:
                    snap = out
                else:
                    continue
            else:                            # expire
                t.expire(keep_last=a, orphan_grace_s=0)
                keep = {h["snapshot_id"] for h in t.history()}
                history = {i: r for i, r in history.items()
                           if i in keep}
                continue
            history[snap["snapshot_id"]] = list(current)

            got = sorted((r.k, r.v) for r in t.read(spark).collect())
            assert got == sorted(current)

        # every retained snapshot still reproduces its model state
        for sid in (h["snapshot_id"] for h in t.history()):
            if sid in history:
                got = sorted((r.k, r.v) for r in
                             t.read(spark, snapshot_id=sid).collect())
                assert got == sorted(history[sid])
    finally:
        shutil.rmtree(d, ignore_errors=True)
