"""Boruvka MSF, curriculum schedule, bucket pruning — closed-form
checks."""

import pytest

from ferenda_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="tests-boruvka-curriculum", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _msf(spark, rows):
    from ferenda_spark.operators.graphs import boruvka_msf
    e = spark.createDataFrame(rows, "src long, dst long, weight long")
    return sorted(((r.src, r.dst, r.weight) for r in
                   boruvka_msf(e).collect()))


def test_boruvka_triangle(spark):
    """Triangle 1-2-3 with weights 1, 2, 3: the MSF drops the
    heaviest edge."""
    out = _msf(spark, [(1, 2, 1), (2, 3, 2), (1, 3, 3)])
    assert out == [(1, 2, 1), (2, 3, 2)]


def test_boruvka_two_components_and_path(spark):
    """A 4-cycle and a disjoint path: the cycle loses its max edge,
    the path is kept whole; no cross edges are invented."""
    out = _msf(spark, [(1, 2, 10), (2, 3, 11), (3, 4, 12),
                       (1, 4, 13),              # cycle, max dropped
                       (7, 8, 5), (8, 9, 6)])   # path
    assert out == [(1, 2, 10), (2, 3, 11), (3, 4, 12),
                   (7, 8, 5), (8, 9, 6)]


def test_boruvka_matches_kruskal_random(spark):
    """Pseudo-random graph vs a driver-side Kruskal on the same
    edges (distinct weights -> unique MSF)."""
    rows = []
    w = set()
    for i in range(40):
        a, b = (i * 7) % 13, (i * 11 + 3) % 13
        if a == b:
            continue
        wt = (i * 37) % 1000 * 100 + i
        rows.append((a, b, wt))
        w.add(wt)
    assert len(w) == len(rows)

    # Kruskal reference
    parent = list(range(13))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ref = set()
    seen = set()
    dedup = {}
    for a, b, wt in rows:
        k = (min(a, b), max(a, b))
        if k not in dedup or dedup[k][2] > wt:
            dedup[k] = (a, b, wt)
    for a, b, wt in sorted(dedup.values(), key=lambda t: t[2]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            ref.add((min(a, b), max(a, b), wt))
        seen.add((a, b))
    out = set(_msf(spark, rows))
    assert out == ref


def test_curriculum_epochs(spark):
    """4 docs, T=4: rank r enters at ceil(4 r^2 / 16) =
    1, 1, 3, 4."""
    from ferenda_spark.operators.training import curriculum_schedule
    docs = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30), (4, 40)],
        "doc_id long, difficulty long")
    out = {r.doc_id: r for r in
           curriculum_schedule(docs, "difficulty",
                               total_epochs=4).collect()}
    assert [out[i].rank for i in (1, 2, 3, 4)] == [1, 2, 3, 4]
    assert [out[i].first_epoch for i in (1, 2, 3, 4)] == [1, 1, 3, 4]


def test_bucket_prune_point_lookup(spark):
    from ferenda_spark.operators.store import bucket_prune
    rows = spark.createDataFrame(
        [("k%d" % i, "f%d" % (i % 10)) for i in range(200)],
        "url string, file_id string")
    probes = spark.createDataFrame([("k3",), ("absent",)],
                                   "probe string")
    out = {r.probe: r for r in
           bucket_prune(rows, probes, n_buckets=4).collect()}
    assert out["k3"].n_matching_rows == 1
    assert 0 < out["k3"].n_files_scanned <= out["k3"].n_files_total
    assert out["absent"].n_matching_rows == 0
    # pruning is real: a bucket never holds the whole manifest here
    assert out["k3"].n_files_scanned < out["k3"].n_files_total
