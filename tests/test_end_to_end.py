"""Capstone integration: the full north-rule DAG through every layer
this engine ships — streaming-shaped ingest via atomic snapshot
stages, KG construction + sameAs canonicalization, RDFS entailment,
the SPARQL surface (SELECT/UPDATE) over the materialized table, and
the byte-stable N-Triples dump — one pipeline, consistency asserted
between layers."""

import os
import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from ferenda_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="e2e-tests", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="ferenda_e2e_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_full_dag_end_to_end(spark, tmpdir):
    from ferenda_spark.catalog import dump_nt
    from ferenda_spark.corpus import load_pages
    from ferenda_spark.operators.extract import extract_pages
    from ferenda_spark.operators.incremental import run_stage_atomic
    from ferenda_spark.operators.triples import (all_triples,
                                                 with_doc_metadata)
    from ferenda_spark.pipeline import canonical_triples
    from ferenda_spark.snaptable import SnapshotTable
    from ferenda_spark.sparql import (sparql_select,
                                      sparql_update_table)

    sf = "/root/testdata/sf0.001"
    pages = load_pages(spark, sf)
    n_pages = pages.count()

    # 1. parse through the atomic snapshot stage (resumable ingest)
    def parse_t(todo):
        return (extract_pages(todo)
                .join(todo.select("url", "input_fingerprint"), "url"))

    parsed, ptab, s1 = run_stage_atomic(pages, tmpdir, "parse",
                                        parse_t)
    assert s1["summary"]["added_rows"] == n_pages
    # rerun = no rework, no new snapshot
    _, _, s_again = run_stage_atomic(pages, tmpdir, "parse", parse_t)
    assert s_again is None

    # 2. KG construction + canonicalization from the staged table
    docs = with_doc_metadata(parsed.drop("input_fingerprint"))
    triples = canonical_triples(spark, docs.localCheckpoint())

    # 3. materialize as a snapshot table
    tab = SnapshotTable(os.path.join(tmpdir, "kg"))
    snap = tab.create(triples, stats_cols=("subj",))
    n_triples = snap["summary"]["total_rows"]
    assert n_triples > 0

    # 4. SPARQL over the materialized table matches the DataFrame
    g = tab.read(spark)
    got = sparql_select(g, """
        SELECT ?pub (COUNT(?d) AS ?n) WHERE {
          ?d dcterms:publisher ?pub .
        } GROUP BY ?pub ORDER BY ?pub""").collect()
    want = (g.where(F.col("pred")
                    == "http://purl.org/dc/terms/publisher")
            .groupBy(F.col("obj")).count().orderBy("obj").collect())
    assert [(r.pub, r.n) for r in got] == [(r.obj, r["count"])
                                           for r in want]

    # 5. SPARQL UPDATE commits a new snapshot; old state time-travels
    s2 = sparql_update_table(tab, spark, """
        PREFIX dcterms: <http://purl.org/dc/terms/>
        DELETE WHERE { ?d dcterms:subject ?s }""")
    n_subj = g.where(F.col("pred")
                     == "http://purl.org/dc/terms/subject").count()
    assert tab.read(spark).count() == n_triples - n_subj
    assert tab.read(spark,
                    snapshot_id=snap["snapshot_id"]).count() \
        == n_triples

    # 6. dump of the updated graph: line count equals the table, and
    # the dumped content is exactly the table's N-Triples
    # serialization (tuple-key range ordering at file boundaries is
    # the writer's contract; content equality is the test)
    from ferenda_spark.catalog import nt_lines
    out = os.path.join(tmpdir, "dump.nt")
    n_lines = dump_nt(tab.read(spark), out)
    assert n_lines == n_triples - n_subj
    dumped = sorted(r.value for r in spark.read.text(out).collect())
    expect = sorted(r.line for r in
                    nt_lines(tab.read(spark)).collect())
    assert dumped == expect


def test_staged_flagship_atomic_resume(spark, tmpdir):
    """Re-running the snapshot-staged flagship is a no-op: both stage
    tables keep exactly one snapshot and the triples are unchanged."""
    from ferenda_spark.pipeline import staged_flagship_atomic

    sf = "/root/testdata/sf0.001"
    t1, ptab, ttab = staged_flagship_atomic(spark, sf, tmpdir)
    n = t1.count()
    assert n > 0
    assert len(ptab.history()) == 1 and len(ttab.history()) == 1
    t2, ptab, ttab = staged_flagship_atomic(spark, sf, tmpdir)
    assert t2.count() == n
    assert len(ptab.history()) == 1 and len(ttab.history()) == 1
    # per-row lineage survives: every triple row carries the url +
    # fingerprint of the page bytes that produced it
    assert {"url", "input_fingerprint"} <= set(t2.columns)
