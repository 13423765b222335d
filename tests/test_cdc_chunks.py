"""Content-defined chunking — the self-synchronization property and
exact duplicate detection on hand-built texts."""

import pytest

from ferenda_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="tests-cdc", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _chunks(spark, docs, **kw):
    from ferenda_spark.operators.dedup import cdc_chunks
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return cdc_chunks(df, **kw).collect()


def test_cdc_identical_docs_share_all_chunks(spark):
    text = "the quick brown fox jumps over the lazy dog " * 8
    out = _chunks(spark, [(1, text), (2, text)])
    assert len(out) >= 1
    assert all(r.n_docs == 2 for r in out)
    # every char is covered: shared chunk lengths sum to the text
    assert sum(r.chunk_len for r in out) == len(text)


def test_cdc_self_synchronizes_after_insertion(spark):
    """Prefix insertion shifts every offset in doc 2, yet chunks
    inside the unchanged suffix realign: at least one chunk is
    still shared (a fixed-block scheme would share none)."""
    base = "alpha beta gamma delta epsilon zeta eta theta " * 10
    out = _chunks(spark, [(1, base), (2, "INSERTED PREFIX " + base)],
                  min_docs=2)
    assert len(out) >= 1
    assert all(r.n_docs == 2 for r in out)


def test_cdc_disjoint_docs_share_nothing(spark):
    out = _chunks(spark, [(1, "aaaa bbbb cccc " * 10),
                          (2, "xxxx yyyy zzzz " * 10)])
    assert out == []
