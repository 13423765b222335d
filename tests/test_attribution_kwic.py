"""Multi-touch attribution, Sankey path prefixes, KWIC concordance
— closed-form checks on hand-built streams."""

import datetime

import pytest

from ferenda_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="tests-attribution-kwic", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _events(spark, rows):
    base = datetime.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [(i, base + datetime.timedelta(minutes=i), u, t)
         for i, (u, t) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, "
        "event_type string")


def test_attribution_credit_split(spark):
    """User 1: click, view, click -> purchase.  First touch: click;
    last touch: click; linear: 333 each + remainder 1 to the closer
    -> click 333+334, view 333."""
    from ferenda_spark.operators.events import attribution
    ev = _events(spark, [(1, "click"), (1, "view"), (1, "click"),
                         (1, "purchase")])
    out = {r.channel: r for r in
           attribution(ev, ["click", "view"]).collect()}
    assert out["click"].first_permille == 1000
    assert out["click"].last_permille == 1000
    assert out["click"].linear_permille == 333 + 334
    assert out["view"].linear_permille == 333
    assert out["view"].first_permille == 0
    total = sum(r.linear_permille for r in out.values())
    assert total == 1000


def test_attribution_post_conversion_excluded(spark):
    """Touches after the final purchase are unattributed; a second
    journey starts fresh."""
    from ferenda_spark.operators.events import attribution
    ev = _events(spark, [(1, "click"), (1, "purchase"),
                         (1, "view"), (1, "purchase"),
                         (1, "click")])          # trailing click lost
    out = {r.channel: r for r in
           attribution(ev, ["click", "view"]).collect()}
    assert out["click"].n_touches == 1
    assert out["view"].n_touches == 1
    assert out["click"].linear_permille == 1000
    assert out["view"].linear_permille == 1000


def test_path_prefixes_depths(spark):
    """Two users a>b>c and a>b: depth-1 'a' counts both, depth-2
    'a>b' counts both, depth-3 only the longer stream."""
    from ferenda_spark.operators.events import path_prefixes
    ev = _events(spark, [(1, "a"), (1, "b"), (1, "c"),
                         (2, "a"), (2, "b")])
    out = {(r.depth, r.path): r.n_users for r in
           path_prefixes(ev, max_depth=3).collect()}
    assert out[(1, "a")] == 2
    assert out[(2, "a>b")] == 2
    assert out[(3, "a>b>c")] == 1
    assert (3, "a>b") not in out


def test_kwic_contexts(spark):
    from ferenda_spark.operators.textstats import kwic
    docs = spark.createDataFrame(
        [(1, "alpha beta TARGET gamma delta epsilon")],
        "doc_id long, text string")
    out = kwic(docs, ["target"], window=2).collect()
    assert len(out) == 1
    r = out[0]
    assert r.pos == 3
    assert r.left_ctx == "alpha beta"
    assert r.right_ctx == "gamma delta"


def test_kwic_edges(spark):
    """Occurrence at position 1 has empty left context; at the end,
    empty right context."""
    from ferenda_spark.operators.textstats import kwic
    docs = spark.createDataFrame(
        [(1, "hit middle hit")], "doc_id long, text string")
    out = sorted(kwic(docs, ["hit"], window=3).collect(),
                 key=lambda r: r.pos)
    assert out[0].left_ctx == "" and out[0].right_ctx == "middle hit"
    assert out[1].right_ctx == "" and out[1].left_ctx == "hit middle"
