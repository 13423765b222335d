"""Identity stitching and shot-boundary detection — closed-form
checks."""

import pytest

from ferenda_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="tests-identity-shots", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_identity_stitch_transitive(spark):
    """cookie1 seen with devA and devB; cookie2 seen with devB only:
    all four stitch into ONE identity (the transitive merge no
    pairwise rule finds).  Canonical is the (length, value)-min."""
    from ferenda_spark.operators.linking import identity_stitch
    obs = spark.createDataFrame(
        [("devA", "c1"), ("devB", "c1"), ("devB", "c2")],
        "a string, b string")
    out = {r.identifier: r.canonical_id for r in
           identity_stitch(obs, ["a", "b"]).collect()}
    assert set(out) == {"devA", "devB", "c1", "c2"}
    assert set(out.values()) == {"c1"}          # shortest, then lex


def test_identity_stitch_separate_components(spark):
    from ferenda_spark.operators.linking import identity_stitch
    obs = spark.createDataFrame(
        [("devA", "c1"), ("devB", "c2"), (None, "c3")],
        "a string, b string")
    out = {r.identifier: r.canonical_id for r in
           identity_stitch(obs, ["a", "b"]).collect()}
    assert out["devA"] == "c1" and out["c1"] == "c1"
    assert out["devB"] == "c2" and out["c2"] == "c2"
    assert "c3" not in out                      # null-partner row dropped


def test_shot_boundaries_hard_cut(spark):
    """Three identical frames, then three of a different pattern:
    exactly one interior boundary at the cut, plus the frame-0
    opener."""
    from ferenda_spark.operators.multimodal import (GRAY_MAGIC,
                                                    shot_boundaries)

    def frame(rising):
        px = bytes((i * 3 % 250) if rising else (249 - i * 3 % 250)
                   for i in range(63))
        return bytes(GRAY_MAGIC) + bytes([9, 7]) + px

    rows = [(1, i, bytearray(frame(True))) for i in range(3)] \
        + [(1, i + 3, bytearray(frame(False))) for i in range(3)]
    frames = spark.createDataFrame(
        rows, "doc_id long, frame_idx int, content binary")
    out = sorted(shot_boundaries(frames).collect(),
                 key=lambda r: r.frame_idx)
    assert out[0].is_boundary and out[0].distance is None
    interior = [r for r in out[1:] if r.is_boundary]
    assert [r.frame_idx for r in interior] == [3]
    assert out[3].distance > 6
    assert all(r.distance == 0 for r in out[1:] if r.frame_idx != 3)
