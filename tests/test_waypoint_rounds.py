"""Topo-round semantics of synthesize_waypoints, pinned directly on a
minimal frame (the corpus goldens cover fixture geometry; this pins
the ROUND logic — which edges become ready when — after the
ready-test was restated as a lookup against the shrinking needs set:
a ref blocks readiness iff it names a still-unresolved edge, the set
identity being edge_ids minus pool_ids == needs at every round
entry)."""

import pytest

from pyspark.sql import types as T

POINT = T.StructType([
    T.StructField("x", T.DoubleType()),
    T.StructField("y", T.DoubleType()),
    T.StructField("is_attached_to", T.StringType()),
    T.StructField("attachment_position",
                  T.ArrayType(T.DoubleType())),
    T.StructField("attachment_offset", T.ArrayType(T.DoubleType())),
    T.StructField("orientation", T.ArrayType(T.DoubleType())),
    T.StructField("marker", T.StringType()),
])

SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("frag", T.IntegerType()),
    T.StructField("id", T.StringType()),
    T.StructField("draw_as", T.StringType()),
    T.StructField("is_attached_to", T.ArrayType(T.StringType())),
    T.StructField("endpoint_first_ref", T.StringType()),
    T.StructField("endpoint_last_ref", T.StringType()),
    T.StructField("points", T.ArrayType(POINT)),
])


def _pt(x, y, ref=None, pos=None, orient=None):
    return (float(x), float(y), ref, pos, None, orient, None)


def _edge(eid, draw_as, pts, refs=None, first_ref=None, last_ref=None):
    return ("u", 0, eid, draw_as, refs, first_ref, last_ref, pts)


@pytest.fixture(scope="module")
def synthesized(spark):
    from gpml2pvjson_js_spark.operators.waypoints import (
        synthesize_waypoints)
    rows = [
        # straight edge: never enters the loop, passes through
        _edge("s1", "StraightLine",
              [_pt(0, 0, "n1", [0.5, 0.0], [0.0, -1.0]),
               _pt(10, 10)]),
        # elbow attached to a NODE only -> ready in round 1
        _edge("e1", "ElbowLine",
              [_pt(0, 0, "n1", [1.0, 0.5], [1.0, 0.0]),
               _pt(100, 50)], refs=["n1"]),
        # elbow whose ref names the still-unresolved elbow e1 ->
        # blocked in round 1, ready in round 2
        _edge("e2", "ElbowLine",
              [_pt(50, 25, "e1", [0.5, 0.0], [0.0, 1.0]),
               _pt(50, 200)], refs=["e1"], first_ref="e1"),
        # mutually-referencing elbows: never ready, cycle passthrough
        _edge("c1", "ElbowLine",
              [_pt(0, 0, "c2", [0.5, 0.0], [0.0, 1.0]), _pt(5, 5)],
              refs=["c2"], first_ref="c2"),
        _edge("c2", "ElbowLine",
              [_pt(9, 9, "c1", [0.5, 0.0], [0.0, 1.0]), _pt(7, 7)],
              refs=["c1"], first_ref="c1"),
    ]
    edges = spark.createDataFrame(rows, SCHEMA)
    out = synthesize_waypoints(edges)
    return {r["id"]: r.asDict(recursive=True) for r in out.collect()}


def test_every_edge_comes_back_exactly_once(synthesized):
    assert sorted(synthesized) == ["c1", "c2", "e1", "e2", "s1"]


def test_straight_edge_untouched(synthesized):
    s1 = synthesized["s1"]
    assert [(p["x"], p["y"]) for p in s1["points"]] == \
        [(0.0, 0.0), (10.0, 10.0)]


def test_node_attached_elbow_synthesizes_in_round_one(synthesized):
    e1 = synthesized["e1"]
    # elbow synthesis adds implicit waypoints between the endpoints
    assert len(e1["points"]) > 2
    assert (e1["points"][0]["x"], e1["points"][0]["y"]) == (0.0, 0.0)
    assert (e1["points"][-1]["x"], e1["points"][-1]["y"]) == \
        (100.0, 50.0)


def test_edge_attached_elbow_waits_for_its_referenced_edge(synthesized):
    # e2's ref (e1) is itself an unresolved elbow in round 1, so e2
    # must resolve in a LATER round — with e1's points available
    e2 = synthesized["e2"]
    assert len(e2["points"]) > 2
    assert (e2["points"][-1]["x"], e2["points"][-1]["y"]) == \
        (50.0, 200.0)


def test_cyclic_elbows_pass_through_unchanged(synthesized):
    for cid, pts in (("c1", [(0.0, 0.0), (5.0, 5.0)]),
                     ("c2", [(9.0, 9.0), (7.0, 7.0)])):
        got = [(p["x"], p["y"]) for p in synthesized[cid]["points"]]
        assert got == pts, cid
