"""Pure-Python geometry kernel for implicit waypoint synthesis on
Elbow/Curved edges (F4) and hyperedge emanation orientation (F5).

Re-derivation of the reference's routing semantics
(ref: src/edge/calculateAllPoints.ts:75-406,
src/edge/orientation.ts:30-193, src/geom-utils.ts:53-85,587-594,
src/spinoffs/Angle.ts) as plain Python. PathVisio only stores the
first and last point of an Elbow/Curved edge unless the user dragged
a waypoint; the renderer needs the implicit intermediate points made
explicit. Verified float-for-float against the reference golden
fixtures (tests/test_geometry_golden.py drives all edge-elbow-* /
edge-curved-* expected outputs).

This kernel runs inside the Arrow-batched geometry stage — it is the
one place where per-row Python is warranted (332 LoC of casework in
the reference; SURVEY.md §2.7 F4 calls it the hardest
fidelity-critical kernel).
"""

from __future__ import annotations

import math

TAU = 2 * math.pi
STUB = 20.0  # DEFAULT_STUB_LENGTH (ref: src/edge/edge.ts:30)

# side -> unit emanation orientation (ref: geom-utils.ts:53-58)
SIDE_TO_ORIENTATION = {
    "right": (1, 0), "bottom": (0, 1), "left": (-1, 0), "top": (0, -1),
}
# candidate emanation setups in declaration order (geom-utils.ts:76-85)
START_SEGMENT_DETAILS = [
    {"side": side, "orientation": o,
     "angle": math.atan2(o[1], o[0]) % TAU}
    for side, o in SIDE_TO_ORIENTATION.items()
]


def normalize(angle: float) -> float:
    return angle % TAU


def angle_distance(a: float, b: float) -> float:
    """Circular distance in radians (ref: Angle.ts distance)."""
    h = TAU / 2
    diff = ((a - b + h) % TAU) - h
    if diff > h:
        diff -= TAU
    return abs(diff)


def from_slope(p1, p2) -> float:
    return math.atan2(p2[1] - p1[1], p2[0] - p1[0]) % TAU


def same_side(p1, p2, a, b) -> bool:
    """True if p1 and p2 lie on the same side of line a->b
    (cross-product sign test, ref: geom-utils.ts:587-594)."""
    bax, bay = b["x"] - a["x"], b["y"] - a["y"]
    c1 = bax * (p1["y"] - a["y"]) - (p1["x"] - a["x"]) * bay
    c2 = bax * (p2["y"] - a["y"]) - (p2["x"] - a["x"]) * bay
    return _sign(c1) == _sign(c2)


def _sign(x: float) -> int:
    return (x > 0) - (x < 0)


def valid_orientation(o) -> bool:
    return (o is not None and len(o) == 2
            and all(v is not None and math.isfinite(v) for v in o))


def start_side_by_orientation(o) -> str:
    ox, oy = o
    if abs(ox) > abs(oy):
        return "right" if ox > 0 else "left"
    return "bottom" if oy > 0 else "top"


def polyline_position(points, t: float):
    """(x, y, tangent angle) at arc-length fraction t along a
    polyline — the straight/elbow analog of SmartPath.position
    (curves are approximated by their control polyline)."""
    seg_lens = []
    for i in range(len(points) - 1):
        dx = points[i + 1]["x"] - points[i]["x"]
        dy = points[i + 1]["y"] - points[i]["y"]
        seg_lens.append(math.hypot(dx, dy))
    total = sum(seg_lens)
    if total == 0:
        p = points[0]
        return p["x"], p["y"], 0.0
    target = max(0.0, min(1.0, t)) * total
    acc = 0.0
    for i, L in enumerate(seg_lens):
        if acc + L >= target or i == len(seg_lens) - 1:
            f = (target - acc) / L if L else 0.0
            x = points[i]["x"] + f * (points[i + 1]["x"] - points[i]["x"])
            y = points[i]["y"] + f * (points[i + 1]["y"] - points[i]["y"])
            ang = from_slope((points[i]["x"], points[i]["y"]),
                             (points[i + 1]["x"], points[i + 1]["y"]))
            return x, y, ang
        acc += L
    p = points[-1]
    return p["x"], p["y"], 0.0


def hyperedge_start_orientation(referenced_edge: dict, start_point: dict,
                                end_point: dict):
    """Pick the best of 4 candidate emanation sides for a point
    attached to another edge: same-side of the referenced edge first,
    then closest to perpendicular to it, then closest to the current
    edge direction (ref: orientation.ts:30-173)."""
    ref_points = referenced_edge["points"]
    current_angle = from_slope((start_point["x"], start_point["y"]),
                               (end_point["x"], end_point["y"]))
    pos = start_point.get("attachment_position") or [0.5, 0.0]
    _, _, ref_angle = polyline_position(ref_points, pos[0])

    candidates = []
    for detail in START_SEGMENT_DETAILS:
        ox, oy = detail["orientation"]
        seg_end = {"x": start_point["x"] + STUB * ox,
                   "y": start_point["y"] + STUB * oy}
        is_same = same_side(seg_end, end_point,
                            ref_points[0], ref_points[-1])
        to_current = angle_distance(detail["angle"], current_angle)
        to_perp = abs(angle_distance(ref_angle, detail["angle"])
                      - math.pi / 2)
        candidates.append((0 if is_same else 1, to_perp, to_current,
                           detail["orientation"]))
    candidates.sort(key=lambda c: (c[0], c[1], c[2]))
    return list(candidates[0][3])


def hyperedge_end_orientation(referenced_edge, end_point, other_point):
    o = hyperedge_start_orientation(referenced_edge, end_point, other_point)
    return [-o[0], -o[1]]


def calculate_all_points(points: list[dict],
                         source_edge_points: list | None = None,
                         target_edge_points: list | None = None
                         ) -> list[dict]:
    """Synthesize implicit Elbow/Curved waypoints.

    `points` is the list of explicit resolved points (dicts with at
    least x, y; attached points also carry orientation and
    attachment_position). source/target_edge_points are the point
    lists of referenced EDGES when an endpoint attaches via an anchor
    (needed for emanation-orientation selection).

    Semantics re-derived from src/edge/calculateAllPoints.ts:75-406;
    intermediate points carry only x/y.
    """
    pts = [dict(p) for p in points]
    first, last_p = pts[0], pts[-1]

    if not valid_orientation(first.get("orientation")):
        if first.get("is_attached_to") is not None \
                and source_edge_points:
            first["orientation"] = hyperedge_start_orientation(
                {"points": source_edge_points}, first, last_p)
        else:
            first["orientation"] = [-1, 0]

    if not valid_orientation(last_p.get("orientation")):
        if last_p.get("is_attached_to") is not None \
                and target_edge_points:
            last_p["orientation"] = hyperedge_end_orientation(
                {"points": target_edge_points}, last_p, first)
        else:
            x0, y0 = first["x"], first["y"]
            x1 = last_p["x"]
            first_side = start_side_by_orientation(first["orientation"])
            if first_side == "left":
                last_p["orientation"] = [1, 0] \
                    if (x0 >= x1 and x0 < x1 + STUB) else [-1, 0]
            elif first_side == "right":
                last_p["orientation"] = [1, 0] \
                    if (x0 + STUB <= x1) else [-1, 0]
            else:
                last_p["orientation"] = [-1, 0]

    if len(pts) > 2:
        return pts

    # orient the walk from whichever endpoint has a valid orientation
    if valid_orientation(first.get("orientation")):
        reversed_order = False
        start, end = first, last_p
    elif valid_orientation(last_p.get("orientation")):
        reversed_order = True
        start, end = last_p, first
    else:
        raise ValueError("no valid endpoint orientation")

    so, eo = start["orientation"], end["orientation"]
    vec_sum = (_sign(end["x"] - start["x"]), _sign(end["y"] - start["y"]))

    def active_index(o):
        return 0 if o[0] != 0 else 1

    si, ei = active_index(so), active_index(eo)
    sdim, s_other = ("x", "y") if si == 0 else ("y", "x")
    edim, e_other = ("x", "y") if ei == 0 else ("y", "x")

    out = [start]
    if si == ei:
        # parallel start/end orientations
        other_disp = end[s_other] - start[s_other]
        if so[si] == vec_sum[si]:
            mid = {s_other: start[s_other] + other_disp / 2}
            if so[si] == eo[ei]:
                mid[sdim] = start[sdim] + so[si] * STUB
            else:
                mid[sdim] = end[sdim] - eo[ei] * STUB
            out.append(mid)
        else:
            if so[si] == eo[ei]:
                # route around the start side: three waypoints
                out.append({
                    sdim: start[sdim] + so[si] * STUB,
                    s_other: start[s_other] + other_disp / 4,
                })
                out.append({
                    sdim: (start[sdim] + end[sdim]) / 2,
                    s_other: start[s_other] + other_disp / 2,
                })
                out.append({
                    sdim: end[sdim] - eo[ei] * STUB,
                    s_other: start[s_other] + 3 * other_disp / 4,
                })
            else:
                out.append({
                    sdim: start[sdim] + so[si] * STUB,
                    s_other: start[s_other] + other_disp / 2,
                })
    else:
        # perpendicular orientations
        if so[si] == vec_sum[si] and eo[ei] == vec_sum[ei]:
            pass  # direct L: no intermediate points
        else:
            other_start_disp = (end[s_other] - eo[ei] * STUB
                                - start[s_other])
            p1 = {
                sdim: start[sdim] + so[si] * STUB,
                s_other: start[s_other] + other_start_disp / 2,
            }
            out.append(p1)
            out.append({
                edim: end[edim] - eo[ei] * STUB,
                e_other: (p1[e_other] + end[e_other]) / 2,
            })
    out.append(end)
    return list(reversed(out)) if reversed_order else out
