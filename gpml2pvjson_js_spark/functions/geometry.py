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


# --- full angle-math surface (F1) -----------------------------------
# The kernel above carries the subset F4/F5 need; the functions below
# complete the reference's exported angle API (ref: src/geom-utils.ts:
# 199-306, src/spinoffs/Angle.ts:28-140, SCALE = TAU so the radian
# convention matches this kernel). Semantics re-derived, pinned by
# tests/test_geometry_golden.py::TestAngleMath.

def add_angles(a1: float, a2: float) -> float:
    """Sum of two angles wrapped to [0, TAU) with the reference's
    sign handling: a negative single-revolution sum wraps UP by TAU
    (ref: geom-utils.ts:199-205). Distinct from `normalize` only in
    how it treats exact negative zero inputs."""
    s = math.fmod(a1 + a2, TAU)  # JS % keeps the dividend's sign
    return TAU + s if s < 0 else s


def reverse_angle(angle: float) -> float:
    """Opposite direction (ref: geom-utils.ts:254-256)."""
    return add_angles(angle, math.pi)


def cross_product(u, v) -> float:
    """2-D scalar cross product (ref: geom-utils.ts:209-211)."""
    return u[0] * v[1] - v[0] * u[1]


def flip_orientation(o):
    """Negate an orientation unit vector (ref: geom-utils.ts:213-217)."""
    return [-o[0], -o[1]]


# side -> emanation angle, derived exactly as the reference derives it
# (fromSlope of the orientation vector; ref: geom-utils.ts:60-74)
SIDE_TO_EMANATION_ANGLE = {
    side: from_slope((0, 0), o) for side, o in SIDE_TO_ORIENTATION.items()
}
_EMANATION_ANGLE_TO_SIDE = {
    a: side for side, a in SIDE_TO_EMANATION_ANGLE.items()
}


def flip_side(side: str) -> str:
    """Opposite attachment side via the emanation-angle round trip the
    reference uses, not a hand-written table (ref: geom-utils.ts:
    219-223)."""
    return _EMANATION_ANGLE_TO_SIDE[
        reverse_angle(SIDE_TO_EMANATION_ANGLE[side])]


def min_angle_between_vectors(a1: float, a2: float) -> float:
    """Max-minus-min over two direction angles, both required to lie
    in [0, TAU) (ref: geom-utils.ts:225-248, including its domain
    check raising on out-of-range input)."""
    if min(a1, a2) < 0 or max(a1, a2) >= TAU:
        raise ValueError(
            f"min_angle_between_vectors({a1}, {a2}) inputs must be in "
            f"[0, TAU)")
    return max(a1, a2) - min(a1, a2)


def angle_of_emanation(orientation) -> float:
    """Raw atan2 of an attachable point's orientation — deliberately
    NOT normalized, matching the reference's return range (-pi, pi]
    (ref: geom-utils.ts:249-253)."""
    return math.atan2(orientation[1], orientation[0])


def angle_at_point(points, position_x: float) -> float:
    """Tangent direction of an edge path at arc-length fraction
    position_x, by the reference's central difference with tangent
    window 0.02 clamped to [0, 1] (ref: geom-utils.ts:258-282).
    Returns raw atan2 (unnormalized) like getAngleFromPointToPoint.
    Curves use the control-polyline approximation documented at
    `polyline_position`."""
    half = 0.02 / 2
    x0, y0, _ = polyline_position(points, max(0.0, position_x - half))
    x1, y1, _ = polyline_position(points, min(1.0, position_x + half))
    return math.atan2(y1 - y0, x1 - x0)


def normalize_half(n: float) -> float:
    """Wrap an angle to [-pi, pi) (ref: Angle.ts:48-53)."""
    h = TAU / 2
    return (n + h) % TAU - h


def shortest_direction(a_from: float, a_to: float) -> int:
    """-1 if rotating left is shorter, +1 if right, 0 if equal
    (ref: Angle.ts:71-84)."""
    if a_from == a_to:
        return 0
    return -1 if normalize_half(a_from - a_to) < 0 else 1


def angle_between(n: float, a: float, b: float) -> bool:
    """True if angle n lies inside the arc from a to b going
    clockwise (ref: Angle.ts:93-103)."""
    n, a, b = n % TAU, a % TAU, b % TAU
    if a < b:
        return a <= n <= b
    return a <= n or n <= b


def angle_diff(a: float, b: float) -> float:
    """Absolute angular difference, NOT reduced to the short way
    around (ref: Angle.ts:111-113; `angle_distance` above is the
    short-way version)."""
    return abs(b - a) % TAU


def radians_to_degrees(radians: float) -> float:
    return (180.0 / math.pi) * radians


def degrees_to_radians(degrees: float) -> float:
    return (math.pi / 180.0) * degrees


def to_gon(n: float) -> float:
    """Gradians from a radian angle (ref: Angle.ts:163-166)."""
    return (n / TAU) * 400.0


def from_sin_cos(sin_v: float, cos_v: float) -> float:
    """Recover the angle in [0, TAU) from its sine and cosine,
    including the reference's reflection step for negative sine
    (ref: Angle.ts:175-182)."""
    angle = (1 + math.acos(cos_v) / TAU) * TAU
    if sin_v < 0:
        angle = TAU - angle
    return angle % TAU


_COMPASS = ["N", "NE", "E", "SE", "S", "SW", "W", "NW"]


def quadrant(x: float, y: float, k: int = 4, shift: float = 0.0) -> int:
    """1-based region index of point (x, y) in a k-region compass
    rose rotated by `shift`, 0 exactly on a boundary within 1e-15
    (ref: Angle.ts:206-232)."""
    eps = 1e-15
    phi = (math.atan2(y, x) + TAU) / TAU
    if abs((phi * TAU) % (TAU / k)) < eps:
        return 0
    return 1 + int(math.floor((k * shift) / TAU + k * phi)) % k


def compass(course: float) -> str:
    """Nearest of 8 compass directions for a course angle where 0 is
    north increasing clockwise (ref: Angle.ts:239-249)."""
    k = len(_COMPASS)
    return _COMPASS[round((course / TAU) * k) % k]


def angle_lerp(a: float, b: float, p: float, direction: int = 0) -> float:
    """Interpolate between two angles by fraction p, optionally
    forcing clockwise (+1) or counter-clockwise (-1) travel; the
    default takes the unwrapped difference minus a revolution, as the
    reference does (ref: Angle.ts:258-274)."""
    a, b = a % TAU, b % TAU
    if a == b:
        return a
    if not direction:
        offset = -TAU
    elif (direction == 1) == (a < b):
        offset = direction * TAU
    else:
        offset = 0.0
    return (a + p * (b - a - offset)) % TAU


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
