"""Affine transform parity (reference src/geom-utils.ts:415-686).

The oracle below is a direct Python port of the reference's
transform()/getTransformationMatrix()/rotate()/scale()/translate()
math; the Spark operator (Catalyst F.aggregate fold, no UDF) must
match it float-for-float across rotation/scale/translate mixes,
keyword / percent / em / px origins, and NULL sequences.
"""

import math

import pytest

from gpml2pvjson_js_spark.functions.affine import SEQ_TYPE, transform_elements

_KEYWORDS = {"left": "0%", "center": "50%", "right": "100%",
             "top": "0%", "bottom": "100%"}


def _mat(key, value):
    if key == "rotate":
        th = value[0]
        return [[math.cos(th), -math.sin(th), 0],
                [math.sin(th), math.cos(th), 0], [0, 0, 1]]
    if key == "scale":
        return [[value[0], 0, 0], [0, value[1], 0], [0, 0, 1]]
    return [[1, 0, value[0]], [0, 1, value[1]], [0, 0, 1]]


def _mul(a, b):
    return [[sum(a[i][k] * b[k][j] for k in range(3)) for j in range(3)]
            for i in range(3)]


def _origin_component(tok, i, x, y, w, h):
    mapped = _KEYWORDS.get(tok, tok)
    if "%" in mapped:
        dec = float(mapped.rstrip("%")) / 100.0
        num = dec * (w if i == 0 else h)
    elif "em" in tok:
        num = float(mapped.replace("em", "")) * 12.0
    else:
        num = float(mapped.replace("px", ""))
    return num + (x if i == 0 else y)


def _oracle(x, y, w, h, seq, origin):
    origin = origin or "50% 50%"
    toks = origin.split(" ")
    ox = _origin_component(toks[0], 0, x, y, w, h)
    oy = _origin_component(toks[1], 1, x, y, w, h)
    full = ([("translate", [ox, oy])] + list(seq or [])
            + [("translate", [-ox, -oy])])
    m = [[1, 0, 0], [0, 1, 0], [0, 0, 1]]
    for key, value in full:
        m = _mul(m, _mat(key, value))
    tlx = m[0][0] * x + m[0][1] * y + m[0][2]
    tly = m[1][0] * x + m[1][1] * y + m[1][2]
    brx = m[0][0] * (x + w) + m[0][1] * (y + h) + m[0][2]
    bry = m[1][0] * (x + w) + m[1][1] * (y + h) + m[1][2]
    return tlx, tly, brx - tlx, bry - tly


CASES = [
    # (x, y, w, h, seq, origin)
    (10.0, 20.0, 100.0, 50.0, [("rotate", [math.pi / 2])], None),
    (10.0, 20.0, 100.0, 50.0, [("rotate", [0.37])], "left top"),
    (0.0, 0.0, 40.0, 40.0, [("scale", [2.0, 0.5])], "right bottom"),
    (5.0, -3.0, 10.0, 8.0, [("translate", [7.0, -2.0])], "center center"),
    (5.0, -3.0, 10.0, 8.0,
     [("rotate", [1.1]), ("scale", [1.5, 2.0]), ("translate", [3.0, 4.0])],
     "25% 75%"),
    (1.0, 2.0, 30.0, 60.0, [("scale", [0.25, 4.0])], "1.5em 10px"),
    (1.0, 2.0, 30.0, 60.0, [], "50% 50%"),
    (1.0, 2.0, 30.0, 60.0, None, None),  # NULL sequence == identity
    (-10.0, -20.0, 5.0, 5.0,
     [("rotate", [-2.2]), ("rotate", [0.7])], "0% 100%"),
]


@pytest.fixture(scope="module")
def transformed(spark):
    rows = [(i, x, y, w, h,
             [(k, list(v)) for k, v in seq] if seq is not None else None,
             origin)
            for i, (x, y, w, h, seq, origin) in enumerate(CASES)]
    df = spark.createDataFrame(
        rows,
        f"id long, x double, y double, width double, height double, "
        f"seq {SEQ_TYPE}, origin string")
    out = transform_elements(df, seq_col="seq", origin_col="origin")
    return {r["id"]: r for r in out.collect()}


def test_affine_matches_reference_port(transformed):
    for i, (x, y, w, h, seq, origin) in enumerate(CASES):
        ex, ey, ew, eh = _oracle(x, y, w, h, seq, origin)
        r = transformed[i]
        got = (r["x"], r["y"], r["width"], r["height"])
        for g, e in zip(got, (ex, ey, ew, eh)):
            assert g == pytest.approx(e, abs=1e-9), (i, got, (ex, ey, ew, eh))


def test_affine_rotation_about_center_is_exact(transformed):
    # 90deg clockwise (y-down) about the center (60, 45) of
    # (10,20,100,50). The reference maps the ORIGINAL top-left and
    # bottom-right corners through the matrix and recomputes
    # width/height as their difference (geom-utils.ts:668-686) — it
    # does NOT re-normalize the box, so after 90deg the old top-left
    # lands right of the old bottom-right and width goes NEGATIVE.
    # TL (10,20): o + R(p-o) = (60,45) + (25,-50) = (85, -5)
    # BR (110,70): (60,45) + (-25,50) = (35, 95)
    r = transformed[0]
    assert r["x"] == pytest.approx(85)
    assert r["y"] == pytest.approx(-5)
    assert r["width"] == pytest.approx(35 - 85)   # corner diff, negative
    assert r["height"] == pytest.approx(95 - (-5))


def test_affine_plan_is_udf_free(spark):
    df = spark.createDataFrame(
        [(0.0, 0.0, 1.0, 1.0, None, None)],
        f"x double, y double, width double, height double, "
        f"seq {SEQ_TYPE}, origin string")
    plan = transform_elements(
        df, seq_col="seq", origin_col="origin") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEval" not in plan
