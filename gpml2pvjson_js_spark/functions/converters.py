"""Column-expression library: GPML value -> pvjson value converters.

Spark-first re-expression of /root/reference/src/2013a/ValueConverters.ts
(P4-P14 in SURVEY.md §2.2).  Everything here is a pure Catalyst column
expression (JVM-side, codegen-friendly) — no Python UDFs.
"""

from __future__ import annotations

import math
from functools import lru_cache

from pyspark.sql import Column
from pyspark.sql import functions as F

from .mappings import NAMED_COLORS, VALUE_MAPPINGS

_HEX6 = r"^[0-9a-fA-F]{6}$"
_HEX3 = r"^[0-9a-fA-F]{3}$"


_PAIR_SEP = "\x1e"
_KV_SEP = "\x1f"


def _map_literal(d: dict) -> Column:
    """Literal map column. Encoded as ONE string literal through
    str_to_map (constant-folded to a map literal by Catalyst) instead
    of create_map(2N literal expressions) — keeps plan trees, plan
    strings, and codegen units small for the 40+-entry dialect maps."""
    flat = _PAIR_SEP.join(f"{k}{_KV_SEP}{v}" for k, v in d.items())
    return F.str_to_map(F.lit(flat), F.lit(_PAIR_SEP), F.lit(_KV_SEP))


_NAMED_COLOR_MAP = None
_VALUE_MAP = None


def named_color_map() -> Column:
    global _NAMED_COLOR_MAP
    if _NAMED_COLOR_MAP is None:
        _NAMED_COLOR_MAP = _map_literal(NAMED_COLORS)
    return _NAMED_COLOR_MAP


def value_mappings_map() -> Column:
    global _VALUE_MAP
    if _VALUE_MAP is None:
        _VALUE_MAP = _map_literal(VALUE_MAPPINGS)
    return _VALUE_MAP


def map_value(col: Column) -> Column:
    """ValueMappings lookup with identity fallback
    (ref: src/Processor.ts:435-440)."""
    return F.coalesce(F.element_at(value_mappings_map(), col), col)


def css_color(col: Column) -> Column:
    """gpmlColorToCssColor (ref: src/2013a/ValueConverters.ts:314-332):
    'Transparent'/'None' pass through lowercased; hex gets '#'; named
    colors resolve via the rgbcolor table; unknown -> null (quarantine
    upstream)."""
    low = F.lower(col)
    return (
        F.when(col.isNull(), F.lit(None))
        .when(low.isin("transparent", "none"), low)
        .when(col.rlike(_HEX6), F.concat(F.lit("#"), low))
        .when(
            col.rlike(_HEX3),
            F.concat(
                F.lit("#"),
                F.substring(low, 1, 1), F.substring(low, 1, 1),
                F.substring(low, 2, 1), F.substring(low, 2, 1),
                F.substring(low, 3, 1), F.substring(low, 3, 1),
            ),
        )
        .otherwise(F.element_at(named_color_map(), low))
    )


def kebab(col: Column) -> Column:
    """kebabCase for single-word GPML enum values (Center -> center)."""
    return F.lower(col)


def _chr(codepoint: Column) -> Column:
    """codepoint -> single-character string, fully JVM-side: UTF-16BE
    code units (surrogate pair above the BMP) as hex, unhexed,
    decoded (Spark's decode supports UTF-16BE, not UTF-32)."""
    cp = codepoint.cast("long")
    bmp = F.lpad(F.hex(cp), 4, "0")
    astral = cp - F.lit(0x10000)
    hi = F.lit(0xD800) + F.shiftright(astral, 10)
    lo = F.lit(0xDC00) + F.pmod(astral, F.lit(1024))
    pair = F.concat(F.lpad(F.hex(hi), 4, "0"), F.lpad(F.hex(lo), 4, "0"))
    return F.decode(
        F.unhex(F.when(cp <= 0xFFFF, bmp).otherwise(pair)), "UTF-16BE")


def _decode_numeric_entities(col: Column) -> Column:
    """One non-recursive left-to-right pass over &#NNN; / &#xHH;
    entities (he.decode semantics): lookahead-split the string before
    every '&#', decode each piece's leading entity, reassemble."""
    parts = F.split(col, r"(?=&#)")
    dec = r"^&#([0-9]{1,7});"
    hexp = r"^&#[xX]([0-9a-fA-F]{1,6});"

    def piece(p):
        cp_d = F.regexp_extract(p, dec, 1).cast("long")
        cp_h = F.conv(F.regexp_extract(p, hexp, 1), 16, 10).cast("long")
        return (
            F.when(p.rlike(dec) & (cp_d <= 1114111),
                   F.concat(_chr(cp_d), F.regexp_replace(p, dec, "")))
            .when(p.rlike(hexp) & (cp_h <= 1114111),
                  F.concat(_chr(cp_h), F.regexp_replace(p, hexp, "")))
            .otherwise(p))

    return F.when(col.isNull(), F.lit(None)).otherwise(
        F.concat_ws("", F.transform(parts, piece)))


@lru_cache(maxsize=None)
def html_unescape_name(name: str) -> Column:
    """``html_unescape(F.col(name))`` memoized per process: the
    decode chain costs ~60 py4j round-trips to construct, the same
    few named columns recur on every model build, and unresolved
    Columns are immutable / DataFrame-independent, so reuse is
    safe."""
    return html_unescape(F.col(name))


def html_unescape(col: Column) -> Column:
    """he.decode for the entities that occur in GPML text
    (ref: decodeIfNotEmpty, src/2013a/ValueConverters.ts:38-40).
    Numeric entities decode FIRST (a '&#' produced by the later
    '&amp;' -> '&' rewrite must NOT re-decode — he is non-recursive),
    then the named entities. Everything stays a Catalyst expression."""
    c = _decode_numeric_entities(col)
    for ent, rep in [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                     ("&apos;", "'"), ("&nbsp;", " "),
                     ("&amp;", "&")]:
        c = F.regexp_replace(c, ent, rep)
    return c


# JS encodeURI keeps exactly A-Za-z0-9 ; , / ? : @ & = + $ - _ . ! ~
# * ' ( ) # and percent-encodes everything else as uppercase UTF-8.
# Java's URLEncoder (F.url_encode) keeps A-Za-z0-9 . - * _ , maps
# space to '+', and encodes the rest — so the delta is a FIXED set of
# literal rewrites. Order matters: '+' (space) must become %20 before
# %2B is restored to '+'.
_URL_ENCODE_FIXUPS = [
    ("+", "%20"),
    # unreserved in JS, encoded by Java
    ("%21", "!"), ("%7E", "~"), ("%27", "'"), ("%28", "("),
    ("%29", ")"),
    # reserved set kept by encodeURI
    ("%3B", ";"), ("%2F", "/"), ("%3F", "?"), ("%3A", ":"),
    ("%40", "@"), ("%26", "&"), ("%3D", "="), ("%2B", "+"),
    ("%24", "$"), ("%2C", ","), ("%23", "#"),
]


def encode_uri(col: Column) -> Column:
    """JS encodeURI for Href values (ref: src/2013a/ValueConverters.ts
    :308-311), as a JVM-side url_encode plus literal fixups."""
    c = F.url_encode(col)
    for frm, to in _URL_ENCODE_FIXUPS:
        c = F.replace(c, F.lit(frm), F.lit(to))
    return c


def rotation_degrees(col: Column) -> Column:
    """Rotation: radians (or a side keyword) -> normalized [0, 2pi) ->
    degrees (ref: src/2013a/ValueConverters.ts:191-222 + Angle.ts:60-62).
    Null input -> 0."""
    side = F.when(col == "Top", F.lit(0.0)) \
        .when(col == "Right", F.lit(0.5 * math.pi)) \
        .when(col == "Bottom", F.lit(math.pi)) \
        .when(col == "Left", F.lit(1.5 * math.pi))
    rad = F.coalesce(side, col.cast("double"), F.lit(0.0))
    norm = F.pmod(rad, F.lit(2.0 * math.pi))
    return F.degrees(norm)


def text_decoration(font_decoration: Column, font_strikethru: Column) -> Column:
    """underline / line-through / none synthesis
    (ref: src/2013a/ValueConverters.ts:270-288)."""
    under = font_decoration == "Underline"
    strike = font_strikethru == "Strikethru"
    return (
        F.when(under & strike, F.lit("underline line-through"))
        .when(under, F.lit("underline"))
        .when(strike, F.lit("line-through"))
        .otherwise(F.lit("none"))
    )


def stroke_dasharray(line_style: Column) -> Column:
    """Solid -> absent(null); Broken -> '5,3'
    (ref: src/2013a/ValueConverters.ts:224-238)."""
    return F.when(line_style == "Broken", F.lit("5,3"))


def stroke_width(line_thickness: Column, shape_type: Column,
                 has_points: Column) -> Column:
    """LineThickness converter (ref: src/2013a/ValueConverters.ts:351-381):
    0 if undefined; the value if ShapeType is a real shape or the element
    has edge Points; else 0."""
    shape_ok = shape_type.isNotNull() & (F.lower(shape_type) != "none")
    return (
        F.when(line_thickness.isNull(), F.lit(0.0))
        .when(shape_ok, line_thickness)
        .when(has_points, line_thickness)
        .otherwise(F.lit(0.0))
    )


def fill(fill_color: Column, shape_type: Column, has_points: Column) -> Column:
    """FillColor converter (ref: src/2013a/ValueConverters.ts:339-349)."""
    shape_ok = shape_type.isNotNull() & (F.lower(shape_type) != "none")
    return F.when(shape_ok | has_points, css_color(fill_color)) \
        .otherwise(F.lit("transparent"))


def rel_position_scalar(rel: Column) -> Column:
    """RelX/RelY -> position scalar with clamping into [0,1]
    (ref: src/2013a/ValueConverters.ts:405-432)."""
    rel01 = (rel + F.lit(1.0)) / F.lit(2.0)
    return F.when(rel01 < 0, F.lit(0.0)) \
        .when(rel01 > 1, F.lit(1.0)).otherwise(rel01)


def rel_offset_scalar(rel: Column) -> Column:
    """RelX/RelY -> relative offset scalar (spill outside [0,1])."""
    rel01 = (rel + F.lit(1.0)) / F.lit(2.0)
    return F.when(rel01 < 0, rel01) \
        .when(rel01 > 1, rel01 - F.lit(1.0)).otherwise(F.lit(0.0))


def orientation_scalar(position_scalar: Column) -> Column:
    """Initial edge emanation sign along an axis
    (ref: src/edge/edge.ts:74-82)."""
    return F.when(position_scalar == 0.0, F.lit(-1.0)) \
        .when(position_scalar == 1.0, F.lit(1.0)).otherwise(F.lit(0.0))


def union_types(*cols: Column) -> Column:
    """unionLSV over array/string columns: flatten, drop nulls, distinct,
    preserving first-seen order (ref: src/spinoffs/jsonld-utils.ts:85-89
    — lodash union keeps insertion order; array_union does too)."""
    arrs = []
    for c in cols:
        arrs.append(c)
    out = arrs[0]
    for c in arrs[1:]:
        out = F.array_union(out, c)
    return F.filter(out, lambda x: x.isNotNull())


def arr(col: Column) -> Column:
    """arrayify a scalar column (null -> empty array)."""
    return F.when(col.isNull(), F.array().cast("array<string>")) \
        .otherwise(F.array(col))
