"""Edge processing: point attachment resolution (J7), marker -> ontology
typing (J11), markerStart/markerEnd, and edge-level isAttachedTo with
the anchor hop (an edge attaches to another EDGE via an anchor,
ref: src/edge/edge.ts:92-383).

Pipeline shape (all Catalyst built-ins):
  edges --explode points--> attachable points
        --equi join (url, frag, graph_ref = target.id)--> targets
        --anchor hop: F.when(target is Anchor, anchor.is_attached_to)-->
        --collect_list sorted by point idx--> resolved edges

Marker typing is an F.aggregate over the points array against a
broadcast literal map (16-row MarkerMappings dimension).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .entities import DOC_KEY
from ..functions import converters as C
from ..functions.mappings import MARKER_MAPPINGS
from ..functions.skew import left_join_skipping_null_keys

_EDGE_NAMES = ("Interaction", "GraphicalLine")


def _marker_types_map() -> Column:
    """marker -> array of SBO/WP type terms (the bp record is excluded
    from `type`, matching unionLSV's primitive filter —
    src/spinoffs/jsonld-utils.ts:56-89)."""
    pairs = []
    for marker, m in MARKER_MAPPINGS.items():
        terms = list(m["sbo"]) + ([m["wp"]] if m["wp"] else [])
        pairs.extend([F.lit(marker), F.array(*[F.lit(t) for t in terms])])
    return F.create_map(*pairs)


_EDGE_EXPRS: tuple | None = None


def _edge_exprs() -> tuple:
    """convert_edges' point-struct transform and output projection —
    pure functions of module constants and literal column names,
    built once per process (same memo pattern as
    entities._nodeish_exprs; ~2.3k py4j round-trips per build)."""
    global _EDGE_EXPRS
    if _EDGE_EXPRS is not None:
        return _EDGE_EXPRS
    has_points = F.lit(True)

    pts = F.transform(
        "points",
        lambda p: F.struct(
            p.idx.alias("idx"),
            p.x.alias("x"),
            p.y.alias("y"),
            C.map_value(p.arrow_head).alias("marker"),
            p.graph_ref.alias("graph_ref"),
            C.rel_position_scalar(p.rel_x).alias("pos_x"),
            C.rel_position_scalar(p.rel_y).alias("pos_y"),
            C.rel_offset_scalar(p.rel_x).alias("roff_x"),
            C.rel_offset_scalar(p.rel_y).alias("roff_y"),
        ),
    )
    mmap = _marker_types_map()
    # processType parity (src/Processor.ts:373-393): an edge with an
    # Xref gains the "DB:ID" CURIE type, same as DataNodes (observed:
    # WP1818 Reactome-converted interactions)
    curie = F.when(
        F.col("xref_datasource").isNotNull()
        & F.col("xref_identifier").isNotNull(),
        F.array(F.concat_ws(":", "xref_datasource", "xref_identifier")),
    ).otherwise(F.array().cast("array<string>"))
    base_types = F.array_union(
        F.array(F.col("gpml_element_name"), F.lit("Edge")), curie)
    marker_types = F.aggregate(
        "pts",
        base_types,
        lambda acc, p: F.when(
            p.marker.isNotNull(),
            F.array_union(
                acc,
                F.coalesce(F.element_at(mmap, p.marker),
                           F.array().cast("array<string>")),
            ),
        ).otherwise(acc),
    )

    outcols = {
            "id": F.col("graph_id"),
            "kaavio_type": F.lit("Edge"),
            "marker_start": F.element_at("pts", 1).marker,
            "marker_end": F.when(F.size("pts") > 1,
                                 F.element_at("pts", -1).marker),
            "types": marker_types,
            "draw_as": F.concat(F.col("eff_connector_type"), F.lit("Line")),
            "stroke": C.css_color(F.col("eff_color")),
            "stroke_width": C.stroke_width(
                F.col("eff_line_thickness"), F.col("eff_shape_type"),
                has_points),
            "stroke_dasharray": C.stroke_dasharray(F.col("eff_line_style")),
            "fill": C.fill(F.col("eff_fill_color"), F.col("eff_shape_type"),
                           has_points),
            "z_index": F.col("zorder"),
            "citations": F.when(
                F.col("biopax_refs").isNotNull(),
                F.transform(F.col("biopax_refs"),
                            lambda r: F.concat(F.lit("publicationXref"), r)),
            ),
    }
    _EDGE_EXPRS = (pts, outcols)
    return _EDGE_EXPRS


def convert_edges(converted: DataFrame) -> DataFrame:
    """Edge mentions -> edge entities with provisional points.

    drawAs = ConnectorType + 'Line' (P12); stroke/fill/strokeWidth use
    the has-Points branch of the converters
    (ref: src/2013a/ValueConverters.ts:339-386). The projection
    expressions are memoized per process (_edge_exprs)."""
    e = converted.filter(F.col("gpml_element_name").isin(*_EDGE_NAMES))
    pts, outcols = _edge_exprs()
    return (
        e.withColumn("pts", pts)
        .withColumns(outcols)
        .select(
            *DOC_KEY, "pathway_id", "elem_idx", "id", "gpml_element_name",
            "kaavio_type", "types", "marker_start", "marker_end", "draw_as",
            "stroke", "stroke_width", "stroke_dasharray", "fill", "z_index",
            "citations", "comments", "group_ref", "pts",
            "xref_datasource", "xref_identifier",
        )
    )


def resolve_edge_points(edges: DataFrame, targets: DataFrame) -> DataFrame:
    """Resolve each attachable point against the entity it references;
    apply the anchor hop for edge-level attachment (J7,
    ref: src/edge/edge.ts:148-317).

    `targets` must provide: url, frag, id, gpml_element_name, width,
    height, attachment_position (for anchors), is_attached_to (anchor's
    parent edge).
    """
    t = targets.select(
        F.col("url").alias("t_url"), F.col("frag").alias("t_frag"),
        F.col("id").alias("t_id"),
        F.col("gpml_element_name").alias("t_elem"),
        F.col("width").alias("t_width"), F.col("height").alias("t_height"),
        F.col("attachment_position").alias("t_att_pos"),
        F.col("is_attached_to").alias("t_parent"),
    )

    p = edges.select(
        *DOC_KEY, "id", F.posexplode("pts").alias("pos", "p")
    ).select(*DOC_KEY, "id", "pos", "p.*")

    # most points are unattached (graph_ref NULL): they bypass the
    # join instead of hashing into one straggler reducer
    j = left_join_skipping_null_keys(
        p, t,
        (p.url == t.t_url) & (p.frag == t.t_frag)
        & (p.graph_ref == t.t_id),
        "graph_ref",
    )

    is_anchor = F.col("t_elem") == "Anchor"
    is_first = F.col("idx") == 0
    attached = F.col("graph_ref").isNotNull()

    # node/group/burr attachment: absolute offset + emanation orientation
    off_x = F.col("roff_x") * F.col("t_width")
    off_y = F.col("roff_y") * F.col("t_height")
    orient_sign = F.when(is_first, F.lit(1.0)).otherwise(F.lit(-1.0))
    orient_x = orient_sign * C.orientation_scalar(F.col("pos_x"))
    orient_y = orient_sign * C.orientation_scalar(F.col("pos_y"))

    resolved = j.withColumns({
        # what the EDGE is attached to (anchor -> its parent edge)
        "edge_ref": F.when(is_anchor, F.col("t_parent"))
        .otherwise(F.col("t_id")),
        "att_position": F.when(is_anchor, F.col("t_att_pos"))
        .when(attached, F.array("pos_x", "pos_y")),
        "att_offset": F.when(is_anchor, F.array(F.lit(0.0), F.lit(0.0)))
        .when(attached, F.array(off_x, off_y)),
        "orientation": F.when(attached & ~is_anchor,
                              F.array(orient_x, orient_y)),
        "resolved_target_elem": F.col("t_elem"),
    })

    point_struct = F.struct(
        F.col("x"), F.col("y"),
        F.col("graph_ref").alias("is_attached_to"),
        F.col("att_position").alias("attachment_position"),
        F.col("att_offset").alias("attachment_offset"),
        F.col("orientation"),
        F.col("marker"),
    )
    agg = resolved.groupBy(*DOC_KEY, "id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("idx"),
                                                 point_struct.alias("pt")))),
            lambda s: s.pt,
        ).alias("points_resolved"),
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("edge_ref").isNotNull(),
                           F.struct(F.col("idx"), F.col("edge_ref"))))),
            lambda s: s.edge_ref,
        ).alias("is_attached_to"),
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("graph_ref").isNotNull(),
                           F.struct(F.col("idx"),
                                    F.col("resolved_target_elem"),
                                    F.col("graph_ref"))))),
            lambda s: F.struct(s.resolved_target_elem.alias("elem"),
                               s.graph_ref.alias("point_ref")),
        ).alias("point_targets"),
        # edge-level endpoint refs (anchor hop applied) for the
        # interaction-classification stage
        F.min_by(F.col("edge_ref"), F.col("idx")).alias("endpoint_first_ref"),
        F.max_by(F.col("edge_ref"), F.col("idx")).alias("endpoint_last_ref"),
    )
    agg = agg.withColumn(
        "is_attached_to",
        F.when(F.size("is_attached_to") > 0, F.col("is_attached_to")),
    )
    out = edges.join(agg, [*DOC_KEY, "id"], "left").withColumn(
        "points", F.coalesce(
            F.col("points_resolved"),
            F.transform(
                "pts",
                lambda pnt: F.struct(
                    pnt.x.alias("x"), pnt.y.alias("y"),
                    F.lit(None).cast("string").alias("is_attached_to"),
                    F.lit(None).cast("array<double>").alias("attachment_position"),
                    F.lit(None).cast("array<double>").alias("attachment_offset"),
                    F.lit(None).cast("array<double>").alias("orientation"),
                    pnt.marker.alias("marker"),
                ),
            ),
        ),
    ).drop("points_resolved", "pts")
    return out
