"""Group resolution: membership (J5/J6), bounding box (A3), member
re-basing (A4), empty/nested-group filtering (P21).

GPML2013a identifies groups by GroupId but references them by GraphId
in pvjson; every element carrying GroupRef is a member
(ref: src/Processor.ts:235-243, src/group.ts:28-181,
src/2013a/toPvjson.ts:746-869).

All joins/aggregations key on (url, frag, ...): both sides are
corpus-scale, so these are shuffle joins by design (auto-broadcast is
disabled session-wide, session.py), co-partitioned after the initial
url-hash shuffle; AQE coalesces/splits the partitions at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .entities import DOC_KEY, _base_types, _finish
from ..functions import converters as C


def group_membership(converted: DataFrame) -> DataFrame:
    """(url, frag, group_graph_id, member_id, member_is_edge):
    members resolve GroupRef=GroupId -> the group's GraphId (J5)."""
    groups = converted.filter(F.col("gpml_element_name") == "Group") \
        .select(F.col("url").alias("g_url"), F.col("frag").alias("g_frag"),
                F.col("group_id").alias("g_group_id"),
                F.col("graph_id").alias("group_graph_id"))
    members = converted.filter(F.col("group_ref").isNotNull()).select(
        *DOC_KEY,
        F.col("group_ref"),
        F.col("graph_id").alias("member_id"),
        F.col("gpml_element_name").isin("Interaction", "GraphicalLine")
        .alias("member_is_edge"),
        F.col("elem_idx").alias("member_elem_idx"),
    )
    return members.join(
        groups,
        (members.url == groups.g_url) & (members.frag == groups.g_frag)
        & (members.group_ref == groups.g_group_id),
    ).select(members.url, members.frag, "group_graph_id", "member_id",
             "member_is_edge", "member_elem_idx")


def build_groups(converted: DataFrame, free_nodes: DataFrame,
                 states: DataFrame, membership: DataFrame) -> DataFrame:
    """Group entities with computed bbox. Empty groups are dropped by
    the inner membership join (P21); nested groups (a Group with its
    own GroupRef) are excluded from bbox members like the reference
    (contained groups are filtered, src/2013a/toPvjson.ts:781)."""
    groups = converted.filter(F.col("gpml_element_name") == "Group")
    groups = groups.withColumn("types", _base_types(F.col("style_types")))
    g = _finish(groups).withColumnRenamed("group_id", "gpml_group_id")

    # member geometry: free nodes + states (nodes) and edge endpoints
    node_geo = free_nodes.unionByName(states).select(
        *DOC_KEY, F.col("id").alias("member_id"),
        "x", "y", "width", "height", F.col("z_index"),
    )
    edge_geo = converted.filter(
        F.col("gpml_element_name").isin("Interaction", "GraphicalLine")
    ).select(
        *DOC_KEY, F.col("graph_id").alias("member_id"),
        F.least(F.element_at("points", 1).x,
                F.element_at("points", -1).x).alias("x"),
        F.least(F.element_at("points", 1).y,
                F.element_at("points", -1).y).alias("y"),
        (F.greatest(F.element_at("points", 1).x,
                    F.element_at("points", -1).x)
         - F.least(F.element_at("points", 1).x,
                   F.element_at("points", -1).x)).alias("width"),
        (F.greatest(F.element_at("points", 1).y,
                    F.element_at("points", -1).y)
         - F.least(F.element_at("points", 1).y,
                   F.element_at("points", -1).y)).alias("height"),
        F.col("zorder").alias("z_index"),
    )
    member_geo = node_geo.unionByName(edge_geo).select(
        F.col("url").alias("n_url"), F.col("frag").alias("n_frag"),
        F.col("member_id").alias("n_member_id"),
        "x", "y", "width", "height", "z_index")

    mg = membership.join(
        member_geo,
        (membership.member_id == member_geo.n_member_id)
        & (membership.url == member_geo.n_url)
        & (membership.frag == member_geo.n_frag),
    ).select(membership.url, membership.frag, "group_graph_id",
             "x", "y", "width", "height", "z_index")

    # classic partial+final hash agg (A3, ref: src/group.ts:28-150)
    bbox = mg.groupBy(*DOC_KEY, "group_graph_id").agg(
        F.min("x").alias("min_x"),
        F.min("y").alias("min_y"),
        F.max(F.col("x") + F.col("width")).alias("max_x"),
        F.max(F.col("y") + F.col("height")).alias("max_y"),
        F.min("z_index").alias("min_z"),
        F.count(F.lit(1)).alias("n_members"),
    ).select(F.col("url").alias("b_url"), F.col("frag").alias("b_frag"),
             "group_graph_id", "min_x", "min_y", "max_x", "max_y", "min_z",
             "n_members")

    out = g.join(
        bbox,
        (g.id == bbox.group_graph_id) & (g.url == bbox.b_url)
        & (g.frag == bbox.b_frag),
    ).drop("b_url", "b_frag", "group_graph_id")
    pad = F.col("padding") + F.col("stroke_width")
    return (
        out.withColumn("x", F.col("min_x") - pad)
        .withColumn("y", F.col("min_y") - pad)
        .withColumn("width", F.col("max_x") - F.col("min_x") + 2 * pad)
        .withColumn("height", F.col("max_y") - F.col("min_y") + 2 * pad)
        .withColumn("z_index", F.col("min_z"))
        .drop("min_x", "min_y", "max_x", "max_y", "min_z", "n_members")
    )


def member_origins(groups: DataFrame, membership: DataFrame) -> DataFrame:
    """(m_url, m_frag, member_id, gid, gx, gy): each member's containing
    group origin, with prefixed keys to keep downstream joins
    unambiguous."""
    gsel = groups.select(
        F.col("url").alias("g_url"), F.col("frag").alias("g_frag"),
        F.col("id").alias("gid"),
        F.col("x").alias("gx"), F.col("y").alias("gy"))
    return membership.join(
        gsel,
        (membership.group_graph_id == gsel.gid)
        & (membership.url == gsel.g_url)
        & (membership.frag == gsel.g_frag),
    ).select(membership.url.alias("m_url"), membership.frag.alias("m_frag"),
             "member_id", "gid", "gx", "gy")


def rebase_members(nodes: DataFrame, groups: DataFrame,
                   membership: DataFrame) -> DataFrame:
    """Members become group-relative: coords -= group (x, y); gain
    isPartOf (A4, ref: src/2013a/toPvjson.ts:800-860). Left join: non-
    members pass through unchanged."""
    m = member_origins(groups, membership)
    j = nodes.join(
        m,
        (nodes.id == m.member_id) & (nodes.url == m.m_url)
        & (nodes.frag == m.m_frag),
        "left",
    ).drop("m_url", "m_frag", "member_id")
    return (
        j.withColumn("x", F.when(F.col("gid").isNotNull(),
                                 F.col("x") - F.col("gx"))
          .otherwise(F.col("x")))
        .withColumn("y", F.when(F.col("gid").isNotNull(),
                                F.col("y") - F.col("gy"))
          .otherwise(F.col("y")))
        .withColumn("is_part_of", F.col("gid"))
        .drop("gid", "gx", "gy")
    )


def group_contains(groups: DataFrame, membership: DataFrame,
                   z_index_of: DataFrame) -> DataFrame:
    """contains = member ids sorted by zIndex (O1,
    ref: src/2013a/toPvjson.ts:791-798)."""
    z = z_index_of.select(F.col("url").alias("z_url"),
                          F.col("frag").alias("z_frag"), "zid", "z")
    mz = membership.join(
        z,
        (membership.member_id == z.zid)
        & (membership.url == z.z_url) & (membership.frag == z.z_frag),
        "left",
    ).select(membership.url, membership.frag, "group_graph_id",
             "member_id", "z")
    agg = mz.groupBy(*DOC_KEY, "group_graph_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("z", "member_id"))),
            lambda s: s.member_id,
        ).alias("contains")
    ).select(F.col("url").alias("a_url"), F.col("frag").alias("a_frag"),
             "group_graph_id", "contains")
    return groups.join(
        agg,
        (groups.id == agg.group_graph_id) & (groups.url == agg.a_url)
        & (groups.frag == agg.a_frag),
        "left",
    ).drop("a_url", "a_frag", "group_graph_id")
