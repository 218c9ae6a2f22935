"""Iterative topological levels (O2): the reference's fixpoint
scheduler (src/2013a/toPvjson.ts:470-637, RECURSION_LIMIT=1000) as
bounded rounds of DataFrame joins — the connected-components-style
driver loop.

An entity's dependencies are what must be resolved before it
(contains ∪ isAttachedTo ∪ isAttachedToOrVia). Depth in practice is
<= 4 (hyperedge depth-3 fixtures); rounds are capped and
non-converged rows are quarantined as cycles, matching the
reference's cycle tolerance (leftovers appended unsorted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..operators.entities import DOC_KEY

MAX_ROUNDS = 8


def dependency_edges(model: dict) -> DataFrame:
    """(url, frag, id, dep_id) for burr->host, edge->target,
    group->member."""
    nodes, edges = model["nodes"], model["edges"]
    burr = nodes.filter(F.col("is_attached_to").isNotNull()).select(
        *DOC_KEY, "id", F.col("is_attached_to").alias("dep_id"))
    # edge-level attachment (isAttachedTo)
    edge = edges.filter(F.col("is_attached_to").isNotNull()).select(
        *DOC_KEY, "id", F.explode("is_attached_to").alias("dep_id"))
    # point-level attachment incl. anchors (isAttachedToOrVia,
    # ref: src/edge/edge.ts:92-106)
    via = edges.filter(F.col("point_targets").isNotNull()).select(
        *DOC_KEY, "id",
        F.explode("point_targets").alias("pt")
    ).select(*DOC_KEY, "id", F.col("pt.point_ref").alias("dep_id"))
    grp = nodes.filter(F.col("contains").isNotNull()).select(
        *DOC_KEY, "id", F.explode("contains").alias("dep_id"))
    return burr.unionByName(edge).unionByName(via).unionByName(grp) \
        .distinct()


def topo_levels(entities: DataFrame, deps: DataFrame,
                max_rounds: int = MAX_ROUNDS) -> DataFrame:
    """entities(url, frag, id) + deps -> (url, frag, id, topo_level);
    topo_level = -1 marks cycle/non-converged rows (quarantine)."""
    d = deps.select(*DOC_KEY, "id", "dep_id").localCheckpoint(eager=False, storageLevel=StorageLevel.MEMORY_AND_DISK)
    has_deps = d.select(*DOC_KEY, "id").distinct()
    levels = entities.select(*DOC_KEY, "id").join(
        has_deps, [*DOC_KEY, "id"], "left_anti"
    ).withColumn("topo_level", F.lit(0))

    remaining = entities.select(*DOC_KEY, "id").join(
        levels.select(*DOC_KEY, "id"), [*DOC_KEY, "id"], "left_anti")

    for _ in range(max_rounds):
        if remaining.isEmpty():
            break
        lv = levels.select(
            F.col("url").alias("l_url"), F.col("frag").alias("l_frag"),
            F.col("id").alias("l_id"), "topo_level")
        dep_lv = d.join(
            lv, (d.url == lv.l_url) & (d.frag == lv.l_frag)
            & (d.dep_id == lv.l_id), "left",
        ).groupBy(*DOC_KEY, "id").agg(
            F.min(F.when(F.col("topo_level").isNotNull(), 1)
                  .otherwise(0)).alias("all_known"),
            F.max("topo_level").alias("max_dep"),
        )
        newly = remaining.join(dep_lv, [*DOC_KEY, "id"]) \
            .filter(F.col("all_known") == 1) \
            .select(*DOC_KEY, "id",
                    (F.col("max_dep") + 1).alias("topo_level"))
        if newly.isEmpty():
            break
        levels = levels.unionByName(newly).localCheckpoint(eager=False, storageLevel=StorageLevel.MEMORY_AND_DISK)
        remaining = remaining.join(newly.select(*DOC_KEY, "id"),
                                   [*DOC_KEY, "id"], "left_anti") \
            .localCheckpoint(eager=False, storageLevel=StorageLevel.MEMORY_AND_DISK)

    cycles = remaining.withColumn("topo_level", F.lit(-1))
    return levels.unionByName(cycles)
