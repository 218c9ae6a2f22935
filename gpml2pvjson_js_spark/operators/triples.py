"""Materialize (url, subj, pred, obj) triples from the document model.

This is the north-star output (BASELINE.json north_rule): the flattened
knowledge-graph form of the reference's `{pathway, entitiesById}`
JSON-LD document (src/Processor.ts:88-121). Predicate vocabulary per
FIXTURES.md §3.3.

Each generator is a narrow select + explode — no shuffles beyond what
the inputs already did; the final union is shuffle-free.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .entities import DOC_KEY
from ..functions import mappings as M

TRIPLE_COLS = ["url", "frag", "pathway_id", "subj", "pred", "obj"]


def _t(df: DataFrame, subj, pred: str, obj) -> DataFrame:
    return df.select(
        *DOC_KEY, "pathway_id",
        subj.alias("subj"), F.lit(pred).alias("pred"), obj.alias("obj"),
    ).filter(F.col("obj").isNotNull() & F.col("subj").isNotNull())


def _explode(df: DataFrame, subj, pred: str, arr) -> DataFrame:
    return _t(df.withColumn("_o", F.explode_outer(arr)),
              subj, pred, F.col("_o"))


def entity_triples(nodes: DataFrame) -> list[DataFrame]:
    sid = F.col("id")
    out = [
        _explode(nodes, sid, M.PRED_TYPE, F.col("types")),
        _t(nodes, sid, M.PRED_LABEL, F.col("text_content")),
        _t(nodes, sid, M.PRED_XREF,
           F.when(F.col("xref_datasource").isNotNull()
                  & F.col("xref_identifier").isNotNull(),
                  F.concat_ws(":", "xref_datasource", "xref_identifier"))),
        _t(nodes, sid, M.PRED_IS_PART_OF, F.col("is_part_of")),
        _explode(nodes, sid, M.PRED_CITATION, F.col("citations")),
    ]
    if "contains" in nodes.columns:
        out.append(_explode(nodes, sid, M.PRED_CONTAINS, F.col("contains")))
    if "is_attached_to" in nodes.columns:
        # burrs (States/Anchors) attach to a host entity
        out.append(_t(nodes, sid, "wp:attachedTo", F.col("is_attached_to")))
    return out


def edge_triples(edges: DataFrame) -> list[DataFrame]:
    sid = F.col("id")
    return [
        _explode(edges, sid, M.PRED_TYPE, F.col("types")),
        _t(edges, sid, M.PRED_SOURCE, F.col("endpoint_first_ref")),
        _t(edges, sid, M.PRED_TARGET, F.col("endpoint_last_ref")),
        _t(edges, sid, M.PRED_IS_PART_OF, F.col("is_part_of")),
        _explode(edges, sid, M.PRED_CITATION, F.col("citations")),
    ]


def interaction_triples(interactions: DataFrame) -> list[DataFrame]:
    sid = F.col("id")
    i = interactions
    return [
        _t(i, sid, M.PRED_TYPE, F.col("biopax_type")),
        _t(i, sid, M.PRED_CONTROLLER, F.col("controller")),
        _t(i, sid, M.PRED_CONTROLLED, F.col("controlled")),
        _t(i, sid, M.PRED_LEFT, F.col("left")),
        _t(i, sid, M.PRED_RIGHT, F.col("right")),
        _explode(i, sid, M.PRED_PARTICIPANT, F.col("participants")),
        _t(i, sid, M.PRED_CONTROL_TYPE, F.col("control_type")),
        _t(i, sid, M.PRED_CONVERSION_DIRECTION,
           F.col("conversion_direction")),
    ]


def citation_triples(citations: DataFrame) -> list[DataFrame]:
    sid = F.col("id")
    return [
        _explode(citations, sid, M.PRED_TYPE, F.col("types")),
        _t(citations, sid, M.PRED_XREF,
           F.when(F.col("xref_datasource").isNotNull()
                  & F.col("xref_identifier").isNotNull(),
                  F.concat_ws(":", "xref_datasource", "xref_identifier"))),
        _t(citations, sid, M.PRED_LABEL, F.col("standard_name")),
    ]


def vocabulary_triples(vocabularies: DataFrame) -> list[DataFrame]:
    """openControlledVocabulary entities: IRI subject, type + term
    (ref entity shape: golden openControlledVocabulary entries)."""
    sid = F.col("id")
    return [
        _explode(vocabularies, sid, M.PRED_TYPE, F.col("types")),
        _t(vocabularies, sid, M.PRED_TERM, F.col("term")),
    ]


def pathway_triples(pathways: DataFrame) -> list[DataFrame]:
    sid = F.col("id")
    p = pathways
    out = [
        _explode(p, sid, M.PRED_TYPE, F.col("types")),
        _t(p, sid, M.PRED_LABEL, F.col("name")),
        _explode(p, sid, M.PRED_CONTAINS, F.col("contains")),
    ]
    # wp:ontologyTag for every vocab IRI in types beyond "Pathway"
    tags = _explode(
        p, sid, M.PRED_ONTOLOGY_TAG,
        F.filter(F.col("types"), lambda t: t.startswith("http")))
    out.append(tags)
    return out


def build_triples(model: dict, interactions: DataFrame | None = None,
                  dedup: bool = True) -> DataFrame:
    """`dedup=False` returns the raw union and leaves the distinct to
    the caller — the snapshot pipeline folds it into its bucket
    shuffle (one full-corpus exchange instead of two, see
    plans/pipeline.py bucketed_distinct)."""
    parts: list[DataFrame] = []
    parts += entity_triples(model["nodes"])
    parts += edge_triples(model["edges"])
    parts += citation_triples(model["citations"])
    parts += pathway_triples(model["pathways"])
    if "vocabularies" in model:
        parts += vocabulary_triples(model["vocabularies"])
    if interactions is not None:
        parts += interaction_triples(interactions)
    out = reduce(lambda a, b: a.unionByName(b), parts)
    return out.dropDuplicates(TRIPLE_COLS) if dedup else out
