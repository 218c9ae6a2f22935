"""JSON-LD document export (JS1/JS2): reassemble the per-page
`{pathway, entitiesById}` document the reference emits as NDJSON
(ref: src/Processor.ts:88-121, bin/gpml2pvjson:104-120,
src/2013a/toPvjson.ts:281-309).

Document reassembly is a grouped aggregation per (url, frag):
each entity serializes to a JSON object string via `to_json`
(null fields dropped), and `entitiesById` is a string-assembled JSON
map — all JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .entities import DOC_KEY
from ..functions.mappings import (
    FONT_EXTRA_CLASSES,
    FONT_EXTRA_DEFAULTS,
    JSONLD_CONTEXT,
)


def _named(col: Column, name: str) -> Column:
    return col.alias(name)


def _node_json(nodes: DataFrame) -> DataFrame:
    n = nodes
    is_fontish = F.col("gpml_element_name").isin(*FONT_EXTRA_CLASSES)
    fields = [
        _named(F.col("id"), "id"),
        _named(F.col("text_content"), "textContent"),
        _named(F.col("wp_type"), "wpType"),
        _named(F.col("state_type"), "stateType"),
        _named(F.col("x"), "x"), _named(F.col("y"), "y"),
        _named(F.col("width"), "width"),
        _named(F.col("height"), "height"),
        _named(F.col("z_index"), "zIndex"),
        _named(F.col("draw_as"), "drawAs"),
        _named(F.col("stroke"), "stroke"),
        _named(F.col("stroke_width"), "strokeWidth"),
        _named(F.col("stroke_dasharray"), "strokeDasharray"),
        _named(F.col("stroke_style"), "strokeStyle"),
        _named(F.col("fill"), "fill"),
        _named(F.col("fill_opacity"), "fillOpacity"),
        _named(F.col("rotation"), "rotation"),
        _named(F.col("text_rotation"), "textRotation"),
        _named(F.col("font_family"), "fontFamily"),
        _named(F.col("font_size"), "fontSize"),
        _named(F.col("font_weight"), "fontWeight"),
        _named(F.col("font_style"), "fontStyle"),
        _named(F.col("text_align"), "textAlign"),
        _named(F.col("vertical_align"), "verticalAlign"),
        _named(F.col("text_decoration"), "textDecoration"),
        _named(F.col("padding"), "padding"),
        _named(F.col("rx"), "rx"), _named(F.col("ry"), "ry"),
        _named(F.col("xref_datasource"), "xrefDataSource"),
        _named(F.col("xref_identifier"), "xrefIdentifier"),
        _named(F.col("cellular_component"), "cellularComponent"),
        _named(F.col("citations"), "citations"),
        _named(F.col("comments"), "comments"),
        _named(F.col("is_attached_to"), "isAttachedTo"),
        _named(
            F.when(F.col("attachment_position").isNotNull(), F.struct(
                F.col("attachment_position").alias("position"),
                F.col("attachment_offset").alias("offset"))),
            "attachmentDisplay"),
        _named(F.col("is_part_of"), "isPartOf"),
        _named(F.col("contains"), "contains"),
        _named(F.col("burrs"), "burrs"),
        _named(F.col("href"), "href"),
        _named(F.col("types"), "type"),
        _named(F.col("kaavio_type"), "kaavioType"),
        _named(F.col("gpml_element_name"), "gpmlElementName"),
        _named(F.when(is_fontish, F.lit(FONT_EXTRA_DEFAULTS["lineHeight"])),
               "lineHeight"),
        _named(F.when(is_fontish, F.lit(FONT_EXTRA_DEFAULTS["overflow"])),
               "overflow"),
        _named(F.when(is_fontish, F.lit(FONT_EXTRA_DEFAULTS["textOverflow"])),
               "textOverflow"),
        _named(F.when(is_fontish, F.lit(FONT_EXTRA_DEFAULTS["whiteSpace"])),
               "whiteSpace"),
    ]
    return n.select(*DOC_KEY, F.col("id"),
                    F.to_json(F.struct(*fields)).alias("entity_json"))


def _edge_json(edges: DataFrame) -> DataFrame:
    pts = F.transform(
        "points",
        lambda p: F.struct(
            p.is_attached_to.alias("isAttachedTo"),
            F.when(p.attachment_position.isNotNull(), F.struct(
                p.attachment_position.alias("position"),
                p.attachment_offset.alias("offset"))).alias(
                    "attachmentDisplay"),
            p.x.alias("x"), p.y.alias("y"),
            p.orientation.alias("orientation"),
        ))
    fields = [
        _named(F.col("id"), "id"),
        _named(F.col("stroke_width"), "strokeWidth"),
        _named(F.col("z_index"), "zIndex"),
        _named(pts, "points"),
        _named(F.col("stroke"), "stroke"),
        _named(F.col("stroke_dasharray"), "strokeDasharray"),
        _named(F.col("draw_as"), "drawAs"),
        _named(F.col("fill"), "fill"),
        _named(F.col("types"), "type"),
        _named(F.col("kaavio_type"), "kaavioType"),
        _named(F.col("gpml_element_name"), "gpmlElementName"),
        _named(F.col("marker_start"), "markerStart"),
        _named(F.col("marker_end"), "markerEnd"),
        _named(F.col("is_attached_to"), "isAttachedTo"),
        _named(F.col("citations"), "citations"),
        _named(F.col("comments"), "comments"),
        _named(F.col("is_part_of"), "isPartOf"),
        _named(F.col("burrs"), "burrs"),
    ]
    return edges.select(*DOC_KEY, F.col("id"),
                        F.to_json(F.struct(*fields)).alias("entity_json"))


def _citation_json(citations: DataFrame) -> DataFrame:
    fields = [
        _named(F.col("id"), "id"),
        _named(F.col("xref_identifier"), "xrefIdentifier"),
        _named(F.col("xref_datasource"), "xrefDataSource"),
        _named(F.col("standard_name"), "standardName"),
        _named(F.col("source"), "source"),
        _named(F.col("year"), "year"),
        _named(F.col("authors"), "authors"),
        _named(F.col("types"), "type"),
        _named(F.col("gpml_element_name"), "gpmlElementName"),
        _named(F.col("text_content"), "textContent"),
    ]
    return citations.select(*DOC_KEY, F.col("id"),
                            F.to_json(F.struct(*fields))
                            .alias("entity_json"))


def _vocab_json(vocabs: DataFrame) -> DataFrame:
    fields = [
        _named(F.col("term"), "term"),
        _named(F.col("xref_identifier"), "xrefIdentifier"),
        _named(F.col("ontology"), "ontology"),
        _named(F.col("types"), "type"),
        _named(F.col("gpml_element_name"), "gpmlElementName"),
        _named(F.col("id"), "id"),
    ]
    return vocabs.select(*DOC_KEY, F.col("id"),
                         F.to_json(F.struct(*fields)).alias("entity_json"))


def _pathway_json(pathways: DataFrame) -> Column:
    fields = [
        _named(F.array(F.lit(JSONLD_CONTEXT)), "@context"),
        _named(F.lit("white"), "fill"),
        _named(F.lit(0.0), "strokeWidth"),
        _named(F.lit("black"), "stroke"),
        _named(F.col("contains"), "contains"),
        _named(F.lit("rect"), "drawAs"),
        _named(F.lit("Pathway"), "gpmlElementName"),
        _named(F.col("height"), "height"),
        _named(F.lit("Group"), "kaavioType"),
        _named(F.col("name"), "name"),
        _named(F.lit(5.0), "padding"),
        _named(F.col("types"), "type"),
        _named(F.col("width"), "width"),
        _named(F.lit(0.0), "x"), _named(F.lit(0.0), "y"),
        _named(F.lit(0.0), "zIndex"),
        _named(F.lit(12.0), "fontSize"),
        _named(F.lit("bold"), "fontWeight"),
        _named(F.lit("left"), "textAlign"),
        _named(F.lit("top"), "verticalAlign"),
        _named(F.col("organism"), "organism"),
        _named(F.col("license"), "license"),
        _named(F.col("data_source"), "dataSource"),
        _named(F.col("data_source_version"), "dataSourceVersion"),
        _named(F.col("author"), "author"),
        _named(F.col("email"), "email"),
        _named(F.col("maintainer"), "maintainer"),
        _named(F.col("last_modified"), "lastModified"),
        _named(F.col("comments"), "comments"),
        _named(F.col("standard_name"), "standardName"),
        _named(F.col("display_name"), "displayName"),
        _named(F.col("text_content"), "textContent"),
        _named(F.col("is_similar_to"), "isSimilarTo"),
        _named(F.col("id"), "id"),
    ]
    return F.to_json(F.struct(*fields))


def _entity_entries(model: dict) -> DataFrame:
    """(url, frag, entry) — one escaped `"id":{...}` map entry per
    entity across the four entity frames."""
    ents = (
        _node_json(model["nodes"])
        .unionByName(_edge_json(model["edges"]))
        .unionByName(_citation_json(model["citations"]))
        .unionByName(_vocab_json(model["vocabularies"]))
    )
    # to_json on the id emits a correctly-escaped JSON string key (a
    # GraphId may legally contain '"' via &quot;): {"k":"<esc>"} with
    # the fixed 5-char prefix and 1-char suffix stripped
    key_json = F.to_json(F.struct(F.col("id").alias("k")))
    escaped_key = key_json.substr(F.lit(6), F.length(key_json) - 6)
    # to_json omits null fields ("{}" -> empty key -> ':{...}' corrupt
    # entry); drop null-id rows instead, matching the pre-to_json
    # behavior where concat returned NULL and collect_list skipped it
    return ents.filter(F.col("id").isNotNull()).select(
        *DOC_KEY,
        F.concat(escaped_key, F.lit(":"), F.col("entity_json"))
        .alias("entry"))


def _assemble(pathway_json, entities_body) -> Column:
    return F.concat(
        F.lit('{"pathway":'), pathway_json,
        F.lit(',"entitiesById":{'),
        F.coalesce(entities_body, F.lit("")),
        F.lit("}}"))


def jsonld_documents(model: dict,
                     bucketize: tuple[int, int] | None = None
                     ) -> DataFrame:
    """One row per (url, frag): the full {pathway, entitiesById}
    JSON-LD document string (NDJSON-ready, S5).

    `bucketize=(n_buckets, write_mult)`: the snapshot-pipeline path.
    The pathway row rides the SAME union as the entity entries
    (marker columns instead of a join), and the single grouped
    assembly is keyed by the snapshot's (bucket, __wsalt, url, frag)
    — its one exchange hash-partitions by (bucket, __wsalt), which
    simultaneously satisfies the groupBy (subset rule) and the
    snapshot writer's layout, so the FULL document text is shuffled
    exactly once instead of twice (grouping + commit repartition).
    entitiesById map order differs from the join path only in entry
    arrival order — JSON-object semantics, pinned order-insensitively
    by the golden tests."""
    p = model["pathways"].withColumn("pathway_json",
                                     _pathway_json(model["pathways"]))
    if bucketize is None:
        per_doc = _entity_entries(model).groupBy(*DOC_KEY).agg(
            F.concat_ws(",", F.collect_list("entry"))
            .alias("entities_body"))
        p = p.select(*DOC_KEY, "pathway_id", "pathway_json")
        per_doc = per_doc.select(F.col("url").alias("e_url"),
                                 F.col("frag").alias("e_frag"),
                                 "entities_body")
        out = p.join(
            per_doc,
            (p.url == per_doc.e_url) & (p.frag == per_doc.e_frag),
            "left",
        ).drop("e_url", "e_frag")
        return out.select(*DOC_KEY, "pathway_id",
                          _assemble(F.col("pathway_json"),
                                    F.col("entities_body"))
                          .alias("jsonld"))

    from ..plans.pipeline import with_bucket_cols
    n_buckets, mult = bucketize
    null_s = F.lit(None).cast("string")
    e_rows = _entity_entries(model).select(
        *DOC_KEY, null_s.alias("pid"), null_s.alias("pathway_json"),
        F.col("entry"))
    p_rows = p.select(*DOC_KEY, F.col("pathway_id").alias("pid"),
                      "pathway_json", null_s.alias("entry"))
    u = with_bucket_cols(e_rows.unionByName(p_rows), n_buckets, mult)
    # layout keys without a fixed count: AQE sizes the exchange from
    # runtime bytes (see SnapshotStore.commit) — partitioning on
    # (bucket, __wsalt) still satisfies the groupBy's clustering AND
    # the snapshot layout, so the document text is shuffled once.
    u = u.repartition(F.col("bucket"), F.col("__wsalt"))
    per_doc = u.groupBy("bucket", "__wsalt", *DOC_KEY).agg(
        F.max("pid").alias("pathway_id"),
        F.max("pathway_json").alias("pathway_json"),
        F.concat_ws(",", F.collect_list("entry")).alias("entities_body"))
    # docs are DEFINED by their pathway row (the join path keeps all
    # pathways, drops orphan entity groups) — mirror that exactly
    return per_doc.filter(F.col("pathway_json").isNotNull()).select(
        "bucket", "__wsalt", *DOC_KEY, "pathway_id",
        _assemble(F.col("pathway_json"), F.col("entities_body"))
        .alias("jsonld"))
