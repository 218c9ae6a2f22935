"""Canonicalization: connected components over sameAs edges via
iterative DataFrame joins, then triple subj/obj rewrite to canonical
ids.

The reference has no distributed analog — its nearest mechanism is the
promise-cache forward-reference resolution (src/Processor.ts:278-318);
this stage is mandated by the north rule.

Algorithm: min-label propagation with POINTER DOUBLING. Each round
does (a) a neighbor-min hop and (b) a label-of-label shortcut, so the
label frontier at round k covers component diameter ~2^k, not k.
Labels are rank-prefixed ("0" + id for IRIs, "1" + id for
url#frag#id mention keys) so the elected representative is always the
lexicographically-smallest IRI when the component contains one —
a component of mentions linked to http://identifiers.org/... always
canonicalizes to the identifiers.org IRI, never to a page-dependent
mention key.

Production default is check_convergence=False: exactly max_rounds
lazy rounds, NO driver-side actions, so the whole pipeline stays one
deferred DAG (a blocking per-round count() was measured to serialize
the pipeline at high parallelism). Each round localCheckpoints with
SERIALIZED storage to cut the iterative lineage without the
deserialized-row GC thrash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

# pointer doubling: 6 rounds cover component diameters beyond 2^6,
# far past any sameAs chain the linker emits (mention-IRI stars have
# diameter <= 4)
MAX_ROUNDS = 6

_SER = StorageLevel.MEMORY_AND_DISK


def _ranked(col: Column) -> Column:
    """Rank-prefix an id so canonical IRIs sort before mention keys.

    A scheme prefix alone does NOT discriminate: mention keys are
    concat_ws('#', url, frag, id) and so start with http(s) too, and
    on a low-sorting page domain a bare lexicographic min would make
    the mention key the component representative. Mention keys always
    contain '#'; BridgeDb-style canonical xref IRIs (identifiers.org)
    never carry a fragment."""
    is_iri = (col.startswith("http://") | col.startswith("https://")) \
        & ~col.contains("#")
    return F.concat(F.when(is_iri, F.lit("0")).otherwise(F.lit("1")), col)


def _unranked(col: Column) -> Column:
    return F.substring(col, 2, 2147483647)


def connected_components(edges: DataFrame, max_rounds: int = MAX_ROUNDS,
                         check_convergence: bool = False) -> DataFrame:
    """edges(src, dst) undirected -> (id, component); component is the
    min-ranked member (IRIs preferred over mention keys).

    check_convergence=True adds a driver-side changed-row count per
    round (early exit) — useful in tests, NOT in the production DAG.
    """
    sym = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint(eager=False, storageLevel=_SER)

    labels = sym.select(F.col("src").alias("id")).distinct() \
        .withColumn("lbl", _ranked(F.col("id")))

    for _ in range(max_rounds):
        # (a) hop: min label among neighbors
        nbr = sym.join(labels.select(F.col("id").alias("dst2"),
                                     F.col("lbl").alias("nbr_lbl")),
                       sym.dst == F.col("dst2")) \
            .groupBy("src").agg(F.min("nbr_lbl").alias("nbr_min"))
        hopped = labels.join(
            nbr.withColumnRenamed("src", "id2"),
            labels.id == F.col("id2"), "left",
        ).select(
            "id",
            F.least(F.col("lbl"),
                    F.coalesce(F.col("nbr_min"), F.col("lbl"))).alias("lbl"),
        )
        # (b) double: label of my label's node (path shortcut).
        # The lookup MUST be keyed by node id (id -> lbl is unique, no
        # groupBy needed): joining unranked(lbl) == id returns
        # lbl[lbl[i]] — true pointer doubling. Keying by unranked(lbl)
        # instead would return the row's own label (a no-op shortcut).
        parent = hopped.select(F.col("id").alias("p_id"),
                               F.col("lbl").alias("p_min"))
        new_labels = hopped.join(
            parent, _unranked(hopped.lbl) == parent.p_id, "left",
        ).select(
            "id",
            F.least(F.col("lbl"),
                    F.coalesce(F.col("p_min"), F.col("lbl"))).alias("lbl"),
        ).localCheckpoint(eager=False, storageLevel=_SER)

        if check_convergence:
            changed = labels.withColumnRenamed("lbl", "old").join(
                new_labels.withColumnRenamed("id", "id3"),
                F.col("id") == F.col("id3"),
            ).filter(F.col("old") != F.col("lbl")).count()
            labels = new_labels
            if changed == 0:
                break
        else:
            labels = new_labels
    return labels.select("id", _unranked(F.col("lbl")).alias("component"))


def canonical_map(linked: DataFrame, same_as: DataFrame,
                  check_convergence: bool = False) -> DataFrame:
    """(url, frag, id, canonical): every linked mention mapped to the
    component representative (min IRI) of its sameAs component."""
    comp = connected_components(same_as,
                                check_convergence=check_convergence)
    mention_key = F.concat_ws("#", "url", F.col("frag").cast("string"), "id")
    m = linked.filter(F.col("canonical_iri").isNotNull()) \
        .withColumn("mkey", mention_key)
    return m.join(comp.withColumnRenamed("id", "mkey2"),
                  m.mkey == F.col("mkey2"), "left") \
        .select("url", "frag", "id",
                F.coalesce("component", "canonical_iri").alias("canonical")) \
        .dropDuplicates(["url", "frag", "id"])


def rewrite_triples(triples: DataFrame, cmap: DataFrame) -> DataFrame:
    """Rewrite subj/obj to canonical ids where a mapping exists (two
    equi joins on (url, frag, local id))."""
    s = cmap.select(F.col("url").alias("s_url"), F.col("frag").alias("s_frag"),
                    F.col("id").alias("s_id"),
                    F.col("canonical").alias("s_canon"))
    o = cmap.select(F.col("url").alias("o_url"), F.col("frag").alias("o_frag"),
                    F.col("id").alias("o_id"),
                    F.col("canonical").alias("o_canon"))
    t = triples.join(
        s, (triples.url == s.s_url) & (triples.frag == s.s_frag)
        & (triples.subj == s.s_id), "left",
    ).join(
        o, (triples.url == o.o_url) & (triples.frag == o.o_frag)
        & (triples.obj == o.o_id), "left",
    )
    return t.select(
        "url", "frag", "pathway_id",
        F.coalesce("s_canon", "subj").alias("subj"),
        "pred",
        F.coalesce("o_canon", "obj").alias("obj"),
    )
