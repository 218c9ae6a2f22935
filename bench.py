#!/usr/bin/env python3
"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "triples_per_sec", "value": N, "unit": "sec",
   "queries": {...per-query seconds...}, "sf": ...}

The headline metric is end-to-end KG-construction throughput
(pages -> parse -> document model -> classification -> triples ->
linking -> canonicalization), reported as triples/sec.

`python3 bench.py --scaling` additionally runs the same job at two
parallelism levels (local[8] vs local[32]) in subprocesses and writes
BENCH/BASELINE.md with the scaling efficiency (the sandbox substitute
for N -> 4N executors, BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _sf_from_dir(sf_dir: str) -> float:
    tail = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        return float(tail)
    except ValueError:
        return -1.0


def run_kg_pipeline(spark, sf_dir: str) -> tuple[int, float]:
    """Full KG pipeline over pages synthesized from the documents
    table; returns (n_triples, seconds). Wall time excludes the
    one-time plan construction (measured separately as plan_build)."""
    from gpml2pvjson_js_spark.corpus import pages_from_documents
    from gpml2pvjson_js_spark.operators.assemble import build_document_model
    from gpml2pvjson_js_spark.operators.canonicalize import (
        canonical_map, rewrite_triples)
    from gpml2pvjson_js_spark.operators.interactions import (
        classify_interactions)
    from gpml2pvjson_js_spark.operators.linking import (
        link_entities, same_as_edges, xref_dictionary)
    from gpml2pvjson_js_spark.operators.triples import build_triples

    pages = pages_from_documents(spark, sf_dir)
    model = build_document_model(spark, pages)
    inter = classify_interactions(model["edges"], model["nodes"])
    triples = build_triples(model, inter)
    xd = xref_dictionary(spark)
    linked = link_entities(model["nodes"], xd)
    canon = rewrite_triples(
        triples, canonical_map(linked, same_as_edges(linked, xd)))
    t0 = time.time()
    n = canon.count()
    return n, time.time() - t0


def _kg_lazy(spark, sf_dir: str, replicate: int = 1):
    """Build the full pipeline DAG with NO driver-side actions
    (fixed CC rounds), so one count() captures all execution."""
    from gpml2pvjson_js_spark.corpus import pages_from_documents
    from gpml2pvjson_js_spark.operators.assemble import build_document_model
    from gpml2pvjson_js_spark.operators.canonicalize import (
        canonical_map, rewrite_triples)
    from gpml2pvjson_js_spark.operators.interactions import (
        classify_interactions)
    from gpml2pvjson_js_spark.operators.linking import (
        link_entities, same_as_edges, xref_dictionary)
    from gpml2pvjson_js_spark.operators.triples import build_triples

    pages = pages_from_documents(spark, sf_dir)
    if replicate > 1:
        from gpml2pvjson_js_spark.corpus import replicate_pages
        pages = replicate_pages(pages, replicate)
    model = build_document_model(spark, pages)
    inter = classify_interactions(model["edges"], model["nodes"])
    triples = build_triples(model, inter)
    xd = xref_dictionary(spark)
    linked = link_entities(model["nodes"], xd)
    return rewrite_triples(
        triples,
        canonical_map(linked, same_as_edges(linked, xd),
                      check_convergence=False))


def run_pipeline_measured(spark, sf_dir: str, out_root: str,
                          replicate: int = 1) -> tuple[int, float, dict]:
    """Snapshot pipeline (the production path) over the derived
    corpus; returns (n_triples, wall_sec, per_stage_ms)."""
    import shutil
    from gpml2pvjson_js_spark.corpus import (
        pages_from_documents, replicate_pages)
    from gpml2pvjson_js_spark.plans.pipeline import Pipeline

    shutil.rmtree(out_root, ignore_errors=True)
    pages = replicate_pages(
        pages_from_documents(spark, sf_dir), replicate)
    pipe = Pipeline(spark, pages, out_root, n_buckets=64)
    t0 = time.time()
    pipe.run(resume=False)
    wall = time.time() - t0
    n = pipe.store.manifest("canonical_triples")["rows"]
    stages = {s: m["wall_ms"] for s, m in pipe.metrics().items()}
    return n, wall, stages


def _lazy_probe(spark, sf_dir: str, replicate: int) -> tuple[int, float]:
    """One lazy DAG, one count — pure compute window."""
    from gpml2pvjson_js_spark.corpus import (
        pages_from_documents, replicate_pages)
    import gpml2pvjson_js_spark.operators.assemble as A
    from gpml2pvjson_js_spark.operators.triples import build_triples
    from gpml2pvjson_js_spark.operators.interactions import (
        classify_interactions)
    lazy_pages = replicate_pages(
        pages_from_documents(spark, sf_dir), replicate)
    model = A.build_document_model(spark, lazy_pages)
    lazy_triples = build_triples(
        model, classify_interactions(model["edges"], model["nodes"]))
    t0 = time.time()
    n_lazy = lazy_triples.count()
    return n_lazy, time.time() - t0


def main() -> dict:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import tempfile
    from gpml2pvjson_js_spark.session import get_spark
    import __spark_entry__ as entrymod

    # ONE job config at every parallelism level (exactly what ships to
    # a cluster): shuffle partitions sized for the LARGEST level
    # (8 tasks/core at 32 cores = 256) with AQE coalescing shrinking
    # them at runtime when data is small. Measured: 64 partitions at
    # 32 cores overflowed per-task execution memory and anti-scaled.
    scaling_only = os.environ.get("SPARK_GRAFT_SCALING_ONLY") == "1"
    replicate = int(os.environ.get("SPARK_GRAFT_REPLICATE", "1"))

    spark = get_spark(
        app_name="bench", master=f"local[{CPUS}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE",
                                              "256")))
    queries: dict[str, float] = {}
    tmp = tempfile.mkdtemp(prefix="kgbench_")

    if scaling_only:
        # Protocol (root-cause history in BENCH/PLANS.md): the scaling
        # pair runs the PRODUCTION path — the snapshot pipeline, the
        # same job `tools/submit_job.py` ships via spark-submit — at a
        # replication factor high enough that per-stage compute
        # saturates the smaller level (measured: repl 32 leaves 8
        # cores idle-equal with 32; repl 512 pins all cores). AQE
        # stays ON here (per-stage plans are small, so its replanning
        # is cheap and its skew splitting is wanted); a warmup pass at
        # sf0.001 pays codegen + python-worker spinup first.
        run_pipeline_measured(spark, "/root/testdata/sf0.001",
                              f"{tmp}/warmup")
        n_snap, snap_sec, _ = run_pipeline_measured(
            spark, SF_DIR, f"{tmp}/scale", replicate)
        queries["kg_pipeline_exec"] = round(snap_sec, 3)
        queries["kg_pipeline_triples_per_sec"] = (
            round(n_snap / snap_sec, 2) if snap_sec else 0.0)
        return {"metric": "triples_per_sec",
                "value": queries["kg_pipeline_triples_per_sec"],
                "unit": "sec", "queries": queries,
                "sf": _sf_from_dir(SF_DIR), "n_triples": n_snap,
                "cpus": CPUS}

    # warmup: small corpus through the same plans — compiles codegen,
    # spins up python workers, JITs the hot paths
    t0 = time.time()
    run_pipeline_measured(spark, "/root/testdata/sf0.001",
                          f"{tmp}/warmup")
    queries["kg_warmup"] = round(time.time() - t0, 3)

    # measured run (cold data, warm JVM) — the reported number
    n_triples, kg_sec, stages = run_pipeline_measured(
        spark, SF_DIR, f"{tmp}/measured", replicate)
    queries["kg_pipeline_exec"] = round(kg_sec, 3)
    for s, ms in stages.items():
        queries[f"kg_stage_{s}"] = round(ms / 1000.0, 3)

    n_lazy, lazy_sec = _lazy_probe(spark, SF_DIR, replicate)
    queries["kg_lazy_exec"] = round(lazy_sec, 3)
    queries["kg_lazy_triples_per_sec"] = round(n_lazy / lazy_sec, 2) \
        if lazy_sec else 0.0

    headline = [
        "agg_pricing_summary", "two_hop_join", "window_ordinal",
        "bbox_agg", "dedup_exact", "minhash_lsh_pairs", "lang_id",
        "quality_score", "ann_bruteforce", "ann_lsh",
    ]
    qmap = entrymod.queries()
    for name in headline:
        t0 = time.time()
        qmap[name](spark, SF_DIR).write.format("noop").mode("overwrite") \
            .save()
        queries[name] = round(time.time() - t0, 3)

    value = round(n_triples / kg_sec, 2) if kg_sec > 0 else 0.0
    result = {
        "metric": "triples_per_sec",
        "value": value,
        "unit": "sec",
        "queries": queries,
        "sf": _sf_from_dir(SF_DIR),
        "n_triples": n_triples,
        "cpus": CPUS,
    }
    return result


def scaling_report() -> None:
    """Run the KG pipeline at local[8] and local[32] in fresh
    subprocesses; write BENCH/BASELINE.md with scaling efficiency."""
    results = {}
    replicate = os.environ.get("SPARK_GRAFT_REPLICATE", "512")
    for cpus in (8, 32):
        # IDENTICAL job + config at both levels (only threads vary):
        # warmed snapshot-pipeline protocol, see main()'s
        # scaling_only branch
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
                   SPARK_GRAFT_SF_DIR=SF_DIR,
                   SPARK_GRAFT_REPLICATE=replicate,
                   SPARK_GRAFT_SCALING_ONLY="1")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=5400)
        line = [l for l in out.stdout.splitlines()
                if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
    r8, r32 = results[8], results[32]
    l8 = r8["queries"].get("kg_pipeline_triples_per_sec", 0.0)
    l32 = r32["queries"].get("kg_pipeline_triples_per_sec", 0.0)
    eff = (l32 / l8) / 4 if l8 else 0.0
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(f"""# BENCH baseline (measured)

End-to-end KG pipeline — the PRODUCTION snapshot path that
`tools/submit_job.py` ships via spark-submit (pages -> parse ->
document model -> classification -> triples -> linking ->
canonicalization, per-stage parquet snapshots + lineage manifests) —
on the deterministic corpus derived from `{SF_DIR}` documents,
replicate factor {replicate}. Both levels run the IDENTICAL job and
config (shuffle_partitions=256, AQE + skew-join splitting on) after
an sf0.001 warmup pass, so only compute threads vary. Replication is
sized so per-stage compute saturates the smaller level (measured:
replicate 32 left local[8] and local[32] wall-equal at ~121 s — the
job was orchestration-bound, not CPU-bound — so a scaling ratio there
would be meaningless).

| parallelism | triples | wall sec | triples/sec |
|---|---|---|---|
| local[8]  (N)  | {r8["n_triples"]} | {r8["queries"]["kg_pipeline_exec"]} | {l8} |
| local[32] (4N) | {r32["n_triples"]} | {r32["queries"]["kg_pipeline_exec"]} | {l32} |

**Scaling efficiency (N -> 4N): {eff:.3f}**
(target >= 0.8 per BASELINE.md; sandbox substitute for N vs 4N
executors — same input, 8 vs 32 compute threads.)

Why earlier rounds were flat (full history in BENCH/PLANS.md):
1. null-keyed left joins funneled every unattached point/ref into one
   reducer (a single task ran minutes while 31 cores idled) — fixed
   structurally: null-key rows bypass the shuffle
   (`functions/skew.py:left_join_skipping_null_keys`);
2. the un-staged megaplan paid AQE re-optimization at every
   query-stage boundary (measured: one Catalyst transform thread
   burning 440+ s) and ~0.5 s/task closure deserialization — the
   staged pipeline's small per-stage plans avoid both;
3. the waypoint loop re-staged the full edge corpus every round —
   now only the per-round delta is staged;
4. the benchmark corpus was too small: below ~100x replication the
   pipeline is orchestration-bound and extra cores are invisible.

Per-query seconds at local[32]:

```json
{json.dumps(r32["queries"], indent=1)}
```
""")
    print(json.dumps({"scaling_efficiency": round(eff, 3),
                      "local8_triples_per_sec": l8,
                      "local32_triples_per_sec": l32}))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling_report()
    else:
        print(json.dumps(main()))
