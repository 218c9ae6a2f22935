"""Resumable snapshot pipeline: manifests, commit markers, resume."""

import json
import os
import shutil

from pyspark.sql import functions as F

from gpml2pvjson_js_spark.corpus import pages_df
from gpml2pvjson_js_spark.plans.pipeline import Pipeline


def test_pipeline_run_resume_manifests(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kgout"))
    pages = pages_df(spark, 7, giant_every=0)
    p = Pipeline(spark, pages, root, n_buckets=4)
    out = p.run(resume=False)
    metrics = p.metrics()
    assert set(metrics) >= {"mentions", "nodes", "edges", "triples",
                            "canonical_triples", "text"}
    m = metrics["triples"]
    assert m["rows"] > 0 and m["wall_ms"] > 0
    assert sum(x["rows"] for x in m["partitions"]) == m["rows"]

    # simulate crash after `nodes`: delete later manifests, resume
    for stage in ["edges", "triples", "canonical_triples"]:
        os.remove(os.path.join(root, stage, "manifest.json"))
    p2 = Pipeline(spark, pages, root, n_buckets=4)
    out2 = p2.run(resume=True)
    assert out2["triples"].count() == m["rows"]
    # untouched stages were NOT recomputed: manifest timestamps equal
    assert (p2.metrics()["nodes"]["committed_at_unix_ms"]
            == metrics["nodes"]["committed_at_unix_ms"])

    # text invariant through the pipeline surface
    t = out2["text"].join(pages.select("url", "text"), "url")
    assert t.filter(F.col("extracted_text") != F.col("text")).count() == 0


def test_empty_stage_round_trip(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kgout_empty"))
    pages = pages_df(spark, 7, giant_every=0)
    p = Pipeline(spark, pages, root, n_buckets=4)
    p.run(resume=False)
    q = p.store.read(spark, "quarantine")
    assert q.count() == 0
    assert "error" in q.columns  # schema preserved for empty snapshot
