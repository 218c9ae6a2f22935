"""Structured Streaming smoke (SURVEY.md §2.9): pages dropped as
parquet files are ingested by stream_pages, each micro-batch runs the
snapshot pipeline, and the streaming checkpoint gives exactly-once
(a restart with no new files processes nothing new)."""

import glob
import os

from pyspark.sql import functions as F

from gpml2pvjson_js_spark.corpus import pages_df
from gpml2pvjson_js_spark.streaming.stream import stream_pages


def _run(q):
    sq = q.start()
    sq.awaitTermination(300)
    sq.stop()


def test_stream_ingest_and_resume(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("pages_src"))
    out = str(tmp_path_factory.mktemp("stream_out"))
    ckpt = str(tmp_path_factory.mktemp("ckpt"))

    pages_df(spark, 3, giant_every=0).write.mode("overwrite").parquet(src)
    _run(stream_pages(spark, src, out, ckpt))

    batch_roots = sorted(glob.glob(f"{out}/batch=*"))
    assert batch_roots, "no micro-batch output"
    manifest = os.path.join(batch_roots[0], "triples", "manifest.json")
    assert os.path.exists(manifest)
    triples = spark.read.parquet(
        os.path.join(batch_roots[0], "triples", "data"))
    assert triples.count() > 0
    n_batches_first = len(batch_roots)

    # restart with NO new files: checkpoint must prevent reprocessing
    _run(stream_pages(spark, src, out, ckpt))
    assert len(glob.glob(f"{out}/batch=*")) == n_batches_first

    # drop one more file: exactly the new rows flow through
    pages_df(spark, 2, giant_every=0).withColumn(
        "url", F.concat(F.col("url"), F.lit("?v=2"))
    ).write.mode("append").parquet(src)
    _run(stream_pages(spark, src, out, ckpt))
    batch_roots2 = sorted(glob.glob(f"{out}/batch=*"))
    assert len(batch_roots2) > n_batches_first
