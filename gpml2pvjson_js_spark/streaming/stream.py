"""Structured Streaming ingest wrapper.

The reference is a bounded-stream batch program (SURVEY.md §2.9): its
streaming machinery exists for memory bounding and forward-reference
resolution, both subsumed by batch DataFrame semantics. The unit of
work is one self-contained page row, so continuous ingest is
`readStream -> foreachBatch(batch pipeline)` — no stateful streaming
operators are required to match reference semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..plans.pipeline import Pipeline


def stream_pages(spark: SparkSession, source_dir: str, out_root: str,
                 checkpoint_dir: str, pages_schema=None):
    """Continuously ingest page parquet files dropped into source_dir;
    each micro-batch runs the batch pipeline against its own snapshot
    root (append-style commit), with exactly-once bookkeeping from the
    streaming checkpoint."""
    from ..corpus import PAGES_SCHEMA

    stream = (
        spark.readStream.schema(pages_schema or PAGES_SCHEMA)
        .parquet(source_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        Pipeline(spark, batch_df,
                 f"{out_root}/batch={batch_id}").run(resume=False)

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
