"""SparkSession factory tuned for the KG-construction pipeline.

Local-mode defaults mirror what we would set cluster-side via
spark-submit: AQE on (skew-join splitting for hot domains / giant
pages), Arrow for every pandas UDF exchange, shuffle partitions sized
to the parallelism level rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "gpml2pvjson_js_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    # local[N] / local[*] / local-cluster[n,cores,mem]
    n = master.rstrip("]").rsplit("[", 1)[-1]
    if "," in n:  # local-cluster: n_workers * cores_per_worker
        try:
            workers, cores = n.split(",")[:2]
            parallelism = int(workers) * int(cores)
        except ValueError:
            parallelism = os.cpu_count()
    elif n in ("*", ""):
        parallelism = os.cpu_count()
    else:
        try:
            parallelism = int(n)
        except ValueError:
            parallelism = os.cpu_count()
    # ~8 tasks per core: small-enough shuffle partitions that a task's
    # working set fits its share of execution memory (measured: 64
    # partitions at 32 cores spilled and ran 2x slower than 256), with
    # AQE coalescing shrinking them back when data is small. The same
    # setting works across cluster sizes, which is what makes the
    # N -> 4N scaling comparison honest.
    shuffle_partitions = shuffle_partitions or max(8 * parallelism, 64)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Broadcasts are EXPLICIT-ONLY (F.broadcast hints on frames the
        # code asserts are dimension-scale); size-estimate-driven auto
        # broadcast is off at both decision points. In this pipeline
        # every non-hinted join side is corpus-scale, and the byte
        # heuristics both planners use (parquet bytes statically,
        # compressed shuffle bytes in AQE) under-estimate highly
        # compressible web-corpus frames by orders of magnitude:
        # measured at replicate 8192, AQE promoted a corpus-scale join
        # side whose compressed shuffle output looked broadcastable
        # into a 360 MB broadcast that deserialized into a >8 GB
        # UnsafeHashedRelation PER EXECUTOR — OOM-killing the fleet's
        # executors, and below the OOM threshold taxing every executor
        # with a redundant per-executor hash build that grows with
        # data (anti-scaling: N executors pay it once, 4N pay it 4x).
        # At 100 TB no corpus-derived frame is ever broadcastable, so
        # the honest policy is assert-don't-guess.
        .config("spark.sql.autoBroadcastJoinThreshold",
                os.environ.get("SPARK_GRAFT_AUTOBROADCAST", "-1"))
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold",
                os.environ.get("SPARK_GRAFT_AUTOBROADCAST", "-1"))
        # Production defaults match Spark's (128m / 4m): at 100 TB a
        # 16m packing size would mean ~6M scan partitions per table.
        # The REPLICATED bench corpora are the special case — they
        # compress ~1000x in parquet, so byte-based packing at 128 MB
        # collapses a 64-file stage into ONE map task (a single thread
        # decoding tens of millions of rows). The scaling bench
        # therefore sets SPARK_GRAFT_MAX_PARTITION_BYTES=16m in ITS
        # environment only (bench.py scaling path), keeping the
        # session factory honest for real data.
        .config("spark.sql.files.maxPartitionBytes",
                os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "128m"))
        .config("spark.sql.files.openCostInBytes",
                os.environ.get("SPARK_GRAFT_OPEN_COST_BYTES", "4m"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        # wide generated projections: keep plan stringification cheap
        # (plan-description generation of large CaseWhen trees otherwise
        # dominates driver time)
        .config("spark.sql.maxPlanStringLength", "65536")
        .config("spark.sql.debug.maxToStringFields", "10")
        .config("spark.driver.extraJavaOptions", "-Duser.timezone=UTC")
        .config("spark.executor.extraJavaOptions", "-Duser.timezone=UTC")
    )
    # Generic conf passthrough (semicolon-separated k=v pairs), the
    # local analog of spark-submit --conf: lets a deployment or a
    # bench experiment set e.g. spark.eventLog.* or spark.local.dir
    # without code changes. Explicit extra_conf wins over env.
    for item in filter(None,
                       os.environ.get("SPARK_GRAFT_CONF", "").split(";")):
        k, _, v = item.partition("=")
        builder = builder.config(k.strip(), v.strip())
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
