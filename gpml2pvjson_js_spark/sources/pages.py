"""Pages source: the north-rule input table
(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)
read from parquet or an Iceberg table, schema-validated at plan time.

The reference is a stdin->stdout stream converter (`/root/reference/
bin/gpml2pvjson`, src/toPvjson.ts); this is its distributed input
boundary. Validation fails fast on the driver — a missing or
mistyped column surfaces before any cluster work is scheduled — and
selecting exactly the five contract columns lets Catalyst prune any
extra columns at the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..corpus import PAGES_SCHEMA


class PagesSchemaError(ValueError):
    pass


def _validate(df: DataFrame, source: str) -> DataFrame:
    got = {f.name: f.dataType for f in df.schema.fields}
    problems = []
    for f in PAGES_SCHEMA.fields:
        if f.name not in got:
            problems.append(f"missing column {f.name}:{f.dataType.simpleString()}")
        elif got[f.name].simpleString() != f.dataType.simpleString():
            problems.append(
                f"column {f.name} is {got[f.name].simpleString()}, "
                f"expected {f.dataType.simpleString()}")
    if problems:
        raise PagesSchemaError(
            f"{source} does not match the pages contract "
            f"(url string, warc_ts timestamp, html binary, text string, "
            f"lang string): " + "; ".join(problems))
    # exactly the contract columns, in contract order -> column
    # pruning reaches the scan even if the table carries extras
    return df.select(*[f.name for f in PAGES_SCHEMA.fields])


def read_pages(spark: SparkSession, path: str,
               fmt: str = "parquet",
               langs: list[str] | None = None) -> DataFrame:
    """Read the pages input table.

    fmt="parquet": path is a parquet directory.
    fmt="iceberg": path is a catalog table name (spark.read.table);
    requires an Iceberg catalog configured on the session — the
    snapshot/commit semantics the pipeline's SnapshotStore emulates on
    plain parquet come for free there.

    langs: optional language filter, pushed down to the scan.
    """
    if fmt == "parquet":
        df = spark.read.parquet(path)
    elif fmt == "iceberg":
        df = spark.read.table(path)
    else:
        raise ValueError(f"unsupported pages format: {fmt!r}")
    df = _validate(df, f"{fmt}:{path}")
    if langs:
        df = df.filter(F.col("lang").isin(langs))
    return df
