import json
import shutil

import pytest
from pyspark.storagelevel import StorageLevel

from gpml2pvjson_js_spark.corpus import pages_df
from gpml2pvjson_js_spark.operators.assemble import build_document_model
from gpml2pvjson_js_spark.operators.interactions import classify_interactions
from gpml2pvjson_js_spark.operators.triples import build_triples
from gpml2pvjson_js_spark.session import get_spark

N_PAGES = 15  # one page per fixture class (PAGE_MIX), no giants


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[8]")
    yield s


@pytest.fixture(scope="session")
def pages(spark):
    return pages_df(spark, N_PAGES, giant_every=0).cache()


@pytest.fixture(scope="session")
def model(spark, pages):
    return build_document_model(spark, pages)


@pytest.fixture(scope="session")
def interactions(spark, model):
    return classify_interactions(model["edges"], model["nodes"]) \
        .localCheckpoint(eager=False, storageLevel=StorageLevel.MEMORY_AND_DISK)


@pytest.fixture(scope="session")
def triples(model, interactions):
    return build_triples(model, interactions).localCheckpoint(eager=False, storageLevel=StorageLevel.MEMORY_AND_DISK)


@pytest.fixture(scope="session")
def golden():
    """Reference golden outputs (read-only oracle)."""
    def load(name):
        with open(f"/root/reference/test/expected/{name}.json") as f:
            return json.load(f)
    return load


def rows_by_id(df, url_part):
    from pyspark.sql import functions as F
    out = {}
    for r in df.filter(F.col("url").contains(url_part)).collect():
        d = {k: v for k, v in r.asDict().items() if v is not None}
        out[d["id"]] = d
    return out
