"""JSON-LD document export (JS1/JS2): byte-level parity with the
reference golden document for the exactly-reconstructed `one-node`
fixture (the only difference allowed is the content-hash id, which is
a function of the raw input bytes)."""

import json

from pyspark.sql import functions as F

from gpml2pvjson_js_spark.operators.export import jsonld_documents


def test_one_node_document_matches_golden_exactly(model, golden):
    docs = jsonld_documents(model)
    row = docs.filter(F.col("url").contains("/one-node/")).collect()[0]
    ours = json.loads(row["jsonld"])
    g = golden("one-node")
    ours["pathway"]["id"] = g["pathway"]["id"] = "X"
    assert ours["pathway"] == g["pathway"]
    assert ours["entitiesById"] == g["entitiesById"]


def test_documents_are_valid_json_per_page(model):
    docs = jsonld_documents(model).collect()
    assert len(docs) == 15  # one per fragment incl. empty + multi
    for r in docs:
        d = json.loads(r["jsonld"])
        assert "pathway" in d and "entitiesById" in d
        assert d["pathway"]["type"][0] == "Pathway"
