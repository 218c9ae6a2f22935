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


def test_cli_convert_bytes_multidoc(spark):
    """The reference's stdin->stdout CLI surface: concatenated GPML
    docs on one stream come back as one JSON-LD document per pathway,
    in input order, byte-deterministic across runs
    (ref: bin/gpml2pvjson:61-96)."""
    import json

    from gpml2pvjson_js_spark.__main__ import convert_bytes
    from gpml2pvjson_js_spark.corpus import gpml_data_nodes, gpml_groups

    stream = (gpml_data_nodes() + "\n" + gpml_groups()).encode()
    docs = convert_bytes(spark, stream, "file://stdin")
    assert len(docs) == 2
    parsed = [json.loads(d) for d in docs]
    assert all(set(p) == {"pathway", "entitiesById"} for p in parsed)
    # doc 0 is the data-node fixture, doc 1 the groups fixture
    assert any(v.get("gpmlElementName") == "Group"
               for v in parsed[1]["entitiesById"].values())
    assert docs == convert_bytes(spark, stream, "file://stdin")


def test_cli_id_and_pathway_version_flags(spark):
    """Reference CLI options: `--id` overrides pathway.id on every
    document of the stream (ref: src/2013a/toPvjson.ts:219-230 via
    bin/gpml2pvjson:52), `--pathway-version` is a CLI-side post-set
    appended to the pathway object (ref: bin/gpml2pvjson:112-114),
    and with neither flag the pipeline bytes pass through untouched
    (content-hash fallback, ref: bin/gpml2pvjson:57-59,108-111)."""
    import json

    from gpml2pvjson_js_spark.__main__ import convert_bytes
    from gpml2pvjson_js_spark.corpus import gpml_data_nodes, gpml_groups

    stream = (gpml_data_nodes() + "\n" + gpml_groups()).encode()
    iri = "http://identifiers.org/wikipathways/WP4"

    plain = convert_bytes(spark, stream, "file://stdin")
    assert all(json.loads(d)["pathway"]["id"].startswith("hash://sha256/")
               for d in plain)

    flagged = convert_bytes(spark, stream, "file://stdin",
                            pathway_id=iri, pathway_version="90358")
    assert len(flagged) == len(plain)
    for doc in flagged:
        p = json.loads(doc)["pathway"]
        assert p["id"] == iri  # one id for every doc, like the ref CLI
        assert p["pathwayVersion"] == "90358"
        # JS property-insertion order: appended at the end
        assert list(p)[-1] == "pathwayVersion"
    # everything except id/pathwayVersion is unchanged
    for a, b in zip(plain, flagged):
        da, db = json.loads(a), json.loads(b)
        db["pathway"].pop("pathwayVersion")
        db["pathway"]["id"] = da["pathway"]["id"]
        assert da == db

    # version-only: id keeps its content-hash fallback
    ver_only = convert_bytes(spark, stream, "file://stdin",
                             pathway_version="7")
    for doc in ver_only:
        p = json.loads(doc)["pathway"]
        assert p["id"].startswith("hash://sha256/")
        assert p["pathwayVersion"] == "7"
