"""Deployment surface: the package ships as a --py-files zip and the
pipeline runs under spark-submit with ONLY that artifact on the
executors' path (north rule: 'run via spark-submit --py-files on a
multi-executor cluster')."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str | None:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    import pyspark
    cand = os.path.join(os.path.dirname(pyspark.__file__),
                        "bin", "spark-submit")
    return cand if os.path.exists(cand) else None


def test_spark_submit_pyfiles_roundtrip(tmp_path):
    exe = _spark_submit()
    assert exe, "spark-submit not found in pyspark installation"

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import make_pyfiles
    zip_path = make_pyfiles.build(str(tmp_path / "pkg.zip"), REPO)
    # the zip is self-contained package code
    import zipfile
    names = zipfile.ZipFile(zip_path).namelist()
    assert "gpml2pvjson_js_spark/plans/pipeline.py" in names
    assert not any("__pycache__" in n or "tests/" in n for n in names)

    out_dir = str(tmp_path / "kg_out")
    env = dict(os.environ)
    # strip the repo from PYTHONPATH: executors must import from the zip
    env["PYTHONPATH"] = ""
    env.setdefault("SPARK_GRAFT_CPUS", "4")
    proc = subprocess.run(
        [exe, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=16",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path,
         os.path.join(REPO, "tools", "submit_job.py"),
         "--sf-dir", "/root/testdata/sf0.001",
         "--output", out_dir],
        env=env, cwd=str(tmp_path), capture_output=True, text=True,
        timeout=900)
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = [l for l in proc.stdout.splitlines()
            if l.startswith("KG_SUBMIT_RESULT ")][-1]
    result = json.loads(line.split(" ", 1)[1])
    assert result["canonical_triples"] > 0
    assert "mentions" in result["stages"]
    # lineage manifests landed with the snapshots
    assert os.path.exists(os.path.join(
        out_dir, "canonical_triples", "manifest.json"))
