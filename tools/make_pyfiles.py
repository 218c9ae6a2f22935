"""Build the --py-files artifact for cluster submission.

`python3 tools/make_pyfiles.py /tmp/gpml2pvjson_js_spark.zip` produces
a zip of the package suitable for

    spark-submit --master <cluster> \
        --py-files /tmp/gpml2pvjson_js_spark.zip \
        tools/submit_job.py --pages <parquet> --output <dir>

The zip contains only the package sources (no tests, no __pycache__),
so executors import the exact code the driver shipped.
"""

from __future__ import annotations

import os
import sys
import zipfile

PKG = "gpml2pvjson_js_spark"


def build(dest: str, repo_root: str | None = None) -> str:
    root = repo_root or os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(
                os.path.join(root, PKG)):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                zf.write(full, os.path.relpath(full, root))
    return dest


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 \
        else "/tmp/gpml2pvjson_js_spark.zip"
    print(build(out))
