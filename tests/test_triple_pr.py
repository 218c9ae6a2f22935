"""North-rule gate: triple P/R >= 0.95 against ALL reference golden
fixtures (/root/reference/test/expected/*.json), not a hand-curated
subset. Every golden pvjson document is inverted back to GPML
(golden.gpml_from_golden), pushed through the production
parse -> document model -> triples path in ONE Spark job, and compared
against the flatten of the golden itself (golden.golden_triples).

A per-fixture report is written to BENCH/PR_REPORT.json so regressions
are attributable to a fixture and a triple."""

import json
import os

import pytest

from gpml2pvjson_js_spark.golden import pr_report

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def report(spark):
    rep = pr_report(spark)
    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    with open(f"{REPO}/BENCH/PR_REPORT.json", "w") as f:
        json.dump(rep, f, indent=1, sort_keys=True)
    return rep


def test_aggregate_precision(report):
    assert report["aggregate"]["precision"] >= 0.95, report["aggregate"]


def test_aggregate_recall(report):
    assert report["aggregate"]["recall"] >= 0.95, report["aggregate"]


def test_fixture_coverage(report):
    # every golden document must be exercised (91 fixtures incl. the
    # 13 real WikiPathways documents)
    assert report["aggregate"]["n_fixtures"] >= 85
    assert report["aggregate"]["n_gold"] > 5000
