"""Self-serve mirror of the driver's correctness gate: run every
`__spark_entry__.queries()` entry on Spark AND (where an
`oracle_sql()` entry exists) the equivalent SQL on DuckDB over the
same parquet tables, and compare row count, column names, and a
canonicalized value hash.

    python tools/correctness_sweep.py [--sf-dir /root/testdata/sf0.01] \
        [--only q1,q2] [--out /tmp/sweep.json]

Exit 0 iff every query passes (oracle queries: rows+schema+hash all
match; no-oracle queries: the Spark side runs and returns a stable
schema). The driver's own comparison sorts columns by name before
hashing values — this tool does the same, so a green sweep here
predicts a green CORRECTNESS_r{N}.json row for the oracle-eligible
set. Floats are canonicalized to 9 significant digits on BOTH sides
(Spark doubles and DuckDB doubles agree to well beyond that on these
queries; the driver hashes raw values, so this tool is slightly more
permissive — a hash mismatch here is always a real failure).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import math
import sys
import time

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _canon(v):
    """Canonicalize one cell so Spark- and DuckDB-collected values of
    the same logical value compare equal (floats -> 9 sig digits,
    array/map/struct -> tuples, NaN/None unified)."""
    import datetime
    import decimal

    import numpy as np

    if v is None:
        return "\x00null"
    if isinstance(v, float):
        if math.isnan(v):
            return "\x00nan"
        return f"{v:.9g}"
    if isinstance(v, (np.floating,)):
        return _canon(float(v))
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, decimal.Decimal):
        return f"{float(v):.9g}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    if isinstance(v, bytes):
        return v.hex()
    return v


def _hash_frame(cols: list[str], rows: list[tuple]) -> str:
    """Order-insensitive value hash over rows with columns sorted by
    name (the driver's compare does the same column sort)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon_rows = sorted(
        repr(tuple(_canon(r[i]) for i in order)) for r in rows
    )
    h = hashlib.sha256()
    for r in canon_rows:
        h.update(r.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()


def _spark_result(df):
    cols = [c.lower() for c in df.columns]
    rows = [tuple(r) for r in df.collect()]
    return cols, rows


def _duck_result(con, sql):
    cur = con.execute(sql)
    cols = [d[0].lower() for d in cur.description]
    rows = cur.fetchall()
    return cols, rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None,
                    help="comma-separated query names to run")
    ap.add_argument("--out", default=None, help="write JSON here too")
    args = ap.parse_args()

    import duckdb

    sys.path.insert(0, ".")
    import __spark_entry__ as entry
    from gpml2pvjson_js_spark.session import get_spark

    spark = get_spark(app_name="correctness-sweep", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')")

    qs = entry.queries()
    osql = entry.oracle_sql()
    only = set(args.only.split(",")) if args.only else None

    results: dict[str, dict] = {}
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec: dict = {}
        t0 = time.monotonic()
        try:
            cols, rows = _spark_result(fn(spark, args.sf_dir))
            rec["spark_rows"] = len(rows)
            if name in osql:
                ocols, orows = _duck_result(con, osql[name])
                rec["oracle_rows"] = len(orows)
                rec["rows_match"] = len(rows) == len(orows)
                rec["schema_match"] = sorted(cols) == sorted(ocols)
                rec["hash_match"] = (
                    rec["rows_match"] and rec["schema_match"]
                    and _hash_frame(cols, rows) == _hash_frame(ocols, orows)
                )
                ok = rec["hash_match"]
                if not rec["schema_match"]:
                    rec["spark_cols"] = sorted(cols)
                    rec["oracle_cols"] = sorted(ocols)
            else:
                rec["oracle"] = "none (rows-only)"
                ok = True
        except Exception as exc:  # a query that throws is a failure
            rec["err"] = f"{type(exc).__name__}: {exc}"
            ok = False
        rec["secs"] = round(time.monotonic() - t0, 2)
        rec["pass"] = ok
        n_pass += ok
        n_fail += not ok
        results[name] = rec
        print(f"{'PASS' if ok else 'FAIL'} {name} "
              f"({rec['secs']}s, {rec.get('spark_rows', '-')} rows)",
              flush=True)

    summary = {"pass": n_pass, "fail": n_fail, "sf_dir": args.sf_dir}
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"summary": summary, "queries": results}, f,
                      indent=1)
    spark.stop()
    return 0 if n_fail == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
