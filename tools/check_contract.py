"""Local twin of the driver's correctness gate: run every __spark_entry__
query against its DuckDB oracle and compare row count + order-insensitive
values (columns sorted by name, rows sorted, cells normalized).

Usage: python tools/check_contract.py [--json OUT.json] [sf_dir] [query ...]

With --json, a driver-style artifact (rows_match / schema_match /
hash_match / spark_rows / oracle_rows / err per query) is written so
out-of-window queries still carry a committed correctness record
(e.g. CORRECTNESS_LOCAL_r03.json).
"""

from __future__ import annotations

import datetime as dt
import json
import math
import sys

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from data_pipeline_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return sorted(c for c in cols), out


def main():
    argv = sys.argv[1:]
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])
    report = {}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entrymod.queries()
    unknown = only - set(qs)
    if unknown:
        # A typo'd filter would otherwise report "0 failures" over zero queries.
        print(f"ERROR: unknown query filter(s): {sorted(unknown)}")
        sys.exit(2)
    spark = get_spark("contract-check")
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec = report[name] = {
            "rows_match": False, "schema_match": False, "hash_match": False,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            rec["err"] = f"spark error: {e}"
            print(f"FAIL {name}: spark error: {e}")
            continue
        rec["spark_rows"] = len(srows)
        if name not in oracles:
            rec["err"] = "rows-only (no oracle)"
            rec["rows_match"] = rec["schema_match"] = len(srows) >= 0
            print(f"ok?  {name}: rows-only ({len(srows)} rows, no oracle)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failures.append(name)
            rec["err"] = f"oracle error: {e}"
            print(f"FAIL {name}: oracle error: {e}")
            continue
        rec["oracle_rows"] = len(orows)
        sc, sr = canon(srows, scols)
        oc, orr = canon(orows, ocols)
        rec["schema_match"] = sc == oc
        rec["rows_match"] = len(sr) == len(orr)
        if sc != oc:
            failures.append(name)
            print(f"FAIL {name}: columns differ spark={sc} oracle={oc}")
            continue
        if len(sr) != len(orr):
            failures.append(name)
            print(f"FAIL {name}: row count spark={len(sr)} oracle={len(orr)}")
            continue
        bad = [(a, b) for a, b in zip(sr, orr) if a != b]
        if bad:
            failures.append(name)
            print(f"FAIL {name}: {len(bad)}/{len(sr)} rows differ; first:")
            print("  spark :", bad[0][0])
            print("  oracle:", bad[0][1])
            continue
        rec["hash_match"] = True
        print(f"PASS {name} ({len(sr)} rows)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {json_out} ({len(report)} queries)")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
