"""Local twin of the driver's correctness gate: run every __spark_entry__
query against its DuckDB oracle and compare row count + order-insensitive
values (columns sorted by name, rows sorted, cells normalized) AND result
TYPES (round-4 tightening).

Round 3 post-mortem: the driver hashes typed values, so a DuckDB oracle
column whose type drifts from the Spark schema (sum(BIGINT)->HUGEINT,
to_timestamp()->TIMESTAMP WITH TIME ZONE) fails the driver even when every
cell value matches. The old checker normalized exactly that away (tz strip,
str() cells, name-only schema compare) and reported 129/129 green while the
driver said 47/50. This version (a) never strips tzinfo — a tz-aware oracle
timestamp vs a naive Spark timestamp is a visible diff — and (b) maps each
DuckDB result-column type against the Spark schema, hard-failing on the
driver-divergent families (HUGEINT, TIMESTAMP WITH TIME ZONE, DECIMAL) and
on any known-map mismatch. Verified to reproduce the driver's three round-3
failures when run against the pre-fix tree (see tests/test_oracle_types.py).

Usage: python tools/check_contract.py [--json OUT.json] [sf_dir] [query ...]

With --json, a driver-style artifact (rows_match / schema_match /
hash_match / spark_rows / oracle_rows / err per query) is written so
out-of-window queries still carry a committed correctness record
(e.g. CORRECTNESS_LOCAL_r04.json).
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
        # Deliberately keep tzinfo: a TIMESTAMPTZ oracle cell must NOT
        # compare equal to a naive Spark timestamp (driver parity).
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return sorted(c for c in cols), out


# DuckDB result-type id -> Spark simpleString type(s) the driver's typed
# hash would accept. Anything mapping to None is "unknown — warn only";
# FORBIDDEN types fail outright regardless of the Spark side, because the
# driver's value hash diverges on them even when cell values match.
FORBIDDEN_DUCK_TYPES = ("HUGEINT", "UHUGEINT", "TIMESTAMP WITH TIME ZONE")
DUCK_TO_SPARK = {
    "BOOLEAN": {"boolean"},
    "TINYINT": {"tinyint"},
    "SMALLINT": {"smallint"},
    "INTEGER": {"int"},
    "BIGINT": {"bigint"},
    "UBIGINT": {"bigint"},
    "DOUBLE": {"double"},
    "FLOAT": {"float"},
    "VARCHAR": {"string"},
    "BLOB": {"binary"},
    "DATE": {"date"},
    "TIMESTAMP": {"timestamp", "timestamp_ntz"},
}


def oracle_type_errors(duck_cols, duck_types, spark_schema):
    """Return driver-divergence complaints for an oracle result shape.

    duck_cols/duck_types: names + str(DuckDBPyType) of the oracle result.
    spark_schema: the Spark DataFrame's schema (or None to only scan for
    forbidden DuckDB types — used by the sf0.001 CI guard, which doesn't
    want to pay for a Spark run per query).
    """
    errs = []
    spark_types = (
        {f.name: f.dataType.simpleString() for f in spark_schema.fields}
        if spark_schema is not None
        else {}
    )
    for name, t in zip(duck_cols, duck_types):
        t = str(t)
        if t.startswith(FORBIDDEN_DUCK_TYPES) or t.startswith("DECIMAL"):
            errs.append(f"oracle column {name!r} has driver-divergent type {t}")
            continue
        st = spark_types.get(name)
        expected = DUCK_TO_SPARK.get(t.split("(")[0])
        if expected is None:
            # Not forbidden, but not mapped either (TIMESTAMP_NS, LIST,
            # INTERVAL, ...): the strict gate can't vouch for it, so make
            # the drift VISIBLE instead of silently passing (round-5
            # ADVICE — the docstring promised "unknown — warn only").
            print(
                f"WARN: oracle column {name!r} has unmapped DuckDB type "
                f"{t} — type-strict gate cannot check it",
                file=sys.stderr,
            )
            continue
        if st is not None and st not in expected:
            errs.append(
                f"oracle column {name!r}: DuckDB {t} vs Spark {st}"
            )
    return errs


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
            rel = con.sql(oracles[name])
            ocols = list(rel.columns)
            otypes = [str(t) for t in rel.types]
            orows = rel.fetchall()
        except Exception as e:
            failures.append(name)
            rec["err"] = f"oracle error: {e}"
            print(f"FAIL {name}: oracle error: {e}")
            continue
        rec["oracle_rows"] = len(orows)
        type_errs = oracle_type_errors(ocols, otypes, sdf.schema)
        if type_errs:
            failures.append(name)
            rec["err"] = "; ".join(type_errs)
            print(f"FAIL {name}: " + "; ".join(type_errs))
            continue
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
