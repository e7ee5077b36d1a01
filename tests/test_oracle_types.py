"""CI guard against DuckDB oracle type drift (VERDICT r3 ask #4).

Round-3 post-mortem: three driver-red rows (`doc_search`, `cdc_tx_align`,
`content_delta`) were caused not by engine values but by oracle SQL whose
result types diverge from Spark's — DuckDB `sum(BIGINT)` returns HUGEINT
and `to_timestamp()` returns TIMESTAMP WITH TIME ZONE, and the driver
hashes typed values. This test walks EVERY `oracle_sql()` entry through
DuckDB at sf0.001 (no Spark session — pure metadata+execute, runs in
seconds) and asserts no result column carries a driver-divergent type
(HUGEINT / UHUGEINT / TIMESTAMP WITH TIME ZONE / DECIMAL).

It would have failed on the round-3 tree: `test_guard_catches_r3_bugs`
reconstructs the three pre-fix column expressions and asserts the guard
flags each one.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from tools.check_contract import TABLES, oracle_type_errors  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def test_no_oracle_type_drift(con):
    """Every oracle result column must map to a driver-hashable type."""
    bad = {}
    for name, sql in entrymod.oracle_sql().items():
        rel = con.sql(sql)
        errs = oracle_type_errors(
            list(rel.columns), [str(t) for t in rel.types], None
        )
        if errs:
            bad[name] = errs
    assert not bad, f"oracle type drift: {bad}"


def test_guard_catches_r3_bugs(con):
    """The three round-3 driver failures must trip this guard."""
    # doc_search / cdc_tx_align root cause: sum(BIGINT) -> HUGEINT
    rel = con.sql("SELECT sum(doc_id) AS score FROM documents")
    assert oracle_type_errors(rel.columns, [str(t) for t in rel.types], None)
    # content_delta root cause: to_timestamp() -> TIMESTAMP WITH TIME ZONE
    rel = con.sql("SELECT to_timestamp(1700000000) AS warc_ts")
    assert oracle_type_errors(rel.columns, [str(t) for t in rel.types], None)
    # and the shipped casts are clean
    rel = con.sql(
        "SELECT CAST(sum(doc_id) AS BIGINT) AS score,"
        " CAST(to_timestamp(1700000000) AS TIMESTAMP) AS warc_ts"
        " FROM documents"
    )
    assert not oracle_type_errors(
        rel.columns, [str(t) for t in rel.types], None
    )
