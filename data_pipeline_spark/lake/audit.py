"""Audit gates for write-audit-publish (X28).

The WAP pattern is only as good as the audit between stage and publish.
This module makes the audit declarative: a list of checks evaluated
against the BRANCH state (and, where relevant, against published main),
then one decision — all pass → ``fast_forward`` (atomic publish), any
fail → refuse, keeping the branch for forensics (or dropping it).

Checks are deliberately metadata-frugal: each runs at most one aggregate
job over the branch read, and the row-count checks use the zero-job
manifest count where physical == logical (compacted, tombstone-free) is
not required.

Reference analog: the pipeline's post-run quality prints
(/root/reference/src/bin/test_full_pipeline.rs:61-96 — row-count
preservation and null-count checks) promoted from prints to a publish
gate.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import pyspark.sql.functions as F

from .table import DELETED_COL, LakeTable


@dataclass
class CheckResult:
    name: str
    ok: bool
    detail: str


Check = Callable[[LakeTable, str], CheckResult]


def min_rows(n: int) -> Check:
    """Branch state must hold at least ``n`` rows (an empty or truncated
    feed must not publish)."""

    def run(table: LakeTable, branch: str) -> CheckResult:
        got = table.read(ref=branch).count()
        return CheckResult("min_rows", got >= n, f"rows={got} min={n}")

    return run


def no_shrink(tolerance: float = 0.0) -> Check:
    """Branch must not serve fewer rows than published main by more than
    ``tolerance`` (fraction). A CDC feed that suddenly deletes half the
    table is a bug until a human says otherwise."""

    def run(table: LakeTable, branch: str) -> CheckResult:
        before = table.read().count()
        after = table.read(ref=branch).count()
        floor = before * (1.0 - tolerance)
        return CheckResult(
            "no_shrink", after >= floor,
            f"main={before} branch={after} floor={floor:.1f}",
        )

    return run


def max_null_fraction(col: str, frac: float) -> Check:
    """At most ``frac`` of branch rows may have a null ``col`` (schema
    drift or a broken extractor shows up as a null surge)."""

    def run(table: LakeTable, branch: str) -> CheckResult:
        row = table.read(ref=branch).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(col).isNull().cast("long")).alias("nulls"),
        ).first()
        got = (row["nulls"] or 0) / row["n"] if row["n"] else 0.0
        return CheckResult(
            "max_null_fraction",
            got <= frac,
            f"col={col} null_frac={got:.4f} max={frac}",
        )

    return run


def max_delete_fraction(frac: float) -> Check:
    """At most ``frac`` of the branch's per-key winners may be tombstones —
    the mass-delete guard (a takedown deletes keys; a broken feed deletes
    the table)."""

    def run(table: LakeTable, branch: str) -> CheckResult:
        head = table.snapshot(table.ref(branch))
        raw = table._read_files(table.files_of(head))
        winners = table._resolve(raw) if head and head.get("needs_resolve") else raw
        row = winners.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.coalesce(F.col(DELETED_COL), F.lit(False)).cast("long")
            ).alias("dels"),
        ).first()
        got = (row["dels"] or 0) / row["n"] if row["n"] else 0.0
        return CheckResult(
            "max_delete_fraction",
            got <= frac,
            f"delete_frac={got:.4f} max={frac}",
        )

    return run


def audit(table: LakeTable, branch: str, checks: list[Check]) -> list[CheckResult]:
    """Run every check against the branch (no early exit — the report
    should show everything that is wrong, not just the first thing)."""
    return [c(table, branch) for c in checks]


def publish_if(
    table: LakeTable,
    branch: str,
    checks: list[Check],
    on_fail: str = "keep",
) -> dict:
    """Audit then publish: all checks pass → ``fast_forward`` (atomic);
    any fail → main untouched and the branch is kept for forensics
    (``on_fail="keep"``) or dropped (``on_fail="drop"``). Returns the
    decision plus every check's result."""
    if on_fail not in ("keep", "drop"):
        raise ValueError(f"on_fail must be 'keep' or 'drop', got {on_fail!r}")
    results = audit(table, branch, checks)
    passed = all(r.ok for r in results)
    if passed:
        table.fast_forward(branch)
    elif on_fail == "drop":
        table.drop_branch(branch)
    return {
        "published": passed,
        "branch": branch,
        "on_fail": None if passed else on_fail,
        "checks": [
            {"name": r.name, "ok": r.ok, "detail": r.detail} for r in results
        ],
    }
