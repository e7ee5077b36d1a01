"""Sparse patch apply (operators/patch.py): equivalence with a sequential
per-key replay oracle, delete/resurrect semantics, and plan shape (one
aggregation + one join, no window, no per-row Python)."""

import random

import pyspark.sql.functions as F

from data_pipeline_spark.operators.patch import apply_patches


def _oracle(base_rows, patch_rows, value_cols):
    """Driver-side truth: replay patches per key in lsn order."""
    state = {k: dict(v) for k, v in base_rows.items()}
    for key, lsn, op, patch in sorted(patch_rows, key=lambda r: r[1]):
        if op == "delete":
            state.pop(key, None)
        else:
            row = state.setdefault(key, {c: None for c in value_cols})
            for c, v in (patch or {}).items():
                row[c] = v
    return state


def _run(spark, base_rows, patch_rows, value_cols=("price", "status")):
    base = spark.createDataFrame(
        [(k, v.get("price"), v.get("status")) for k, v in base_rows.items()],
        "k bigint, price double, status string",
    )
    patches = spark.createDataFrame(
        [(k, lsn, op, patch) for k, lsn, op, patch in patch_rows],
        "k bigint, lsn bigint, op string, patch map<string,string>",
    )
    out = apply_patches(base, patches, key_cols=["k"], value_cols=list(value_cols))
    got = {
        r["k"]: {"price": r["price"], "status": r["status"]}
        for r in out.collect()
    }
    want_raw = _oracle(base_rows, patch_rows, value_cols)
    want = {
        k: {
            "price": float(v["price"]) if v.get("price") is not None else None,
            "status": v.get("status"),
        }
        for k, v in want_raw.items()
    }
    assert got == want, (got, want)
    return out


def test_basic_patch_delete_resurrect(spark):
    base = {1: {"price": 10.0, "status": "A"}, 2: {"price": 20.0, "status": "B"}}
    patches = [
        (1, 1, "upsert", {"price": "11.5"}),          # partial: status stays A
        (2, 2, "delete", None),                        # key 2 erased
        (2, 3, "upsert", {"status": "C"}),             # resurrected: price NULL
        (3, 4, "upsert", {"price": "7", "status": "N"}),  # created from nothing
        (4, 5, "delete", None),                        # delete of unseen key: no-op
    ]
    out = _run(spark, base, patches)
    rows = {r["k"]: r for r in out.collect()}
    assert rows[1]["status"] == "A" and rows[1]["price"] == 11.5
    assert rows[2]["price"] is None and rows[2]["status"] == "C"
    assert rows[3]["price"] == 7.0
    assert 4 not in rows


def test_patch_before_delete_is_erased(spark):
    """A column set before the last delete must NOT leak into the
    resurrected row."""
    base = {9: {"price": 1.0, "status": "Z"}}
    patches = [
        (9, 1, "upsert", {"price": "2.0"}),
        (9, 2, "delete", None),
        (9, 3, "upsert", {"status": "R"}),
    ]
    out = _run(spark, base, patches).collect()
    assert len(out) == 1
    assert out[0]["price"] is None and out[0]["status"] == "R"


def test_randomized_equivalence_with_sequential_replay(spark):
    """Fuzz: hot keys × interleaved upserts/deletes == sequential oracle."""
    rng = random.Random(42)
    keys = list(range(12))
    base = {
        k: {"price": float(rng.randint(1, 50)), "status": rng.choice("ABC")}
        for k in keys
        if rng.random() < 0.6
    }
    patches = []
    for lsn in range(1, 300):
        k = rng.choice(keys)  # few keys, many patches: hot-key pile-up
        if rng.random() < 0.15:
            patches.append((k, lsn, "delete", None))
        else:
            patch = {}
            if rng.random() < 0.7:
                patch["price"] = str(rng.randint(1, 99))
            if rng.random() < 0.5:
                patch["status"] = rng.choice("XYZ")
            patches.append((k, lsn, "upsert", patch))
    _run(spark, base, patches)


def test_plan_shape_single_agg_no_window(spark):
    """The fold is ONE hash aggregation (map-side combinable) + ONE join:
    no Window (per-key sort) and no Python eval anywhere."""
    base = spark.createDataFrame([(1, 1.0, "A")], "k bigint, price double, status string")
    patches = spark.createDataFrame(
        [(1, 1, "upsert", {"price": "2"})],
        "k bigint, lsn bigint, op string, patch map<string,string>",
    )
    out = apply_patches(base, patches, key_cols=["k"], value_cols=["price", "status"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # partial aggregation present => hot-key patches collapse before shuffle
    assert "partial_" in plan or "HashAggregate" in plan
