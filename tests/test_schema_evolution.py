"""Schema evolution mid-log: the registry rewrites the table schema and the
merge plan in-flight (north_star); old data resolves at scan (null-filled)."""

import pyspark.sql.functions as F

from data_pipeline_spark.plans.registry import SchemaRegistry
from data_pipeline_spark.sources import changelog
from data_pipeline_spark.sources.datagen import gen_changes
from data_pipeline_spark.streaming.checkpoint import CheckpointStore
from data_pipeline_spark.streaming.runner import ReplayRunner, make_table_for_log


def test_evolution_mid_replay(spark, tmp_path):
    log_dir = str(tmp_path / "log")
    df = gen_changes(
        spark, 2000, events_per_epoch=500, seed=11, evolve_at_epoch=2
    )
    changelog.write_log(df, log_dir)

    registry = SchemaRegistry()
    table = make_table_for_log(spark, str(tmp_path / "t"), registry, n_buckets=4)
    assert "fetch_status" not in [f.name for f in table.schema.fields]

    runner = ReplayRunner(spark, log_dir, table, CheckpointStore(str(tmp_path / "cp")), registry)
    results = runner.run()
    assert len(results) == 4

    # Table evolved to v2 schema.
    names = [f.name for f in table.schema.fields]
    assert names == ["url", "warc_ts", "html", "text", "lang", "fetch_status"]

    final = table.read()
    # Rows whose winner came from epochs >= 2 carry fetch_status; winners
    # from earlier epochs read as null (scan-time alignment).
    with_status = final.where(F.col("fetch_status").isNotNull()).count()
    without = final.where(F.col("fetch_status").isNull()).count()
    assert with_status > 0 and without > 0

    # An evolve-schema snapshot is in the history, before the epoch-2 merge.
    ops = [(s["summary"].get("operation"), s["summary"].get("engine.epoch")) for s in table.history()]
    assert ("evolve-schema", None) in ops
    evolve_idx = ops.index(("evolve-schema", None))
    merge2_idx = ops.index(("merge", "2"))
    assert evolve_idx < merge2_idx

    # diff() reports the evolution plan.
    d = registry.diff(1, 2)
    assert d == {"added": ["fetch_status"], "dropped": [], "retyped": []}


def test_registry_roundtrip(tmp_path):
    reg = SchemaRegistry()
    p = str(tmp_path / "registry.json")
    reg.save(p)
    reg2 = SchemaRegistry.load(p)
    assert reg2.table_schema(2).json() == reg.table_schema(2).json()
    assert reg2.field_mappings == reg.field_mappings


def test_classifier_tiers():
    """Reference regression tests (field_classifier.rs:258-375)."""
    reg = SchemaRegistry()
    # exact + normalization: "Cost-Price" → costprice → cost_price
    assert reg.classify_field("Cost-Price") == "cost_price"
    assert reg.classify_field("productID") == "product_id"
    assert reg.classify_field("dcImsMrp") == "mrp"
    # sku guard: sku → sku, sku_percent_off → discount, no contamination
    assert reg.classify_field("sku") == "sku"
    assert reg.classify_field("sku_percent_off") == "discount"
    # content-based value shapes
    assert reg.classify_field("mystery_col", ["$19.99", "5.00"]) == "cost_price"
    assert reg.classify_field("mystery_col", ["50% off", "25%"]) == "discount"
    assert reg.classify_field("zzz", ["hello world"]) is None


def test_late_old_schema_epoch_does_not_downgrade(spark, tmp_path):
    """Forward-only evolution: replaying a v1 epoch AFTER the table evolved
    to v2 must leave the v2 schema in place and converge to the in-order
    final state."""
    log_dir = str(tmp_path / "log")
    changelog.write_log(
        gen_changes(spark, 2000, events_per_epoch=500, seed=11, evolve_at_epoch=2),
        log_dir,
    )

    def run(order, name):
        registry = SchemaRegistry()
        table = make_table_for_log(spark, str(tmp_path / name), registry, n_buckets=4)
        runner = ReplayRunner(
            spark, log_dir, table, CheckpointStore(str(tmp_path / f"cp_{name}")), registry
        )
        for e in order:
            runner.apply_epoch(e)
        return table

    ordered = run([0, 1, 2, 3], "ord")
    shuffled = run([2, 3, 0, 1], "late")

    names = [f.name for f in shuffled.schema.fields]
    assert names == ["url", "warc_ts", "html", "text", "lang", "fetch_status"]
    # exactly one evolve commit, despite v1 epochs applied after it
    evolves = [
        s for s in shuffled.history()
        if s["summary"].get("operation") == "evolve-schema"
    ]
    assert len(evolves) == 1

    key = ["url", "warc_ts", "fetch_status"]

    def state(t):
        return sorted(map(tuple, t.read().select(*key).collect()))

    assert state(ordered) == state(shuffled)


def test_drop_and_retype_columns(spark, tmp_path):
    """Evolution beyond adds: dropping a column and widening a type must
    resolve at scan for old files (dropped → not selected, retyped → cast)
    and merge correctly afterwards."""
    import datetime as dt

    import pyspark.sql.functions as F
    from pyspark.sql.types import (
        BinaryType, IntegerType, LongType, StringType, StructField,
        StructType, TimestampType,
    )

    from data_pipeline_spark.lake.table import LakeTable

    base = StructType([
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("lang", StringType()),
        StructField("fetch_status", IntegerType()),
    ])
    table = LakeTable.create(spark, str(tmp_path / "t_evo2"), base, n_buckets=4)
    t0 = dt.datetime(2024, 1, 1)

    def ev(k, lsn, status, op="insert"):
        return ("u" if op != "delete" else "delete", f"https://e/p/{k}", lsn,
                t0 + dt.timedelta(seconds=lsn), b"<p>x</p>", "en", status)

    schema = ("op string, url string, lsn long, warc_ts timestamp, "
              "html binary, lang string, fetch_status int")
    table.merge(spark.createDataFrame([ev(1, 1, 200), ev(2, 2, 404)], schema), epoch=0)

    # v2: drop lang, retype fetch_status int → long.
    evolved = StructType([
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("fetch_status", LongType()),
    ])
    table.evolve(evolved)

    got = {r["url"]: r for r in table.read().collect()}
    assert "lang" not in table.read().columns
    assert got["https://e/p/1"]["fetch_status"] == 200
    assert isinstance(got["https://e/p/1"]["fetch_status"], int)
    assert dict(table.read().dtypes)["fetch_status"] == "bigint"

    # Post-evolution merge in the new shape; old + new files co-resolve.
    schema2 = ("op string, url string, lsn long, warc_ts timestamp, "
               "html binary, fetch_status long")
    table.merge(
        spark.createDataFrame(
            [("u", "https://e/p/1", 3, t0 + dt.timedelta(seconds=3), b"<p>y</p>", 5_000_000_000)],
            schema2,
        ),
        epoch=1,
    )
    got = {r["url"]: r for r in table.read().collect()}
    assert got["https://e/p/1"]["fetch_status"] == 5_000_000_000  # needs long
    assert got["https://e/p/2"]["fetch_status"] == 404


def test_fuzzy_tier_respects_sku_discount_guard():
    """Review finding: the C4 fuzzy tier matched mapping key 'sku' before
    the C5 guard could veto it — an unseen discount-style name containing
    'sku' must classify as discount, never contaminate the sku column."""
    reg = SchemaRegistry()
    assert reg.classify_field("skuPercentageOff") == "discount"
    assert reg.classify_field("sku_amount_off") == "discount"
    # plain fuzzy sku names still land on sku
    assert reg.classify_field("item_sku_code") == "sku"


def test_map_to_canonical_never_duplicates_columns(spark):
    """Review finding: two source columns classifying to one canonical name
    must not produce duplicate output names; the column ALREADY named the
    canonical keeps it regardless of position."""
    reg = SchemaRegistry()
    df = spark.createDataFrame([( "9.99", "7.50")], ["price", "cost_price"])
    out = reg.map_to_canonical(df, sample_rows=0)
    assert sorted(out.columns) == ["cost_price", "price"]
    row = out.first()
    assert row["cost_price"] == "7.50" and row["price"] == "9.99"
    # parquet write (the original crash site for duplicate names) works
    assert out.select("cost_price").first()[0] == "7.50"
