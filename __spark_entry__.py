"""Driver contract for the spark-graft builder (PySpark target).

`queries()` exposes every operator family from SURVEY.md §2 plus the
training-data extensions (dedup / similarity / text-analysis / multimodal)
as (spark, sf_dir) → DataFrame callables; `oracle_sql()` carries DuckDB
twins generated from the SAME constant tables and regexes
(data_pipeline_spark.functions.textstats / operators.textdedup), so the
driver's sf=0.01 comparison checks true cross-engine parity.

Float discipline: every floating output column is rounded (≤6 dp) on BOTH
sides so summation-order noise (~1e-13) can't flip the driver's value hash;
orderings are over rounded values with an id tie-break.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from data_pipeline_spark.functions import normalize as N
from data_pipeline_spark.functions import htmlmeta as HM
from data_pipeline_spark.functions import quality as QL
from data_pipeline_spark.functions import textstats as TS
from data_pipeline_spark.functions import weburl as WU
from data_pipeline_spark.functions import webqa as WQ
from data_pipeline_spark.operators import hostrep as HR
from data_pipeline_spark.operators import inverted_index as II
from data_pipeline_spark.operators import sampling as SMP
from data_pipeline_spark.operators import spandedup as SPD
from data_pipeline_spark.operators import textprep as TP
from data_pipeline_spark.functions.extract import extract_products_udf, extract_text_udf
from data_pipeline_spark.operators import components as CC
from data_pipeline_spark.operators import decontaminate as DX
from data_pipeline_spark.operators import importance as IW
from data_pipeline_spark.operators import semdedup as SD
from data_pipeline_spark.operators import similarity as SIM
from data_pipeline_spark.operators import textdedup as TD
from data_pipeline_spark.operators.dedup import lww_dedup, lww_dedup_window
from data_pipeline_spark.plans.registry import SchemaRegistry


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# CDC core (D1/D2, SURVEY.md §2.6): LWW dedup, snapshot diff, replay
# ---------------------------------------------------------------------------

def q_cdc_lww_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1: last event per user by (ts, event_id) — max_by scale path."""
    ev = _t(spark, sf_dir, "events")
    return lww_dedup(
        ev.select("user_id", "event_id", "ts", "event_type", F.round("value", 6).alias("value")),
        key_cols=("user_id",),
        order_cols=("ts", "event_id"),
    )


def q_cdc_lww_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 window twin: row_number()==1 — must equal the max_by path."""
    ev = _t(spark, sf_dir, "events")
    return lww_dedup_window(
        ev.select("user_id", "event_id", "ts", "event_type", F.round("value", 6).alias("value")),
        key_cols=("user_id",),
        order_cols=("ts", "event_id"),
    )


_SQL_LWW = """
WITH src AS (
  SELECT user_id, event_id, ts, event_type, round(value, 6) AS value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, event_id, ts, event_type, value FROM src WHERE rn = 1
"""


def q_cdc_key_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2: two-directional anti-join key diff between two snapshots."""
    o = _t(spark, sf_dir, "orders")
    snap_a = o.where(F.col("o_orderkey") % 7 != 0).select("o_orderkey")
    snap_b = o.where(F.col("o_orderkey") % 5 != 0).select("o_orderkey")
    inserts = snap_b.join(snap_a, "o_orderkey", "left_anti").withColumn(
        "op", F.lit("insert")
    )
    deletes = snap_a.join(snap_b, "o_orderkey", "left_anti").withColumn(
        "op", F.lit("delete")
    )
    return inserts.unionByName(deletes)


_SQL_KEY_DIFF = """
WITH a AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 7 <> 0),
     b AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 5 <> 0)
SELECT o_orderkey, 'insert' AS op FROM b WHERE o_orderkey NOT IN (SELECT o_orderkey FROM a)
UNION ALL
SELECT o_orderkey, 'delete' AS op FROM a WHERE o_orderkey NOT IN (SELECT o_orderkey FROM b)
"""


def q_cdc_update_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 update leg: inner-join value comparison between snapshots."""
    o = _t(spark, sf_dir, "orders")
    live = o.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") + F.lit(10.0)).otherwise(
            F.col("o_totalprice")
        ),
    )
    old = o.select("o_orderkey", F.col("o_totalprice").alias("old_price"))
    new = live.select("o_orderkey", F.col("o_totalprice").alias("new_price"))
    return (
        old.join(new, "o_orderkey")
        .where(F.col("old_price") != F.col("new_price"))
        .select(
            "o_orderkey",
            F.round("old_price", 2).alias("old_price"),
            F.round("new_price", 2).alias("new_price"),
        )
    )


_SQL_UPDATE_DETECT = """
WITH live AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 10.0 ELSE o_totalprice END AS new_price
  FROM orders
)
SELECT o.o_orderkey, round(o.o_totalprice, 2) AS old_price, round(l.new_price, 2) AS new_price
FROM orders o JOIN live l ON o.o_orderkey = l.o_orderkey
WHERE o.o_totalprice <> l.new_price
"""


def q_cdc_net_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X30 change-data-feed core (`lake/diff.py::snapshot_diff`): net
    row-level diff of two keyed relations — delete / insert /
    update_preimage / update_postimage — as ONE full-outer join with an
    exploded CASE array (no union of per-change-type legs). The same
    operator `LakeTable.change_feed` runs over its bucket-pruned snapshot
    scans."""
    from data_pipeline_spark.lake.diff import snapshot_diff

    base = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey"),
        F.round("o_totalprice", 2).alias("price"),
        F.col("o_orderstatus"),
    )
    pre = base.where(F.col("o_orderkey") % 7 != 0)
    post = base.where(F.col("o_orderkey") % 5 != 0).withColumn(
        "price",
        F.when(
            F.col("o_orderkey") % 3 == 0, F.round(F.col("price") + 10, 2)
        ).otherwise(F.col("price")),
    )
    return snapshot_diff(pre, post, "o_orderkey")


_SQL_NET_CHANGES = """
WITH base AS (
  SELECT o_orderkey AS k, round(o_totalprice, 2) AS price, o_orderstatus AS st
  FROM orders
), pre AS (
  SELECT * FROM base WHERE k % 7 <> 0
), post AS (
  SELECT k,
         CASE WHEN k % 3 = 0 THEN round(price + 10, 2) ELSE price END AS price,
         st
  FROM base WHERE k % 5 <> 0
)
SELECT p.k AS o_orderkey, p.price, p.st AS o_orderstatus,
       'delete' AS _change_type
FROM pre p LEFT JOIN post c ON p.k = c.k WHERE c.k IS NULL
UNION ALL
SELECT c.k, c.price, c.st, 'insert'
FROM post c LEFT JOIN pre p ON p.k = c.k WHERE p.k IS NULL
UNION ALL
SELECT p.k, p.price, p.st, 'update_preimage'
FROM pre p JOIN post c ON p.k = c.k
WHERE p.price <> c.price OR p.st <> c.st
UNION ALL
SELECT c.k, c.price, c.st, 'update_postimage'
FROM pre p JOIN post c ON p.k = c.k
WHERE p.price <> c.price OR p.st <> c.st
"""


def q_cdc_rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained grouped rollup WITH min/max (round 4,
    `lake/incremental.py::IncrementalRollup(minmax_cols=)`): a real
    LakeTable is bootstrapped from orders-derived change events, the
    rollup state (count/sum + min/max per group) is committed, then an
    epoch of deletes (including group-extremum holders), value updates,
    group moves and fresh inserts lands and the rollup advances
    INCREMENTALLY — additive delta for count/sum, monotone fold for
    untouched-extremum groups, affected-group-only rescan for removed
    extrema (the Materialize-style non-retractable-aggregate treatment),
    and exact per-group count-distinct retraction via the per-(group,
    value) aux relation.
    The DuckDB twin aggregates the final table state directly, so parity
    proves incremental == full recompute across every change mode."""
    import tempfile

    from data_pipeline_spark.lake.incremental import IncrementalRollup
    from data_pipeline_spark.lake.table import LakeTable

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round("o_totalprice", 2).alias("val"),
    )
    k = F.col("o_orderkey")
    ts = F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    base = o.where(k % 2 == 0).select(
        F.lit("insert").alias("op"),
        F.concat(F.lit("k"), k).alias("url"),
        ts.alias("warc_ts"),
        (F.col("o_custkey") % 20).cast("int").alias("grp"),
        F.col("val"),
        k.alias("lsn"),
    )
    deletes = o.where((k % 2 == 0) & (k % 10 == 0)).select(
        F.lit("delete").alias("op"),
        F.concat(F.lit("k"), k).alias("url"),
        ts.alias("warc_ts"),
        F.lit(None).cast("int").alias("grp"),
        F.lit(None).cast("double").alias("val"),
        (k + 1000000).alias("lsn"),
    )
    updates = o.where((k % 2 == 0) & (k % 10 != 0) & (k % 6 == 0)).select(
        F.lit("update").alias("op"),
        F.concat(F.lit("k"), k).alias("url"),
        ts.alias("warc_ts"),
        ((F.col("o_custkey") + 1) % 20).cast("int").alias("grp"),
        (F.col("val") + 100).alias("val"),
        (k + 1000000).alias("lsn"),
    )
    inserts = o.where((k % 2 == 1) & (k % 3 == 0)).select(
        F.lit("insert").alias("op"),
        F.concat(F.lit("k"), k).alias("url"),
        ts.alias("warc_ts"),
        (F.col("o_custkey") % 20).cast("int").alias("grp"),
        F.col("val"),
        (k + 1000000).alias("lsn"),
    )
    ws = tempfile.mkdtemp(prefix="rollupq-")
    schema = spark.createDataFrame(
        [], "url string, warc_ts timestamp, grp int, val double"
    ).schema
    table = LakeTable.create(
        spark, f"{ws}/t", schema, key_col="url", n_buckets=8
    )
    roll = IncrementalRollup(
        spark, table, ["grp"], ["val"], f"{ws}/roll", minmax_cols=["val"],
        distinct_cols=["val"],
    )
    table.merge(base, epoch=0, mode="mor")
    roll.refresh()
    table.merge(
        deletes.unionByName(updates).unionByName(inserts), epoch=1, mode="mor"
    )
    info = roll.refresh()
    assert info["mode"] == "incremental", info
    return roll.read().select(
        "grp",
        "n_rows",
        F.round("sum_val", 4).alias("sum_val"),
        "min_val",
        "max_val",
        "n_distinct_val",
    )


_SQL_ROLLUP_INCREMENTAL = """
WITH final_rows AS (
  SELECT CASE WHEN o_orderkey % 6 = 0 THEN CAST((o_custkey + 1) % 20 AS INT)
              ELSE CAST(o_custkey % 20 AS INT) END AS grp,
         CASE WHEN o_orderkey % 6 = 0 THEN round(o_totalprice, 2) + 100
              ELSE round(o_totalprice, 2) END AS val
  FROM orders WHERE o_orderkey % 2 = 0 AND o_orderkey % 10 <> 0
  UNION ALL
  SELECT CAST(o_custkey % 20 AS INT) AS grp, round(o_totalprice, 2) AS val
  FROM orders WHERE o_orderkey % 2 = 1 AND o_orderkey % 3 = 0
)
SELECT grp, count(*) AS n_rows, round(sum(val), 4) AS sum_val,
       min(val) AS min_val, max(val) AS max_val,
       count(DISTINCT val) AS n_distinct_val
FROM final_rows GROUP BY grp
"""


def q_cdc_rollup_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-backed distinct maintenance (round 5,
    `lake/incremental.py::IncrementalRollup(distinct_mode="hll")`): the
    rollup's n_distinct aux is a per-group HLL register table — O(groups
    × 2^p) state instead of O(live (group, value) pairs), the shape a
    10^10-row table with a high-cardinality distinct column needs. The
    contract checks the STRONGEST property: after an incremental refresh
    across deletes, value changes, group moves and inserts, the
    maintained register table must EQUAL the registers computed from
    scratch over the final table state (loss-free insert merge + exact
    affected-group rebuild — no drift, ever). The DuckDB twin builds the
    same md5-derived registers over the final rows
    (`operators/hll.py::sql_hll_registers`)."""
    import tempfile

    from data_pipeline_spark.lake.incremental import IncrementalRollup
    from data_pipeline_spark.lake.table import LakeTable

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    k = F.col("o_orderkey")
    ts = F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    cat = F.concat(F.lit("c"), (k % 350)).alias("cat")
    base = o.where(k % 2 == 0).select(
        F.lit("insert").alias("op"),
        F.concat(F.lit("k"), k).alias("url"),
        ts.alias("warc_ts"),
        (F.col("o_custkey") % 20).cast("int").alias("grp"),
        cat,
        k.alias("lsn"),
    )
    deletes = o.where((k % 2 == 0) & (k % 10 == 0)).select(
        F.lit("delete").alias("op"),
        F.concat(F.lit("k"), k).alias("url"),
        ts.alias("warc_ts"),
        F.lit(None).cast("int").alias("grp"),
        F.lit(None).cast("string").alias("cat"),
        (k + 1000000).alias("lsn"),
    )
    updates = o.where((k % 2 == 0) & (k % 10 != 0) & (k % 6 == 0)).select(
        F.lit("update").alias("op"),
        F.concat(F.lit("k"), k).alias("url"),
        ts.alias("warc_ts"),
        ((F.col("o_custkey") + 1) % 20).cast("int").alias("grp"),
        F.concat(F.lit("c"), (k + 7) % 350).alias("cat"),
        (k + 1000000).alias("lsn"),
    )
    inserts = o.where((k % 2 == 1) & (k % 3 == 0)).select(
        F.lit("insert").alias("op"),
        F.concat(F.lit("k"), k).alias("url"),
        ts.alias("warc_ts"),
        (F.col("o_custkey") % 20).cast("int").alias("grp"),
        cat,
        (k + 1000000).alias("lsn"),
    )
    ws = tempfile.mkdtemp(prefix="rollhll-")
    schema = spark.createDataFrame(
        [], "url string, warc_ts timestamp, grp int, cat string"
    ).schema
    table = LakeTable.create(
        spark, f"{ws}/t", schema, key_col="url", n_buckets=8
    )
    roll = IncrementalRollup(
        spark, table, ["grp"], [], f"{ws}/roll",
        distinct_cols=["cat"], distinct_mode="hll", hll_p=10,
    )
    table.merge(base, epoch=0, mode="mor")
    roll.refresh()
    table.merge(
        deletes.unionByName(updates).unionByName(inserts), epoch=1, mode="mor"
    )
    info = roll.refresh()
    assert info["mode"] == "incremental", info
    assert info["distinct_recomputed_groups"] >= 1, info
    return roll.read_aux("cat").select(
        "grp", F.col("idx").cast("int").alias("idx"),
        F.col("rho").cast("int").alias("rho"),
    )


def _sql_rollup_hll_distinct() -> str:
    from data_pipeline_spark.operators.hll import sql_hll_registers

    inner = sql_hll_registers(
        "final_rows", "cat", group_cols=["grp"], p=10, seed="rollup:cat"
    )
    return f"""
WITH final_rows AS (
  SELECT CASE WHEN o_orderkey % 6 = 0 THEN CAST((o_custkey + 1) % 20 AS INT)
              ELSE CAST(o_custkey % 20 AS INT) END AS grp,
         CASE WHEN o_orderkey % 6 = 0 THEN 'c' || CAST((o_orderkey + 7) % 350 AS VARCHAR)
              ELSE 'c' || CAST(o_orderkey % 350 AS VARCHAR) END AS cat
  FROM orders WHERE o_orderkey % 2 = 0 AND o_orderkey % 10 <> 0
  UNION ALL
  SELECT CAST(o_custkey % 20 AS INT) AS grp,
         'c' || CAST(o_orderkey % 350 AS VARCHAR) AS cat
  FROM orders WHERE o_orderkey % 2 = 1 AND o_orderkey % 3 = 0
)
{inner}
"""


def q_cdc_rollup_null_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL group keys through the maintained rollup (round 5 ADVICE
    fix): SQL GROUP BY treats NULL as its own group, so the rollup's
    min/max attach, distinct attach, and affected-group rescan must all
    match NULL to NULL (`_ns_join` / the isin IS NULL arm) — before the
    fix that group silently got NULL extrema and 0 distinct. Events
    derive from orders with every 7th customer's group key NULLed; an
    incremental epoch deletes NULL-group extremum holders and moves keys
    in/out of the NULL group. The DuckDB twin is a plain GROUP BY over
    the final rows — which handles NULL natively — so parity proves the
    maintained state does too."""
    import tempfile

    from data_pipeline_spark.lake.incremental import IncrementalRollup
    from data_pipeline_spark.lake.table import LakeTable

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("val")
    )
    k = F.col("o_orderkey")
    ts = F.to_timestamp(F.lit("2024-01-01 00:00:00"))

    def grp_of(custkey, orderkey):
        return F.when(
            custkey % 7 == 0, F.lit(None).cast("int")
        ).otherwise((custkey % 10).cast("int"))

    base = o.where(k % 2 == 0).select(
        F.lit("insert").alias("op"),
        F.concat(F.lit("k"), k).alias("url"),
        ts.alias("warc_ts"),
        grp_of(F.col("o_custkey"), k).alias("grp"),
        F.col("val"),
        k.alias("lsn"),
    )
    deletes = o.where((k % 2 == 0) & (k % 10 == 0)).select(
        F.lit("delete").alias("op"),
        F.concat(F.lit("k"), k).alias("url"),
        ts.alias("warc_ts"),
        F.lit(None).cast("int").alias("grp"),
        F.lit(None).cast("double").alias("val"),
        (k + 1000000).alias("lsn"),
    )
    # group move via custkey+1: keys hop INTO and OUT OF the NULL group
    updates = o.where((k % 2 == 0) & (k % 10 != 0) & (k % 6 == 0)).select(
        F.lit("update").alias("op"),
        F.concat(F.lit("k"), k).alias("url"),
        ts.alias("warc_ts"),
        grp_of(F.col("o_custkey") + 1, k).alias("grp"),
        (F.col("val") + 100).alias("val"),
        (k + 1000000).alias("lsn"),
    )
    inserts = o.where((k % 2 == 1) & (k % 3 == 0)).select(
        F.lit("insert").alias("op"),
        F.concat(F.lit("k"), k).alias("url"),
        ts.alias("warc_ts"),
        grp_of(F.col("o_custkey"), k).alias("grp"),
        F.col("val"),
        (k + 1000000).alias("lsn"),
    )
    ws = tempfile.mkdtemp(prefix="rollnull-")
    schema = spark.createDataFrame(
        [], "url string, warc_ts timestamp, grp int, val double"
    ).schema
    table = LakeTable.create(
        spark, f"{ws}/t", schema, key_col="url", n_buckets=8
    )
    roll = IncrementalRollup(
        spark, table, ["grp"], ["val"], f"{ws}/roll",
        minmax_cols=["val"], distinct_cols=["val"],
    )
    table.merge(base, epoch=0, mode="mor")
    roll.refresh()
    table.merge(
        deletes.unionByName(updates).unionByName(inserts), epoch=1, mode="mor"
    )
    info = roll.refresh()
    assert info["mode"] == "incremental", info
    return roll.read().select(
        "grp",
        "n_rows",
        F.round("sum_val", 4).alias("sum_val"),
        "min_val",
        "max_val",
        "n_distinct_val",
    )


_SQL_ROLLUP_NULL_GROUPS = """
WITH final_rows AS (
  SELECT CASE WHEN o_orderkey % 6 = 0
              THEN CASE WHEN (o_custkey + 1) % 7 = 0 THEN NULL
                        ELSE CAST((o_custkey + 1) % 10 AS INT) END
              ELSE CASE WHEN o_custkey % 7 = 0 THEN NULL
                        ELSE CAST(o_custkey % 10 AS INT) END END AS grp,
         CASE WHEN o_orderkey % 6 = 0 THEN round(o_totalprice, 2) + 100
              ELSE round(o_totalprice, 2) END AS val
  FROM orders WHERE o_orderkey % 2 = 0 AND o_orderkey % 10 <> 0
  UNION ALL
  SELECT CASE WHEN o_custkey % 7 = 0 THEN NULL
              ELSE CAST(o_custkey % 10 AS INT) END AS grp,
         round(o_totalprice, 2) AS val
  FROM orders WHERE o_orderkey % 2 = 1 AND o_orderkey % 3 = 0
)
SELECT grp, count(*) AS n_rows, round(sum(val), 4) AS sum_val,
       min(val) AS min_val, max(val) AS max_val,
       count(DISTINCT val) AS n_distinct_val
FROM final_rows GROUP BY grp
"""


def q_cdc_join_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental join-view maintenance (`lake/incremental_join.py`): the
    materialized orders⋈customer view advanced from its previous state by
    the delta algebra ONLY — touched fact keys from `snapshot_diff`, the
    affected-join-key set K (pre- and post-image custkeys of changed
    orders, plus changed customers), one restricted left join sized
    O(delta), untouched rows spliced through verbatim. The DuckDB twin
    joins the post-snapshots directly, so parity proves incremental ==
    full recompute under fact updates, join-key churn, fact/dim inserts,
    and dim deletes. At the stateful layer (`IncrementalJoinView`) the
    same algebra runs over bucket-pruned LakeTable image reads with the
    view stored in its own LakeTable (atomic commits, exactly-once
    cursor pairs) — pytest `test_incremental_join.py`."""
    from data_pipeline_spark.lake.diff import snapshot_diff
    from data_pipeline_spark.lake.incremental_join import (
        join_view_refresh,
        touched_join_keys,
    )

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("price")
    )
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", F.round("c_acctbal", 2).alias("acctbal")
    )
    a_old = o.where(F.col("o_orderkey") % 7 != 0)
    a_new = (
        o.where(F.col("o_orderkey") % 5 != 0)
        .withColumn(
            "price",
            F.when(
                F.col("o_orderkey") % 3 == 0, F.round(F.col("price") + 10, 2)
            ).otherwise(F.col("price")),
        )
        .withColumn(
            "o_custkey",
            F.when(
                F.col("o_orderkey") % 11 == 0, (F.col("o_custkey") % 500) + 1
            ).otherwise(F.col("o_custkey")),
        )
    )
    b_old = c.where(F.col("c_custkey") % 6 != 0)
    b_new = c.where(F.col("c_custkey") % 4 != 0).withColumn(
        "acctbal",
        F.when(
            F.col("c_custkey") % 9 == 0, F.round(F.col("acctbal") + 5, 2)
        ).otherwise(F.col("acctbal")),
    )
    # Materialize the "previously committed" state once — in production it
    # IS materialized (the view's own LakeTable files); recomputing the
    # old join per downstream reference would misrepresent the refresh
    # cost the operator actually has.
    old_view = a_old.join(
        b_old, a_old["o_custkey"] == b_old["c_custkey"], "left"
    ).select(
        "o_orderkey", "o_custkey", "price", "c_custkey", "c_name", "acctbal"
    ).localCheckpoint(eager=True)

    # The touched-key sets are each referenced 2-3 times downstream (semi
    # joins + the keep-leg anti join); eager checkpoints stop the
    # full-outer diff joins from re-executing per use — the same posture
    # the stateful IncrementalJoinView takes on its change-feed reads.
    touched_a = snapshot_diff(a_old, a_new, "o_orderkey").select(
        "o_orderkey"
    ).distinct().localCheckpoint(eager=True)
    touched_b = snapshot_diff(b_old, b_new, "c_custkey").select(
        "c_custkey"
    ).distinct().localCheckpoint(eager=True)
    a_pre = a_old.join(touched_a, "o_orderkey", "left_semi")
    a_post = a_new.join(touched_a, "o_orderkey", "left_semi")
    K = touched_join_keys(
        a_pre.select("o_custkey"), a_post.select("o_custkey"), touched_b,
        "o_custkey", "c_custkey",
    )
    b_post_k = b_new.join(
        K.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_semi"
    )
    new_view = join_view_refresh(
        old_view, touched_a, a_post, b_post_k, K,
        a_key="o_orderkey", join_key_a="o_custkey", join_key_b="c_custkey",
    )
    return new_view.where(F.col("c_custkey").isNotNull())


_SQL_JOIN_INCREMENTAL = """
WITH a_new AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 11 = 0 THEN (o_custkey % 500) + 1
              ELSE o_custkey END AS o_custkey,
         CASE WHEN o_orderkey % 3 = 0 THEN round(round(o_totalprice, 2) + 10, 2)
              ELSE round(o_totalprice, 2) END AS price
  FROM orders WHERE o_orderkey % 5 <> 0
), b_new AS (
  SELECT c_custkey, c_name,
         CASE WHEN c_custkey % 9 = 0 THEN round(round(c_acctbal, 2) + 5, 2)
              ELSE round(c_acctbal, 2) END AS acctbal
  FROM customer WHERE c_custkey % 4 <> 0
)
SELECT a.o_orderkey, a.o_custkey, a.price, b.c_custkey, b.c_name, b.acctbal
FROM a_new a JOIN b_new b ON a.o_custkey = b.c_custkey
"""


def q_cdc_chunked_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBLog watermark chunked-snapshot reconciliation
    (`sources/chunked_snapshot.py`, arXiv:2010.12597): a lock-free
    snapshot taken in 10 chunks at UNKNOWN read points inside each chunk's
    (lw, hw] watermark window, interleaved with a live update/delete
    stream. The kill rule discards chunk rows whose key saw an in-window
    event; survivors are stamped at lw; LWW over survivors ∪ log must
    equal the ground-truth final state — which the DuckDB twin computes
    directly from the event schedule with NO snapshot anywhere, so parity
    proves the watermark algebra corrects for the unknown read points.
    Chunk read point is simulated mid-window (lw+5); update lsns are odd,
    delete lsns even, so no (key, lsn) ties exist."""
    from data_pipeline_spark.sources.chunked_snapshot import reconcile_chunks

    k = F.col("o_orderkey")
    base = _t(spark, sf_dir, "orders").select(
        k.alias("k"), F.col("o_custkey").alias("ck"),
        F.round("o_totalprice", 2).alias("price"),
        F.col("o_orderstatus").alias("st"),
    )
    kk = F.col("k")
    lsn_u = (2 * ((kk * 7) % 50) + 1).cast("long")   # odd, 1..99
    lsn_d = (2 * ((kk * 3) % 50) + 2).cast("long")   # even, 2..100
    updates = base.where(kk % 4 == 0).select(
        "k", "ck", F.round(F.col("price") + 5, 2).alias("price"), "st",
        F.lit("upsert").alias("op"), lsn_u.alias("lsn"),
    )
    deletes = base.where(kk % 10 == 0).select(
        "k", "ck", F.lit(None).cast("double").alias("price"), "st",
        F.lit("delete").alias("op"), lsn_d.alias("lsn"),
    )
    log = updates.unionByName(deletes)

    # chunk c = k % 10, window (10c, 10c+10], read point mid = 10c+5:
    # the chunk row reflects exactly the events with lsn <= mid.
    c = (kk % 10).cast("long")
    mid = 10 * c + 5
    chunks = (
        base.withColumn("lw_lsn", (10 * c))
        .withColumn("hw_lsn", (10 * c + 10))
        # delete already visible at the read point -> row absent from chunk
        .where(~((kk % 10 == 0) & (lsn_d <= mid)))
        # update already visible at the read point -> reflected in the row
        .withColumn(
            "price",
            F.when(
                (kk % 4 == 0) & (lsn_u <= mid), F.round(F.col("price") + 5, 2)
            ).otherwise(F.col("price")),
        )
    )
    survivors = reconcile_chunks(chunks, log, key_col="k")
    replayed = survivors.unionByName(
        log.select(*survivors.columns)
    )
    final = (
        replayed.groupBy("k")
        .agg(
            F.max_by(
                F.struct("ck", "price", "st", "op"), F.col("lsn")
            ).alias("w")
        )
        .where(F.col("w.op") != "delete")
        .select(
            F.col("k").alias("o_orderkey"),
            F.col("w.ck").alias("o_custkey"),
            F.col("w.price").alias("price"),
            F.col("w.st").alias("o_orderstatus"),
        )
    )
    return final


_SQL_CHUNKED_SNAPSHOT = """
WITH base AS (
  SELECT o_orderkey AS k, o_custkey AS ck, round(o_totalprice, 2) AS price,
         o_orderstatus AS st
  FROM orders
), ev AS (
  SELECT k, ck, round(price + 5, 2) AS price, st,
         'upsert' AS op, 2 * ((k * 7) % 50) + 1 AS lsn
  FROM base WHERE k % 4 = 0
  UNION ALL
  SELECT k, ck, NULL, st, 'delete', 2 * ((k * 3) % 50) + 2
  FROM base WHERE k % 10 = 0
), winner AS (
  SELECT *, row_number() OVER (PARTITION BY k ORDER BY lsn DESC) AS rn
  FROM ev
)
SELECT k AS o_orderkey, ck AS o_custkey, price, st AS o_orderstatus
FROM winner WHERE rn = 1 AND op <> 'delete'
UNION ALL
SELECT k, ck, price, st FROM base
WHERE k NOT IN (SELECT k FROM ev)
"""


def q_cdc_offset_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka-shaped transport bridge (`sources/partitioned.py`): events
    spread over 8 partitions (key-hash on user_id, per-partition offsets
    by delivery order) packed into offset-vector epochs — a pure narrow
    map (epoch = (offset - start[p] - 1) // target), with the committed
    start vector dropping redelivered offsets. Returns the per-(epoch,
    partition) extents a consumer group would commit; the DuckDB twin
    reproduces the formula from row_number alone."""
    from data_pipeline_spark.sources.partitioned import pack_offset_epochs
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id",
        (F.col("user_id") % 8).alias("partition"),
    )
    w = Window.partitionBy("partition").orderBy("ts", "event_id")
    stream = ev.withColumn("offset", F.row_number().over(w).cast("long"))
    packed = pack_offset_epochs(
        stream, {0: 100, 1: 50}, target=1000
    )
    return (
        packed.groupBy("epoch", "partition")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("offset").alias("lo"),
            F.max("offset").alias("hi"),
        )
    )


_SQL_OFFSET_EPOCHS = """
WITH stream AS (
  SELECT user_id % 8 AS partition,
         CAST(row_number() OVER (PARTITION BY user_id % 8
                                 ORDER BY ts, event_id) AS BIGINT) AS "offset"
  FROM events
), packed AS (
  SELECT partition, "offset",
         CAST(floor(("offset" - CASE partition WHEN 0 THEN 100
                                               WHEN 1 THEN 50
                                               ELSE 0 END - 1) / 1000.0)
              AS BIGINT) AS epoch
  FROM stream
  WHERE "offset" > CASE partition WHEN 0 THEN 100 WHEN 1 THEN 50 ELSE 0 END
)
SELECT epoch, partition, count(*) AS n, min("offset") AS lo, max("offset") AS hi
FROM packed GROUP BY epoch, partition
"""


def q_cdc_debezium_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wire-format adapter (`sources/debezium.py`): events → Debezium JSON
    envelopes (`to_debezium`) → parsed typed change frame
    (`parse_debezium`, native from_json). The DuckDB twin computes the
    target frame directly from the table with no JSON anywhere, so parity
    proves the envelope construction + parse round trip is lossless —
    including microsecond timestamps and float payloads."""
    from data_pipeline_spark.sources.debezium import parse_debezium, to_debezium

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", F.round("value", 6).alias("value")
    )
    src = ev.withColumn(
        "op",
        F.when(F.col("event_id") % 10 <= 6, F.lit("insert"))
        .when(F.col("event_id") % 10 <= 8, F.lit("update"))
        .otherwise(F.lit("delete")),
    )
    wire = to_debezium(
        src,
        payload_cols=["event_id", "ts", "user_id", "event_type", "value"],
        op_col="op",
        lsn_col="event_id",
        ts_col="ts",
    )
    parsed = parse_debezium(
        wire,
        "event_id bigint, ts timestamp_ntz, user_id bigint, event_type string,"
        " value double",
    )
    return parsed.select(
        "op", "event_id", "ts", "user_id", "event_type", "value", "lsn"
    )


_SQL_DEBEZIUM_ROUNDTRIP = """
SELECT CASE WHEN event_id % 10 <= 6 THEN 'insert'
            WHEN event_id % 10 <= 8 THEN 'update'
            ELSE 'delete' END AS op,
       event_id, ts, user_id, event_type, round(value, 6) AS value,
       event_id AS lsn
FROM events
"""


def q_cdc_patch_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse column-level patch apply (`operators/patch.py`): interleaved
    partial updates, deletes, and a post-delete resurrection folded onto a
    base snapshot in ONE hash aggregation + ONE full-outer join (per-column
    max_by LWW — no window, no per-key iteration). The DuckDB twin computes
    the final state by direct case analysis of the same deterministic
    patch schedule."""
    from data_pipeline_spark.operators.patch import apply_patches

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.round("o_totalprice", 2).alias("oprice"),
        F.col("o_orderstatus").alias("ostatus"),
    )
    base = o.where("k % 2 = 0").select(
        "k", F.col("oprice").alias("price"), F.col("ostatus").alias("status")
    )
    nullmap = F.lit(None).cast("map<string,string>")
    p1 = o.where("k % 3 = 0").select(
        "k", F.lit(1).cast("bigint").alias("lsn"), F.lit("upsert").alias("op"),
        F.create_map(F.lit("price"), (F.col("oprice") + 5).cast("string")).alias("patch"),
    )
    p2 = o.where("k % 5 = 0").select(
        "k", F.lit(2).cast("bigint").alias("lsn"), F.lit("upsert").alias("op"),
        F.create_map(F.lit("status"), F.lit("X")).alias("patch"),
    )
    p3 = o.where("k % 7 = 0").select(
        "k", F.lit(3).cast("bigint").alias("lsn"), F.lit("delete").alias("op"),
        nullmap.alias("patch"),
    )
    p4 = o.where("k % 21 = 0").select(
        "k", F.lit(4).cast("bigint").alias("lsn"), F.lit("upsert").alias("op"),
        F.create_map(F.lit("price"), F.lit("1.0")).alias("patch"),
    )
    patches = p1.unionByName(p2).unionByName(p3).unionByName(p4)
    out = apply_patches(base, patches, key_cols=["k"], value_cols=["price", "status"])
    return out.select(
        F.col("k").alias("o_orderkey"), F.round("price", 2).alias("price"), "status"
    )


_SQL_PATCH_APPLY = """
WITH s AS (
  SELECT o_orderkey AS k, round(o_totalprice, 2) AS oprice,
         o_orderstatus AS ostatus,
         (o_orderkey % 2 = 0) AS in_base,
         (o_orderkey % 3 = 0) AS p_price,
         (o_orderkey % 5 = 0) AS p_status,
         (o_orderkey % 7 = 0) AS deleted,
         (o_orderkey % 21 = 0) AS resurrected
  FROM orders
)
SELECT k AS o_orderkey,
       round(CASE WHEN resurrected THEN 1.0
                  WHEN deleted THEN NULL
                  WHEN p_price THEN oprice + 5
                  WHEN in_base THEN oprice END, 2) AS price,
       CASE WHEN deleted AND NOT resurrected THEN NULL
            WHEN resurrected THEN NULL
            WHEN p_status THEN 'X'
            WHEN in_base THEN ostatus END AS status
FROM s
WHERE (in_base AND NOT deleted)
   OR (NOT deleted AND (p_price OR p_status))
   OR resurrected
"""


def q_cdc_tx_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transaction-aligned epoch assignment (`sources/transactions.py`):
    pack source transactions into ~target-size epochs in commit order
    without ever splitting one. The engine runs the distributed two-pass
    prefix sum (range partition → partition sums → offsets); the DuckDB
    twin uses a plain global window cumsum — same math, different
    execution, equal epochs."""
    from data_pipeline_spark.sources.transactions import align_epochs

    ch = _t(spark, sf_dir, "events").select(
        F.floor(F.col("event_id") / 20).cast("bigint").alias("tx_id"),
        F.col("event_id").cast("bigint").alias("lsn"),
    )
    out = align_epochs(ch, target_events=500, num_partitions=8)
    return out.groupBy("epoch").agg(
        F.countDistinct("tx_id").alias("n_tx"),
        F.count("*").alias("n_events"),
        F.max("lsn").alias("hi_commit"),
    )


_SQL_TX_ALIGN = """
WITH tx AS (
  SELECT event_id // 20 AS tx_id, count(*) AS n, max(event_id) AS commit_lsn
  FROM events GROUP BY 1
), ordered AS (
  SELECT tx_id, n, commit_lsn,
         sum(n) OVER (ORDER BY commit_lsn, tx_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n
           AS start
  FROM tx
)
SELECT CAST(floor(start / 500) AS int) AS epoch,
       count(*) AS n_tx, CAST(sum(n) AS BIGINT) AS n_events, max(commit_lsn) AS hi_commit
FROM ordered GROUP BY 1
"""


def q_merge_into_generic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic declarative MERGE (Delta/Iceberg `MERGE INTO` surface,
    `lake/merge.py::MergeBuilder`): all four clause families — matched
    DELETE, matched UPDATE, not-matched INSERT, not-matched-BY-SOURCE
    UPDATE — compiled to ONE full-outer equi-join plan with
    first-match-wins CASE branches (no per-clause passes, no second
    shuffle). The reference only ships the hard-wired LWW upsert; this is
    the general form its lake users would reach for."""
    from data_pipeline_spark.lake.merge import merge_frames

    t = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_name", "c_acctbal", "c_mktsegment"
    )
    base = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count(F.lit(1)).alias("order_cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("spend"),
        )
    )
    newbies = base.where(F.col("custkey") % 7 == 0).select(
        (F.col("custkey") + F.lit(1000000)).alias("custkey"), "order_cnt", "spend"
    )
    src = base.unionByName(newbies)
    return (
        merge_frames(t, src, on=["custkey"])
        .when_matched_delete(condition="s.order_cnt > 24")
        .when_matched_update(
            set={
                "c_acctbal": "round(t.c_acctbal + s.spend / 1000, 2)",
                "c_mktsegment": "'ACTIVE'",
            }
        )
        .when_not_matched_insert(
            values={
                "custkey": "s.custkey",
                "c_name": "concat('new#', cast(s.custkey as string))",
                "c_acctbal": "round(s.spend / 100, 2)",
                "c_mktsegment": "'NEW'",
            }
        )
        .when_not_matched_by_source_update(
            set={"c_mktsegment": "'DORMANT'"}, condition="t.c_acctbal < 0"
        )
        .plan()
    )


_SQL_MERGE_INTO = """
WITH base AS (
  SELECT o_custkey AS custkey, count(*) AS order_cnt,
         round(sum(o_totalprice), 2) AS spend
  FROM orders GROUP BY o_custkey
), src AS (
  SELECT * FROM base
  UNION ALL
  SELECT custkey + 1000000, order_cnt, spend FROM base WHERE custkey % 7 = 0
), t AS (
  SELECT c_custkey AS custkey, c_name, c_acctbal, c_mktsegment FROM customer
), j AS (
  SELECT t.custkey AS t_key, t.c_name, t.c_acctbal, t.c_mktsegment,
         s.custkey AS s_key, s.order_cnt, s.spend
  FROM t FULL OUTER JOIN src s ON t.custkey = s.custkey
)
SELECT
  COALESCE(t_key, s_key) AS custkey,
  CASE WHEN t_key IS NOT NULL AND s_key IS NOT NULL THEN c_name
       ELSE concat('new#', CAST(s_key AS VARCHAR)) END AS c_name,
  CASE WHEN t_key IS NOT NULL AND s_key IS NOT NULL
         THEN round(c_acctbal + spend / 1000, 2)
       WHEN t_key IS NULL THEN round(spend / 100, 2)
       ELSE c_acctbal END AS c_acctbal,
  CASE WHEN t_key IS NOT NULL AND s_key IS NOT NULL THEN 'ACTIVE'
       WHEN t_key IS NULL THEN 'NEW'
       WHEN c_acctbal < 0 THEN 'DORMANT'
       ELSE c_mktsegment END AS c_mktsegment
FROM j
WHERE NOT (t_key IS NOT NULL AND s_key IS NOT NULL AND order_cnt > 24)
"""


# ---------------------------------------------------------------------------
# CDC history + observability (round 3): SCD2 derivation, point-in-time
# lookup, sequence-gap / redelivery audit, hot-key skew evidence, freshness
# (operators/scd.py, operators/flowstats.py)
# ---------------------------------------------------------------------------

def q_cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 version intervals from the change log: one keyed shuffle
    (lag-change-detect → filter to version starts → lead close), no
    self-join; consecutive no-op updates collapse into the open interval."""
    from data_pipeline_spark.operators.scd import scd2_history

    ev = _t(spark, sf_dir, "events")
    return scd2_history(
        ev.select("user_id", "event_id", "ts", "event_type"),
        key_cols=("user_id",),
        order_cols=("ts", "event_id"),
        tracked_cols=("event_type",),
    )


_SQL_SCD2_HISTORY = """
WITH ordered AS (
  SELECT user_id, event_id, ts, event_type,
         lag(event_type) OVER w AS prev_type,
         lag(1) OVER w AS prev_flag
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), starts AS (
  SELECT user_id, event_id, ts, event_type FROM ordered
  WHERE prev_flag IS NULL OR prev_type IS DISTINCT FROM event_type
)
SELECT user_id, event_type, ts AS valid_from,
       lead(ts) OVER w2 AS valid_to,
       CAST(row_number() OVER w2 AS BIGINT) AS version,
       (lead(1) OVER w2 IS NULL) AS is_current
FROM starts
WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_cdc_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup against the SCD2 history (asof composition —
    single-shuffle union+window, no range-join explosion): every 17th
    event asks 'what was this user's tracked type when I happened?'."""
    from data_pipeline_spark.operators.scd import scd2_history, scd2_lookup

    ev = _t(spark, sf_dir, "events")
    hist = scd2_history(
        ev.select("user_id", "event_id", "ts", "event_type"),
        key_cols=("user_id",),
        order_cols=("ts", "event_id"),
        tracked_cols=("event_type",),
    ).withColumnRenamed("event_type", "type_at_ts")
    probes = ev.where(F.col("event_id") % 17 == 0).select(
        "user_id", "event_id", "ts"
    )
    return scd2_lookup(
        hist, probes, key_cols=("user_id",), probe_ts="ts",
        value_cols=("type_at_ts",),
    )


_SQL_SCD2_LOOKUP = """
WITH ordered AS (
  SELECT user_id, event_id, ts, event_type,
         lag(event_type) OVER w AS prev_type,
         lag(1) OVER w AS prev_flag
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), hist AS (
  SELECT user_id, ts AS valid_from, event_type AS type_at_ts FROM ordered
  WHERE prev_flag IS NULL OR prev_type IS DISTINCT FROM event_type
), probes AS (
  SELECT user_id, event_id, ts FROM events WHERE event_id % 17 = 0
)
SELECT p.user_id, p.event_id, p.ts, h.type_at_ts
FROM probes p ASOF LEFT JOIN hist h
  ON p.user_id = h.user_id AND p.ts >= h.valid_from
"""


def _sequenced_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → a partitioned, sequenced wire stream with KNOWN defects:
    4 stream partitions, dense per-partition seq = event_id div 4; every
    13th event dropped (isolated holes) plus an 8-wide burst hole per 100
    (multi-seq gaps) — the shapes a real binlog tail shows after loss."""
    ev = _t(spark, sf_dir, "events")
    kept = ev.where(
        (F.col("event_id") % 13 != 0) & ~(F.col("event_id") % 100).between(40, 47)
    )
    return kept.select(
        (F.col("event_id") % 4).alias("part"),
        F.expr("CAST(event_id DIV 4 AS BIGINT)").alias("seq"),
        "event_id",
    )


_SQL_SEQ_STREAM = """
  SELECT event_id % 4 AS part, event_id // 4 AS seq, event_id
  FROM events
  WHERE event_id % 13 <> 0 AND NOT (event_id % 100 BETWEEN 40 AND 47)
"""


def q_cdc_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-partition sequence-gap intervals (diagnostic window path):
    every hole in the wire stream as (part, gap_from, gap_to, n_missing)."""
    from data_pipeline_spark.operators.flowstats import sequence_gap_intervals

    return sequence_gap_intervals(
        _sequenced_stream(spark, sf_dir), ("part",), "seq"
    )


_SQL_GAP_AUDIT = f"""
WITH stream AS ({_SQL_SEQ_STREAM}),
lagged AS (
  SELECT part, seq, lag(seq) OVER (PARTITION BY part ORDER BY seq) AS prev
  FROM stream
)
SELECT part, prev + 1 AS gap_from, seq - 1 AS gap_to, seq - prev - 1 AS n_missing
FROM lagged WHERE prev IS NOT NULL AND seq - prev > 1
"""


def q_cdc_seq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path contiguity summary — ONE map-side-combinable hash agg per
    stream partition (no sort/window): rows, distinct, bounds, holes,
    duplicates. Redelivered events (every 97th, re-appended) must show up
    as duplicates; the dropped ranges as missing."""
    from data_pipeline_spark.operators.flowstats import sequence_audit

    stream = _sequenced_stream(spark, sf_dir)
    redelivered = stream.where(F.col("event_id") % 97 == 0)
    return sequence_audit(
        stream.unionByName(redelivered), ("part",), "seq"
    )


_SQL_SEQ_AUDIT = f"""
WITH base AS ({_SQL_SEQ_STREAM}),
stream AS (
  SELECT * FROM base
  UNION ALL
  SELECT * FROM base WHERE event_id % 97 = 0
)
SELECT part,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT seq) AS BIGINT) AS n_distinct,
       min(seq) AS min_seq,
       max(seq) AS max_seq,
       CAST(coalesce(max(seq) - min(seq) + 1 - count(DISTINCT seq), 0) AS BIGINT) AS n_missing,
       CAST(count(seq) - count(DISTINCT seq) AS BIGINT) AS n_duplicates,
       CAST(count(*) - count(seq) AS BIGINT) AS n_null_seq
FROM stream GROUP BY part
"""


def q_cdc_hot_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key skew evidence: top-100 keys by change count with share of
    the whole stream — hash agg + broadcast total + TakeOrderedAndProject
    (no global sort); feeds the salted-write path."""
    from data_pipeline_spark.operators.flowstats import hot_keys

    ev = _t(spark, sf_dir, "events")
    return hot_keys(ev, ("user_id",), top_k=100)


_SQL_HOT_KEYS = """
WITH counts AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_changes FROM events GROUP BY 1
), total AS (SELECT CAST(count(*) AS BIGINT) AS t FROM events)
SELECT user_id, n_changes, round(n_changes / t, 6) AS share
FROM counts, total
ORDER BY n_changes DESC, user_id
LIMIT 100
"""


def q_cdc_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type freshness vs the stream high-water mark (1-row aggregate
    broadcast back, never a global window); exact integer microsecond lag
    so the oracle hash is float-free."""
    from data_pipeline_spark.operators.flowstats import freshness_report

    ev = _t(spark, sf_dir, "events")
    return freshness_report(ev, ("event_type",), "ts").select(
        "event_type", "n_events", "latest_ts", "staleness_us"
    )


_SQL_FRESHNESS = """
WITH per_group AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
         max(ts) AS latest_ts
  FROM events GROUP BY 1
), hwm AS (SELECT max(ts) AS h FROM events)
SELECT event_type, n_events, latest_ts,
       CAST(epoch_us(h) - epoch_us(latest_ts) AS BIGINT) AS staleness_us
FROM per_group, hwm
"""


def q_cdc_disorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time disorder profile per stream partition — the lateness
    distribution a Structured Streaming watermark must cover (running
    event-time high-water mark in arrival order minus own event time;
    one bounded per-partition window + one hash agg). Percentiles are
    EXACT (linear interpolation), value-identical to DuckDB's
    quantile_cont, so the oracle hashes real numbers, not approx."""
    from data_pipeline_spark.operators.flowstats import disorder_report

    ev = _t(spark, sf_dir, "events").select(
        (F.col("event_id") % 4).alias("part"), "event_id", "ts"
    )
    return disorder_report(ev, ("part",), "event_id", "ts")


_SQL_DISORDER = """
WITH stream AS (
  SELECT event_id % 4 AS part, event_id, ts FROM events
),
scored AS (
  SELECT part,
         epoch_us(max(ts) OVER (PARTITION BY part ORDER BY event_id
                                ROWS UNBOUNDED PRECEDING)) - epoch_us(ts)
           AS late_us
  FROM stream
)
SELECT part,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       round(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) / count(*), 6)
         AS late_frac,
       max(late_us) AS max_late_us,
       round(quantile_cont(late_us, 0.5), 3) AS p50_late_us,
       round(quantile_cont(late_us, 0.95), 3) AS p95_late_us,
       round(quantile_cont(late_us, 0.99), 3) AS p99_late_us
FROM scored GROUP BY part
"""


def _orders_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → a parent change stream: every key inserted (lsn 1), every
    5th updated (lsn 2), every 19th deleted (lsn 3)."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("pk"),
        F.round("o_totalprice", 2).alias("price"),
    )
    ins = o.select("pk", F.lit(1).alias("lsn"), F.lit("insert").alias("op"))
    upd = o.where(F.col("pk") % 5 == 0).select(
        "pk", F.lit(2).alias("lsn"), F.lit("update").alias("op")
    )
    dele = o.where(F.col("pk") % 19 == 0).select(
        "pk", F.lit(3).alias("lsn"), F.lit("delete").alias("op")
    )
    return ins.unionByName(upd).unionByName(dele)


_SQL_ORDERS_STREAM = """
  SELECT o_orderkey AS pk, 1 AS lsn, 'insert' AS op FROM orders
  UNION ALL
  SELECT o_orderkey, 2, 'update' FROM orders WHERE o_orderkey % 5 = 0
  UNION ALL
  SELECT o_orderkey, 3, 'delete' FROM orders WHERE o_orderkey % 19 = 0
"""


def q_cdc_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit after replay (operators/refint.py):
    surviving lineitem children whose LWW foreign key points at a
    deleted order (reason parent_deleted) or at a key no parent event
    ever carried (parent_missing — every 31st child's fk is re-pointed
    to pk+1, usually a hole in the sparse TPC-H keyspace). Two max_by
    hash aggs + ONE fk equi-join; report bounded by violations."""
    from data_pipeline_spark.operators.refint import orphan_audit

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ck1"),
        F.col("l_linenumber").alias("ck2"),
    )
    ins = li.select(
        "ck1", "ck2", F.col("ck1").alias("fk"),
        F.lit(1).alias("lsn"), F.lit("insert").alias("op"),
    )
    repoint = li.where(F.col("ck1") % 31 == 0).select(
        "ck1", "ck2", (F.col("ck1") + 1).alias("fk"),
        F.lit(2).alias("lsn"), F.lit("update").alias("op"),
    )
    dele = li.where(F.col("ck1") % 23 == 0).select(
        "ck1", "ck2", F.col("ck1").alias("fk"),
        F.lit(3).alias("lsn"), F.lit("delete").alias("op"),
    )
    children = ins.unionByName(repoint).unionByName(dele)
    return orphan_audit(
        children,
        _orders_stream(spark, sf_dir),
        ("ck1", "ck2"),
        fk_col="fk",
        parent_key_col="pk",
    )


_SQL_ORPHANS = f"""
WITH parents AS ({_SQL_ORDERS_STREAM}),
children AS (
  SELECT l_orderkey AS ck1, l_linenumber AS ck2, l_orderkey AS fk,
         1 AS lsn, 'insert' AS op FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, l_orderkey + 1, 2, 'update'
  FROM lineitem WHERE l_orderkey % 31 = 0
  UNION ALL
  SELECT l_orderkey, l_linenumber, l_orderkey, 3, 'delete'
  FROM lineitem WHERE l_orderkey % 23 = 0
),
kid_final AS (
  SELECT ck1, ck2, max_by(op, lsn) AS final_op, max_by(fk, lsn) AS fk
  FROM children GROUP BY ck1, ck2
),
par_final AS (
  SELECT pk, max_by(op, lsn) AS final_op FROM parents GROUP BY pk
)
SELECT k.ck1, k.ck2, k.fk,
       CASE WHEN p.pk IS NULL THEN 'parent_missing'
            WHEN p.final_op = 'delete' THEN 'parent_deleted' END AS reason
FROM kid_final k LEFT JOIN par_final p ON k.fk = p.pk
WHERE k.final_op <> 'delete'
  AND (p.pk IS NULL OR p.final_op = 'delete')
"""


def q_cdc_conflicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-writer conflict audit (operators/refint.py): two writers race
    on the orders keyspace with overlapping sequence ranges; per
    contended key the report says whether their individual final states
    truly disagree and which version wins under LWW-by-(seq, lowest
    writer id). One union + two hash aggs + one key join — the stream
    never self-joins."""
    from data_pipeline_spark.operators.refint import conflict_audit

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("pk"),
        F.round("o_totalprice", 2).alias("price"),
    )
    a = o.select(
        "pk",
        (F.lit(10) + F.col("pk") % 3).cast("long").alias("lsn"),
        F.lit("update").alias("op"),
        "price",
    )
    b = o.where(F.col("pk") % 2 == 0).select(
        "pk",
        (F.lit(9) + F.col("pk") % 5).cast("long").alias("lsn"),
        F.when(F.col("pk") % 7 == 0, F.lit("delete"))
        .otherwise(F.lit("update"))
        .alias("op"),
        F.when(F.col("pk") % 3 == 0, F.round(F.col("price") + 5, 2))
        .otherwise(F.col("price"))
        .alias("price"),
    )
    return conflict_audit(
        [(1, a), (2, b)], ("pk",), "lsn", "op", ("price",)
    )


_SQL_CONFLICTS = """
WITH a AS (
  SELECT o_orderkey AS pk, 1 AS w, CAST(10 + o_orderkey % 3 AS BIGINT) AS lsn,
         'update' AS op, round(o_totalprice, 2) AS price
  FROM orders
),
b AS (
  SELECT o_orderkey AS pk, 2 AS w, CAST(9 + o_orderkey % 5 AS BIGINT) AS lsn,
         CASE WHEN o_orderkey % 7 = 0 THEN 'delete' ELSE 'update' END AS op,
         CASE WHEN o_orderkey % 3 = 0 THEN round(round(o_totalprice, 2) + 5, 2)
              ELSE round(o_totalprice, 2) END AS price
  FROM orders WHERE o_orderkey % 2 = 0
),
u AS (SELECT * FROM a UNION ALL SELECT * FROM b),
per_writer AS (
  SELECT pk, w,
         max_by(op || '#' || CAST(price AS VARCHAR), lsn) AS image
  FROM u GROUP BY pk, w
),
facts AS (
  SELECT pk, CAST(count(*) AS BIGINT) AS n_writers,
         count(DISTINCT image) > 1 AS is_conflict
  FROM per_writer GROUP BY pk
),
resolved AS (
  -- composite numeric rank: higher lsn wins, ties to the LOWEST writer id
  -- (lsn * 10 - w is strictly monotone in (lsn, -w) for w in {1,2})
  SELECT pk,
         max_by(w, lsn * 10 - w) AS winner_writer,
         max_by(lsn, lsn * 10 - w) AS winner_seq,
         max_by(op, lsn * 10 - w) AS final_op,
         max_by(price, lsn * 10 - w) AS price
  FROM u GROUP BY pk
)
SELECT f.pk, f.n_writers, f.is_conflict,
       r.winner_writer, r.winner_seq, r.final_op, r.price
FROM facts f JOIN resolved r USING (pk)
WHERE f.n_writers > 1
"""


def q_cdc_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity burst detection (operators/flowstats.py::burst_report):
    hourly counts on a DENSIFIED per-entity window spine, z-score vs the
    trailing-24h sample stddev, null-z (never burst) under thin or flat
    baselines. One windowed count + spine explode + one keyed window."""
    from data_pipeline_spark.operators.flowstats import burst_report

    ev = _t(spark, sf_dir, "events")
    return burst_report(
        ev, ("event_type",), "ts", window="1 hour", trailing=24,
        z_threshold=2.0, min_count=5,
    )


_SQL_BURSTS = """
WITH counts AS (
  SELECT event_type, date_trunc('hour', ts) AS window_start,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
spans AS (
  SELECT event_type, min(window_start) AS lo, max(window_start) AS hi
  FROM counts GROUP BY 1
),
spine AS (
  SELECT event_type,
         unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS window_start
  FROM spans
),
dense AS (
  SELECT s.event_type, s.window_start,
         CAST(coalesce(c.n, 0) AS BIGINT) AS n
  FROM spine s LEFT JOIN counts c USING (event_type, window_start)
),
stats AS (
  SELECT event_type, window_start, n,
         avg(n) OVER wt AS m, stddev_samp(n) OVER wt AS sd
  FROM dense
  WINDOW wt AS (PARTITION BY event_type ORDER BY window_start
                ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, window_start, n,
       round(m, 4) AS baseline_mean,
       round(sd, 4) AS baseline_std,
       round(CASE WHEN sd > 0 THEN (n - m) / sd END, 4) AS zscore,
       (coalesce(CASE WHEN sd > 0 THEN (n - m) / sd END >= 2.0, false)
        AND n >= 5) AS is_burst
FROM stats
"""


def q_warc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC round trip as a contract (sources/warc.py): documents become a
    deterministic Common-Crawl-style ``.warc.gz`` segment (per-record gzip
    members, HTTP response blocks), then the full parser recovers every
    record and its payload digest. The oracle recomputes the invariants —
    byte length and sha256 of the payload — directly in SQL, so any drift
    anywhere in the encode → compress → split → HTTP-strip → digest chain
    hash-mismatches. Arrow-batched mapInPandas, partition-preserving: at
    100 TB this is one narrow map over segment-sized batches, no shuffle."""
    import pandas as pd

    from data_pipeline_spark.sources.warc import iter_records, segment_bytes

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    cols = ["doc_id", "url", "http_status", "content_len", "payload_sha256"]

    def roundtrip(batches):
        from datetime import datetime as _dt

        for pdf in batches:
            pages = [
                (
                    f"https://example.com/doc/{int(d)}",
                    _dt.utcfromtimestamp(1_700_000_000 + int(d) % 86_400),
                    str(t).encode("utf-8"),
                )
                for d, t in zip(pdf["doc_id"], pdf["text"])
            ]
            rows = [
                {
                    "doc_id": int(r["url"].rsplit("/", 1)[-1]),
                    "url": r["url"],
                    "http_status": r["http_status"],
                    "content_len": len(bytes(r["html"])),
                    "payload_sha256": r["payload_digest"],
                }
                for r in iter_records(segment_bytes(pages), "mem.warc.gz")
            ]
            out = pd.DataFrame(rows, columns=cols)
            if not len(out):
                out = out.astype(
                    {"doc_id": "int64", "http_status": "int32", "content_len": "int64"}
                )
            yield out

    return docs.mapInPandas(
        roundtrip,
        schema="doc_id bigint, url string, http_status int, "
        "content_len bigint, payload_sha256 string",
    )


_SQL_WARC_INGEST = """
SELECT doc_id,
       'https://example.com/doc/' || CAST(doc_id AS VARCHAR) AS url,
       200 AS http_status,
       CAST(strlen(text) AS BIGINT) AS content_len,
       sha256(text) AS payload_sha256
FROM documents
"""


def _event_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → synthetic CDC change log: op by event_type, key=user_id."""
    ev = _t(spark, sf_dir, "events")
    op = (
        F.when(F.col("event_type") == "signup", F.lit("insert"))
        .when(F.col("event_type") == "error", F.lit("delete"))
        .otherwise(F.lit("update"))
    )
    return ev.select(
        op.alias("op"),
        F.col("user_id").alias("key"),
        F.col("ts").alias("warc_ts"),
        F.col("event_id").alias("lsn"),
        "event_type",
        F.round("value", 6).alias("value"),
    )


def q_cdc_replay_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: change-event tail → per-key (warc_ts, lsn) LWW → final
    state (delete winners drop their key) — the engine's replay semantics
    as one declarative plan (merge/commit machinery is pytest-verified)."""
    log = _event_changelog(spark, sf_dir)
    latest = lww_dedup(log, key_cols=("key",), order_cols=("warc_ts", "lsn"))
    return latest.where(F.col("op") != "delete").select(
        "key", "op", "warc_ts", "lsn", "event_type", "value"
    )


_SQL_REPLAY_FINAL = """
WITH log AS (
  SELECT CASE WHEN event_type = 'signup' THEN 'insert'
              WHEN event_type = 'error' THEN 'delete'
              ELSE 'update' END AS op,
         user_id AS key, ts AS warc_ts, event_id AS lsn,
         event_type, round(value, 6) AS value
  FROM events
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY key ORDER BY warc_ts DESC, lsn DESC) AS rn
  FROM log
)
SELECT key, op, warc_ts, lsn, event_type, value
FROM ranked WHERE rn = 1 AND op <> 'delete'
"""


# ---------------------------------------------------------------------------
# Aggregations / joins / windows (A1-A8, D4)
# ---------------------------------------------------------------------------

def q_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: shipdate predicate (pushed to the parquet scan —
    pinned by tests/test_plans.py) + map-side-combinable aggregation."""
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp")
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").cast("long").alias("count_order"),
        )
    )


_SQL_Q1 = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_discount), 6) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_q3_top_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-table join + agg + deterministic top-10 (broadcastable dims)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "c_mktsegment")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


_SQL_Q3 = """
SELECT o_orderkey, o_orderdate, c_mktsegment,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY o_orderkey, o_orderdate, c_mktsegment
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


def q_top_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: value-frequency top-k with deterministic tie-break."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("event_type"))
        .limit(10)
    )


_SQL_TOP_EVENT_TYPES = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY event_type ORDER BY n DESC, event_type ASC LIMIT 10
"""


def q_brand_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: min/max/avg stats per group."""
    p = _t(spark, sf_dir, "part")
    return p.groupBy("p_brand").agg(
        F.round(F.min("p_retailprice"), 2).alias("min_price"),
        F.round(F.max("p_retailprice"), 2).alias("max_price"),
        F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
        F.count("*").cast("long").alias("n_parts"),
    )


_SQL_BRAND_STATS = """
SELECT p_brand, round(min(p_retailprice), 2) AS min_price,
       round(max(p_retailprice), 2) AS max_price,
       round(avg(p_retailprice), 4) AS avg_price,
       CAST(count(*) AS BIGINT) AS n_parts
FROM part GROUP BY p_brand
"""


def q_nation_supplier_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4: dimension enrichment via broadcast joins through 2 hops."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").cast("long").alias("n_suppliers"),
            F.round(F.avg("s_acctbal"), 4).alias("avg_acctbal"),
        )
    )


_SQL_NATION_ROLLUP = """
SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n_suppliers,
       round(avg(s_acctbal), 4) AS avg_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


def q_null_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: per-column null counts / completeness (nulls synthesized
    deterministically so the check is non-trivial)."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "value", F.when(F.col("event_type") == "error", F.lit(None)).otherwise(F.col("value"))
    )
    total = F.count("*").cast("long")
    return ev.agg(
        total.alias("total"),
        F.sum(F.col("value").isNull().cast("long")).cast("long").alias("value_nulls"),
        F.sum(F.col("props").isNull().cast("long")).cast("long").alias("props_nulls"),
        F.round(
            F.lit(100.0) * (total - F.sum(F.col("value").isNull().cast("long"))) / total, 4
        ).alias("value_complete_pct"),
    )


_SQL_NULLS = """
WITH ev AS (
  SELECT CASE WHEN event_type = 'error' THEN NULL ELSE value END AS value, props
  FROM events
)
SELECT CAST(count(*) AS BIGINT) AS total,
       CAST(count(*) FILTER (value IS NULL) AS BIGINT) AS value_nulls,
       CAST(count(*) FILTER (props IS NULL) AS BIGINT) AS props_nulls,
       round(100.0 * (count(*) - count(*) FILTER (value IS NULL)) / count(*), 4)
         AS value_complete_pct
FROM ev
"""


def q_events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8-style time rollup: per-hour event counts + value sums."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


_SQL_HOURLY = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_events_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-family: multi-level aggregation in ONE pass — ROLLUP grouping sets
    (detail → per-day subtotal → grand total) expand inside a single
    map-side-combinable hash aggregate instead of three scans + union.
    grouping_id distinguishes subtotal levels (a genuinely-NULL group value
    could not; both engines use the same MSB-first bitmask)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("day", F.to_date("ts"))
        .rollup("day", "event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.grouping_id().cast("long").alias("gid"),
        )
    )


_SQL_ROLLUP_CUBE = """
SELECT CAST(ts AS DATE) AS day, event_type,
       CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS sum_value,
       CAST(grouping(CAST(ts AS DATE), event_type) AS BIGINT) AS gid
FROM events GROUP BY ROLLUP (CAST(ts AS DATE), event_type)
"""


def q_events_user_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct reach per event_type — Spark plans count(distinct) as
    a two-phase expand + partial agg (dedup shuffles on (group, user), not
    on group alone, so one hot event_type cannot skew a single reducer).
    The HLL++ sketch (approx_count_distinct) is the 10^10-row scale path —
    error bound vs this exact query pinned in tests/test_plans.py."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("long").alias("n_users"),
        F.count("*").cast("long").alias("n_events"),
    )


_SQL_USER_REACH = """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY 1
"""


def q_events_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group percentiles (linear interpolation — bit-identical to
    DuckDB's quantile_cont). Exact percentile buffers a group's values, so
    the 10^10-row path is approx_percentile (Greenwald-Khanna sketch,
    map-side mergeable, bounded memory) — relative-error pinned against
    this exact query in tests/test_plans.py."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.expr("percentile(value, array(0.5, 0.9, 0.99))").alias("_q"),
            F.count("*").cast("long").alias("n"),
        )
        .select(
            "event_type",
            F.round(F.col("_q")[0], 6).alias("p50"),
            F.round(F.col("_q")[1], 6).alias("p90"),
            F.round(F.col("_q")[2], 6).alias("p99"),
            "n",
        )
    )


_SQL_VALUE_QUANTILES = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.9), 6) AS p90,
       round(quantile_cont(value, 0.99), 6) AS p99,
       CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY 1
"""


def q_events_asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (single-shuffle union+window plan, no range-join
    explosion): each event gains the dim value of the user's latest signup
    at-or-before the event's timestamp; DuckDB's native ASOF LEFT JOIN is
    the oracle twin."""
    from data_pipeline_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    versions = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max_by(F.round("value", 6), "event_id").alias("dim_value"))
    )
    left = ev.select("event_id", "user_id", "ts")
    return asof_join(
        left, versions, key_cols=("user_id",), left_ts="ts", right_ts="ts",
        value_cols=("dim_value",),
    )


_SQL_ASOF = """
WITH versions AS (
  SELECT user_id, ts, max_by(round(value, 6), event_id) AS dim_value
  FROM events WHERE event_type = 'signup' GROUP BY user_id, ts
)
SELECT e.event_id, e.user_id, e.ts, v.dim_value
FROM events e ASOF LEFT JOIN versions v
  ON e.user_id = v.user_id AND e.ts >= v.ts
"""


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time sessionization (30-min gap) + per-session rollup — the
    gaps-and-islands plan: one keyed shuffle, no self-join."""
    from data_pipeline_spark.operators.asof import session_stats

    ev = _t(spark, sf_dir, "events")
    return session_stats(
        ev, key_cols=("user_id",), ts_col="ts", gap_seconds=1800,
        order_tiebreak=("event_id",),
    )


_SQL_SESSIONIZE = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NOT NULL
                   AND epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_idx
  FROM flagged
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       CAST(count(*) AS BIGINT) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end,
       CAST((epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS BIGINT)
         AS duration_sec
FROM sessions GROUP BY user_id, session_idx
"""


def q_events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join on the bucketized equi-join scale path (points hash to
    one grid bucket, ranges explode over theirs — no nested-loop join):
    events inside the 2-hour window opened by each signup of the same
    user; oracle is the plain inequality join."""
    from data_pipeline_spark.operators.asof import range_join

    ev = _t(spark, sf_dir, "events")
    windows = ev.where(F.col("event_type") == "signup").select(
        F.col("user_id"),
        F.col("event_id").alias("window_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("w_end"),
    )
    points = ev.select("user_id", "event_id", "ts")
    out = range_join(
        points, windows, point_ts="ts", start_ts="w_start", end_ts="w_end",
        key_cols=("user_id",), bucket_seconds=7200,
    )
    return out.select("user_id", "event_id", "window_id", "ts")


_SQL_RANGE_JOIN = """
WITH windows AS (
  SELECT user_id, event_id AS window_id, ts AS w_start,
         ts + INTERVAL 2 HOUR AS w_end
  FROM events WHERE event_type = 'signup'
)
SELECT e.user_id, e.event_id, w.window_id, e.ts
FROM events e JOIN windows w
  ON e.user_id = w.user_id AND e.ts >= w.w_start AND e.ts <= w.w_end
"""


def q_events_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window: per-user running total ordered by (ts, event_id)."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.sum("value").over(w), 4).alias("running_value"),
    )


_SQL_RUNNING = """
SELECT event_id, user_id, ts,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
         AS running_value
FROM events
"""


# ---------------------------------------------------------------------------
# Normalization family (N1-N5) + classification (C1-C6) + flatten (P3-P12)
# ---------------------------------------------------------------------------

def _price_str_cols():
    """Deterministic price-string construction shared by Spark + SQL."""
    cents = F.floor(F.col("p_retailprice") * 100 + F.lit(0.5)).cast("long")
    int_part = F.floor(cents / 100).cast("long")
    frac = F.lpad((cents % 100).cast("string"), 2, "0")
    with_comma = F.concat(
        F.floor(int_part / 1000).cast("string"),
        F.lit(","),
        F.lpad((int_part % 1000).cast("string"), 3, "0"),
    )
    int_str = F.when(
        (F.col("p_partkey") % 2 == 0) & (int_part >= 1000), with_comma
    ).otherwise(int_part.cast("string"))
    return F.concat(F.lit("$"), int_str, F.lit("."), frac)


def q_normalize_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N1: '$1,234.56' → 1234.56 (strip $/commas, cast)."""
    p = _t(spark, sf_dir, "part")
    df = p.select("p_partkey", _price_str_cols().alias("price_str"))
    return df.withColumn("price", N.normalize_price(F.col("price_str")))


_SQL_NORM_PRICES = """
WITH base AS (
  SELECT p_partkey,
         CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS cents,
         p_retailprice
  FROM part
), built AS (
  SELECT p_partkey,
         '$' ||
         CASE WHEN p_partkey % 2 = 0 AND cents // 100 >= 1000
              THEN (cents // 100 // 1000)::VARCHAR || ',' ||
                   lpad((cents // 100 % 1000)::VARCHAR, 3, '0')
              ELSE (cents // 100)::VARCHAR END ||
         '.' || lpad((cents % 100)::VARCHAR, 2, '0') AS price_str
  FROM base
)
SELECT p_partkey, price_str,
       CASE WHEN regexp_matches(trim(regexp_replace(price_str, '[$,]', '', 'g')),
                                '^-?\\d+(\\.\\d+)?$')
            THEN CAST(trim(regexp_replace(price_str, '[$,]', '', 'g')) AS DOUBLE)
       END AS price
FROM built
"""


def q_parse_discounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4: '40% off' / 'discount 12 percent' → 40.0 / 12.0."""
    p = _t(spark, sf_dir, "part")
    disc_str = (
        F.when(F.col("p_partkey") % 3 == 0, F.concat(F.col("p_size").cast("string"), F.lit("% off")))
        .when(
            F.col("p_partkey") % 3 == 1,
            F.concat(F.lit("discount "), F.col("p_size").cast("string"), F.lit(" percent")),
        )
        .otherwise(F.concat(F.col("p_size").cast("string"), F.lit(".5% OFF")))
    )
    df = p.select("p_partkey", disc_str.alias("disc_str"))
    return df.withColumn("discount", N.parse_discount(F.col("disc_str")))


_SQL_PARSE_DISC = """
WITH built AS (
  SELECT p_partkey,
         CASE WHEN p_partkey % 3 = 0 THEN p_size::VARCHAR || '% off'
              WHEN p_partkey % 3 = 1 THEN 'discount ' || p_size::VARCHAR || ' percent'
              ELSE p_size::VARCHAR || '.5% OFF' END AS disc_str
  FROM part
), cleaned AS (
  SELECT p_partkey, disc_str,
         trim(replace(replace(replace(replace(replace(lower(disc_str),
              '%', ''), 'percent', ''), 'off', ''), 'discount', ''), 'sale', '')) AS c
  FROM built
)
SELECT p_partkey, disc_str,
       CASE WHEN regexp_extract(c, '(\\d+(?:\\.\\d+)?)', 1) <> ''
            THEN CAST(regexp_extract(c, '(\\d+(?:\\.\\d+)?)', 1) AS DOUBLE)
       END AS discount
FROM cleaned
"""


def q_derive_discounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5: derived discount pct from (cost, mrp) when no explicit value."""
    li = _t(spark, sf_dir, "lineitem")
    cost = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2)
    mrp = F.round(F.col("l_extendedprice"), 2)
    df = li.select(
        "l_orderkey",
        "l_linenumber",
        cost.alias("cost_price"),
        mrp.alias("mrp"),
        F.lit(None).cast("double").alias("discount"),
    )
    return df.select(
        "l_orderkey",
        "l_linenumber",
        N.derive_discount(F.col("discount"), F.col("cost_price"), F.col("mrp")).alias(
            "derived_discount"
        ),
    )


_SQL_DERIVE_DISC = """
WITH base AS (
  SELECT l_orderkey, l_linenumber,
         round(l_extendedprice * (1 - l_discount), 2) AS cost_price,
         round(l_extendedprice, 2) AS mrp
  FROM lineitem
)
SELECT l_orderkey, l_linenumber,
       CASE WHEN cost_price IS NOT NULL AND mrp IS NOT NULL
                 AND mrp > 0 AND cost_price < mrp
            THEN round((mrp - cost_price) / mrp * 100.0, 2)
            WHEN cost_price IS NOT NULL AND mrp IS NOT NULL THEN 0.0
       END AS derived_discount
FROM base
"""


def q_clean_names_units(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2: ordered first-match-wins unit extraction (Arrow pandas UDF);
    oracle derives expected output structurally from the controlled input."""
    p = _t(spark, sf_dir, "part")
    raw_name = (
        F.when(F.col("p_partkey") % 4 == 0, F.concat(F.col("p_name"), F.lit(" (500gm)")))
        .when(F.col("p_partkey") % 4 == 1, F.concat(F.col("p_name"), F.lit(" - half dozen")))
        .when(F.col("p_partkey") % 4 == 2, F.concat(F.col("p_name"), F.lit(" 3 Kg")))
        .otherwise(F.concat(F.col("p_name"), F.lit(" | mega deal")))
    )
    df = p.select("p_partkey", raw_name.alias("name"))
    return N.with_clean_name_and_units(df).select("p_partkey", "name", "units_of_mass")


_SQL_CLEAN_NAMES = """
SELECT p_partkey, lower(p_name) AS name,
       CASE WHEN p_partkey % 4 = 0 THEN '500gm'
            WHEN p_partkey % 4 = 1 THEN 'half dozen'
            WHEN p_partkey % 4 = 2 THEN '3 Kg'
            ELSE 'N/A' END AS units_of_mass
FROM part
"""


def q_field_classify_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1-C6: registry-driven canonical rename of drifting column names."""
    p = _t(spark, sf_dir, "part")
    messy = p.select(
        F.col("p_name").alias("Product Name"),
        F.col("p_brand").alias("SKU"),
        F.col("p_partkey").cast("string").alias("ProductID"),
        F.col("p_type").alias("Category-Name"),
    )
    reg = SchemaRegistry()
    return reg.map_to_canonical(messy)


_SQL_CLASSIFY = """
SELECT p_name AS name, p_brand AS sku, p_partkey::VARCHAR AS product_id,
       p_type AS category
FROM part
"""


def q_flatten_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3-P8: fallback coalesce cascade over drifting JSON payload shapes."""
    ev = _t(spark, sf_dir, "events")
    payload = (
        F.when(
            F.col("event_id") % 3 == 0,
            F.concat(F.lit('{"price": "'), F.col("event_id").cast("string"), F.lit('"}')),
        )
        .when(
            F.col("event_id") % 3 == 1,
            F.concat(F.lit('{"special_price": "'), F.col("event_id").cast("string"), F.lit('"}')),
        )
        .otherwise(
            F.concat(
                F.lit('{"discountedPrice": "'), F.col("event_id").cast("string"), F.lit('"}')
            )
        )
    )
    df = ev.select("event_id", payload.alias("payload"))
    price = F.coalesce(
        F.get_json_object("payload", "$.cost_price"),
        F.get_json_object("payload", "$.special_price"),
        F.get_json_object("payload", "$.discountedPrice"),
        F.get_json_object("payload", "$.price"),
    )
    return df.select("event_id", price.cast("double").alias("cost_price"))


_SQL_FLATTEN = """
WITH built AS (
  SELECT event_id,
         CASE WHEN event_id % 3 = 0 THEN '{"price": "' || event_id::VARCHAR || '"}'
              WHEN event_id % 3 = 1 THEN '{"special_price": "' || event_id::VARCHAR || '"}'
              ELSE '{"discountedPrice": "' || event_id::VARCHAR || '"}' END AS payload
  FROM events
)
SELECT event_id,
       CAST(coalesce(json_extract_string(payload, '$.cost_price'),
                     json_extract_string(payload, '$.special_price'),
                     json_extract_string(payload, '$.discountedPrice'),
                     json_extract_string(payload, '$.price')) AS DOUBLE) AS cost_price
FROM built
"""


def q_json_envelope_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P2: the five reference envelope shapes (root array / KraveMart
    data[] / products[] / items[] / Pandamart GraphQL with parent-name
    enrichment) exploded by the registry-spec-driven extractor, then pushed
    through the full P3-P12 flatten cascade. The registry is round-tripped
    through its JSON document first, so the extraction is driven by a
    LOADED config, not code."""
    from data_pipeline_spark.functions.parse import flatten_products

    p = _t(spark, sf_dir, "part")
    k = F.col("p_partkey")
    a = F.concat(
        F.lit('{"id":"'), k.cast("string"),
        F.lit('","name":"'), F.col("p_name"),
        F.lit('","price":"'), F.col("p_size").cast("string"), F.lit('"}'),
    )
    b = F.concat(
        F.lit('{"id":"'), (k + 1000000).cast("string"),
        F.lit('","title":"'), F.col("p_name"),
        F.lit(' b","special_price":"'), (F.col("p_size") + 7).cast("string"),
        F.lit('"}'),
    )
    payload = (
        # Leading whitespace (newline + tab) pins the whitespace-tolerant
        # root-array probe: real APIs pretty-print / prefix newlines.
        F.when(k % 5 == 0, F.concat(F.lit("\n\t ["), a, F.lit(","), b, F.lit("]")))
        .when(
            k % 5 == 1,
            F.concat(
                F.lit('{"data":[{"l2_products":['), a,
                F.lit(']},{"krave_mart_products":['), b, F.lit("]}]}"),
            ),
        )
        .when(k % 5 == 2, F.concat(F.lit('{"products":['), a, F.lit(","), b, F.lit("]}")))
        .when(k % 5 == 3, F.concat(F.lit('{"items":['), a, F.lit("]}")))
        .otherwise(
            F.concat(
                F.lit('{"data":{"categoryProductList":{"categoryProducts":'
                      '[{"name":"sec '),
                k.cast("string"),
                F.lit('","items":['), a, F.lit(","), b, F.lit("]}]}}}"),
            )
        )
    )
    df = p.select("p_partkey", payload.alias("payload"))
    # Config-driven: specs come from a registry document loaded from JSON.
    reg = SchemaRegistry.from_json(SchemaRegistry().to_json())
    prods = reg.envelope_products(df, "payload", source="pandamart",
                                  id_cols=("p_partkey",))
    return flatten_products(prods, keep_cols=("p_partkey", "prod_idx"))


_SQL_ENVELOPE = """
WITH a_rows AS (
  SELECT p_partkey, 0 AS prod_idx,
         p_size::VARCHAR AS cost_price, '' AS mrp, p_name AS name,
         'SKU_' || p_partkey::VARCHAR AS sku,
         p_partkey::VARCHAR AS product_id, '' AS sku_percent_off,
         CASE WHEN p_partkey % 5 = 4 THEN 'sec ' || p_partkey::VARCHAR
              ELSE '' END AS category_name,
         'N/A' AS units_of_mass
  FROM part
), b_rows AS (
  SELECT p_partkey, 1 AS prod_idx,
         (p_size + 7)::VARCHAR AS cost_price, '' AS mrp,
         p_name || ' b' AS name,
         'SKU_' || (p_partkey + 1000000)::VARCHAR AS sku,
         (p_partkey + 1000000)::VARCHAR AS product_id, '' AS sku_percent_off,
         CASE WHEN p_partkey % 5 = 4 THEN 'sec ' || p_partkey::VARCHAR
              ELSE '' END AS category_name,
         'N/A' AS units_of_mass
  FROM part WHERE p_partkey % 5 <> 3
)
SELECT * FROM a_rows UNION ALL SELECT * FROM b_rows
"""


# ---------------------------------------------------------------------------
# HTML extraction (H1-H8) — vectorized pandas UDFs over binary html
# ---------------------------------------------------------------------------

def q_html_extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H-family: html binary → visible text (Arrow pandas UDF). The oracle
    reconstructs the expected text from the controlled page structure."""
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") % 10 == 0)
    html = F.concat(
        F.lit("<html><body><h2>Doc "),
        F.col("doc_id").cast("string"),
        F.lit("</h2><p>"),
        F.substring("text", 1, 200),
        F.lit("</p></body></html>"),
    )
    df = d.select("doc_id", html.cast("binary").alias("html"))
    xt = extract_text_udf()
    return df.select("doc_id", xt(F.col("html")).alias("text_out"))


_SQL_EXTRACT_TEXT = """
SELECT doc_id,
       trim(regexp_replace('Doc ' || doc_id::VARCHAR || ' ' || substr(text, 1, 200),
                           '\\s+', ' ', 'g')) AS text_out
FROM documents WHERE doc_id % 10 = 0
"""


def _excluded_sql(name_expr: str) -> str:
    from data_pipeline_spark.functions.extract import EXCLUDED_KEYWORDS

    return " OR ".join(f"contains(lower({name_expr}), '{k}')" for k in EXCLUDED_KEYWORDS)


def q_html_extract_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H1-H8: product-card extraction cascade (container/name/price/id
    selectors, price cleaning, validation, exclusion) over synthesized pages."""
    p = _t(spark, sf_dir, "part").where(F.col("p_partkey") % 5 == 0)
    html = F.concat(
        F.lit('<html><body><h1>tools</h1><div class="product-item" data-product-id="'),
        F.col("p_partkey").cast("string"),
        F.lit('"><h3>'),
        F.col("p_name"),
        F.lit('</h3><span class="price">Rs. '),
        (F.col("p_size") * 100).cast("string"),
        F.lit("</span></div></body></html>"),
    )
    df = p.select("p_partkey", html.cast("binary").alias("html"))
    xp = extract_products_udf()
    prod = df.select("p_partkey", F.explode(xp(F.col("html"))).alias("pr"))
    return prod.select(
        "p_partkey",
        F.col("pr.name").alias("name"),
        F.col("pr.cost_price").alias("cost_price"),
        F.col("pr.mrp").alias("mrp"),
        F.col("pr.product_id").alias("product_id"),
        F.col("pr.category_name").alias("category_name"),
        F.col("pr.units_of_mass").alias("units_of_mass"),
    )


def _sql_extract_products() -> str:
    excl = _excluded_sql("p_name")
    return f"""
SELECT p_partkey, p_name AS name,
       (p_size * 100)::VARCHAR AS cost_price,
       (p_size * 100)::VARCHAR AS mrp,
       p_partkey::VARCHAR AS product_id,
       'tools' AS category_name,
       'N/A' AS units_of_mass
FROM part
WHERE p_partkey % 5 = 0
  AND length(p_name) BETWEEN 3 AND 200
  AND regexp_matches(p_name, '[A-Za-z]')
  AND p_size * 100 > 0
  AND NOT ({excl})
"""


# ---------------------------------------------------------------------------
# Text analysis (training-data extension)
# ---------------------------------------------------------------------------

def q_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        TS.char_count(t).alias("n_chars"),
        TS.token_count(t).alias("n_tokens"),
        TS.bpe_token_count(t).alias("n_bpe_tokens"),
    )


_SQL_TOKEN_STATS = f"""
SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
       {TS.sql_token_count('text')} AS n_tokens,
       {TS.sql_bpe_token_count('text')} AS n_bpe_tokens
FROM documents
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", TS.fingerprint(F.col("text")).alias("fingerprint"))


_SQL_FINGERPRINT = f"""
SELECT doc_id, {TS.sql_fingerprint('text')} AS fingerprint FROM documents
"""


def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", TS.quality_score(F.col("text")).alias("quality"))


_SQL_QUALITY = f"""
SELECT doc_id, {TS.sql_quality_score('text')} AS quality FROM documents
"""


def q_doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", TS.lang_id(F.col("text")).alias("lang_pred"))


_SQL_LANG_ID = f"""
SELECT doc_id, lang, {TS.sql_lang_id('text')} AS lang_pred FROM documents
"""


def q_doc_script_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode script profiling (webtext QA): per-doc script codepoint
    counts, dominant script, mojibake flag. Row-local regexp counting over
    the shared BMP range table — one codegen stage, no shuffle."""
    d = _t(spark, sf_dir, "documents")
    return WQ.script_profile(d, "doc_id", "text")


_SQL_SCRIPT_PROFILE = WQ.sql_script_profile_select("documents", "doc_id")


def q_doc_soft404(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft-404 detection: error-phrase hits + short-content signal from
    the shared phrase table; flags 200-but-error pages content-side."""
    d = _t(spark, sf_dir, "documents")
    return WQ.soft404_flag(d, "doc_id", "text")


_SQL_SOFT404 = WQ.sql_soft404_select("documents", "doc_id")


def q_doc_grouped_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: grouped counts over categorical columns."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )


_SQL_DOC_COUNTS = """
SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(n_chars), 4) AS avg_chars
FROM documents GROUP BY lang, source
"""


# ---------------------------------------------------------------------------
# Quality / curation family (training-data extension, round 2):
# repetition metrics, Gopher rules, URL canonicalization, PII masking,
# deterministic stratified sampling (functions/quality.py, weburl.py,
# operators/sampling.py)
# ---------------------------------------------------------------------------

def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-doc repetition profile (Gopher §A1.1 signals): dup line/word/
    2-gram/3-gram fractions + top-2-gram character fraction. Row-local
    fractions ride the projection; the top-gram pass is explode → hash
    count → per-doc max(struct) → join (no per-doc gram map in one row)."""
    d = _t(spark, sf_dir, "documents")
    return QL.repetition_stats(d, "doc_id", "text", n=2)


_SQL_REPETITION = QL.sql_repetition_stats(
    "SELECT doc_id, text FROM documents", "doc_id", "text", n=2
)


def q_doc_gopher_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule filter: one boolean per rule + the AND keep flag,
    all native Column expressions (zero Python UDFs)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        *[c.alias(k) for k, c in QL.gopher_flags("text").items()],
        QL.gopher_pass("text").alias("keep"),
    )


_SQL_GOPHER = (
    "SELECT doc_id, "
    + ", ".join(f"{v} AS {k}" for k, v in QL.sql_gopher_flags("text").items())
    + f", {QL.sql_gopher_pass('text')} AS keep FROM documents"
)


# Messy absolute URLs synthesized deterministically from doc_id (same
# expression in both engines): mixed case, default port, tracking params,
# unsorted query, sometimes trailing slash / fragment / gclid.
_URL_SYNTH_SPARK = (
    "concat('HTTPS://WWW.Site', CAST(doc_id % 7 AS string), '.COM:443"
    "/catalog/item-', CAST(doc_id AS string), "
    "CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END, "
    "'?utm_source=feed&b=2&a=1', "
    "CASE WHEN doc_id % 2 = 0 THEN '&gclid=x' ELSE '' END, "
    "CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END)"
)
_URL_SYNTH_DUCK = _URL_SYNTH_SPARK.replace("AS string", "AS VARCHAR")


_URL_MESSY_SPARK = (
    "concat('https://', "
    "CASE WHEN doc_id % 11 = 0 THEN 'ads.spam-mall.com' "
    "     WHEN doc_id % 11 = 1 THEN '192.168.3.7' "
    "     ELSE concat('www.site', CAST(doc_id % 7 AS string), '.com') END, "
    "'/page/', CAST(doc_id AS string), "
    "CASE WHEN doc_id % 11 = 3 THEN '/free-casino-bonus' "
    "     WHEN doc_id % 11 = 4 THEN concat('/', repeat('a', 2600)) "
    "     WHEN doc_id % 11 = 5 THEN concat('/', CAST(doc_id * 1000003 AS string), '/9917') "
    "     ELSE '' END)"
)
_URL_MESSY_DUCK = _URL_MESSY_SPARK.replace("AS string", "AS VARCHAR")


def q_url_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FineWeb/RefinedWeb URL gate (functions/weburl.py::url_verdict) over
    synthesized urls planting every rule class: UT1-style blocked domain,
    raw-IP host, banned word, over-length, digit-heavy path. One CASE of
    native regexes — the filter runs inside the ingest scan at 10^10 urls."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_URL_MESSY_SPARK).alias("url")
    )
    blocked = ("spam-mall.com",)
    return d.select(
        "doc_id",
        WU.url_verdict("url", blocked_domains=blocked).alias("verdict"),
        WU.url_allowed("url", blocked_domains=blocked).alias("allowed"),
    )


_SQL_URL_FILTER = f"""
WITH urlf AS (SELECT doc_id, {_URL_MESSY_DUCK} AS url FROM documents)
SELECT doc_id,
       {WU.sql_url_verdict('url', blocked_domains=('spam-mall.com',))} AS verdict,
       ({WU.sql_url_verdict('url', blocked_domains=('spam-mall.com',))}) = 'ok' AS allowed
FROM urlf
"""


def q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical url + host + registered domain over synthesized messy
    URLs — the key-collapse step for a url-keyed lake table."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_URL_SYNTH_SPARK).alias("url")
    )
    return d.select(
        "doc_id",
        WU.canonical_url("url").alias("canonical_url"),
        WU.url_host("url").alias("host"),
        WU.registered_domain("url").alias("domain"),
    )


_SQL_URL_CANON = f"""
WITH urlq AS (SELECT doc_id, {_URL_SYNTH_DUCK} AS url FROM documents)
SELECT doc_id, {WU.sql_canonical_url('url')} AS canonical_url,
       {WU.sql_url_host('url')} AS host,
       {WU.sql_registered_domain('url')} AS domain
FROM urlq
"""


def q_url_surt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURT keys (reversed-host CDX sort form, functions/weburl.py::_surt)
    over the same synthesized messy URLs as `url_canonicalize`, plus the
    per-domain adjacency the key exists for: rank of each url inside its
    registered domain under SURT order."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_URL_SYNTH_SPARK).alias("url")
    )
    w = Window.partitionBy("domain").orderBy("surt", "doc_id")
    return (
        d.select(
            "doc_id",
            WU.surt_key("url").alias("surt"),
            WU.registered_domain("url").alias("domain"),
        )
        .withColumn("domain_rank", F.row_number().over(w))
    )


_SQL_URL_SURT = f"""
WITH urlq AS (SELECT doc_id, {_URL_SYNTH_DUCK} AS url FROM documents),
keyed AS (
  SELECT doc_id, {WU.sql_surt_key('url')} AS surt,
         {WU.sql_registered_domain('url')} AS domain
  FROM urlq
)
SELECT doc_id, surt, domain,
       CAST(row_number() OVER (PARTITION BY domain ORDER BY surt, doc_id)
            AS INTEGER) AS domain_rank
FROM keyed
"""


def q_recrawl_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive recrawl scheduling (operators/recrawl.py): synthesize a
    3-capture history per document (payload digest changes at capture 1
    for even doc_ids, again at capture 2 for doc_ids % 3 == 0), then
    estimate per-url change period and due score. One window lag + one
    hash agg + a broadcast 1-row high-water — scale-safe at 10^10
    captures. Floats rounded 6dp both sides (repo float discipline)."""
    from data_pipeline_spark.operators.recrawl import recrawl_stats

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    caps = d.select(
        "doc_id", "text",
        F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("c"),
    )
    ver = (
        F.when((F.col("c") >= 1) & (F.col("doc_id") % 2 == 0), 1).otherwise(0)
        + F.when((F.col("c") >= 2) & (F.col("doc_id") % 3 == 0), 1).otherwise(0)
    )
    caps = caps.select(
        F.concat(
            F.lit("https://example.com/doc/"), F.col("doc_id").cast("string")
        ).alias("url"),
        F.timestamp_seconds(
            F.lit(1_700_000_000)
            + (F.col("doc_id") % 97) * 60
            + F.col("c") * 86_400
        ).alias("warc_ts"),
        F.md5(
            F.concat(F.col("text"), F.lit("#"), ver.cast("string"))
        ).alias("payload_digest"),
    )
    s = recrawl_stats(caps)
    return s.select(
        "url",
        "n_captures",
        "n_changes",
        F.round("span_s", 6).alias("span_s"),
        F.round("change_period_s", 6).alias("change_period_s"),
        F.round("staleness_s", 6).alias("staleness_s"),
        F.round("due_score", 6).alias("due_score"),
    )


_SQL_RECRAWL = """
WITH caps AS (
  SELECT 'https://example.com/doc/' || CAST(doc_id AS VARCHAR) AS url,
         to_timestamp(1700000000 + (doc_id % 97) * 60 + c.c * 86400) AS warc_ts,
         md5(text || '#' || CAST(
           (CASE WHEN c.c >= 1 AND doc_id % 2 = 0 THEN 1 ELSE 0 END)
           + (CASE WHEN c.c >= 2 AND doc_id % 3 = 0 THEN 1 ELSE 0 END)
           AS VARCHAR)) AS payload_digest
  FROM documents, (VALUES (0),(1),(2)) AS c(c)
),
flagged AS (
  SELECT url, payload_digest, warc_ts,
         CASE WHEN lag(payload_digest) OVER w IS NULL THEN FALSE
              ELSE lag(payload_digest) OVER w <> payload_digest END AS changed
  FROM caps
  WINDOW w AS (PARTITION BY url ORDER BY warc_ts, payload_digest)
),
per_key AS (
  SELECT url, CAST(count(*) AS BIGINT) AS n_captures,
         CAST(sum(CASE WHEN changed THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
         min(warc_ts) AS first_ts, max(warc_ts) AS last_ts
  FROM flagged GROUP BY 1
),
hw AS (SELECT max(last_ts) AS h FROM per_key)
SELECT url, n_captures, n_changes,
  round((epoch_us(last_ts) - epoch_us(first_ts)) / 1e6, 6) AS span_s,
  round(CASE WHEN n_changes > 0 AND epoch_us(last_ts) > epoch_us(first_ts)
        THEN (epoch_us(last_ts) - epoch_us(first_ts)) / 1e6 / n_changes END,
        6) AS change_period_s,
  round((epoch_us(h) - epoch_us(last_ts)) / 1e6, 6) AS staleness_s,
  round(coalesce((epoch_us(h) - epoch_us(last_ts)) / 1e6
        / (CASE WHEN n_changes > 0 AND epoch_us(last_ts) > epoch_us(first_ts)
           THEN (epoch_us(last_ts) - epoch_us(first_ts)) / 1e6 / n_changes END),
        0.0), 6) AS due_score
FROM per_key, hw
"""


def q_content_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-url change MAGNITUDE between consecutive captures
    (operators/contentdelta.py::version_deltas): 3 versions per document —
    v0 the original text, v1 appends a sentence for even doc_ids (minor
    churn), v2 halves the text for doc_ids % 3 == 0 (major/rewrite) —
    then token-set Jaccard + churn class vs the previous capture. One
    keyed window shuffle (lag of the distinct-token set), no Python.
    Jaccard rounded 6dp both sides; churn classified on the raw
    integer-ratio double (bit-identical cross-engine)."""
    from data_pipeline_spark.operators.contentdelta import version_deltas

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    t1 = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(F.col("text"), F.lit(" freshly updated section appended here")),
    ).otherwise(F.col("text"))
    caps = d.select(
        "doc_id", F.col("text").alias("t0"), t1.alias("t1"),
        F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("c"),
    )
    t2 = F.when(
        F.col("doc_id") % 3 == 0,
        F.col("t1").substr(F.lit(1), F.floor(F.length("t1") / 2).cast("int")),
    ).otherwise(F.col("t1"))
    caps = caps.select(
        F.concat(
            F.lit("https://example.com/doc/"), F.col("doc_id").cast("string")
        ).alias("url"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("c") * 86_400).alias(
            "warc_ts"
        ),
        F.when(F.col("c") == 0, F.col("t0"))
        .when(F.col("c") == 1, F.col("t1"))
        .otherwise(t2)
        .alias("text"),
    )
    return version_deltas(caps)


_SQL_CONTENT_DELTA = f"""
WITH v1e AS (
  SELECT doc_id, text,
         CASE WHEN doc_id % 2 = 0
              THEN text || ' freshly updated section appended here'
              ELSE text END AS t1
  FROM documents
),
caps AS (
  SELECT 'https://example.com/doc/' || CAST(doc_id AS VARCHAR) AS url,
         CAST(to_timestamp(1700000000 + c.c * 86400) AS TIMESTAMP) AS warc_ts,
         CASE WHEN c.c = 0 THEN text
              WHEN c.c = 1 THEN t1
              ELSE CASE WHEN doc_id % 3 = 0
                        THEN substr(t1, 1, length(t1) // 2)
                        ELSE t1 END
         END AS text
  FROM v1e, (VALUES (0),(1),(2)) AS c(c)
),
v AS (
  SELECT url, warc_ts,
         coalesce(list_distinct({{toks}}), []::VARCHAR[]) AS toks,
         {{fp}} AS fp
  FROM caps
),
d AS (
  SELECT url, warc_ts, toks,
         len(toks) AS n,
         lag(toks) OVER w AS ptoks,
         lag(len(toks)) OVER w AS pn
  FROM v
  WINDOW w AS (PARTITION BY url ORDER BY warc_ts, fp)
)
SELECT url, warc_ts,
  CAST(n AS BIGINT) AS n_tokens,
  CAST(n - pn AS BIGINT) AS token_delta,
  CASE WHEN ptoks IS NULL THEN NULL
       WHEN len(list_distinct(list_concat(toks, ptoks))) = 0 THEN round(1.0, 6)
       ELSE round(CAST(len(list_intersect(toks, ptoks)) AS DOUBLE)
                  / len(list_distinct(list_concat(toks, ptoks))), 6)
  END AS jaccard,
  CASE WHEN ptoks IS NULL THEN 'new'
       WHEN len(list_intersect(toks, ptoks))
            = len(list_distinct(list_concat(toks, ptoks))) THEN 'unchanged'
       WHEN CAST(len(list_intersect(toks, ptoks)) AS DOUBLE)
            / len(list_distinct(list_concat(toks, ptoks))) >= 0.7 THEN 'minor'
       WHEN CAST(len(list_intersect(toks, ptoks)) AS DOUBLE)
            / len(list_distinct(list_concat(toks, ptoks))) >= 0.3 THEN 'major'
       ELSE 'rewrite'
  END AS churn
FROM d
"""


def q_corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-over-epoch corpus distribution drift
    (operators/contentdelta.py::corpus_drift): documents split into 3
    ingest epochs by doc_id % 3; per consecutive pair, Jensen-Shannon
    divergence of the unigram token distributions + OOV / lost mass +
    vocabulary deltas. Token-keyed hash aggs only — epochs are never
    joined pairwise, vocabulary never collected. Floats rounded 6dp both
    sides (sums of ~vocab-size log terms differ by ~1e-12 across
    engines' summation orders)."""
    from data_pipeline_spark.operators.contentdelta import corpus_drift

    d = _t(spark, sf_dir, "documents").select(
        (F.col("doc_id") % 3).cast("long").alias("epoch"), "text"
    )
    return corpus_drift(d)


_SQL_CORPUS_DRIFT = """
WITH counts AS (
  SELECT doc_id % 3 AS epoch, t.token AS token, count(*) AS n
  FROM documents, unnest({toks}) AS t(token)
  GROUP BY 1, 2
),
merged AS (
  SELECT pair, token, sum(cur_n) AS cur_n, sum(prev_n) AS prev_n FROM (
    SELECT epoch AS pair, token, n AS cur_n, 0 AS prev_n FROM counts
    UNION ALL
    SELECT epoch + 1 AS pair, token, 0 AS cur_n, n AS prev_n FROM counts
  ) u GROUP BY 1, 2
),
tot AS (
  SELECT pair, sum(cur_n) AS cur_total, sum(prev_n) AS prev_total
  FROM merged GROUP BY 1
  HAVING sum(cur_n) > 0 AND sum(prev_n) > 0
),
j AS (
  SELECT m.pair, m.cur_n, m.prev_n, t.cur_total, t.prev_total,
         CAST(m.cur_n AS DOUBLE) / t.cur_total AS p,
         CAST(m.prev_n AS DOUBLE) / t.prev_total AS q
  FROM merged m JOIN tot t USING (pair)
)
SELECT CAST(pair AS BIGINT) AS epoch,
  round(sum(
      (CASE WHEN cur_n > 0 THEN p * ln(p / ((p + q) / 2)) ELSE 0.0 END) * 0.5
    + (CASE WHEN prev_n > 0 THEN q * ln(q / ((p + q) / 2)) ELSE 0.0 END) * 0.5
  ), 6) AS js_divergence,
  round(sum(CASE WHEN prev_n = 0 THEN p ELSE 0.0 END), 6) AS oov_mass,
  round(sum(CASE WHEN cur_n = 0 THEN q ELSE 0.0 END), 6) AS lost_mass,
  CAST(max(cur_total) AS BIGINT) AS cur_tokens,
  CAST(max(prev_total) AS BIGINT) AS prev_tokens,
  CAST(sum(CASE WHEN cur_n > 0 THEN 1 ELSE 0 END) AS BIGINT) AS cur_vocab,
  CAST(sum(CASE WHEN prev_n > 0 THEN 1 ELSE 0 END) AS BIGINT) AS prev_vocab,
  CAST(sum(CASE WHEN cur_n > 0 AND prev_n = 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS new_vocab
FROM j GROUP BY pair
"""


def q_doc_quality_nb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained NB quality classifier, train/apply split
    (operators/qualityclassifier.py): weak labels from the Gopher rules on
    the EVEN doc_ids (the DCLM/FineWeb trick: heuristic labels, learned
    generalization), then every document — training rows and held-out odd
    ids alike — scored against the frozen model. Train is one token-keyed
    hash agg + two 1-row broadcasts; score is one explode + model
    equi-join + doc-keyed agg. log_odds rounded 6dp both sides (sums of
    per-token ln-ratio terms differ ~1e-12 across engines' summation
    orders); pred on the un-rounded value."""
    from data_pipeline_spark.operators.qualityclassifier import (
        score_documents,
        train_classifier,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    model = train_classifier(
        d.filter(F.col("doc_id") % 2 == 0), "text", QL.gopher_pass("text")
    )
    return score_documents(d, model, "doc_id", "text")


def _sql_doc_quality_nb() -> str:
    from data_pipeline_spark.operators.qualityclassifier import (
        sql_score_documents,
        sql_train_classifier,
    )

    return sql_score_documents(
        "SELECT doc_id, text FROM documents",
        sql_train_classifier(
            "SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0",
            "text",
            QL.sql_gopher_pass("text"),
        ),
        "doc_id",
        "text",
    )


def q_link_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-graph edge extraction (operators/webgraph.py): documents become
    synthetic pages with two planted absolute links (one double-quoted,
    one single-quoted) plus a relative link on every 5th page that MUST be
    skipped; extract_links recovers exactly the absolute hrefs via one
    native regexp_extract_all + explode (scan-speed, no Python, no
    shuffle). Oracle runs the SAME regex text under DuckDB/RE2."""
    from data_pipeline_spark.operators.webgraph import extract_links

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    html = F.concat(
        F.lit("<html><body><p>"), F.substring("text", 1, 40), F.lit("</p>"),
        F.lit('<a href="https://example.com/doc/'),
        ((F.col("doc_id") * 7 + 1) % 500).cast("string"),
        F.lit('">x</a>'),
        F.lit("<a href='https://mirror.example.org/d/"),
        ((F.col("doc_id") * 13 + 2) % 500).cast("string"),
        F.lit("'>y</a>"),
        F.when(F.col("doc_id") % 5 == 0, F.lit('<a href="/relative/skip">r</a>'))
        .otherwise(F.lit("")),
        F.lit("</body></html>"),
    )
    pages = d.select(
        F.concat(F.lit("https://example.com/doc/"),
                 F.col("doc_id").cast("string")).alias("url"),
        html.alias("html"),
    )
    return extract_links(pages, "url", "html")


def _sql_link_extract() -> str:
    from data_pipeline_spark.functions.quality import _dq
    from data_pipeline_spark.operators.webgraph import HREF_RE

    return f"""
WITH pages AS (
  SELECT 'https://example.com/doc/' || CAST(doc_id AS VARCHAR) AS url,
         '<html><body><p>' || substr(text, 1, 40) || '</p>'
         || '<a href="https://example.com/doc/'
         || CAST((doc_id * 7 + 1) % 500 AS VARCHAR) || '">x</a>'
         || '<a href=''https://mirror.example.org/d/'
         || CAST((doc_id * 13 + 2) % 500 AS VARCHAR) || '''>y</a>'
         || CASE WHEN doc_id % 5 = 0
                 THEN '<a href="/relative/skip">r</a>' ELSE '' END
         || '</body></html>' AS html
  FROM documents
)
SELECT url AS src_url, unnest(regexp_extract_all(html, {_dq(HREF_RE)}, 1)) AS href
FROM pages
"""


def _anchor_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    html = F.concat(
        F.lit("<html><body><p>"), F.substring("text", 1, 40), F.lit("</p>"),
        F.lit('<a href="https://example.com/doc/'),
        ((F.col("doc_id") * 7 + 1) % 100).cast("string"),
        F.lit('">Doc  '), (F.col("doc_id") % 3).cast("string"),
        F.lit("\n</a>"),
        F.lit("<a href='https://mirror.example.org/d/"),
        ((F.col("doc_id") * 13 + 2) % 100).cast("string"),
        F.lit("'><b>the</b> mirror</a>"),
        F.when(F.col("doc_id") % 7 == 0,
               F.lit('<a href="https://img.example.net/i"><img src="x"/></a>'))
        .otherwise(F.lit("")),
        F.lit("</body></html>"),
    )
    return d.select(
        F.concat(F.lit("https://example.com/doc/"),
                 F.col("doc_id").cast("string")).alias("url"),
        html.alias("html"),
    )


def q_anchor_texts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-target anchor-text profile (operators/webgraph.py): whole <a>
    elements extracted natively, visible text tag-stripped + squeezed,
    aggregated to each target url's top-2 anchors (n desc, anchor asc).
    Planted variety: three 'doc N' variants per target, a markup-wrapped
    'the mirror', and an image link whose empty text must NOT profile."""
    from data_pipeline_spark.operators.webgraph import anchor_profile, extract_anchors

    return anchor_profile(
        extract_anchors(_anchor_pages(spark, sf_dir), "url", "html"), k=2
    )


def _sql_anchor_texts() -> str:
    from data_pipeline_spark.functions.quality import _dq
    from data_pipeline_spark.operators.webgraph import (
        ANCHOR_RE,
        HREF_RE,
        TAG_STRIP_RE,
        WS_SQUEEZE_RE,
    )

    return f"""
WITH pages AS (
  SELECT 'https://example.com/doc/' || CAST(doc_id AS VARCHAR) AS url,
         '<html><body><p>' || substr(text, 1, 40) || '</p>'
         || '<a href="https://example.com/doc/'
         || CAST((doc_id * 7 + 1) % 100 AS VARCHAR)
         || '">Doc  ' || CAST(doc_id % 3 AS VARCHAR) || chr(10) || '</a>'
         || '<a href=''https://mirror.example.org/d/'
         || CAST((doc_id * 13 + 2) % 100 AS VARCHAR)
         || '''><b>the</b> mirror</a>'
         || CASE WHEN doc_id % 7 = 0
                 THEN '<a href="https://img.example.net/i"><img src="x"/></a>'
                 ELSE '' END
         || '</body></html>' AS html
  FROM documents
),
raw_a AS (
  SELECT url AS src_url,
         unnest(regexp_extract_all(html, {_dq(ANCHOR_RE)}, 0)) AS a
  FROM pages
),
anch AS (
  SELECT src_url,
         coalesce(regexp_extract(a, {_dq(HREF_RE)}, 1), '') AS href,
         trim(regexp_replace(regexp_replace(a, {_dq(TAG_STRIP_RE)}, ' ', 'g'),
                             {_dq(WS_SQUEEZE_RE)}, ' ', 'g')) AS anchor
  FROM raw_a
),
counted AS (
  SELECT href, lower(anchor) AS anchor, CAST(count(*) AS BIGINT) AS n
  FROM anch WHERE href <> '' AND anchor <> ''
  GROUP BY href, lower(anchor)
)
SELECT href, anchor, n,
       CAST(row_number() OVER (PARTITION BY href ORDER BY n DESC, anchor ASC)
            AS INTEGER) AS rank
FROM counted
QUALIFY rank <= 2
"""


_RANK_PAGES_SPARK = """
SELECT concat('https://site', CAST(doc_id % 5 AS string), '.com/p',
              CAST(doc_id AS string)) AS url,
       concat('<html><body>',
              '<a href="https://site', CAST((doc_id * 7 + 1) % 5 AS string),
              '.com/x">a</a>',
              '<a href="https://site', CAST((doc_id * 13 + 2) % 5 AS string),
              '.com/y">b</a>',
              CASE WHEN doc_id % 3 = 0
                   THEN '<a href="https://hub.example.com/">hub</a>'
                   ELSE '' END,
              '</body></html>') AS html
FROM {src}
"""


def q_host_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted host PageRank end-to-end (operators/webgraph.py): link
    regex → host-graph collapse → 4 power-iteration rounds with exact
    dangling-mass redistribution (hub.example.com has no out-links and
    leaks rank every round). The oracle UNROLLS the same iteration in
    SQL with the same float op order — the whole iterative operator is
    value-hash-checked, not just row counts."""
    from data_pipeline_spark.operators.webgraph import host_rank

    _t(spark, sf_dir, "documents").createOrReplaceTempView("__rank_docs")
    pages = spark.sql(_RANK_PAGES_SPARK.format(src="__rank_docs"))
    return host_rank(pages, iterations=4).select(
        "host", F.round("rank", 6).alias("rank")
    )


def _sql_host_rank_contract() -> str:
    from data_pipeline_spark.operators.webgraph import sql_host_rank

    pages_sql = _RANK_PAGES_SPARK.format(src="documents").replace(
        "AS string", "AS VARCHAR"
    )
    return sql_host_rank(pages_sql, iterations=4, damping=0.85)


def q_template_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template-level fingerprints (operators/webgraph.py): SimHash over
    each page's TAG stream — two planted layouts must collapse to two
    signature groups however different the visible text. Composition of
    the tag_stream narrow map and the existing simhash hash-agg."""
    from data_pipeline_spark.operators.webgraph import template_fingerprint

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    grid = F.concat(
        F.lit("<html><body><div class=g><ul><li><span>"),
        F.substring("text", 1, 30),
        F.lit("</span></li><li><em>x</em></li></ul></div></body></html>"),
    )
    article = F.concat(
        F.lit("<html><body><article><h1>t</h1><p>"),
        F.substring("text", 1, 30),
        F.lit("</p><p>more</p></article></body></html>"),
    )
    pages = d.select(
        F.concat(F.lit("https://example.com/doc/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.when(F.col("doc_id") % 2 == 0, grid).otherwise(article).alias("html"),
    )
    return template_fingerprint(pages, "url", "html")


def _sql_template_simhash() -> str:
    from data_pipeline_spark.operators.textdedup import sql_simhash
    from data_pipeline_spark.operators.webgraph import sql_tag_stream

    pages = """
  SELECT 'https://example.com/doc/' || CAST(doc_id AS VARCHAR) AS url,
         CASE WHEN doc_id % 2 = 0
              THEN '<html><body><div class=g><ul><li><span>'
                   || substr(text, 1, 30)
                   || '</span></li><li><em>x</em></li></ul></div></body></html>'
              ELSE '<html><body><article><h1>t</h1><p>'
                   || substr(text, 1, 30)
                   || '</p><p>more</p></article></body></html>' END AS html
  FROM documents
"""
    staged = (
        f"(SELECT url, {sql_tag_stream('html')} AS _tags FROM ({pages}))"
    )
    inner = sql_simhash(staged, "_tags", "url")
    return f"SELECT doc AS url, simhash FROM ({inner})"


def q_frontier_discover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frontier expansion with a seen-filter (operators/webgraph.py):
    outlink targets canonicalized and anti-joined against the captured
    url set — the discovery feed for the crawl planner. Known set =
    the even-numbered target urls, so exactly the odd targets surface."""
    from data_pipeline_spark.operators.webgraph import (
        discover_frontier,
        extract_links,
    )

    links = extract_links(_anchor_pages(spark, sf_dir), "url", "html")
    known = (
        _t(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 2 == 0)
        .select(
            F.concat(F.lit("https://example.com/doc/"),
                     ((F.col("doc_id") * 7 + 1) % 100).cast("string")).alias("url")
        )
    )
    return discover_frontier(links, known)


def _sql_frontier_discover() -> str:
    from data_pipeline_spark.functions.quality import _dq
    from data_pipeline_spark.functions.weburl import sql_canonical_url
    from data_pipeline_spark.operators.webgraph import HREF_RE

    anchor_pages_sql = _sql_anchor_texts().split("raw_a AS")[0].strip()
    # reuse the anchor contract's page synthesis (the WITH pages AS (...) part)
    return f"""
{anchor_pages_sql}
links AS (
  SELECT unnest(regexp_extract_all(html, {_dq(HREF_RE)}, 1)) AS href
  FROM pages
),
targets AS (
  SELECT DISTINCT {sql_canonical_url('href')} AS url FROM links
  WHERE regexp_matches({sql_canonical_url('href')}, '^https?://')
),
known AS (
  SELECT DISTINCT {sql_canonical_url("'https://example.com/doc/' || CAST((doc_id * 7 + 1) % 100 AS VARCHAR)")} AS url
  FROM documents WHERE doc_id % 2 = 0
)
SELECT t.url FROM targets t LEFT JOIN known k ON t.url = k.url
WHERE k.url IS NULL
"""


_ROBOTS_FIXTURE: list[tuple[str, list[str]]] = [
    # every host: a star group with prefix rules + crawl-delay
    *[(f"site{k}.com",
       ["User-agent: *", f"Disallow: /private", "Allow: /private/ok",
        f"Crawl-delay: {k + 1}", "# trailing comment"])
      for k in range(5)],
]
# site0 ALSO names our agent: per RFC the star group then does NOT apply
# on site0 — /private becomes legal there, /mybot-no does not.
_ROBOTS_FIXTURE[0] = ("site0.com", _ROBOTS_FIXTURE[0][1] + [
    "", "User-agent: mybot", "Disallow: /mybot-no", "Allow: /private",
])
# site1 adds a wildcard + end-anchor rule (regex compilation path)
_ROBOTS_FIXTURE[1] = ("site1.com", _ROBOTS_FIXTURE[1][1] + ["Disallow: /*.pdf$"])

_URL_PATHS_SPARK = (
    "CASE CAST(doc_id % 6 AS int) "
    "WHEN 0 THEN concat('/pub/p', CAST(doc_id AS string)) "
    "WHEN 1 THEN concat('/private/p', CAST(doc_id AS string)) "
    "WHEN 2 THEN concat('/private/ok/p', CAST(doc_id AS string)) "
    "WHEN 3 THEN concat('/doc', CAST(doc_id AS string), '.pdf') "
    "WHEN 4 THEN concat('/mybot-no/', CAST(doc_id AS string)) "
    "ELSE '/' END"
)


def q_robots_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl legality end-to-end (sources/robots.py): RFC 9309 group
    assignment (windows over the line stream), agent-specific group
    override on site0, wildcard/end-anchor rule compilation on site1,
    longest-match allow-wins verdicts + crawl-delay. The oracle re-runs
    the ENTIRE parse+check pipeline in SQL (sql_check_allowed)."""
    from data_pipeline_spark.sources.robots import check_allowed, parse_robots

    robots = spark.createDataFrame(
        [(h, "\n".join(lines)) for h, lines in _ROBOTS_FIXTURE],
        "host string, robots_txt string",
    )
    urls = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(
            "concat('https://site', CAST(doc_id % 5 AS string), '.com', "
            + _URL_PATHS_SPARK + ")"
        ).alias("url"),
    )
    return check_allowed(urls, parse_robots(robots, agent="mybot"))


def _sql_robots_check() -> str:
    from data_pipeline_spark.sources.robots import sql_check_allowed

    def duck_txt(lines: list[str]) -> str:
        return " || chr(10) || ".join(
            "'" + line.replace("'", "''") + "'" if line else "''"
            for line in lines
        )

    values = ", ".join(
        f"('{h}', {duck_txt(lines)})" for h, lines in _ROBOTS_FIXTURE
    )
    robots_sql = f"SELECT * FROM (VALUES {values}) AS rb(host, robots_txt)"
    urls_sql = (
        "SELECT doc_id, 'https://site' || CAST(doc_id % 5 AS VARCHAR) || '.com' || "
        + _URL_PATHS_SPARK.replace("AS string", "AS VARCHAR")
          .replace("concat('/pub/p', CAST(doc_id AS VARCHAR))",
                   "'/pub/p' || CAST(doc_id AS VARCHAR)")
          .replace("concat('/private/p', CAST(doc_id AS VARCHAR))",
                   "'/private/p' || CAST(doc_id AS VARCHAR)")
          .replace("concat('/private/ok/p', CAST(doc_id AS VARCHAR))",
                   "'/private/ok/p' || CAST(doc_id AS VARCHAR)")
          .replace("concat('/doc', CAST(doc_id AS VARCHAR), '.pdf')",
                   "'/doc' || CAST(doc_id AS VARCHAR) || '.pdf'")
          .replace("concat('/mybot-no/', CAST(doc_id AS VARCHAR))",
                   "'/mybot-no/' || CAST(doc_id AS VARCHAR)")
        + " AS url FROM documents"
    )
    return sql_check_allowed(
        urls_sql, robots_sql, agent="mybot", url_cols=("doc_id", "url")
    )


def q_sitemap_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap ingestion (sources/sitemap.py): each document becomes a
    2-entry sitemap file (second entry: entity-escaped query-string loc
    that must decode '&amp;'→'&', a garbage <priority> that must try_cast
    to null — never fail the scan — and no changefreq so nulls surface),
    parsed with one native regexp_extract_all + explode. The oracle runs
    the SAME entry/field regexes + entity decode under DuckDB/RE2."""
    from data_pipeline_spark.sources.sitemap import parse_sitemap

    d = _t(spark, sf_dir, "documents").select("doc_id")
    xml = F.concat(
        F.lit("<urlset>\n  <url>\n    <loc>https://example.com/doc/"),
        F.col("doc_id").cast("string"),
        F.lit("</loc>\n    <lastmod>2024-03-"),
        F.lpad(((F.col("doc_id") % 28) + 1).cast("string"), 2, "0"),
        F.lit("</lastmod>\n    <changefreq>"),
        F.element_at(
            F.array(F.lit("daily"), F.lit("weekly"), F.lit("monthly")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ),
        F.lit("</changefreq>\n    <priority>0."),
        (F.col("doc_id") % 10).cast("string"),
        F.lit("</priority>\n  </url>\n  <url><loc>https://m.example.org/alt/"),
        F.col("doc_id").cast("string"),
        F.lit("?a=1&amp;b=2</loc><lastmod>2024-04-01</lastmod>"
              "<priority>high</priority></url>\n</urlset>"),
    )
    return parse_sitemap(d.select("doc_id", xml.alias("xml")))


def _sql_sitemap_parse() -> str:
    from data_pipeline_spark.functions.quality import _dq
    from data_pipeline_spark.sources.sitemap import (
        CHANGEFREQ_RE,
        LASTMOD_RE,
        LOC_RE,
        PRIORITY_RE,
        URL_ENTRY_RE,
        sql_xml_unescape,
    )

    loc = sql_xml_unescape(f"nullif(regexp_extract(e, {_dq(LOC_RE)}, 1), '')")
    return f"""
WITH files AS (
  SELECT doc_id,
    '<urlset>' || chr(10) || '  <url>' || chr(10)
    || '    <loc>https://example.com/doc/' || CAST(doc_id AS VARCHAR) || '</loc>' || chr(10)
    || '    <lastmod>2024-03-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') || '</lastmod>' || chr(10)
    || '    <changefreq>' || (['daily','weekly','monthly'])[doc_id % 3 + 1] || '</changefreq>' || chr(10)
    || '    <priority>0.' || CAST(doc_id % 10 AS VARCHAR) || '</priority>' || chr(10)
    || '  </url>' || chr(10)
    || '  <url><loc>https://m.example.org/alt/' || CAST(doc_id AS VARCHAR)
    || '?a=1&amp;b=2</loc><lastmod>2024-04-01</lastmod><priority>high</priority></url>'
    || chr(10) || '</urlset>' AS xml
  FROM documents
),
entries AS (
  SELECT doc_id, unnest(regexp_extract_all(xml, {_dq(URL_ENTRY_RE)}, 1)) AS e
  FROM files
)
SELECT doc_id,
  {loc} AS loc,
  nullif(regexp_extract(e, {_dq(LASTMOD_RE)}, 1), '') AS lastmod,
  nullif(regexp_extract(e, {_dq(CHANGEFREQ_RE)}, 1), '') AS changefreq,
  TRY_CAST(nullif(regexp_extract(e, {_dq(PRIORITY_RE)}, 1), '') AS DOUBLE) AS priority
FROM entries
WHERE {loc} IS NOT NULL
"""


def q_canonical_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Origin-asserted dedup (operators/webgraph.py::canonical_collapse):
    every 3rd document declares a rel=canonical pointing at the doc_id
    rounded down to a multiple of 3 (attribute order alternates to cover
    both regex forms); pages collapse onto the declared canonical or
    themselves. Oracle re-derives group membership in plain SQL."""
    from data_pipeline_spark.operators.webgraph import canonical_collapse

    d = _t(spark, sf_dir, "documents").select("doc_id")
    target = F.concat(
        F.lit("https://example.com/doc/"),
        ((F.col("doc_id") / 3).cast("int") * 3).cast("string"),
    )
    link = F.when(
        F.col("doc_id") % 3 == 0, F.lit("")
    ).when(
        F.col("doc_id") % 2 == 0,
        F.concat(F.lit('<link rel="canonical" href="'), target, F.lit('">')),
    ).otherwise(
        F.concat(F.lit("<link href='"), target, F.lit("' rel='canonical'>")),
    )
    pages = d.select(
        F.concat(F.lit("https://example.com/doc/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.concat(F.lit("<html><head>"), link,
                 F.lit("</head><body>x</body></html>")).alias("html"),
    )
    return canonical_collapse(pages)


_SQL_CANONICAL = """
WITH pages AS (
  SELECT doc_id,
         'https://example.com/doc/' || CAST(doc_id AS VARCHAR) AS url,
         CASE WHEN doc_id % 3 = 0 THEN NULL
              ELSE 'https://example.com/doc/'
                   || CAST((doc_id // 3) * 3 AS VARCHAR) END AS canon
  FROM documents
)
SELECT url, canon AS canonical_url,
       coalesce(canon, url) AS group_key,
       (canon IS NULL OR canon = url) AS is_canonical
FROM pages
"""


def q_main_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate removal (functions/boilerplate.py): each document is
    wrapped in chrome — nav + footer link rows, a script, a comment —
    around its real text; block-density scoring must recover exactly the
    text and drop every chrome block. Same regex/threshold constants
    generate the DuckDB twin, so this is full cross-engine parity of the
    justext-style heuristic. All native expressions (one per row)."""
    from data_pipeline_spark.functions.boilerplate import (
        content_ratio,
        main_content,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    html = F.concat(
        F.lit("<html><head><script>track();</script></head><body>"
              '<nav><a href="/">Home</a> <a href="/a">A</a> '
              '<a href="/b">B</a></nav><p>'),
        F.substring("text", 1, 400),
        F.lit('</p><!-- junk --><footer><a href="/t">T</a> '
              '<a href="/p">P</a></footer></body></html>'),
    )
    pages = d.select("doc_id", html.alias("html"))
    return pages.select(
        "doc_id",
        main_content("html").alias("content"),
        F.round(content_ratio("html"), 6).alias("content_ratio"),
    )


def _sql_main_content() -> str:
    from data_pipeline_spark.functions.boilerplate import (
        sql_content_ratio,
        sql_main_content,
    )

    return f"""
WITH pages AS (
  SELECT doc_id,
    '<html><head><script>track();</script></head><body>'
    || '<nav><a href="/">Home</a> <a href="/a">A</a> <a href="/b">B</a></nav><p>'
    || substr(text, 1, 400)
    || '</p><!-- junk --><footer><a href="/t">T</a> <a href="/p">P</a></footer></body></html>'
    AS html
  FROM documents
)
SELECT doc_id, {sql_main_content('html')} AS content,
       round({sql_content_ratio('html')}, 6) AS content_ratio
FROM pages
"""


_PII_SYNTH_SPARK = (
    "concat(substring(text, 1, 40), ' contact user', CAST(doc_id AS string), "
    "'@example.com or +92300', lpad(CAST(doc_id AS string), 7, '0'), "
    "' ip 10.0.', CAST(doc_id % 256 AS string), '.', "
    "CAST((doc_id * 7) % 256 AS string))"
)
_PII_SYNTH_DUCK = _PII_SYNTH_SPARK.replace("AS string", "AS VARCHAR")


def q_pii_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over text with deterministically injected email/phone/IP:
    masked text + per-category counts, all native regexp expressions."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_PII_SYNTH_SPARK).alias("text")
    )
    counts = WU.pii_counts("text")
    return d.select(
        "doc_id",
        WU.mask_pii("text").alias("masked"),
        counts["email"].alias("n_email"),
        counts["ipv4"].alias("n_ip"),
        counts["phone"].alias("n_phone"),
    )


_SQL_PII_COUNTS = WU.sql_pii_counts("text")
_SQL_PII = f"""
WITH piiq AS (SELECT doc_id, {_PII_SYNTH_DUCK} AS text FROM documents)
SELECT doc_id, {WU.sql_mask_pii('text')} AS masked,
       {_SQL_PII_COUNTS['email']} AS n_email,
       {_SQL_PII_COUNTS['ipv4']} AS n_ip,
       {_SQL_PII_COUNTS['phone']} AS n_phone
FROM piiq
"""


# Multi-line docs synthesized deterministically (the documents table is
# single-line): a corpus-wide footer, a body line shared by doc_id % 5
# class, and a unique opening — the C4 line-dedup shape.
_MULTILINE_SPARK = (
    "concat('opening ', CAST(doc_id AS string), chr(10), "
    "'(c) example footer line', chr(10), "
    "'shared body ', CAST(doc_id % 5 AS string), chr(10), "
    "substring(text, 1, 60))"
)
_MULTILINE_DUCK = _MULTILINE_SPARK.replace("AS string", "AS VARCHAR")


def q_dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style corpus-wide line dedup: every line keeps only its first
    (doc_id, line index) occurrence; docs reassembled in order."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_MULTILINE_SPARK).alias("text")
    )
    return TD.line_dedup(d, "doc_id", "text")


_SQL_LINE_DEDUP = TD.sql_line_dedup(
    f"SELECT doc_id, {_MULTILINE_DUCK} AS text FROM documents",
    "doc_id", "text",
)


_SEARCH_TERMS = ["table", "scan", "merge"]


def q_doc_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index batch core: postings build + AND term search with
    tf-sum ranking (TakeOrderedAndProject, isin filter at the scan)."""
    d = _t(spark, sf_dir, "documents")
    posts = II.build_postings(d, "doc_id", "text")
    return II.search_postings(posts, _SEARCH_TERMS, mode="and", top_k=25)


_SQL_DOC_SEARCH = II.sql_search_postings(
    II.sql_build_postings("SELECT doc_id, text FROM documents", "doc_id", "text"),
    _SEARCH_TERMS,
    mode="and",
    top_k=25,
)


def q_doc_search_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 ranking over the same postings (idf × length-normalized
    tf, rounded-score ordering with doc-id tie-break)."""
    d = _t(spark, sf_dir, "documents")
    posts = II.build_postings(d, "doc_id", "text")
    return II.bm25_search(posts, _SEARCH_TERMS, mode="and", top_k=25)


_SQL_DOC_SEARCH_BM25 = II.sql_bm25_search(
    II.sql_build_postings("SELECT doc_id, text FROM documents", "doc_id", "text"),
    _SEARCH_TERMS,
    mode="and",
    top_k=25,
)

_PHRASE = ("table", "scan")


def q_doc_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search over POSITIONAL postings (slot-shift
    intersection: slot i votes for start = pos - i; a start winning all
    slots is an occurrence). Postings filter pushes to the scan; the slot
    table broadcasts; two hash aggs; no postings self-join."""
    d = _t(spark, sf_dir, "documents")
    posts = II.build_positional_postings(d, "doc_id", "text")
    return II.phrase_search(posts, _PHRASE, top_k=25)


_SQL_PHRASE_SEARCH = II.sql_phrase_search(
    II.sql_build_positional_postings(
        "SELECT doc_id, text FROM documents", "doc_id", "text"
    ),
    _PHRASE,
    top_k=25,
)


# 'a' + U+0301 combining acute: every 'a' becomes a decomposed sequence the
# normalizer must fold to precomposed U+00E1.
_NFC_DIRTY = "á"


def q_doc_nfc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization (Arrow pandas UDF) vs DuckDB's native
    nfc_normalize — pins cross-engine composition-form parity."""
    from data_pipeline_spark.functions.charset import nfc_normalize_udf

    d = _t(spark, sf_dir, "documents")
    dirty = F.regexp_replace(F.col("text"), "a", _NFC_DIRTY)
    return d.select(
        "doc_id", nfc_normalize_udf()(dirty).alias("text_nfc")
    )


_SQL_NFC_NORMALIZE = (
    "SELECT doc_id, "
    f"nfc_normalize(replace(text, 'a', '{_NFC_DIRTY}')) AS text_nfc "
    "FROM documents"
)


def q_host_reputation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-level curation rollup: per-host doc counts, mean quality,
    corpus-wide exact-dup ratio, top predicted language, verdict."""
    d = _t(spark, sf_dir, "documents").select(
        F.col("source").alias("host"), "text"
    )
    return HR.host_reputation(d, "host", "text")


_SQL_HOST_REPUTATION = HR.sql_host_reputation(
    "SELECT source AS host, text FROM documents", "host", "text"
)


# Synthesized page head: lang attr, title, description / og:title meta in
# BOTH attribute orders (doc_id parity), robots-noindex on doc_id % 3 == 0.
_HTMLMETA_SPARK = """concat(
 '<html lang="', lang, '"><head><title>Doc ', CAST(doc_id AS string), ' of ', source, '</title>',
 CASE WHEN doc_id % 2 = 0
   THEN concat('<meta name="description" content="', substring(text, 1, 50), '">')
   ELSE concat('<meta content="', substring(text, 1, 50), '" name="description">') END,
 CASE WHEN doc_id % 5 = 0 THEN ''
   WHEN doc_id % 2 = 0 THEN concat('<meta property="og:title" content="OG ', CAST(doc_id AS string), '">')
   ELSE concat('<meta content="OG ', CAST(doc_id AS string), '" property="og:title">') END,
 CASE WHEN doc_id % 3 = 0 THEN '<meta name="robots" content="noindex">' ELSE '' END,
 '</head><body></body></html>')"""
_HTMLMETA_DUCK = """'<html lang="' || lang || '"><head><title>Doc ' || CAST(doc_id AS VARCHAR) || ' of ' || source || '</title>' ||
 CASE WHEN doc_id % 2 = 0
   THEN '<meta name="description" content="' || substr(text, 1, 50) || '">'
   ELSE '<meta content="' || substr(text, 1, 50) || '" name="description">' END ||
 CASE WHEN doc_id % 5 = 0 THEN ''
   WHEN doc_id % 2 = 0 THEN '<meta property="og:title" content="OG ' || CAST(doc_id AS VARCHAR) || '">'
   ELSE '<meta content="OG ' || CAST(doc_id AS VARCHAR) || '" property="og:title">' END ||
 CASE WHEN doc_id % 3 = 0 THEN '<meta name="robots" content="noindex">' ELSE '' END ||
 '</head><body></body></html>'"""


def q_html_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-metadata extraction (title / description / og:title / robots
    noindex / lang) as native regexp exprs over synthesized page heads."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_HTMLMETA_SPARK).alias("html")
    )
    return HM.with_page_metadata(d, "html").select("doc_id", *HM.FIELDS)


_SQL_HTML_METADATA = (
    "SELECT doc_id, "
    + ", ".join(f"{e} AS {k}" for k, e in HM.sql_page_metadata("html").items())
    + f" FROM (SELECT doc_id, {_HTMLMETA_DUCK} AS html FROM documents)"
)


# Boilerplate prefix shared by every doc in the same (doc_id % 7) group: the
# deterministic duplicated spans the ExactSubstr contracts detect/remove.
_SPAN_SPARK = (
    "concat('terms of service for group ', CAST(doc_id % 7 AS string), "
    "' all rights reserved . ', substring(text, 1, 120))"
)
_SPAN_DUCK = (
    "'terms of service for group ' || CAST(doc_id % 7 AS VARCHAR) || "
    "' all rights reserved . ' || substr(text, 1, 120)"
)


def q_doc_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr (Lee et al. 2022): every duplicated 5-token span keeps
    only its corpus-wide first occurrence; docs rebuilt from survivors."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_SPAN_SPARK).alias("text")
    )
    return SPD.span_dedup(d, "doc_id", "text", k=5)


_SQL_SPAN_DEDUP = SPD.sql_span_dedup(
    f"SELECT doc_id, {_SPAN_DUCK} AS text FROM documents", "doc_id", "text", k=5
)


def q_doc_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-span report: gram, doc/occurrence counts, first doc."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_SPAN_SPARK).alias("text")
    )
    return SPD.dup_spans(d, "doc_id", "text", k=5)


_SQL_DUP_SPANS = SPD.sql_dup_spans(
    f"SELECT doc_id, {_SPAN_DUCK} AS text FROM documents", "doc_id", "text", k=5
)


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-window chunking (64-token windows, 8-token overlap): the
    pre-training slicing pass, a pure narrow map (no shuffle — pinned in
    tests/test_textprep.py)."""
    d = _t(spark, sf_dir, "documents")
    return TP.chunk_documents(d, "doc_id", "text", chunk_tokens=64, overlap=8)


_SQL_CHUNKS = TP.sql_chunk_documents(
    "SELECT doc_id, text FROM documents", "doc_id", "text",
    chunk_tokens=64, overlap=8,
)


def q_doc_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-3 TF-IDF terms: corpus statistics via two keyed hash
    aggs + one term-keyed join (vocabulary never broadcast)."""
    d = _t(spark, sf_dir, "documents")
    return TP.tfidf_keywords(d, "doc_id", "text", k=3)


_SQL_TFIDF = TP.sql_tfidf_keywords(
    "SELECT doc_id, text FROM documents", "doc_id", "text", k=3
)


def q_doc_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-cut sequence packing (256-token packs, 4 shards): the
    training-sequence assembly pass — one keyed window cumsum per shard
    plus a narrow span-explode, nothing quadratic."""
    d = _t(spark, sf_dir, "documents")
    return TP.pack_sequences(d, "doc_id", "text", ctx_tokens=256, n_shards=4)


_SQL_PACK = TP.sql_pack_sequences(
    "SELECT doc_id, text FROM documents", "doc_id", "text",
    ctx_tokens=256, n_shards=4,
)


def q_doc_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-self unigram surprisal (CCNet-style perplexity filtering
    without an external LM): two keyed hash aggs + a term-keyed join."""
    d = _t(spark, sf_dir, "documents")
    return TP.unigram_surprisal(d, "doc_id", "text")


_SQL_SURPRISAL = TP.sql_unigram_surprisal(
    "SELECT doc_id, text FROM documents", "doc_id", "text"
)


def q_events_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phi-heavy hitters via bounded-memory two-pass plan
    (operators/heavyhitters.py): per-partition Misra-Gries summaries in
    Arrow mapInPandas (zero shuffle, superset guarantee), broadcast
    candidate semi-join, exact count of candidates only. Output is
    EXACTLY the full-shuffle answer."""
    from data_pipeline_spark.operators.heavyhitters import heavy_hitters

    ev = _t(spark, sf_dir, "events")
    return heavy_hitters(ev, "user_id", phi=0.0008)


def _sql_heavy_hitters() -> str:
    from data_pipeline_spark.operators.heavyhitters import sql_heavy_hitters

    return sql_heavy_hitters("SELECT user_id FROM events", "user_id", 0.0008)


def q_doc_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style interpolated bigram LM perplexity
    (operators/lmfilter.py): train on a deterministic md5 hash-sampled
    reference partition, score EVERY doc (spine-joined — <2-token docs
    surface with NULL scores). Two training hash aggs + per-doc bigram
    collapse + three count equi-joins; vocabulary never broadcast."""
    from data_pipeline_spark.operators.lmfilter import bigram_perplexity

    d = _t(spark, sf_dir, "documents")
    return bigram_perplexity(d, "doc_id", "text")


def _sql_lm_ppl() -> str:
    from data_pipeline_spark.operators.lmfilter import sql_bigram_perplexity

    return sql_bigram_perplexity(
        "SELECT doc_id, text FROM documents", "doc_id", "text"
    )


_SAMPLE_FRACTIONS = {"en": 0.5, "de": 1.0, "fr": 0.25}
_SAMPLE_DEFAULT = 0.1


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language quota sample (md5-threshold predicate:
    pure scan-level filter, no shuffle, identical across engines/reruns)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return SMP.stratified_hash_sample(
        d, "doc_id", "lang", _SAMPLE_FRACTIONS, _SAMPLE_DEFAULT, seed="mix"
    )


_SQL_STRAT_SAMPLE = (
    "SELECT doc_id, lang FROM documents WHERE "
    + SMP.sql_stratified_predicate(
        "doc_id", "lang", _SAMPLE_FRACTIONS, _SAMPLE_DEFAULT, seed="mix"
    )
)


_TOKEN_BUDGETS = {"en": 3000, "de": 1500}
_TOKEN_BUDGET_DEFAULT = 400


def q_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain mixing by TOKEN budget: per language, keep docs in
    deterministic md5 order until the budget is reached (training mixes
    are specified in tokens, not documents) — one window cumsum per
    stratum, the same plan class as sequence packing."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    return SMP.token_budget_sample(
        d, "doc_id", "lang", "text", _TOKEN_BUDGETS, _TOKEN_BUDGET_DEFAULT,
        seed="mix",
    ).select("doc_id", "lang")


_SQL_TOKEN_BUDGET = (
    "SELECT doc_id, lang FROM ("
    + SMP.sql_token_budget_sample(
        "SELECT doc_id, lang, text FROM documents",
        "doc_id", "lang", "text", _TOKEN_BUDGETS, _TOKEN_BUDGET_DEFAULT,
        seed="mix",
    )
    + ")"
)


# ---------------------------------------------------------------------------
# Dedup family (training-data extension)
# ---------------------------------------------------------------------------

def _docs_with_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ exact copies shifted by 10^6 — deterministic dup groups."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    copies = d.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    return d.unionByName(copies)


def q_dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TD.exact_dedup_groups(_docs_with_dups(spark, sf_dir), "text", "doc_id")


_SQL_EXACT_DEDUP = f"""
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents
)
{TD.sql_exact_dedup_groups('all_docs', 'text', 'doc_id')}
"""


def _docs_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subset ∪ near-dup variants (one appended token) — known pairs."""
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") % 20 == 0).select(
        "doc_id", "text"
    )
    variants = d.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzzmarker")).alias("text"),
    )
    return d.unionByName(variants)


_CERT_COLS = ["o_custkey", "o_orderpriority", "o_orderstatus"]


def _cert_states(spark: SparkSession, sf_dir: str):
    """Reference state vs a replayed state with injected divergence:
    updates (key%197), deletes (key%211), inserts (key%503 re-keyed)."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"
    )
    mutated = (
        orders.where(F.col("o_orderkey") % 211 != 0)
        .withColumn(
            "o_custkey",
            F.when(
                F.col("o_orderkey") % 197 == 0, F.col("o_custkey") + 1
            ).otherwise(F.col("o_custkey")),
        )
        .unionByName(
            orders.where(F.col("o_orderkey") % 503 == 0).select(
                (F.col("o_orderkey") + 90000000).alias("o_orderkey"),
                "o_custkey",
                "o_orderstatus",
                "o_orderpriority",
            )
        )
    )
    return orders, mutated


def q_cdc_state_certificate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State-equivalence certificate (X101): per-bucket (count, modular
    sum of portable row hashes) for reference vs diverged replay — the
    scale-safe form of the north rule's "final table state matches after
    replay" check (two O(n) aggs, ≤ n_buckets output rows, no row diff).
    lake/statecert.py."""
    from data_pipeline_spark.lake.statecert import compare_states

    a, b = _cert_states(spark, sf_dir)
    return compare_states(
        a, b, "o_orderkey", cols=_CERT_COLS, n_buckets=64
    ).withColumnRenamed("match", "is_match")


def q_cdc_state_drilldown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level drill-down on the certificate mismatches: keyed diff
    computed ONLY over the buckets whose certificates disagree — output
    is exactly the injected updates/deletes/inserts."""
    from data_pipeline_spark.lake.statecert import state_diff

    a, b = _cert_states(spark, sf_dir)
    return state_diff(a, b, "o_orderkey", cols=_CERT_COLS, n_buckets=64)


def _sql_cert_states() -> str:
    return """
a AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority FROM orders),
b AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 197 = 0 THEN o_custkey + 1 ELSE o_custkey END
           AS o_custkey,
         o_orderstatus, o_orderpriority
  FROM orders WHERE o_orderkey % 211 <> 0
  UNION ALL
  SELECT o_orderkey + 90000000 AS o_orderkey, o_custkey, o_orderstatus,
         o_orderpriority
  FROM orders WHERE o_orderkey % 503 = 0
)"""


def _sql_state_certificate() -> str:
    from data_pipeline_spark.lake.statecert import sql_state_checksum

    ca = sql_state_checksum("a", "o_orderkey", _CERT_COLS, 64)
    cb = sql_state_checksum("b", "o_orderkey", _CERT_COLS, 64)
    return f"""
WITH {_sql_cert_states()},
ca AS ({ca}), cb AS ({cb})
SELECT coalesce(ca.bucket, cb.bucket) AS bucket,
       coalesce(ca.n_rows, 0) AS a_rows,
       coalesce(cb.n_rows, 0) AS b_rows,
       coalesce(ca.checksum, 0) AS a_checksum,
       coalesce(cb.checksum, 0) AS b_checksum,
       (coalesce(ca.n_rows, 0) = coalesce(cb.n_rows, 0)
        AND coalesce(ca.checksum, 0) = coalesce(cb.checksum, 0)) AS is_match
FROM ca FULL OUTER JOIN cb ON ca.bucket = cb.bucket
"""


def _sql_state_drilldown() -> str:
    return f"""
WITH {_sql_cert_states()}
SELECT CAST(coalesce(a.o_orderkey, b.o_orderkey) AS VARCHAR) AS o_orderkey,
       CAST(CASE WHEN a.o_orderkey IS NULL THEN 0 ELSE 1 END AS BIGINT) AS a_rows,
       CAST(CASE WHEN b.o_orderkey IS NULL THEN 0 ELSE 1 END AS BIGINT) AS b_rows,
       CASE WHEN a.o_orderkey IS NULL THEN 'b_only'
            WHEN b.o_orderkey IS NULL THEN 'a_only'
            ELSE 'changed' END AS status
FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
   OR a.o_custkey IS DISTINCT FROM b.o_custkey
   OR a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
   OR a.o_orderpriority IS DISTINCT FROM b.o_orderpriority
"""


def q_cdc_cert_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental certificate maintenance (X102): the post-divergence
    certificate computed WITHOUT scanning the post state — base cert +
    one hash agg over the row-level change feed (snapshot_diff). The
    DuckDB oracle computes the post-state certificate directly, so the
    contract pins the abelian-group update law itself."""
    from data_pipeline_spark.lake.diff import snapshot_diff
    from data_pipeline_spark.lake.statecert import state_checksum, update_checksum

    a, b = _cert_states(spark, sf_dir)
    base = state_checksum(a, "o_orderkey", _CERT_COLS, 64)
    changes = snapshot_diff(a, b, "o_orderkey")
    return update_checksum(base, changes, "o_orderkey", _CERT_COLS, 64)


def _sql_cert_incremental() -> str:
    from data_pipeline_spark.lake.statecert import sql_state_checksum

    return f"""
WITH {_sql_cert_states()}
{sql_state_checksum('b', 'o_orderkey', _CERT_COLS, 64)}
"""


def q_doc_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (X103): per-language
    Efraimidis-Spirakis draw, 15 docs per lang proportional to n_chars —
    quality-weighted corpus downsampling that preserves diversity
    (operators/sampling.py:weighted_sample)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return SMP.weighted_sample(
        docs, "doc_id", "n_chars", 15, stratum_col="lang"
    )


_SQL_WEIGHTED_SAMPLE = SMP.sql_weighted_sample(
    "SELECT doc_id, lang, n_chars FROM documents",
    "doc_id",
    "n_chars",
    15,
    stratum_col="lang",
)


def q_events_cms_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch per-user frequency estimates (X104): depth 4 x
    width 256 over 10k events / 150 users — real collisions, so the
    one-sided error law is live in the contract. Sketch built with one
    hash agg, estimates via broadcast probe join
    (operators/cms.py)."""
    from data_pipeline_spark.operators.cms import cms_build, cms_estimate

    ev = _t(spark, sf_dir, "events")
    sk = cms_build(ev, "user_id", depth=4, width=256)
    return cms_estimate(sk, ev.select("user_id"), "user_id", depth=4, width=256)


def _sql_cms_counts() -> str:
    from data_pipeline_spark.operators.cms import sql_cms_estimate

    return sql_cms_estimate("events", "events", "user_id", depth=4, width=256)


def q_events_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL distinct-user register state per event type (X105): the
    mergeable form of events_user_reach — integer-exact register table,
    foldable across epochs by pointwise max (operators/hll.py). The
    float estimate layer is pinned by tests/test_hll.py accuracy
    bounds."""
    from data_pipeline_spark.operators.hll import hll_registers

    return hll_registers(
        _t(spark, sf_dir, "events"), "user_id", ["event_type"], p=7
    )


def _sql_hll_contract() -> str:
    from data_pipeline_spark.operators.hll import sql_hll_registers

    return sql_hll_registers("events", "user_id", ["event_type"], p=7)


def q_sketch_state_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted sketch state (X106): three ingest epochs folded into a
    lake-persisted CMS via the exactly-once SketchStore ledger
    (operators/sketchstate.py); docs with doc_id%7==0 are re-shipped in
    EVERY epoch, so the frequency state must count them three times. The
    DuckDB twin rebuilds the same sketch from the equivalent union-with-
    duplicates relation — persistence must be invisible to the math."""
    import tempfile

    from data_pipeline_spark.operators.sketchstate import SketchStore

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.concat(F.lit("doc"), F.col("doc_id")).alias("key")
    )
    store = SketchStore.create(
        spark,
        tempfile.mkdtemp(prefix="skst_"),
        "key",
        bloom_m=1 << 14,
        cms_width=1 << 10,
        hll_p=8,
    )
    for e in range(3):
        store.update(
            docs.where(
                (F.col("doc_id") % 3 == e) | (F.col("doc_id") % 7 == 0)
            ).select("key"),
            epoch=e,
        )
    return store.freq(docs.select("key"))


def _sql_sketch_state_freq() -> str:
    from data_pipeline_spark.operators.cms import sql_cms_estimate

    ingested = " UNION ALL ".join(
        f"SELECT 'doc' || CAST(doc_id AS VARCHAR) AS key FROM documents "
        f"WHERE doc_id % 3 = {e} OR doc_id % 7 = 0"
        for e in range(3)
    )
    return sql_cms_estimate(
        f"({ingested})",
        "(SELECT 'doc' || CAST(doc_id AS VARCHAR) AS key FROM documents)",
        "key",
        depth=4,
        width=1 << 10,
        seed="sketch",
    )


def q_events_dd_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DDSketch bucket state of event values per type (X107): the
    mergeable form of events_value_quantiles — geometric bins with fixed
    2% relative accuracy, foldable across epochs by sum
    (operators/ddsketch.py). The float quantile layer is pinned by the
    relative-error law in tests/test_ddsketch.py."""
    from data_pipeline_spark.operators.ddsketch import dd_histogram

    return dd_histogram(
        _t(spark, sf_dir, "events"), "value", ["event_type"], alpha=0.02
    )


def _sql_dd_contract() -> str:
    from data_pipeline_spark.operators.ddsketch import sql_dd_histogram

    return sql_dd_histogram("events", "value", ["event_type"], alpha=0.02)


def q_events_kmv_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV theta-sketch state of distinct users per event type (X110):
    the k smallest md5 values — the ONLY mergeable distinct state that
    also supports set algebra (intersection/containment, which HLL
    cannot). k=64 < the sf0.01 user population, so the driver checks the
    truncated (estimator) regime, not just stored-whole groups. String-
    exact; the float layer is pinned in tests/test_kmv.py."""
    from data_pipeline_spark.operators.kmv import kmv_sketch

    return kmv_sketch(
        _t(spark, sf_dir, "events"), "user_id", ["event_type"], k=64
    )


def q_events_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise user-base set algebra between event types from the X110
    sketches alone (X111): union / intersection / Jaccard / containment
    per (type_a, type_b), P pairs × ≤2k rows of work — the corpus-
    overlap diagnostic ("this crawl is 83% contained in last month's")
    at sketch cost. Same seeded md5 + IEEE754 arithmetic in the DuckDB
    twin."""
    from data_pipeline_spark.operators.kmv import kmv_overlap, kmv_sketch

    sk = kmv_sketch(_t(spark, sf_dir, "events"), "user_id", ["event_type"], k=64)
    return kmv_overlap(sk, "event_type", k=64)


def _sql_kmv_sketch_contract() -> str:
    from data_pipeline_spark.operators.kmv import sql_kmv_sketch

    return sql_kmv_sketch("events", "user_id", ["event_type"], k=64)


def _sql_kmv_overlap_contract() -> str:
    from data_pipeline_spark.operators.kmv import sql_kmv_overlap

    return sql_kmv_overlap("events", "user_id", "event_type", k=64)


def q_doc_sample_maintained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintained uniform sample (X112): three ingest epochs folded into
    a persisted k=40 reservoir via the exactly-once SampleStore ledger
    (operators/samplestate.py); docs with doc_id%7==0 are re-shipped in
    EVERY epoch with an epoch-stamped payload, so the state must show
    the LATEST epoch's payload for them. The DuckDB twin rebuilds the
    same sample from the equivalent union-with-reingestion relation —
    persistence must be invisible to the math, and k=40 < the corpus so
    the driver checks the truncated regime."""
    import tempfile

    from data_pipeline_spark.operators.samplestate import SampleStore

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit("doc"), F.col("doc_id")).alias("key"),
        "lang",
    )
    store = SampleStore.create(
        spark,
        tempfile.mkdtemp(prefix="smst_"),
        "key",
        k=40,
        payload_cols=["tag"],
    )
    for e in range(3):
        store.update(
            docs.where((F.col("doc_id") % 3 == e) | (F.col("doc_id") % 7 == 0))
            .select(
                "key", F.concat(F.col("lang"), F.lit(f"@e{e}")).alias("tag")
            ),
            epoch=e,
        )
    return store.sample()


def _sql_doc_sample_maintained() -> str:
    from data_pipeline_spark.operators.samplestate import sql_maintained_sample

    ingested = " UNION ALL ".join(
        f"SELECT {e} AS epoch, 'doc' || CAST(doc_id AS VARCHAR) AS key, "
        f"lang || '@e{e}' AS tag FROM documents "
        f"WHERE doc_id % 3 = {e} OR doc_id % 7 = 0"
        for e in range(3)
    )
    return sql_maintained_sample(
        f"({ingested})", "key", 40, payload_cols=["tag"]
    )


def q_doc_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-balanced shard export assignment (X113): documents → shards
    of ≈10k chars each by running-cost prefix sum in doc_id order
    (operators/export.py). The Spark path is a distributed prefix sum
    (range exchange + bounded per-partition window + P-scalar driver
    fold, never a global one-partition sort); the DuckDB twin is the
    equivalent global window cumsum — identical row→shard map by
    construction (the prefix sum is partition-independent)."""
    from data_pipeline_spark.operators.export import assign_shards

    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return assign_shards(docs, "n_chars", 10_000, "doc_id").select(
        "doc_id", "n_chars", "shard_id"
    )


def _sql_doc_shard_assign() -> str:
    from data_pipeline_spark.operators.export import sql_assign_shards

    return sql_assign_shards(
        "(SELECT doc_id, n_chars FROM documents)",
        "n_chars",
        10_000,
        "doc_id",
        select="doc_id, n_chars",
    )


def q_doc_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test assignment (X115): the split is a
    pure function of the ENTITY (source/host) hash, so near-duplicate
    pages within a site can never straddle train and eval — the
    contamination a row-wise randomSplit invites. One narrow
    expression, no shuffle; the DuckDB twin is the identical CASE over
    the same md5 buckets."""
    from data_pipeline_spark.operators.sampling import assign_split

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return assign_split(
        docs, "source", {"train": 0.8, "val": 0.1, "test": 0.1}
    )


def _sql_doc_split_assign() -> str:
    from data_pipeline_spark.operators.sampling import sql_assign_split

    expr = sql_assign_split("source", {"train": 0.8, "val": 0.1, "test": 0.1})
    return f"SELECT doc_id, source, {expr} AS split FROM documents"


def q_feed_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RSS/Atom feed ingestion (X116, sources/feeds.py): even documents
    become RSS files (CDATA title kept literal, entity-escaped link
    decoded, guid identity, a link-less third item dropped), odd ones
    Atom files (link is an ATTRIBUTE with rel=alternate preferred over
    rel=self, id identity, guid→link fallback on the second entry) —
    parsed by one native regexp_extract_all + explode per dialect. The
    oracle runs the SAME regexes + entity decode under DuckDB/RE2."""
    from data_pipeline_spark.sources.feeds import parse_feed

    d = _t(spark, sf_dir, "documents").select("doc_id")
    n = F.col("doc_id").cast("string")
    rss = F.concat(
        F.lit('<rss version="2.0"><channel><title>News</title>\n<item>'
              "<title><![CDATA[Doc "), n,
        F.lit(" &lt;raw&gt;]]></title><link>https://news.example.com/n/"), n,
        F.lit("?a=1&amp;b=2</link><guid>tag:n,"), n,
        F.lit("</guid><pubDate>Mon, 02 Feb 2026 10:30:00 +0000</pubDate>"
              "</item>\n<item><title>Plain &amp; "), n,
        F.lit("</title><link>https://news.example.com/m/"), n,
        F.lit("</link></item>\n<item><title>nolink</title></item>"
              "</channel></rss>"),
    )
    atom = F.concat(
        F.lit('<feed xmlns="http://www.w3.org/2005/Atom">\n<entry>'
              '<title type="text">Entry '), n,
        F.lit('</title><link rel="self" href="https://blog.example.org/'
              'feed.xml"/><link rel="alternate" '
              'href="https://blog.example.org/p/'), n,
        F.lit('"/><id>urn:doc:'), n,
        F.lit("</id><updated>2026-02-03T08:00:00Z</updated></entry>\n"
              "<entry><title><![CDATA[Second "), n,
        F.lit(']]></title><link href="https://blog.example.org/q/'), n,
        F.lit('"/><updated>2026-02-04</updated></entry>\n</feed>'),
    )
    xml = F.when(F.col("doc_id") % 2 == 0, rss).otherwise(atom)
    return parse_feed(d.select("doc_id", xml.alias("xml")))


def _sql_feed_parse() -> str:
    from data_pipeline_spark.sources.feeds import sql_parse_feed

    n = "CAST(doc_id AS VARCHAR)"
    rss = (
        "'<rss version=\"2.0\"><channel><title>News</title>' || chr(10) ||"
        f" '<item><title><![CDATA[Doc ' || {n} || ' &lt;raw&gt;]]></title>"
        f"<link>https://news.example.com/n/' || {n} || '?a=1&amp;b=2</link>"
        f"<guid>tag:n,' || {n} || '</guid>"
        "<pubDate>Mon, 02 Feb 2026 10:30:00 +0000</pubDate></item>' || "
        f"chr(10) || '<item><title>Plain &amp; ' || {n} || '</title>"
        f"<link>https://news.example.com/m/' || {n} || '</link></item>' || "
        "chr(10) || '<item><title>nolink</title></item></channel></rss>'"
    )
    atom = (
        "'<feed xmlns=\"http://www.w3.org/2005/Atom\">' || chr(10) || "
        f"'<entry><title type=\"text\">Entry ' || {n} || '</title>"
        '<link rel="self" href="https://blog.example.org/feed.xml"/>'
        f"<link rel=\"alternate\" href=\"https://blog.example.org/p/' || {n}"
        f" || '\"/><id>urn:doc:' || {n} || '</id>"
        "<updated>2026-02-03T08:00:00Z</updated></entry>' || chr(10) || "
        f"'<entry><title><![CDATA[Second ' || {n} || ']]></title>"
        f"<link href=\"https://blog.example.org/q/' || {n} || '\"/>"
        "<updated>2026-02-04</updated></entry>' || chr(10) || '</feed>'"
    )
    files = (
        f"SELECT doc_id, CASE WHEN doc_id % 2 = 0 THEN {rss} "
        f"ELSE {atom} END AS xml FROM documents"
    )
    return sql_parse_feed(f"({files})")


def q_doc_tokens_multilingual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Script-calibrated token counting (X117): each document gets an
    unspaced CJK suffix (doc_id%4 copies) and a Cyrillic word — the
    whitespace counter sees the suffix as one token (starving CJK in
    budget math) and the ASCII BPE counter sees every Cyrillic char as a
    symbol (letting spaced non-latin scripts hog budgets); the
    multilingual counter charges one per CJK char + one per unicode
    letter run. All three are returned so the calibration gap itself is
    oracle-checked."""
    from data_pipeline_spark.functions.textstats import (
        bpe_token_count,
        multilingual_token_count,
        token_count,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    mixed = F.concat(
        F.col("text"),
        F.lit(" слово "),
        F.repeat(F.lit("今天天气很好"),
                 (F.col("doc_id") % 4).cast("int")),
    )
    return d.select(
        "doc_id",
        multilingual_token_count(mixed).alias("ml_tokens"),
        token_count(mixed).alias("ws_tokens"),
        bpe_token_count(mixed).alias("bpe_tokens"),
    )


def _sql_doc_tokens_multilingual() -> str:
    from data_pipeline_spark.functions.textstats import (
        sql_bpe_token_count,
        sql_multilingual_token_count,
        sql_token_count,
    )

    mixed = (
        "(text || ' слово ' || "
        "repeat('今天天气很好', doc_id % 4))"
    )
    return f"""
WITH mixed_docs AS (SELECT doc_id, {mixed} AS m FROM documents)
SELECT doc_id,
  {sql_multilingual_token_count('m')} AS ml_tokens,
  {sql_token_count('m')} AS ws_tokens,
  {sql_bpe_token_count('m')} AS bpe_tokens
FROM mixed_docs
"""


def q_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus report card (X118, operators/report.py): the datasheet
    numbers — rows, char/token mass (whitespace AND script-calibrated,
    so the gap itself is a diagnostic), quality mean, Gopher pass rate,
    exact-dup ratio, per-language shares — in one aggregation pass,
    emitted as a tidy (metric, dimension, value) frame. The DuckDB twin
    composes the SAME oracle-checked expression twins."""
    from data_pipeline_spark.operators.report import corpus_report

    return corpus_report(_t(spark, sf_dir, "documents"))


def _sql_corpus_report() -> str:
    from data_pipeline_spark.operators.report import sql_corpus_report

    return sql_corpus_report("documents")


def q_corpus_report_maintained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintained report card (X119): three ingest epochs folded into a
    lake-persisted ReportStore via the exactly-once ledger
    (operators/reportstate.py); docs with doc_id%7==0 are re-shipped in
    EVERY epoch, so the maintained sums must count them three times.
    The contract checks the INTEGER-EXACT metrics (rows, chars, token
    masses, lang shares) against a DuckDB rebuild from the equivalent
    union-with-duplicates relation — persistence must be invisible to
    the math; the HLL dup-ratio float layer is pinned by
    tests/test_reportstate.py tolerance bounds instead."""
    import tempfile

    from data_pipeline_spark.operators.reportstate import ReportStore

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    store = ReportStore.create(
        spark, tempfile.mkdtemp(prefix="repst_"), hll_p=8
    )
    for e in range(3):
        store.update(
            docs.where((F.col("doc_id") % 3 == e) | (F.col("doc_id") % 7 == 0)),
            epoch=e,
        )
    return store.report().where(
        F.col("metric").isin(
            "rows", "chars_total", "tokens_ws_total", "tokens_ml_total",
            "lang_share",
        )
    )


def _sql_corpus_report_maintained() -> str:
    from data_pipeline_spark.functions.textstats import (
        sql_multilingual_token_count,
        sql_token_count,
    )

    ingested = " UNION ALL ".join(
        f"SELECT text, lang FROM documents "
        f"WHERE doc_id % 3 = {e} OR doc_id % 7 = 0"
        for e in range(3)
    )
    return f"""
WITH mrep_docs AS (
  SELECT lang, length(text) AS _chars,
         {sql_token_count('text')} AS _ws,
         {sql_multilingual_token_count('text')} AS _ml
  FROM ({ingested})
),
mrep_globals AS (
  SELECT count(*) AS rows, CAST(sum(_chars) AS DOUBLE) AS chars_total,
         CAST(sum(_ws) AS DOUBLE) AS tokens_ws_total,
         CAST(sum(_ml) AS DOUBLE) AS tokens_ml_total
  FROM mrep_docs
)
SELECT 'rows' AS metric, 'all' AS dimension,
       round(CAST(rows AS DOUBLE), 6) AS value FROM mrep_globals
UNION ALL
SELECT 'chars_total', 'all', round(chars_total, 6) FROM mrep_globals
UNION ALL
SELECT 'tokens_ws_total', 'all', round(tokens_ws_total, 6) FROM mrep_globals
UNION ALL
SELECT 'tokens_ml_total', 'all', round(tokens_ml_total, 6) FROM mrep_globals
UNION ALL
SELECT 'lang_share', lang,
       round(CAST(count(*) AS DOUBLE)
             / (SELECT count(*) FROM mrep_docs), 6)
FROM mrep_docs GROUP BY lang
"""


def _dhash_media_df(spark: SparkSession, sf_dir: str):
    """Synthetic media for the X121 contracts: every 10th doc becomes a
    REAL binary P6 PPM of nine uniform column blocks whose brightness
    encodes doc_id's low nine bits (200 if set else 50) — chosen so the
    dHash of the DECODED image has a closed form DuckDB can compute
    from doc_id arithmetic alone: bit j of each row = (bit_j=1 AND
    bit_{j+1}=0), all eight rows identical → hash = rowbyte ×
    0x0101010101010101 (two's-complement into a signed 64)."""
    import pandas as pd

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 10 == 0)
    )

    def gen(batches):
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                cols = [
                    200 if (int(doc_id) >> j) & 1 else 50 for j in range(9)
                ]
                roww = b"".join(bytes((v, v, v)) * 4 for v in cols)
                out.append(b"P6\n36 32\n255\n" + roww * 32)
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "content": out}
            )

    return d.mapInPandas(gen, "media_id long, content binary").withColumn(
        "media_type", F.lit("image/x-portable-pixmap")
    )


_SQL_DHASH_CTE = """
dhash_rows AS (
  SELECT doc_id AS media_id,
    ({B}) AS _rb
  FROM documents WHERE doc_id % 10 = 0
),
dhash_vals AS (
  SELECT media_id,
    CAST(CAST(_rb AS HUGEINT) * 72340172838076673
         - CASE WHEN _rb >= 128 THEN CAST(18446744073709551616 AS HUGEINT)
                ELSE CAST(0 AS HUGEINT) END AS BIGINT) AS dhash
  FROM dhash_rows
)
""".format(
    B=" + ".join(
        f"(CASE WHEN ((doc_id >> {j}) & 1) = 1 AND ((doc_id >> {j + 1}) & 1) = 0 "
        f"THEN {2 ** (7 - j)} ELSE 0 END)"
        for j in range(8)
    )
)


def q_media_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image hashing through the REAL decode path (X121,
    operators/imagedup.py): binary PPM → luma plane → 9×8 block means →
    64-bit difference hash, via mapInPandas. The oracle computes the
    closed-form expected hash from doc_id arithmetic (see
    _dhash_media_df) — so the decoder + block-mean + bit-packing math
    is verified end-to-end against independent math, not a fake."""
    from data_pipeline_spark.operators.imagedup import image_dhash

    return image_dhash(_dhash_media_df(spark, sf_dir), id_col="media_id")


def _sql_media_dhash() -> str:
    return f"WITH {_SQL_DHASH_CTE} SELECT media_id, dhash FROM dhash_vals"


def q_media_dhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup image pairs (X121): pigeonhole banding over the real
    hashes — chunk equi-joins, never all-pairs — verified by
    bit_count(xor). The oracle brute-forces the same pairs from the
    closed-form hashes (50 media rows → trivially exact in SQL), so the
    banding's completeness at the distance bound is what's checked."""
    from data_pipeline_spark.operators.imagedup import dhash_pairs, image_dhash

    hashes = image_dhash(_dhash_media_df(spark, sf_dir), id_col="media_id")
    return dhash_pairs(hashes, id_col="media_id", max_hamming=8)


def _sql_media_dhash_pairs() -> str:
    return f"""
WITH {_SQL_DHASH_CTE}
SELECT a.media_id AS id_a, b.media_id AS id_b,
       CAST(bit_count(xor(a.dhash, b.dhash)) AS INTEGER) AS hamming
FROM dhash_vals a JOIN dhash_vals b ON a.media_id < b.media_id
WHERE bit_count(xor(a.dhash, b.dhash)) <= 8
"""


def q_media_dedup_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal dedup end-to-end (r4, VERDICT r3 stretch #7): the full
    curation stage over REAL binary media — decode → dHash → pigeonhole
    near-dup pairs → connected components (large-star/small-star) →
    canonical survivor per cluster (operators/imagedup.py::media_dedup,
    the same stage curate() runs under --media-dedup). The oracle
    re-derives the hashes in closed form from doc_id arithmetic (see
    _dhash_media_df), brute-forces the pairs, and closes them with a
    recursive CTE — so decoder, banding completeness AND the iterative
    component closure are all checked against independent math.
    Round-5 note: the JPEG decoder (operators/jpeg.py) is deliberately
    NOT planted here — this oracle needs closed-form EXACT hashes and
    JPEG is lossy by construction (block-boundary ringing can flip
    equal-column dHash bits), so the planted-JPEG-near-dup e2e lives in
    pytest (`test_jpeg.py::test_dhash_pairs_jpeg_reencode_of_bmp`, the
    same media_dedup stage on real encoded bytes)."""
    from data_pipeline_spark.operators.imagedup import media_dedup

    return media_dedup(
        _dhash_media_df(spark, sf_dir), id_col="media_id", max_hamming=8
    )


def _sql_media_dedup_e2e() -> str:
    from data_pipeline_spark.operators.components import (
        sql_connected_components,
    )

    cc = sql_connected_components(
        nodes_sql="SELECT media_id FROM dhash_vals",
        pairs_sql="""
SELECT a.media_id AS id_a, b.media_id AS id_b
FROM dhash_vals a JOIN dhash_vals b ON a.media_id < b.media_id
WHERE bit_count(xor(a.dhash, b.dhash)) <= 8""",
        src_col="id_a",
        dst_col="id_b",
        node_col="media_id",
    )
    # splice the dhash CTE in front of the closure's WITH RECURSIVE
    body = cc.strip()
    assert body.startswith("WITH RECURSIVE")
    return (
        "WITH RECURSIVE "
        + _SQL_DHASH_CTE.strip().rstrip(",")
        + ",\n"
        + body[len("WITH RECURSIVE"):].strip()
        .replace(
            "SELECT n AS media_id, MIN(r) AS component",
            "SELECT n AS media_id, MIN(r) AS component,"
            " n = MIN(r) AS is_survivor",
        )
    )


def q_dedup_history_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered exact dedup against a historical corpus (X100):
    even-doc history, odd-doc ∪ re-keyed-history-copies as the incoming
    epoch, keyed by md5(text). Output is EXACTLY `new ANTI JOIN history`;
    the sparse-bitmap prefilter only routes definitely-new rows around
    the verify join (operators/bloomdedup.py)."""
    from data_pipeline_spark.operators.bloomdedup import dedup_against_history

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    fp = F.md5(F.col("text")).alias("fp")
    history = docs.where(F.col("doc_id") % 2 == 0).select(fp)
    new = (
        docs.where(F.col("doc_id") % 2 == 1)
        .unionByName(
            docs.where(F.col("doc_id") % 10 == 0).select(
                (F.col("doc_id") + 1000000).alias("doc_id"), "text"
            )
        )
        .select("doc_id", fp)
    )
    return dedup_against_history(new, history, "fp", m_bits=1 << 20, k=4)


_SQL_HISTORY_BLOOM = """
WITH history AS (
  SELECT md5(text) AS fp FROM documents WHERE doc_id % 2 = 0
), newrows AS (
  SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id % 2 = 1
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, md5(text) AS fp
  FROM documents WHERE doc_id % 10 = 0
)
SELECT n.doc_id, n.fp FROM newrows n
WHERE NOT EXISTS (SELECT 1 FROM history h WHERE h.fp = n.fp)
"""


_SQL_DOCS_NEARDUP = """(
  SELECT doc_id, text FROM documents WHERE doc_id % 20 = 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text || ' zzzmarker' AS text
  FROM documents WHERE doc_id % 20 = 0
)"""


def q_doc_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (GPT-3 13-gram rule, n=8 here for the
    synthetic corpus): training docs sharing any token n-gram with the
    "benchmark" slice are flagged. Corpus side never shuffles — bench
    n-grams broadcast into a map-side equi-join, per-doc hit counting."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.where(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    return DX.contaminated_ids(docs, bench, n=8)


_SQL_DECONTAMINATE = DX.sql_contaminated_ids(
    "SELECT doc_id, text FROM documents",
    "SELECT doc_id AS bench_id, text FROM documents WHERE doc_id % 100 = 0",
    n=8,
)


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TD.ngram_jaccard_pairs(
        _docs_neardup(spark, sf_dir), "text", "doc_id", n=3, threshold=0.5
    )


_SQL_NGRAM_JACCARD = TD.sql_ngram_jaccard_pairs(
    _SQL_DOCS_NEARDUP, "text", "doc_id", n=3, threshold=0.5
)


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TD.minhash_lsh_pairs(
        _docs_neardup(spark, sf_dir), "text", "doc_id",
        n=3, num_hashes=12, bands=4, threshold=0.5,
    )


_SQL_MINHASH = TD.sql_minhash_lsh_pairs(
    _SQL_DOCS_NEARDUP, "text", "doc_id", n=3, num_hashes=12, bands=4, threshold=0.5
)


def q_dedup_index_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X24: incremental MinHash index — the originals are already indexed
    (epoch 0); the near-dup variants arrive as epoch 1 and are deduped
    against the stored corpus WITHOUT re-shingling it. Returns epoch 1's
    pairs (new-vs-old + new-vs-new; old-vs-old never re-reported)."""
    import tempfile

    from data_pipeline_spark.operators.dedup_index import MinHashDedupIndex

    d = _docs_neardup(spark, sf_dir)
    idx = MinHashDedupIndex.create(
        spark, tempfile.mkdtemp(prefix="mhidx_"),
        n=3, num_hashes=12, bands=4, threshold=0.5,
    )
    idx.update(d.where(F.col("doc_id") < 1000000), epoch=0)
    return idx.update(d.where(F.col("doc_id") >= 1000000), epoch=1)


def _sql_dedup_index() -> str:
    from data_pipeline_spark.operators.dedup_index import sql_dedup_index_update

    return sql_dedup_index_update(
        _SQL_DOCS_NEARDUP, "text", "doc_id", new_pred="doc >= 1000000",
        n=3, num_hashes=12, bands=4, threshold=0.5,
    )


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") % 10 == 0)
    return TD.simhash(d, "text", "doc_id")


_SQL_SIMHASH = TD.sql_simhash(
    "(SELECT * FROM documents WHERE doc_id % 10 = 0)", "text", "doc_id"
)


def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup: subset ∪ scaled copies (cos=1 by construction)."""
    e = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") % 20 == 0)
    base = e.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    copies = e.select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double") * F.lit(1.01)).alias("embedding"),
    )
    return TD.neardup_embedding_pairs(
        base.unionByName(copies), "embedding", "vec_id", threshold=0.99
    )


_SQL_EMB_NEARDUP = """
WITH all_vecs AS (
  SELECT vec_id, embedding::DOUBLE[] AS embedding
  FROM embeddings WHERE vec_id % 20 = 0
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE) * 1.01) AS embedding
  FROM embeddings WHERE vec_id % 20 = 0
), scored AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round(
           list_sum(list_transform(range(1, len(a.embedding) + 1),
                    i -> a.embedding[i] * b.embedding[i]))
           / (sqrt(list_sum(list_transform(a.embedding, x -> x * x)))
              * sqrt(list_sum(list_transform(b.embedding, x -> x * x)))), 4) AS cos_sim
  FROM all_vecs a JOIN all_vecs b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, cos_sim FROM scored WHERE cos_sim >= 0.99
"""


def _emb_with_copies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding subset ∪ scaled copies (cos=1 by construction) — shared by
    the O(n²) verifier contract and the LSH scale-path contract."""
    e = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") % 20 == 0)
    base = e.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    copies = e.select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double") * F.lit(1.01)).alias("embedding"),
    )
    return base.unionByName(copies)


_SQL_EMB_COPIES = """(
  SELECT vec_id, embedding::DOUBLE[] AS embedding
  FROM embeddings WHERE vec_id % 20 = 0
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE) * 1.01) AS embedding
  FROM embeddings WHERE vec_id % 20 = 0
)"""


def q_dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup on the SCALE path: random-hyperplane LSH buckets
    (candidates from a band equi-join, cost Σ bucket² not n²) verified by
    exact cosine — the 10^10-vector posture. The oracle twin embeds the
    same seeded hyperplane literals, so the driver hash-checks the bucketed
    plan itself; the crossJoin twin (dedup_embedding_cosine) remains the
    small-scale verifier."""
    return SIM.lsh_bucket_pairs(
        _emb_with_copies(spark, sf_dir), "embedding", "vec_id",
        n_planes=8, n_tables=2, seed=42, threshold=0.99, dim=64,
    )


_SQL_EMB_LSH = SIM.sql_lsh_bucket_pairs(
    _SQL_EMB_COPIES, "embedding", "vec_id",
    n_planes=8, n_tables=2, seed=42, threshold=0.99, dim=64,
)


def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs → clusters: transitive closure of the MinHash-LSH candidate
    relation via large-star/small-star (operators/components.py), labeling
    every doc (singletons included) with its cluster's min doc_id — the
    "keep one per near-dup group" primitive."""
    docs = _docs_neardup(spark, sf_dir)
    pairs = TD.minhash_lsh_pairs(
        docs, "text", "doc_id", n=3, num_hashes=12, bands=4, threshold=0.5
    )
    return CC.connected_components(
        docs.select("doc_id"), pairs, "id_a", "id_b", "doc_id"
    )


_SQL_COMPONENTS = CC.sql_connected_components(
    f"SELECT doc_id FROM {_SQL_DOCS_NEARDUP}",
    _SQL_MINHASH,
    "id_a",
    "id_b",
    "doc_id",
)


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity search: exact cosine top-5 for each query vector."""
    e = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") % 5 == 0)
    queries = e.where(F.col("vec_id") % 50 == 0)
    return SIM.topk_bruteforce(e, queries, "embedding", "vec_id", k=5)


_SQL_ANN_TOPK = SIM.sql_topk_bruteforce(
    "(SELECT * FROM embeddings WHERE vec_id % 5 = 0)",
    "embedding",
    "vec_id",
    k=5,
    query_pred="vec_id % 50 = 0",
)


# ---------------------------------------------------------------------------
# Multimodal plumbing (binary payload + mapInPandas decode/frame-sample)
# ---------------------------------------------------------------------------

def _media_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_pipeline_spark.operators.multimodal import media_meta_cols

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") % 10 == 0)
    content = F.substring("text", 1, 400).cast("binary")
    return d.select(
        F.col("doc_id").alias("media_id"),
        content.alias("content"),
        media_meta_cols(content, "image/fake").alias("meta"),
    )


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat ANN, deterministic coarse quantizer: seeded fixed centroids
    (SQL-expressible — the DuckDB twin embeds the SAME float64 literals) ->
    argmax list assignment -> probe top-nprobe lists -> exact cosine.
    The learned-KMeans quantizer stays as the quality path
    (quantizer="kmeans"; recall vs brute force pinned in
    tests/test_similarity.py)."""
    from data_pipeline_spark.operators.similarity import ivf_index, ivf_topk

    e = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") % 10 == 0).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = e.where(F.col("vec_id") % 100 == 0)
    # dim passed explicitly: no one-row probe job before the index build
    centroids, assigned = ivf_index(e, n_lists=8, seed=42, quantizer="fixed", dim=64)
    return ivf_topk(centroids, assigned, queries, k=5, nprobe=3)


_SQL_ANN_IVF = SIM.sql_ivf_topk(
    "(SELECT * FROM embeddings WHERE vec_id % 10 = 0)",
    "embedding",
    "vec_id",
    dim=64,
    n_lists=8,
    seed=42,
    k=5,
    nprobe=3,
    query_pred="id % 100 = 0",
)


def q_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantized ANN (ADC): vectors compressed to m=8 codebook
    indices (32x vs float32 at dim 64), queries score candidates with m
    table lookups instead of a dim-wide dot. Fixed seeded codebooks make
    the whole encode+search SQL-expressible (the twin embeds the same
    float64 literals); learned per-subspace KMeans is the quality path
    (recall pinned in tests/test_pq.py)."""
    from data_pipeline_spark.operators import pq as PQ

    e = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") % 10 == 0).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    cbs = PQ.fixed_codebooks(64, m=8, k=16, seed=7)
    codes = PQ.pq_encode(e, cbs)
    queries = e.where(F.col("vec_id") % 100 == 0)
    return PQ.pq_topk(cbs, codes, queries, k=5)


from data_pipeline_spark.operators.pq import sql_pq_topk as _sql_pq_topk

_SQL_ANN_PQ = _sql_pq_topk(
    "(SELECT * FROM embeddings WHERE vec_id % 10 = 0)",
    "embedding", "vec_id",
    dim=64, m=8, k_codes=16, seed=7, k=5,
    query_pred="id % 100 = 0",
)


def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (arXiv:2303.09540): cluster-then-dedup. Fixed seeded
    centroids partition the corpus; near-dup pairs are found only WITHIN a
    cluster (equi-join on cluster_id — Σc², never n²) and each duplicate
    relation keeps the copy FARTHEST from its centroid. Per-vector verdict
    rows; the oracle twin embeds the same centroid literals."""
    return SD.semdedup(
        _emb_with_copies(spark, sf_dir), "embedding", "vec_id",
        n_clusters=8, seed=42, threshold=0.99, dim=64,
    )


_SQL_DEDUP_SEMANTIC = SD.sql_semdedup(
    _SQL_EMB_COPIES, "embedding", "vec_id",
    n_clusters=8, seed=42, threshold=0.99, dim=64,
)


def q_doc_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling (arXiv:2302.03169) over the documents
    corpus with lang='en' as the target domain: per-doc log importance
    weight under smoothed target/raw unigram LMs, ranked most-target-like
    first. One explode, keyed aggs, three broadcast scalars — the
    vocabulary never leaves the cluster."""
    return IW.importance_weights(
        _t(spark, sf_dir, "documents"), "doc_id", "text",
        F.col("lang") == "en",
    )


_SQL_DOC_IMPORTANCE = IW.sql_importance_weights(
    "SELECT doc_id, text, lang FROM documents",
    "doc_id", "text", "lang = 'en'",
)


def q_ann_ivf_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X25: persistent IVF index grown over two ingest epochs — the frozen
    fixed quantizer makes adds append-only, so the incremental index must
    return byte-identical results to the one-shot build. The oracle IS the
    one-shot ann_ivf SQL twin (same vectors, same params)."""
    import tempfile

    from data_pipeline_spark.operators.vector_index import IVFVectorIndex

    e = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") % 10 == 0).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = e.where(F.col("vec_id") % 100 == 0)
    idx = IVFVectorIndex.create(
        spark, tempfile.mkdtemp(prefix="ivfidx_"), dim=64, n_lists=8, seed=42
    )
    idx.add(e.where(F.col("vec_id") % 20 == 0), epoch=0)
    idx.add(e.where(F.col("vec_id") % 20 != 0), epoch=1)
    return idx.topk(queries, k=5, nprobe=3)


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode plumbing: binary → features via mapInPandas
    (deterministic fake decoder; real codec is a drop-in decode_fn)."""
    from data_pipeline_spark.operators.multimodal import decode_features, fake_decode

    media = _media_df(spark, sf_dir)
    feat = decode_features(media, decode_fn=fake_decode)
    return feat.select(
        "media_id",
        "media_type",
        "byte_len",
        "content_hash",
        *[
            F.round(F.col("features")[i] * 255, 0).cast("int").alias(f"fb{i}")
            for i in range(4)
        ],
    )


_SQL_MEDIA_FEATURES = """
WITH media AS (
  SELECT doc_id AS media_id, substr(text, 1, 400) AS content
  FROM documents WHERE doc_id % 10 = 0
)
SELECT media_id, 'image/fake' AS media_type,
       CAST(length(content) AS BIGINT) AS byte_len,
       md5(content) AS content_hash,
       CAST((strpos('0123456789abcdef', substr(md5(content), 1, 1)) - 1) * 16 +
            (strpos('0123456789abcdef', substr(md5(content), 2, 1)) - 1) AS INTEGER) AS fb0,
       CAST((strpos('0123456789abcdef', substr(md5(content), 3, 1)) - 1) * 16 +
            (strpos('0123456789abcdef', substr(md5(content), 4, 1)) - 1) AS INTEGER) AS fb1,
       CAST((strpos('0123456789abcdef', substr(md5(content), 5, 1)) - 1) * 16 +
            (strpos('0123456789abcdef', substr(md5(content), 6, 1)) - 1) AS INTEGER) AS fb2,
       CAST((strpos('0123456789abcdef', substr(md5(content), 7, 1)) - 1) * 16 +
            (strpos('0123456789abcdef', substr(md5(content), 8, 1)) - 1) AS INTEGER) AS fb3
FROM media
"""


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame sampling: every 2nd 64-byte frame, hashed."""
    from data_pipeline_spark.operators.multimodal import sample_frames

    media = _media_df(spark, sf_dir)
    frames = sample_frames(media, every_n=2, frame_bytes=64)
    return frames.select("media_id", "frame_idx", F.md5("frame").alias("frame_hash"))


_SQL_FRAME_SAMPLE = """
WITH media AS (
  SELECT doc_id AS media_id, substr(text, 1, 400) AS content
  FROM documents WHERE doc_id % 10 = 0
), idx AS (
  SELECT media_id, content,
         unnest(range(0, greatest(length(content) // 64, 0), 2)) AS frame_idx
  FROM media
)
SELECT media_id, CAST(frame_idx AS INTEGER) AS frame_idx,
       md5(substr(content, frame_idx * 64 + 1, 64)) AS frame_hash
FROM idx
"""


def q_brand_unit_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H9+H10: unit-keyword and brand extraction over synthesized product
    names (capitalized first word; every 7th carries a known brand; a
    rotating unit suffix exercises all keyword tiers). Pure Column
    expressions — JVM-side contains/when chains, no UDF."""
    from data_pipeline_spark.functions.normalize import (
        extract_brand,
        extract_unit_keyword,
    )

    p = _t(spark, sf_dir, "part").where(F.col("p_partkey") % 3 == 0)
    cap = F.concat(
        F.upper(F.substring("p_name", 1, 1)), F.expr("substring(p_name, 2)")
    )
    suffix = (
        F.when(F.pmod("p_partkey", F.lit(4)) == 0, F.lit("500 gm"))
        .when(F.pmod("p_partkey", F.lit(4)) == 1, F.lit("2 kg"))
        .when(F.pmod("p_partkey", F.lit(4)) == 2, F.lit("6 pcs"))
        .otherwise(F.lit("1 dozen"))
    )
    name = F.when(
        F.pmod("p_partkey", F.lit(7)) == 0,
        F.concat(F.lit("Nestle "), cap, F.lit(" "), suffix),
    ).otherwise(F.concat(cap, F.lit(" "), suffix))
    return p.select(
        "p_partkey",
        name.alias("name"),
        extract_unit_keyword(name).alias("unit"),
        extract_brand(name).alias("brand"),
    )


def _sql_brand_unit() -> str:
    """DuckDB oracle generated from the SAME ordered keyword/brand tables
    the Spark expressions use — order is semantics-bearing (first match
    wins), so both sides are driven by one source of truth."""
    from data_pipeline_spark.functions.normalize import (
        KNOWN_BRANDS,
        UNIT_KEYWORD_PAIRS,
    )

    unit_case = (
        "CASE "
        + " ".join(
            f"WHEN contains(lower(name), '{p}') THEN '{u}'"
            for p, u in UNIT_KEYWORD_PAIRS
        )
        + " ELSE NULL END"
    )
    first_word = "regexp_extract(trim(name), '^\\S+')"
    brand_case = (
        "CASE "
        + " ".join(
            f"WHEN contains(lower(name), '{b}') THEN '{b}'" for b in KNOWN_BRANDS
        )
        + f" WHEN length({first_word}) > 2 AND"
        + f" regexp_matches({first_word}, '^[A-Z]') THEN {first_word}"
        + " ELSE NULL END"
    )
    return f"""
WITH base AS (
  SELECT p_partkey, p_name,
         CASE p_partkey % 4 WHEN 0 THEN '500 gm' WHEN 1 THEN '2 kg'
              WHEN 2 THEN '6 pcs' ELSE '1 dozen' END AS suffix
  FROM part WHERE p_partkey % 3 = 0
), src AS (
  SELECT p_partkey,
         CASE WHEN p_partkey % 7 = 0 THEN 'Nestle ' ELSE '' END
           || upper(substr(p_name, 1, 1)) || substr(p_name, 2)
           || ' ' || suffix AS name
  FROM base
)
SELECT p_partkey, name, {unit_case} AS unit, {brand_case} AS brand
FROM src
"""


def q_dom_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H12: per-candidate DOM structural feature vectors over synthesized
    product pages, flattened to scalar columns so a SQL oracle can recompute
    them from the page's known structure."""
    from data_pipeline_spark.functions.extract import dom_features_udf

    p = _t(spark, sf_dir, "part").where(F.col("p_partkey") % 10 == 0)
    cap = F.concat(
        F.upper(F.substring("p_name", 1, 1)), F.expr("substring(p_name, 2)")
    )
    html = F.concat(
        F.lit('<html><body><div class="product-item grid"><h3>'),
        cap,
        F.lit('</h3><span class="price">Rs. '),
        # floor on BOTH sides: Spark double→int truncates, DuckDB rounds.
        F.floor("p_retailprice").cast("long").cast("string"),
        F.lit("</span></div></body></html>"),
    )
    df = p.select("p_partkey", html.cast("binary").alias("html"))
    feats = dom_features_udf()
    # One candidate div per page → features[0]; flatten the testable scalars.
    f0 = feats(F.col("html"))[0]
    return df.select(
        "p_partkey",
        f0[0].alias("text_len"),
        f0[1].alias("upper_count"),
        f0[2].alias("digit_count"),
        f0[3].alias("word_count"),
        f0[4].alias("price_flag_rs"),
        f0[8].alias("name_flag_cap"),
        f0[10].alias("depth"),
        f0[11].alias("class_count"),
        f0[13].alias("has_link"),
        f0[14].alias("parent_product"),
    )


_SQL_DOM_FEATURES = """
WITH src AS (
  SELECT p_partkey,
         upper(substr(p_name, 1, 1)) || substr(p_name, 2)
           || ' Rs. ' || CAST(CAST(floor(p_retailprice) AS BIGINT) AS VARCHAR) AS text
  FROM part WHERE p_partkey % 10 = 0
)
SELECT p_partkey,
       CAST(length(text) AS FLOAT) AS text_len,
       CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS FLOAT) AS upper_count,
       CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS FLOAT) AS digit_count,
       CAST(array_length(regexp_split_to_array(trim(text), '\\s+')) AS FLOAT) AS word_count,
       CAST(CASE WHEN regexp_matches(text, 'Rs\\.?\\s*[\\d,]+') THEN 1 ELSE 0 END AS FLOAT) AS price_flag_rs,
       CAST(CASE WHEN regexp_matches(text, '\\b[A-Z][a-z]+(\\s+[A-Z][a-z]+)*\\b') THEN 1 ELSE 0 END AS FLOAT) AS name_flag_cap,
       CAST(3 AS FLOAT) AS depth,
       CAST(2 AS FLOAT) AS class_count,
       CAST(0 AS FLOAT) AS has_link,
       CAST(0 AS FLOAT) AS parent_product
FROM src
"""


# ---------------------------------------------------------------------------
# Driver contract
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: CDC replay final state at sf0.001."""
    return q_cdc_replay_final_state(spark, "/root/testdata/sf0.001")


#: Round-5 driver window (the checker records rows for the FIRST 50
#: queries in declaration order — queries() reorders the registry by this
#: list). Standing policy (VERDICT r4 "Next round #1"): every contract new
#: in round N enters round N's window before any re-check slot is spent.
#: Slot 1: cdc_rollup_incremental — the ONLY contract of 131 without a
#: driver-green row ever (new in r4, r4's window was spent on the r3
#: backlog). Slots 2-3: the two new round-5 contracts (HLL distinct
#: rollup, NULL-group-key rollup). Slots 4-7: contracts whose code paths
#: this round touched (media dedup survivor scoping + magic-first dHash,
#: HLL machinery). Slots 8-50: the r03 window contracts not re-checked
#: since r03 (oldest driver evidence first), in r03 order, minus the
#: three re-greened in r04 (content_delta, doc_search, cdc_tx_align).
#: ALL queries are still checked locally by the type-strict twin every
#: round: `python tools/check_contract.py /root/testdata/sf0.01`.
_R5_WINDOW = [
    "cdc_rollup_incremental",
    "cdc_rollup_hll_distinct",
    "cdc_rollup_null_groups",
    "media_dedup_e2e",
    "media_dhash",
    "media_dhash_pairs",
    "events_hll_registers",
    "ann_ivf",
    "ann_pq",
    "ann_ivf_incremental",
    "dedup_components",
    "dedup_embedding_lsh",
    "dedup_index_incremental",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "ann_topk",
    "doc_decontaminate",
    "media_features",
    "frame_sample",
    "merge_into_generic",
    "field_classify_rename",
    "dedup_semantic",
    "doc_importance_sample",
    "url_filter",
    "host_rank",
    "template_simhash",
    "frontier_discover",
    "robots_check",
    "corpus_drift",
    "doc_quality_nb",
    "doc_span_dedup",
    "html_metadata",
    "host_reputation",
    "doc_nfc_normalize",
    "cdc_join_incremental",
    "cdc_chunked_snapshot",
    "cdc_offset_epochs",
    "cdc_debezium_roundtrip",
    "cdc_patch_apply",
    "cdc_scd2_history",
    "cdc_gap_audit",
    "warc_ingest",
    "link_extract",
    "sitemap_parse",
    "canonical_collapse",
    "main_content",
    "doc_script_profile",
    "doc_soft404",
    "cdc_disorder",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q = _registry()
    assert len(_R5_WINDOW) == 50 and set(_R5_WINDOW) <= set(q)
    out = {name: q[name] for name in _R5_WINDOW}
    out.update((k, v) for k, v in q.items() if k not in out)
    return out


def _registry() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Full contract registry; historical declaration order (rounds 1-4).
    # The driver-facing order is set by _R5_WINDOW above.
    return {
        # --- slots 1-3: the round-3 driver reds (oracle-type casts fixed) ---
        "content_delta": q_content_delta,
        "doc_search": q_doc_search,
        "cdc_tx_align": q_cdc_tx_align,
        # --- slots 4-34: the 31 never-driver-checked contracts (VERDICT r3) ---
        "doc_search_bm25": q_doc_search_bm25,
        "doc_dup_spans": q_doc_dup_spans,
        "cdc_scd2_lookup": q_cdc_scd2_lookup,
        "cdc_seq_audit": q_cdc_seq_audit,
        "cdc_hot_keys": q_cdc_hot_keys,
        "cdc_freshness": q_cdc_freshness,
        "url_surt": q_url_surt,
        "recrawl_stats": q_recrawl_stats,
        "anchor_texts": q_anchor_texts,
        "doc_lm_perplexity": q_doc_lm_perplexity,
        "events_heavy_hitters": q_events_heavy_hitters,
        "dedup_history_bloom": q_dedup_history_bloom,
        "cdc_state_certificate": q_cdc_state_certificate,
        "cdc_state_drilldown": q_cdc_state_drilldown,
        "cdc_cert_incremental": q_cdc_cert_incremental,
        "doc_weighted_sample": q_doc_weighted_sample,
        "events_cms_counts": q_events_cms_counts,
        "events_hll_registers": q_events_hll_registers,
        "sketch_state_freq": q_sketch_state_freq,
        "events_dd_histogram": q_events_dd_histogram,
        "events_kmv_sketch": q_events_kmv_sketch,
        "events_kmv_overlap": q_events_kmv_overlap,
        "doc_sample_maintained": q_doc_sample_maintained,
        "doc_shard_assign": q_doc_shard_assign,
        "doc_split_assign": q_doc_split_assign,
        "feed_parse": q_feed_parse,
        "doc_tokens_multilingual": q_doc_tokens_multilingual,
        "corpus_report": q_corpus_report,
        "corpus_report_maintained": q_corpus_report_maintained,
        "media_dhash": q_media_dhash,
        "media_dhash_pairs": q_media_dhash_pairs,
        # --- slots 35-50: refill — new r4 contract + stable re-checks ---
        "media_dedup_e2e": q_media_dedup_e2e,
        "cdc_replay_final_state": q_cdc_replay_final_state,
        "cdc_lww_latest": q_cdc_lww_latest,
        "cdc_net_changes": q_cdc_net_changes,
        "q1_pricing_summary": q_q1_pricing_summary,
        "events_sessionize": q_events_sessionize,
        "events_asof_enrich": q_events_asof_enrich,
        "events_range_join": q_events_range_join,
        "json_envelope_extract": q_json_envelope_extract,
        "html_extract_products": q_html_extract_products,
        "doc_tfidf": q_doc_tfidf,
        "doc_pack_sequences": q_doc_pack_sequences,
        "pii_mask": q_pii_mask,
        "doc_gopher_filter": q_doc_gopher_filter,
        "dedup_exact_groups": q_dedup_exact_groups,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        # --- slot 51+: new round-4 contracts past the window (local-only
        # evidence this round — the type-strict checker + judge protocol —
        # they lead round 5's window) ---
        "cdc_rollup_incremental": q_cdc_rollup_incremental,
        "cdc_rollup_hll_distinct": q_cdc_rollup_hll_distinct,
        "cdc_rollup_null_groups": q_cdc_rollup_null_groups,
        # --- out-of-window: every contract below has a driver-green row in
        # r01-r03 (see VERDICT r3 coverage table) + the r04 local artifact ---
        # dedup / ANN / media (r03 driver-green)
        "ann_ivf": q_ann_ivf,
        "ann_pq": q_ann_pq,
        "ann_ivf_incremental": q_ann_ivf_incremental,
        "dedup_components": q_dedup_components,
        "dedup_embedding_lsh": q_dedup_embedding_lsh,
        "dedup_index_incremental": q_dedup_index_incremental,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_simhash": q_dedup_simhash,
        "dedup_embedding_cosine": q_dedup_embedding_cosine,
        "ann_topk": q_ann_topk,
        "doc_decontaminate": q_doc_decontaminate,
        "media_features": q_media_features,
        "frame_sample": q_frame_sample,
        "merge_into_generic": q_merge_into_generic,
        "field_classify_rename": q_field_classify_rename,
        "dedup_semantic": q_dedup_semantic,
        "doc_importance_sample": q_doc_importance,
        # web corpus (r03 driver-green)
        "url_filter": q_url_filter,
        "host_rank": q_host_rank,
        "template_simhash": q_template_simhash,
        "frontier_discover": q_frontier_discover,
        "robots_check": q_robots_check,
        "corpus_drift": q_corpus_drift,
        "doc_quality_nb": q_doc_quality_nb,
        "doc_span_dedup": q_doc_span_dedup,
        "html_metadata": q_html_metadata,
        "host_reputation": q_host_reputation,
        "doc_nfc_normalize": q_doc_nfc_normalize,
        "warc_ingest": q_warc_ingest,
        "link_extract": q_link_extract,
        "sitemap_parse": q_sitemap_parse,
        "canonical_collapse": q_canonical_collapse,
        "main_content": q_main_content,
        "doc_script_profile": q_doc_script_profile,
        "doc_soft404": q_doc_soft404,
        "doc_phrase_search": q_doc_phrase_search,
        # CDC (r02/r03 driver-green)
        "cdc_join_incremental": q_cdc_join_incremental,
        "cdc_chunked_snapshot": q_cdc_chunked_snapshot,
        "cdc_offset_epochs": q_cdc_offset_epochs,
        "cdc_debezium_roundtrip": q_cdc_debezium_roundtrip,
        "cdc_patch_apply": q_cdc_patch_apply,
        "cdc_scd2_history": q_cdc_scd2_history,
        "cdc_gap_audit": q_cdc_gap_audit,
        "cdc_disorder": q_cdc_disorder,
        "cdc_orphans": q_cdc_orphans,
        "cdc_conflicts": q_cdc_conflicts,
        "cdc_bursts": q_cdc_bursts,
        "cdc_lww_window": q_cdc_lww_window,
        "cdc_key_diff": q_cdc_key_diff,
        "cdc_update_detect": q_cdc_update_detect,
        # aggregates / joins / windows (r02 driver-green)
        "q3_top_revenue": q_q3_top_revenue,
        "top_event_types": q_top_event_types,
        "brand_price_stats": q_brand_price_stats,
        "nation_supplier_rollup": q_nation_supplier_rollup,
        "null_completeness": q_null_completeness,
        "events_hourly_rollup": q_events_hourly_rollup,
        "events_rollup_cube": q_events_rollup_cube,
        "events_user_reach": q_events_user_reach,
        "events_value_quantiles": q_events_value_quantiles,
        "events_running_total": q_events_running_total,
        # normalization / classification / flatten (r02 driver-green)
        "normalize_prices": q_normalize_prices,
        "parse_discounts": q_parse_discounts,
        "derive_discounts": q_derive_discounts,
        "clean_names_units": q_clean_names_units,
        "flatten_cascade": q_flatten_cascade,
        # HTML extraction (r02 driver-green)
        "html_extract_text": q_html_extract_text,
        "brand_unit_keywords": q_brand_unit_keywords,
        "dom_features": q_dom_features,
        # text analysis / curation (r02 driver-green)
        "doc_token_stats": q_doc_token_stats,
        "doc_fingerprint": q_doc_fingerprint,
        "doc_quality": q_doc_quality,
        "doc_lang_id": q_doc_lang_id,
        "doc_grouped_counts": q_doc_grouped_counts,
        "doc_repetition": q_doc_repetition,
        "url_canonicalize": q_url_canonicalize,
        "stratified_sample": q_stratified_sample,
        "token_budget_sample": q_token_budget_sample,
        "doc_chunks": q_doc_chunks,
        "doc_surprisal": q_doc_surprisal,
        "dedup_lines": q_dedup_lines,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "doc_script_profile": _SQL_SCRIPT_PROFILE,
        "doc_soft404": _SQL_SOFT404,
        "cdc_disorder": _SQL_DISORDER,
        "cdc_orphans": _SQL_ORPHANS,
        "cdc_conflicts": _SQL_CONFLICTS,
        "doc_phrase_search": _SQL_PHRASE_SEARCH,
        "cdc_bursts": _SQL_BURSTS,
        "cdc_lww_latest": _SQL_LWW,
        "cdc_lww_window": _SQL_LWW,
        "cdc_key_diff": _SQL_KEY_DIFF,
        "cdc_update_detect": _SQL_UPDATE_DETECT,
        "cdc_replay_final_state": _SQL_REPLAY_FINAL,
        "doc_span_dedup": _SQL_SPAN_DEDUP,
        "doc_dup_spans": _SQL_DUP_SPANS,
        "html_metadata": _SQL_HTML_METADATA,
        "host_reputation": _SQL_HOST_REPUTATION,
        "doc_nfc_normalize": _SQL_NFC_NORMALIZE,
        "doc_search": _SQL_DOC_SEARCH,
        "doc_search_bm25": _SQL_DOC_SEARCH_BM25,
        "merge_into_generic": _SQL_MERGE_INTO,
        "cdc_net_changes": _SQL_NET_CHANGES,
        "cdc_join_incremental": _SQL_JOIN_INCREMENTAL,
        "cdc_rollup_incremental": _SQL_ROLLUP_INCREMENTAL,
        "cdc_rollup_hll_distinct": _sql_rollup_hll_distinct(),
        "cdc_rollup_null_groups": _SQL_ROLLUP_NULL_GROUPS,
        "cdc_chunked_snapshot": _SQL_CHUNKED_SNAPSHOT,
        "cdc_offset_epochs": _SQL_OFFSET_EPOCHS,
        "cdc_debezium_roundtrip": _SQL_DEBEZIUM_ROUNDTRIP,
        "cdc_patch_apply": _SQL_PATCH_APPLY,
        "cdc_tx_align": _SQL_TX_ALIGN,
        "cdc_scd2_history": _SQL_SCD2_HISTORY,
        "cdc_scd2_lookup": _SQL_SCD2_LOOKUP,
        "cdc_gap_audit": _SQL_GAP_AUDIT,
        "cdc_seq_audit": _SQL_SEQ_AUDIT,
        "cdc_hot_keys": _SQL_HOT_KEYS,
        "cdc_freshness": _SQL_FRESHNESS,
        "warc_ingest": _SQL_WARC_INGEST,
        "url_surt": _SQL_URL_SURT,
        "recrawl_stats": _SQL_RECRAWL,
        "content_delta": _SQL_CONTENT_DELTA.format(
            toks=TS.sql_tokens("lower(text)"), fp=TS.sql_fingerprint("text")
        ),
        "corpus_drift": _SQL_CORPUS_DRIFT.format(
            toks=TS.sql_tokens("lower(text)")
        ),
        "doc_quality_nb": _sql_doc_quality_nb(),
        "link_extract": _sql_link_extract(),
        "sitemap_parse": _sql_sitemap_parse(),
        "canonical_collapse": _SQL_CANONICAL,
        "main_content": _sql_main_content(),
        "q1_pricing_summary": _SQL_Q1,
        "q3_top_revenue": _SQL_Q3,
        "top_event_types": _SQL_TOP_EVENT_TYPES,
        "brand_price_stats": _SQL_BRAND_STATS,
        "nation_supplier_rollup": _SQL_NATION_ROLLUP,
        "null_completeness": _SQL_NULLS,
        "events_hourly_rollup": _SQL_HOURLY,
        "events_rollup_cube": _SQL_ROLLUP_CUBE,
        "events_user_reach": _SQL_USER_REACH,
        "events_value_quantiles": _SQL_VALUE_QUANTILES,
        "events_running_total": _SQL_RUNNING,
        "events_asof_enrich": _SQL_ASOF,
        "events_sessionize": _SQL_SESSIONIZE,
        "events_range_join": _SQL_RANGE_JOIN,
        "normalize_prices": _SQL_NORM_PRICES,
        "parse_discounts": _SQL_PARSE_DISC,
        "derive_discounts": _SQL_DERIVE_DISC,
        "clean_names_units": _SQL_CLEAN_NAMES,
        "field_classify_rename": _SQL_CLASSIFY,
        "flatten_cascade": _SQL_FLATTEN,
        "json_envelope_extract": _SQL_ENVELOPE,
        "html_extract_text": _SQL_EXTRACT_TEXT,
        "html_extract_products": _sql_extract_products(),
        "brand_unit_keywords": _sql_brand_unit(),
        "dom_features": _SQL_DOM_FEATURES,
        "doc_token_stats": _SQL_TOKEN_STATS,
        "doc_fingerprint": _SQL_FINGERPRINT,
        "doc_quality": _SQL_QUALITY,
        "doc_lang_id": _SQL_LANG_ID,
        "doc_grouped_counts": _SQL_DOC_COUNTS,
        "doc_repetition": _SQL_REPETITION,
        "doc_gopher_filter": _SQL_GOPHER,
        "url_canonicalize": _SQL_URL_CANON,
        "pii_mask": _SQL_PII,
        "stratified_sample": _SQL_STRAT_SAMPLE,
        "token_budget_sample": _SQL_TOKEN_BUDGET,
        "doc_chunks": _SQL_CHUNKS,
        "doc_tfidf": _SQL_TFIDF,
        "doc_pack_sequences": _SQL_PACK,
        "doc_surprisal": _SQL_SURPRISAL,
        "doc_lm_perplexity": _sql_lm_ppl(),
        "events_heavy_hitters": _sql_heavy_hitters(),
        "dedup_history_bloom": _SQL_HISTORY_BLOOM,
        "cdc_state_certificate": _sql_state_certificate(),
        "cdc_state_drilldown": _sql_state_drilldown(),
        "cdc_cert_incremental": _sql_cert_incremental(),
        "doc_weighted_sample": _SQL_WEIGHTED_SAMPLE,
        "events_cms_counts": _sql_cms_counts(),
        "events_hll_registers": _sql_hll_contract(),
        "sketch_state_freq": _sql_sketch_state_freq(),
        "events_dd_histogram": _sql_dd_contract(),
        "events_kmv_sketch": _sql_kmv_sketch_contract(),
        "events_kmv_overlap": _sql_kmv_overlap_contract(),
        "doc_sample_maintained": _sql_doc_sample_maintained(),
        "doc_shard_assign": _sql_doc_shard_assign(),
        "doc_split_assign": _sql_doc_split_assign(),
        "feed_parse": _sql_feed_parse(),
        "doc_tokens_multilingual": _sql_doc_tokens_multilingual(),
        "corpus_report": _sql_corpus_report(),
        "corpus_report_maintained": _sql_corpus_report_maintained(),
        "media_dhash": _sql_media_dhash(),
        "media_dhash_pairs": _sql_media_dhash_pairs(),
        "media_dedup_e2e": _sql_media_dedup_e2e(),
        "dedup_lines": _SQL_LINE_DEDUP,
        "dedup_exact_groups": _SQL_EXACT_DEDUP,
        "dedup_ngram_jaccard": _SQL_NGRAM_JACCARD,
        "doc_decontaminate": _SQL_DECONTAMINATE,
        "dedup_minhash_lsh": _SQL_MINHASH,
        "dedup_index_incremental": _sql_dedup_index(),
        "dedup_simhash": _SQL_SIMHASH,
        "dedup_embedding_cosine": _SQL_EMB_NEARDUP,
        "dedup_embedding_lsh": _SQL_EMB_LSH,
        "dedup_components": _SQL_COMPONENTS,
        "ann_topk": _SQL_ANN_TOPK,
        "ann_ivf": _SQL_ANN_IVF,
        "ann_pq": _SQL_ANN_PQ,
        "ann_ivf_incremental": _SQL_ANN_IVF,
        "media_features": _SQL_MEDIA_FEATURES,
        "frame_sample": _SQL_FRAME_SAMPLE,
        "dedup_semantic": _SQL_DEDUP_SEMANTIC,
        "doc_importance_sample": _SQL_DOC_IMPORTANCE,
        "url_filter": _SQL_URL_FILTER,
        "anchor_texts": _sql_anchor_texts(),
        "host_rank": _sql_host_rank_contract(),
        "template_simhash": _sql_template_simhash(),
        "frontier_discover": _sql_frontier_discover(),
        "robots_check": _sql_robots_check(),
    }
