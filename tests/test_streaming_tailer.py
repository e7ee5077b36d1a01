"""Structured Streaming tailer: same final state as batch replay,
exactly-once across restart, late-file pickup.

The tailer is the readStream form of the epoch loop; these tests pin the
equivalence (SURVEY.md §2.8 — micro-batch mapping) and the foreachBatch +
idempotent-merge exactly-once composition.
"""

import pyspark.sql.functions as F
import pytest

from data_pipeline_spark.plans.registry import SchemaRegistry
from data_pipeline_spark.sources import changelog
from data_pipeline_spark.sources.datagen import gen_changes
from data_pipeline_spark.streaming.checkpoint import CheckpointStore
from data_pipeline_spark.streaming.runner import ReplayRunner, make_table_for_log
from data_pipeline_spark.streaming.tailer import ChangeLogTailer

N_EVENTS = 2000
EVENTS_PER_EPOCH = 500


@pytest.fixture(scope="module")
def log_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("slog"))
    changelog.write_log(
        gen_changes(spark, N_EVENTS, events_per_epoch=EVENTS_PER_EPOCH, seed=11), d
    )
    return d


def _state(table):
    rows = table.read().select("url", "warc_ts", "text", "lang").collect()
    return {r["url"]: (r["warc_ts"], r["text"], r["lang"]) for r in rows}


def test_stream_matches_batch_replay(spark, log_dir, tmp_path):
    reg = SchemaRegistry()
    bt = make_table_for_log(spark, str(tmp_path / "t_batch"), reg, n_buckets=8)
    ReplayRunner(spark, log_dir, bt, CheckpointStore(str(tmp_path / "cp_b")), reg).run()

    st = make_table_for_log(spark, str(tmp_path / "t_stream"), reg, n_buckets=8)
    tailer = ChangeLogTailer(spark, log_dir, st, str(tmp_path / "cp_s"), reg)
    metrics = tailer.run_available()
    assert metrics, "stream processed no batches"
    assert _state(st) == _state(bt)


def test_stream_restart_is_exactly_once_and_tails_new_epochs(
    spark, log_dir, tmp_path
):
    reg = SchemaRegistry()
    st = make_table_for_log(spark, str(tmp_path / "t_s2"), reg, n_buckets=8)
    cp = str(tmp_path / "cp_s2")

    # First pass: bounded files per trigger → several micro-batches.
    ChangeLogTailer(
        spark, log_dir, st, cp, reg, max_files_per_trigger=2
    ).run_available()
    state1 = _state(st)
    version1 = st.meta["version"]

    # Restart with nothing new: stream checkpoint says all caught up.
    m2 = ChangeLogTailer(spark, log_dir, st, cp, reg).run_available()
    assert st.meta["version"] == version1, m2
    assert _state(st) == state1

    # Append a brand-new epoch, restart: only the new data is applied.
    extra = gen_changes(
        spark, N_EVENTS + EVENTS_PER_EPOCH, events_per_epoch=EVENTS_PER_EPOCH, seed=11
    ).where(F.col("epoch") == N_EVENTS // EVENTS_PER_EPOCH)
    changelog.write_log(extra, log_dir)
    ChangeLogTailer(spark, log_dir, st, cp, reg).run_available()

    # Oracle: batch replay of the full (now longer) log from scratch.
    bt = make_table_for_log(spark, str(tmp_path / "t_b2"), reg, n_buckets=8)
    ReplayRunner(spark, log_dir, bt, CheckpointStore(str(tmp_path / "cp_b2")), reg).run()
    assert _state(st) == _state(bt)


def test_stream_evolves_schema_midstream(spark, tmp_path):
    """A micro-batch carrying a new schema_version evolves the table
    in-flight on the streaming path, same as the batch runner."""
    log = str(tmp_path / "evolog")
    changelog.write_log(
        gen_changes(spark, 1500, events_per_epoch=500, seed=13, evolve_at_epoch=2), log
    )
    reg = SchemaRegistry()
    st = make_table_for_log(spark, str(tmp_path / "t_evo_s"), reg, n_buckets=4)
    assert "fetch_status" not in [f.name for f in st.schema.fields]
    ChangeLogTailer(spark, log, st, str(tmp_path / "cp_evo_s"), reg).run_available()
    assert "fetch_status" in [f.name for f in st.schema.fields]

    bt = make_table_for_log(spark, str(tmp_path / "t_evo_b"), reg, n_buckets=4)
    ReplayRunner(spark, log, bt, CheckpointStore(str(tmp_path / "cp_evo_b")), reg).run()
    s_rows = {r["url"]: (r["warc_ts"], r["text"], r["fetch_status"]) for r in
              st.read().select("url", "warc_ts", "text", "fetch_status").collect()}
    b_rows = {r["url"]: (r["warc_ts"], r["text"], r["fetch_status"]) for r in
              bt.read().select("url", "warc_ts", "text", "fetch_status").collect()}
    assert s_rows == b_rows
