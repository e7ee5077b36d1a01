"""Maintained report card (X119): fold == one-pass corpus_report of
the union (linear metrics exact, dup ratio HLL-approximate),
exactly-once, exact part-drop retraction incl. the HLL refold,
compaction invariance, cold reload, frozen params."""

import pytest
import pyspark.sql.functions as F

from data_pipeline_spark.operators.report import corpus_report
from data_pipeline_spark.operators.reportstate import ReportStore

GOOD = (
    "This is an ordinary paragraph of english text that is long enough to "
    "pass the word count rule and it keeps a healthy mix of short and long "
    "words with the usual stopwords sprinkled in so that the filter is "
    "happy about it as well. " * 2
).strip()


def mk_epochs(spark):
    """Three epochs; every 7th doc is re-shipped in every epoch (same
    text → duplicate fingerprints across epochs) + one junk doc."""
    out = []
    for e in range(3):
        rows = [
            (GOOD + f" unique{i}", "en" if i % 4 else "de")
            for i in range(300)
            if i % 3 == e or i % 7 == 0
        ]
        rows.append(("junk", "en"))
        out.append(spark.createDataFrame(rows, "text string, lang string"))
    return out


def union_all(dfs):
    u = dfs[0]
    for d in dfs[1:]:
        u = u.unionByName(d)
    return u


def as_map(df):
    return {(r["metric"], r["dimension"]): r["value"] for r in df.collect()}


def test_fold_equals_direct_and_exactly_once(spark, tmp_path):
    epochs = mk_epochs(spark)
    st = ReportStore.create(spark, str(tmp_path / "r"), hll_p=10)
    for e, df in enumerate(epochs):
        assert st.update(df, epoch=e) == e
    assert st.update(epochs[0], epoch=0) is None
    got = as_map(st.report())
    want = as_map(corpus_report(union_all(epochs)))
    # linear metrics: exact (sums of longs; means agree to rounding)
    for m in ("rows", "chars_total", "tokens_ws_total", "tokens_ml_total"):
        assert got[(m, "all")] == want[(m, "all")], m
    for m in ("quality_mean", "gopher_pass_rate"):
        assert abs(got[(m, "all")] - want[(m, "all")]) < 1e-5, m
    for k, v in want.items():
        if k[0] == "lang_share":
            assert abs(got[k] - v) < 1e-9, k
    # dup ratio: HLL-approximate vs the exact one-pass number
    assert abs(got[("dup_ratio_est", "all")] - want[("exact_dup_ratio", "all")]) < 0.08


def test_retraction_is_exact_including_hll(spark, tmp_path):
    epochs = mk_epochs(spark)
    st = ReportStore.create(spark, str(tmp_path / "a"), hll_p=10)
    for e, df in enumerate(epochs):
        st.update(df, epoch=e)
    st.retract_epoch(1)
    ref = ReportStore.create(spark, str(tmp_path / "b"), hll_p=10)
    ref.update(epochs[0], epoch=0)
    ref.update(epochs[2], epoch=2)
    assert as_map(st.report()) == as_map(ref.report())
    with pytest.raises(ValueError, match="already retracted"):
        st.retract_epoch(1)


def test_compaction_and_cold_reload(spark, tmp_path):
    epochs = mk_epochs(spark)
    p = str(tmp_path / "c")
    st = ReportStore.create(spark, p, hll_p=10)
    for e, df in enumerate(epochs):
        st.update(df, epoch=e)
    before = as_map(st.report())
    st2 = ReportStore.load(spark, p)
    assert as_map(st2.report()) == before
    info = st2.compact()
    assert info["dirs"] == 3
    assert as_map(st2.report()) == before
    with pytest.raises(ValueError, match="compacted"):
        st2.retract_epoch(0)
    # post-compaction epochs still fold in
    st2.update(epochs[0].limit(5), epoch=9)
    assert as_map(st2.report())[("rows", "all")] == before[("rows", "all")] + 5
    with pytest.raises(ValueError, match="frozen"):
        ReportStore.create(spark, p, hll_p=11)


def test_maintenance_job_report_ops(spark, tmp_path, monkeypatch, capsys):
    import json
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from jobs import maintenance_job

    epochs = mk_epochs(spark)
    p = str(tmp_path / "r")
    st = ReportStore.create(spark, p, hll_p=10)
    for e, df in enumerate(epochs):
        st.update(df, epoch=e)
    monkeypatch.setattr("sys.argv", [
        "maintenance_job.py", "--report-store", p,
        "--retract-report-epoch", "0", "--compact-report",
    ])
    from pyspark.sql import SparkSession

    monkeypatch.setattr(SparkSession, "stop", lambda self: None)
    maintenance_job.main()
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["report_retracted_epoch"] == 0
    assert stats["report_compact"]["dirs"] == 2
    ref = ReportStore.create(spark, str(tmp_path / "ref"), hll_p=10)
    ref.update(epochs[1], epoch=1)
    ref.update(epochs[2], epoch=2)
    assert as_map(ReportStore.load(spark, p).report()) == as_map(ref.report())


def test_replay_runner_rides_state_stores(spark, tmp_path):
    """ReplayRunner(state_stores=[...]): the maintained report/sample
    state stays current with the replay's own epochs — no second pass
    over the log — and a re-run (exactly-once on both sides) changes
    nothing."""
    from data_pipeline_spark.operators.samplestate import SampleStore
    from data_pipeline_spark.plans.registry import SchemaRegistry
    from data_pipeline_spark.sources import changelog
    from data_pipeline_spark.sources.datagen import gen_changes
    from data_pipeline_spark.streaming.checkpoint import CheckpointStore
    from data_pipeline_spark.streaming.runner import (
        ReplayRunner,
        make_table_for_log,
    )

    ws = tmp_path
    changelog.write_log(
        gen_changes(spark, 2000, events_per_epoch=1000, seed=5),
        str(ws / "log"),
    )
    reg = SchemaRegistry()
    table = make_table_for_log(spark, str(ws / "table"), reg, n_buckets=4)
    rep = ReportStore.create(spark, str(ws / "rep"), hll_p=10)
    smp = SampleStore.create(spark, str(ws / "smp"), "url", k=16)
    cp = CheckpointStore(str(ws / "cp"))
    ReplayRunner(
        spark, str(ws / "log"), table, cp, reg,
        state_stores=[rep, smp],
    ).run()
    card = as_map(rep.report())
    assert card[("rows", "all")] > 0
    assert smp.sample().count() == 16
    assert rep.committed_epochs() == {0, 1}
    # both ledgers survive a full re-run untouched
    before = card
    ReplayRunner(
        spark, str(ws / "log"), table, CheckpointStore(str(ws / "cp")), reg,
        state_stores=[rep, smp],
    ).run()
    assert as_map(rep.report()) == before
    # the ingested-winner counts match the replay's own applied metrics
    applied = sum(
        r["rows_in"] for r in cp.metrics_df(spark).collect()
        if "rows_in" in r.asDict() and r["rows_in"] is not None
    ) if "rows_in" in cp.metrics_df(spark).columns else None
    if applied is not None:
        assert card[("rows", "all")] <= applied  # winners <= raw events


def test_streaming_foreach_batch_exactly_once(spark, tmp_path):
    """ReportStore/SampleStore.foreach_batch in a REAL Structured
    Streaming run: stream-fed state == a direct one-pass build over the
    same docs, and a second run over the same checkpoint re-delivers
    nothing (ledger epochs are micro-batch ids)."""
    from data_pipeline_spark.operators.reportstate import (
        STREAM_EPOCH_BASE,
        ReportStore,
    )
    from data_pipeline_spark.operators.samplestate import SampleStore

    log = str(tmp_path / "doclog")
    rows = []
    for part in range(4):
        for i in range(10):
            rows.append((part, GOOD + f" unique{part * 100 + i}", "en"))
    docs = spark.createDataFrame(rows, "part int, text string, lang string")
    docs.write.mode("overwrite").partitionBy("part").parquet(log)

    rep = ReportStore.create(spark, str(tmp_path / "rep"), hll_p=10)
    smp = SampleStore.create(spark, str(tmp_path / "smp"), "text", k=7)

    def both(batch_df, batch_id):
        rep.foreach_batch()(batch_df, batch_id)
        smp.foreach_batch()(batch_df, batch_id)

    def run():
        stream = (
            spark.readStream.schema(spark.read.parquet(log).schema)
            .option("basePath", log)
            .option("maxFilesPerTrigger", 1)
            .parquet(log + "/part=*")
        )
        q = (
            stream.drop("part").writeStream.foreachBatch(both)
            .option("checkpointLocation", str(tmp_path / "cp"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    card = as_map(rep.report())
    direct = as_map(corpus_report(docs.drop("part")))
    assert card[("rows", "all")] == direct[("rows", "all")] == 40.0
    assert card[("tokens_ml_total", "all")] == direct[("tokens_ml_total", "all")]
    assert all(e >= STREAM_EPOCH_BASE for e in rep.committed_epochs())
    assert smp.sample().count() == 7
    before = sorted(map(tuple, smp.sample().collect()))
    run()  # restart over the same checkpoint: nothing re-delivers
    assert as_map(rep.report()) == card
    assert sorted(map(tuple, smp.sample().collect())) == before


def test_epoch_scoped_report(spark, tmp_path):
    """report(epochs=[...]) answers "what did these ingests add" from
    the per-epoch parts; raises on unknown or compacted epochs."""
    epochs = mk_epochs(spark)
    st = ReportStore.create(spark, str(tmp_path / "r"), hll_p=10)
    for e, df in enumerate(epochs):
        st.update(df, epoch=e)
    scoped = as_map(st.report(epochs=[1, 2]))
    ref = ReportStore.create(spark, str(tmp_path / "ref"), hll_p=10)
    ref.update(epochs[1], epoch=1)
    ref.update(epochs[2], epoch=2)
    assert scoped == as_map(ref.report())
    with pytest.raises(ValueError, match="unknown"):
        st.report(epochs=[7])
    st.compact()
    with pytest.raises(ValueError, match="compacted"):
        st.report(epochs=[1])


def test_crash_between_merge_and_store_update_heals_on_retry(spark, tmp_path):
    """ADVICE r3 (runner.py:366): if a run dies AFTER table.merge commits an
    epoch but BEFORE the state stores fold it, the retried epoch arrives
    with merge skipped=True ('epoch already committed'). The runner must
    still deliver it to the stores — their own ledgers make duplicate
    delivery a no-op — otherwise the maintained state desyncs forever."""
    from data_pipeline_spark.plans.registry import SchemaRegistry
    from data_pipeline_spark.sources import changelog
    from data_pipeline_spark.sources.datagen import gen_changes
    from data_pipeline_spark.streaming.checkpoint import CheckpointStore
    from data_pipeline_spark.streaming.runner import (
        ReplayRunner,
        make_table_for_log,
    )

    ws = tmp_path
    changelog.write_log(
        gen_changes(spark, 2000, events_per_epoch=1000, seed=5),
        str(ws / "log"),
    )
    reg = SchemaRegistry()
    table = make_table_for_log(spark, str(ws / "table"), reg, n_buckets=4)
    rep = ReportStore.create(spark, str(ws / "rep"), hll_p=10)

    class CrashOnce:
        """Store proxy that dies on its first sight of epoch 1 — after
        the table merge for epoch 1 has already committed."""

        def __init__(self, inner):
            self.inner = inner
            self.crashed = False

        def update(self, df, epoch):
            if epoch == 1 and not self.crashed:
                self.crashed = True
                raise RuntimeError("injected crash before store fold")
            return self.inner.update(df, epoch=epoch)

    proxy = CrashOnce(rep)
    with pytest.raises(RuntimeError, match="injected crash"):
        ReplayRunner(
            spark, str(ws / "log"), table, CheckpointStore(str(ws / "cp")),
            reg, state_stores=[proxy],
        ).run()
    assert rep.committed_epochs() == {0}
    # retry: epoch 1's merge now skips (already committed) but the store
    # must still receive and fold it
    ReplayRunner(
        spark, str(ws / "log"), table, CheckpointStore(str(ws / "cp")),
        reg, state_stores=[proxy],
    ).run()
    assert rep.committed_epochs() == {0, 1}
    # and the healed state equals a clean single-run build
    ref_tbl = make_table_for_log(spark, str(ws / "t2"), SchemaRegistry(), n_buckets=4)
    ref = ReportStore.create(spark, str(ws / "rep2"), hll_p=10)
    ReplayRunner(
        spark, str(ws / "log"), ref_tbl, CheckpointStore(str(ws / "cp2")),
        SchemaRegistry(), state_stores=[ref],
    ).run()
    assert as_map(rep.report()) == as_map(ref.report())


def test_null_lang_is_not_conflated_with_sentinel_string(spark, tmp_path):
    """ADVICE r3 (reportstate.py:128): NULL language is stored as a real
    NULL, so a document whose lang value is literally '∅' keeps its own
    lang_share dimension instead of being rewritten to NULL."""
    docs = spark.createDataFrame(
        [(GOOD + " a", None), (GOOD + " b", "∅"), (GOOD + " c", "en")],
        "text string, lang string",
    )
    st = ReportStore.create(spark, str(tmp_path / "r"), hll_p=10)
    st.update(docs, epoch=0)
    got = as_map(st.report())
    want = as_map(corpus_report(docs))
    shares_got = {k: v for k, v in got.items() if k[0] == "lang_share"}
    shares_want = {k: v for k, v in want.items() if k[0] == "lang_share"}
    assert shares_got == shares_want
    assert ("lang_share", "∅") in shares_got
    assert ("lang_share", None) in shares_got
