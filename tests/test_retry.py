"""S6: retry with exponential backoff — unit semantics + epoch-loop
composition with exactly-once.

Mirrors the reference's fetch retry schedule
(/root/reference/src/fetcher/html_fetcher.rs:169-193: base·2^attempt ms +
uniform jitter), but verifies the property the reference CANNOT offer:
retrying a failed epoch never double-applies, because the retry composes
with the idempotent merge ledger.
"""

import pytest

from data_pipeline_spark.sources import changelog
from data_pipeline_spark.sources.datagen import gen_changes
from data_pipeline_spark.streaming.checkpoint import CheckpointStore
from data_pipeline_spark.streaming.retry import RetriesExhausted, with_retries
from data_pipeline_spark.streaming.runner import ReplayRunner, make_table_for_log
from data_pipeline_spark.plans.registry import SchemaRegistry


# -- unit: schedule + semantics ------------------------------------------------


def test_success_first_try_never_sleeps():
    sleeps = []
    out = with_retries(lambda: 7, sleep=sleeps.append)
    assert out == 7
    assert sleeps == []


def test_transient_then_success_and_schedule():
    calls = {"n": 0}
    sleeps = []

    def flaky():
        calls["n"] += 1
        if calls["n"] <= 2:
            raise OSError("transient")
        return "ok"

    out = with_retries(flaky, max_retries=3, base_ms=1000, jitter_ms=1000,
                       seed=7, sleep=sleeps.append)
    assert out == "ok"
    assert calls["n"] == 3
    # delay a = base·2^a + seeded-uniform(0, jitter): deterministic, growing.
    assert len(sleeps) == 2
    assert 1.0 <= sleeps[0] <= 2.0
    assert 2.0 <= sleeps[1] <= 3.0
    # Same seed → byte-identical schedule on rerun (reproducible replays).
    sleeps2 = []
    calls["n"] = 0
    with_retries(flaky, max_retries=3, base_ms=1000, jitter_ms=1000,
                 seed=7, sleep=sleeps2.append)
    assert sleeps2 == sleeps


def test_exhaustion_raises_with_context():
    def always():
        raise ValueError("boom")

    with pytest.raises(RetriesExhausted) as ei:
        with_retries(always, max_retries=2, sleep=lambda _: None)
    assert ei.value.attempts == 3
    assert isinstance(ei.value.last, ValueError)
    assert isinstance(ei.value.__cause__, ValueError)


def test_retry_on_filter_propagates_other_errors():
    calls = {"n": 0}

    def typed():
        calls["n"] += 1
        raise KeyError("not retryable")

    with pytest.raises(KeyError):
        with_retries(typed, max_retries=3, retry_on=(OSError,),
                     sleep=lambda _: None)
    assert calls["n"] == 1  # no retry on non-matching exception type


def test_on_retry_callback_observes_attempts():
    seen = []

    def flaky():
        if len(seen) < 1:
            raise OSError("x")
        return 1

    with_retries(flaky, max_retries=2, sleep=lambda _: None,
                 on_retry=lambda a, e, d: seen.append((a, type(e).__name__)))
    assert seen == [(0, "OSError")]


# -- integration: retry × exactly-once in the epoch loop ----------------------


@pytest.fixture(scope="module")
def retry_log_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("retry_log"))
    df = gen_changes(spark, 900, events_per_epoch=300, seed=11)
    changelog.write_log(df, d)
    return d


def _runner(spark, retry_log_dir, tmp_path, name):
    registry = SchemaRegistry()
    table = make_table_for_log(
        spark, str(tmp_path / f"t_{name}"), registry, n_buckets=4
    )
    cps = CheckpointStore(str(tmp_path / f"cp_{name}"))
    return ReplayRunner(spark, retry_log_dir, table, cps, registry), table


def test_run_with_retries_recovers_transient_epoch_failure(
    spark, retry_log_dir, tmp_path
):
    """Epoch 1 fails once BEFORE its commit; the retried run converges to
    the same final state as an unfailed replay, with every epoch applied
    exactly once."""
    runner, table = _runner(spark, retry_log_dir, tmp_path, "flaky")
    ref_runner, ref_table = _runner(spark, retry_log_dir, tmp_path, "ref")
    ref_runner.run()

    original = runner.apply_epoch
    state = {"failed": False}

    def flaky_apply(epoch):
        if epoch == 1 and not state["failed"]:
            state["failed"] = True
            raise OSError("simulated transient storage error")
        return original(epoch)

    runner.apply_epoch = flaky_apply
    results = runner.run(retries=2, base_ms=1)
    assert [r["epoch"] for r in results] == [0, 1, 2]
    assert all(not r["skipped"] for r in results)

    a = {r["url"]: (r["warc_ts"], r["text"]) for r in table.read().collect()}
    b = {r["url"]: (r["warc_ts"], r["text"]) for r in ref_table.read().collect()}
    assert a == b


def test_retry_after_commit_is_noop_via_ledger(spark, retry_log_dir, tmp_path):
    """Failure AFTER the merge commit: the retry must hit the checkpoint
    ledger and skip — never double-apply (at-least-once retry composed with
    the idempotent sink = exactly-once)."""
    runner, table = _runner(spark, retry_log_dir, tmp_path, "postfail")
    original = runner.apply_epoch
    state = {"failed": False}

    def fail_after_commit(epoch):
        rec = original(epoch)
        if epoch == 0 and not state["failed"]:
            state["failed"] = True
            raise OSError("crash after commit, before ack")
        return rec

    runner.apply_epoch = fail_after_commit
    results = runner.run(retries=2, base_ms=1)
    # Epoch 0's retry found the ledger entry and skipped.
    assert results[0]["skipped"] is True
    assert results[0]["reason"] == "checkpointed"
    assert [r["skipped"] for r in results[1:]] == [False, False]
    # Exactly one table commit per epoch — no duplicate snapshot.
    sids = [s["snapshot_id"] for s in table.meta["snapshots"]]
    assert len(sids) == len(set(sids)) == 3
