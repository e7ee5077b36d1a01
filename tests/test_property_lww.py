"""Property-based replay determinism (hypothesis).

For ANY event sequence — duplicate keys, exact warc_ts ties, deletes,
arbitrary epoch batching, either merge mode — the final table state must
equal the single-process python LWW oracle. This is SURVEY.md §7.4's
"deterministic replay under reordering" as a law, not an example.
"""

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_pipeline_spark.functions.extract import extract_text
from data_pipeline_spark.plans.registry import SchemaRegistry
from data_pipeline_spark.streaming.runner import make_table_for_log, stage_changes

BASE = dt.datetime(2024, 1, 1)

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),    # key id
        st.integers(min_value=0, max_value=4),    # ts offset (forces ties)
        st.sampled_from(["insert", "update", "delete"]),
    ),
    min_size=1,
    max_size=40,
)


def _rows(events):
    rows = []
    for lsn, (k, ts, op) in enumerate(events):
        html = None if op == "delete" else f"<p>k{k} v{lsn}</p>".encode()
        rows.append(
            (
                op,
                f"https://e.example/p/{k}",
                lsn,
                BASE + dt.timedelta(seconds=ts),
                html,
                None if op == "delete" else "en",
                1,
            )
        )
    return rows


def _oracle(rows):
    best = {}
    for op, url, lsn, ts, html, lang, _v in rows:
        cur = best.get(url)
        if cur is None or (ts, lsn) > (cur[0], cur[1]):
            best[url] = (ts, lsn, op, html, lang)
    state = {}
    for url, (ts, lsn, op, html, lang) in best.items():
        if op != "delete":
            state[url] = (ts, extract_text(html.decode()), lang)
    return state


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    events=events_strategy,
    epoch_size=st.integers(min_value=1, max_value=7),
    mode=st.sampled_from(["cow", "mor"]),
)
def test_replay_equals_oracle_for_any_batching(
    spark, tmp_path_factory, events, epoch_size, mode
):
    rows = _rows(events)
    table = make_table_for_log(
        spark,
        str(tmp_path_factory.mktemp("prop") / "t"),
        SchemaRegistry(),
        n_buckets=4,
    )
    schema = (
        "op string, url string, lsn long, warc_ts timestamp, "
        "html binary, lang string, schema_version int"
    )
    for e, start in enumerate(range(0, len(rows), epoch_size)):
        batch = spark.createDataFrame(rows[start : start + epoch_size], schema)
        staged = stage_changes(spark, batch, table)
        table.merge(staged, epoch=e, mode=mode)

    got = {
        r["url"]: (r["warc_ts"], r["text"], r["lang"])
        for r in table.read().select("url", "warc_ts", "text", "lang").collect()
    }
    assert got == _oracle(rows)
