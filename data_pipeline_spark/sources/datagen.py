"""Deterministic, fully-distributed synthetic change-log generator.

The engine's input is a binlog/WAL-style change-event log over url-keyed
web-page records (BASELINE.json north_star). The reference's analog is the
paginated fetch loop that lands raw JSON snapshots
(/root/reference/src/fetcher/unified_fetcher.rs:130-224,
/root/reference/src/storage/minio_client.rs:121-143); here we synthesize that
log directly, seeded and reproducible, **with no driver-side row loop** — every
column is a deterministic JVM-side expression over ``spark.range(n)``, so the
generator itself scales to 10^10 rows on a real cluster.

Event columns (FIXTURES.md §2): op, url, lsn, warc_ts, html, lang,
schema_version, epoch (+ v2-only payload column ``fetch_status``).

Determinism: all pseudo-randomness is ``xxhash64(id, salt)`` — same seed, same
rows, independent of partitioning, executor count, or row order.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

BASE_TS = "2024-01-01 00:00:00"

# Hot-domain skew knobs (north_rule: skew handled explicitly — the generator
# must *produce* skew so the engine can prove it defuses it).
HOT_DOMAIN_SHARE = 30  # percent of events landing on one hot domain


def _hp(seed: int, *cols):
    """Deterministic uniform hash in [0, 2^31) from (seed, *cols).

    The range must comfortably exceed any modulus derived from it —
    an earlier 10^6 range silently capped ``n_keys`` at one million for
    logs past 4M events (pmod of a small range is the small range).
    """
    return F.pmod(F.xxhash64(F.lit(seed), *cols), F.lit(1 << 31))


def gen_changes(
    spark: SparkSession,
    n_events: int,
    n_keys: int | None = None,
    n_domains: int = 50,
    events_per_epoch: int = 1000,
    seed: int = 42,
    evolve_at_epoch: int | None = None,
    tie_every: int = 7,
    hot_key_share: int = 0,
    n_hot_keys: int = 4,
) -> DataFrame:
    """Generate ``n_events`` change events as a DataFrame.

    - ``op``: insert/update/delete ≈ 70/25/5 (upsert semantics: update on an
      unseen key behaves as insert; delete on an unseen key is a no-op).
    - ``lsn``: strictly increasing (= range id) — the LWW tie-breaker.
    - ``warc_ts``: pseudo-random event time (out-of-order w.r.t. lsn), with
      deliberate exact-timestamp collisions every ``tie_every`` events so LWW
      tie-breaking by lsn is actually exercised.
    - ``url``: Zipf-ish skew — ``HOT_DOMAIN_SHARE``% of events on one hot
      domain, rest uniform over ``n_domains``.
    - ``html``: deterministic product-card markup exercising the reference's
      selector cascade (container ``.product-item``, name ``h3``, price
      ``data-price-amount`` + ``.price`` text, id ``data-product-id`` —
      /root/reference/src/configs/naheed.toml:18-56), plus boilerplate
      header/footer blocks for the exclusion filter and an HTML entity in
      the name. Content varies with lsn so updates actually change state.
    - ``schema_version``: 1, bumping to 2 at ``evolve_at_epoch`` (v2 adds
      payload column ``fetch_status: int``).
    """
    if n_keys is None:
        n_keys = max(1, n_events // 4)
    df = spark.range(n_events).withColumnRenamed("id", "lsn")

    key_id = F.pmod(_hp(seed + 1, F.col("lsn")), F.lit(n_keys))
    if hot_key_share:
        # Hot-KEY skew (vs the hot-domain skew below): ``hot_key_share``% of
        # all events hammer ``n_hot_keys`` urls — the "one page updated
        # millions of times" CDC pathology the salting policy must defuse.
        hot_roll = F.pmod(_hp(seed + 9, F.col("lsn")), F.lit(100))
        key_id = F.when(
            hot_roll < hot_key_share,
            F.pmod(_hp(seed + 10, F.col("lsn")), F.lit(n_hot_keys)),
        ).otherwise(key_id)
    op_roll = F.pmod(_hp(seed + 2, F.col("lsn")), F.lit(100))
    op = (
        F.when(op_roll < 70, F.lit("insert"))
        .when(op_roll < 95, F.lit("update"))
        .otherwise(F.lit("delete"))
    )

    # Skewed domain: derive from key so a key lives on one stable domain.
    dom_roll = F.pmod(_hp(seed + 3, key_id), F.lit(100))
    domain = F.when(
        dom_roll < HOT_DOMAIN_SHARE, F.lit("hot-0.example.com")
    ).otherwise(
        F.format_string(
            "site-%d.example.com", F.pmod(_hp(seed + 4, key_id), F.lit(n_domains))
        )
    )
    url = F.concat(F.lit("https://"), domain, F.lit("/p/"), key_id.cast("string"))

    # Event time: random offset within n_events seconds; quantized for some
    # rows to force exact ties (tie-break must fall to lsn).
    raw_off = F.pmod(_hp(seed + 5, F.col("lsn")), F.lit(max(n_events, 10)))
    tie_off = (F.floor(raw_off / 100) * 100).cast("long")
    offset = F.when(
        F.pmod(F.col("lsn"), F.lit(tie_every)) == 0, tie_off
    ).otherwise(raw_off.cast("long"))
    warc_ts = F.timestamp_seconds(
        F.unix_timestamp(F.lit(BASE_TS), "yyyy-MM-dd HH:mm:ss") + offset
    )

    price = (F.pmod(_hp(seed + 6, key_id, F.col("lsn")), F.lit(4990)) + 10).cast("int")
    name = F.format_string("Fresh Item &amp; Co %d", key_id)
    epoch = F.floor(F.col("lsn") / events_per_epoch).cast("int")

    html = F.format_string(
        "<html><body>"
        '<div class="header"><span class="menu">navigation menu</span></div>'
        '<span class="base" data-ui-id="page-title-wrapper">Groceries</span>'
        '<div class="product-item" data-product-id="%d">'
        "<h3>%s</h3>"
        '<span class="price" data-price-amount="%d">Rs. %d</span>'
        "</div>"
        '<div class="product-item"><h3>Sponsored banner item</h3>'
        '<span class="price">Rs. 1</span></div>'
        '<div class="footer">footer links</div>'
        "</body></html>",
        key_id,
        name,
        price,
        price,
    )

    lang = F.element_at(
        F.array(F.lit("en"), F.lit("ur"), F.lit("mixed")),
        (F.pmod(_hp(seed + 7, key_id), F.lit(3)) + 1).cast("int"),
    )

    if evolve_at_epoch is not None:
        schema_version = F.when(epoch >= evolve_at_epoch, F.lit(2)).otherwise(F.lit(1))
        fetch_status = F.when(
            epoch >= evolve_at_epoch,
            (F.pmod(_hp(seed + 8, F.col("lsn")), F.lit(3)) + 200).cast("int"),
        )
    else:
        schema_version = F.lit(1)
        fetch_status = F.lit(None).cast("int")

    is_delete = op == "delete"
    return df.select(
        op.alias("op"),
        url.alias("url"),
        F.col("lsn"),
        warc_ts.alias("warc_ts"),
        F.when(~is_delete, F.encode(html, "utf-8")).alias("html"),
        F.when(~is_delete, lang).alias("lang"),
        schema_version.alias("schema_version"),
        fetch_status.alias("fetch_status"),
        epoch.alias("epoch"),
    )
