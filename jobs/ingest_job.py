"""spark-submit entrypoint: Debezium wire envelopes → the typed epoch log.

Closes the shippable chain: a directory (or stream landing zone) of
Debezium JSON-lines becomes the engine's epoch-partitioned change log,
which ``jobs/replay_job.py`` then applies to the lake table:

    spark-submit --py-files dist/data_pipeline_spark.zip jobs/ingest_job.py \
        --wire-dir s3://.../debezium-landing --log-dir s3://.../changelog \
        --row-ddl "url string, warc_ts timestamp, html binary, lang string" \
        [--epoch-size 1000000 | --tx-col tx_id --epoch-size 1000000] \
        [--quarantine-dir .../dlq]

Bootstrap mode: ``--warc-dir`` ingests Common-Crawl-style ``.warc[.gz]``
segments instead of a wire landing — records parse distributed (one task
per segment), optionally emit the CDX index sidecar (``--cdx-dir``), and
become url-keyed insert events (lsn = capture micros) so a later wire tail
LWW-supersedes the bootstrap exactly like any other epoch.

Epoch assignment: without ``--tx-col``, events are packed into
~epoch-size epochs by lsn order (floor(rank/epoch_size) via the same
two-pass distributed prefix sum); with it, transaction-aligned
(``sources.transactions.align_epochs`` — no source tx ever straddles a
commit). Corrupt envelopes dead-letter with the raw line, never kill the
ingest.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--wire-dir", default=None,
                    help="directory of Debezium JSON-lines files")
    ap.add_argument("--warc-dir", default=None,
                    help="bootstrap mode (X66): directory of .warc[.gz] "
                         "crawl segments; records become url-keyed insert "
                         "events (lsn = capture micros) packed into epochs")
    ap.add_argument("--cdx-dir", default=None,
                    help="with --warc-dir: also write the CDX index "
                         "(url, ts, digest, file, offset, length) here")
    ap.add_argument("--lang", default="en",
                    help="with --warc-dir: lang stamped on bootstrap events")
    ap.add_argument("--resolve-revisits", action="store_true",
                    help="with --warc-dir: fill payload-less revisit "
                         "records (crawl-time dedup) from their originals "
                         "via a digest equi-join before bridging")
    ap.add_argument("--normalize-charset", action="store_true",
                    help="with --warc-dir: sniff each page's charset "
                         "(BOM/meta declaration) and re-encode to UTF-8 "
                         "before landing in the change log")
    ap.add_argument("--log-dir", required=True,
                    help="output epoch-partitioned change log")
    ap.add_argument("--row-ddl", default=None,
                    help="payload row DDL, e.g. 'url string, warc_ts "
                         "timestamp, html binary, lang string'")
    ap.add_argument("--epoch-size", type=int, default=1_000_000)
    ap.add_argument("--tx-col", default=None,
                    help="payload column carrying the source transaction id; "
                         "epochs then never split a transaction")
    ap.add_argument("--quarantine-dir", default=None,
                    help="write unparseable envelopes here (raw line + "
                         "nothing else applied)")
    ap.add_argument("--offset-ledger", default=None, metavar="JSON",
                    help="Kafka-shaped mode (X65): --wire-dir is a parquet "
                         "landing of (partition, offset, value) rows; pack "
                         "offset-vector epochs via this durable ledger "
                         "(epoch-size = offsets per partition per epoch); "
                         "lsn = offset")
    ap.add_argument("--offset-genesis", type=int, default=1,
                    help="the transport's first offset (0 for Kafka; "
                         "default 1) — first-sight partitions ship from "
                         "here")
    args = ap.parse_args()

    from pyspark.sql import Observation, SparkSession
    import pyspark.sql.functions as F

    from data_pipeline_spark.sources import changelog
    from data_pipeline_spark.sources.changelog import write_log
    from data_pipeline_spark.sources.debezium import parse_debezium
    from data_pipeline_spark.sources.transactions import align_epochs

    if (args.wire_dir is None) == (args.warc_dir is None):
        ap.error("exactly one of --wire-dir / --warc-dir is required")
    if args.wire_dir is not None and args.row_ddl is None:
        ap.error("--row-ddl is required with --wire-dir")

    spark = SparkSession.builder.appName("cdc-ingest").getOrCreate()
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    # --normalize-charset decodes dirty web bytes: replacement, not failure
    # (functions/charset.py UTF-16 branches need this; see session.py)
    spark.conf.set("spark.sql.legacy.codingErrorAction", "true")

    if args.warc_dir is not None:
        from data_pipeline_spark.sources.warc import (
            read_warc,
            warc_to_change_events,
            write_cdx,
        )

        recs = read_warc(spark, args.warc_dir)
        if args.resolve_revisits:
            from data_pipeline_spark.sources.warc import resolve_revisits

            recs = resolve_revisits(recs)
        if args.cdx_dir is not None:
            # one extra narrow pass over the already-parsed records; at
            # scale you'd persist recs, but segments re-parse cheaply and
            # a persist of html bytes would evict far more useful blocks
            write_cdx(recs, args.cdx_dir)
        events = warc_to_change_events(
            recs, epoch=0, lang=args.lang,
            normalize_charset=args.normalize_charset,
        ).drop("epoch")
        with_epochs = align_epochs(
            events.withColumn("__tx", F.col("lsn")),
            tx_col="__tx",
            target_events=args.epoch_size,
        ).drop("__tx")
        existing = changelog.list_epochs(spark, args.log_dir)
        base = (max(existing) + 1) if existing else 0
        if base:
            with_epochs = with_epochs.withColumn(
                "epoch", (F.col("epoch") + F.lit(base)).cast("int")
            )
        wobs = Observation()
        write_log(
            with_epochs.observe(wobs, F.count(F.lit(1)).alias("n")),
            args.log_dir,
        )
        n = int(wobs.get["n"])
        new_epochs = [e for e in changelog.list_epochs(spark, args.log_dir)
                      if e not in set(existing)]
        print(json.dumps({
            "events": n, "epochs": len(new_epochs), "first_epoch": base,
            "cdx": args.cdx_dir,
        }))
        spark.stop()
        return

    if args.offset_ledger is not None:
        from data_pipeline_spark.sources.partitioned import (
            OffsetVectorLedger,
            ingest_partitioned,
        )

        kafka = spark.read.parquet(args.wire_dir)
        parsed = parse_debezium(
            kafka, args.row_ddl,
            keep_corrupt=args.quarantine_dir is not None,
            extra_cols=["partition", "offset"],
        )
        n_bad = 0
        holes = None
        if args.quarantine_dir is not None:
            bad_pred = F.col("_corrupt").isNotNull()
            bad = parsed.where(bad_pred).select(
                "partition", "offset",
                F.col("_corrupt").alias("raw"),
                F.lit("corrupt_envelope").alias("_reason"),
            )
            qobs = Observation()
            bad.observe(qobs, F.count(F.lit(1)).alias("n")).write.mode(
                "overwrite"
            ).parquet(args.quarantine_dir)
            n_bad = int(qobs.get["n"])
            parsed = parsed.where(~bad_pred).drop("_corrupt")
            # quarantined offsets are CONSUMED from the transport but not
            # shipped: the vector commits past them (Kafka's poison-message
            # semantics) while the DLQ records which offsets they were.
            holes = spark.read.parquet(args.quarantine_dir).select(
                "partition", "offset"
            )
        events = parsed.withColumn(
            "lsn", F.col("offset")
        ).drop("source_ts")
        res = ingest_partitioned(
            spark, events, args.log_dir,
            OffsetVectorLedger(args.offset_ledger),
            target=args.epoch_size,
            consumed=holes,
            genesis=args.offset_genesis,
        )
        print(json.dumps({
            "events": res["rows"], "epochs": len(res["epochs"]),
            "first_epoch": res["epochs"][0] if res["epochs"] else None,
            "quarantined": n_bad,
            "vectors": {str(k): v for k, v in res["vectors"].items()},
        }))
        spark.stop()
        return

    wire = spark.read.text(args.wire_dir)
    parsed = parse_debezium(
        wire, args.row_ddl, keep_corrupt=args.quarantine_dir is not None
    )
    n_bad = 0
    if args.quarantine_dir is not None:
        # Poison = unparseable/unknown-op envelopes AND parseable events
        # with no lsn (align_epochs refuses NULL keys — they would silently
        # vanish at its join otherwise). Count rides the write.
        bad_pred = F.col("_corrupt").isNotNull() | F.col("lsn").isNull()
        bad = parsed.where(bad_pred).select(
            F.col("_corrupt").alias("raw"), "op", "lsn",
            F.when(F.col("_corrupt").isNotNull(), F.lit("corrupt_envelope"))
            .otherwise(F.lit("null_lsn")).alias("_reason"),
        )
        qobs = Observation()
        bad.observe(qobs, F.count(F.lit(1)).alias("n")).write.mode(
            "overwrite"
        ).parquet(args.quarantine_dir)
        n_bad = int(qobs.get["n"])
        parsed = parsed.where(~bad_pred).drop("_corrupt")
    # without a DLQ, a null-lsn event makes align_epochs fail loudly below —
    # never a silent drop.

    if args.tx_col:
        with_epochs = align_epochs(
            parsed, tx_col=args.tx_col, target_events=args.epoch_size
        )
    else:
        # lsn-ordered packing = tx alignment with every event its own tx
        with_epochs = align_epochs(
            parsed.withColumn("__tx", F.col("lsn")),
            tx_col="__tx",
            target_events=args.epoch_size,
        ).drop("__tx")

    # Re-runs append AFTER the existing epochs: reusing epoch numbers would
    # interleave new events into directories a checkpointed replay already
    # marked done — the exactly-once ledger would skip them forever.
    existing = changelog.list_epochs(spark, args.log_dir)
    base = (max(existing) + 1) if existing else 0
    if base:
        with_epochs = with_epochs.withColumn(
            "epoch", (F.col("epoch") + F.lit(base)).cast("int")
        )
    wobs = Observation()
    write_log(
        with_epochs.drop("source_ts").observe(
            wobs, F.count(F.lit(1)).alias("n")
        ),
        args.log_dir,
    )
    n = int(wobs.get["n"])
    new_epochs = [e for e in changelog.list_epochs(spark, args.log_dir)
                  if e not in set(existing)]
    print(json.dumps({
        "events": n, "epochs": len(new_epochs), "first_epoch": base,
        "quarantined": n_bad,
    }))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
