"""spark-submit entrypoint for the curation pipeline (operators/curate.py):

  spark-submit --py-files dist/data_pipeline_spark.zip jobs/curate_job.py \
      --input <parquet dir | lake table dir> --output <parquet dir> \
      [--from-lake] [--line-dedup] [--no-gopher] [--no-minhash] [--no-pii] \
      [--sample '{"en": 0.5, "de": 1.0}'] [--sample-default 0.1] \
      [--bench <parquet dir of (bench_id, text)>] \
      [--bench-ngram 13] [--bench-min-hits 1] \
      [--dedup-index <index dir>] [--dedup-index-epoch N]

--dedup-index makes near-dup dedup CROSS-RUN: new docs are probed against
the persistent MinHash index of everything previous runs shipped, and this
run's survivors are committed back (exactly-once per --dedup-index-epoch).

Input columns: url, warc_ts, (lsn), text, lang. With --from-lake the input
is an icelite lake table (the CDC replay's sink) and the latest snapshot is
curated — changelog → replay → curate → training corpus, end to end.
Prints one JSON line of per-stage counts.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--as-of", default=None, metavar="SNAPSHOT_OR_REF",
                    help="with --from-lake: curate the table AS OF this "
                         "snapshot id, tag, or branch — pins a training "
                         "run to a reproducible corpus version")
    ap.add_argument("--from-lake", action="store_true",
                    help="input is a lake table dir; curate its latest snapshot")
    ap.add_argument("--line-dedup", action="store_true",
                    help="C4-style corpus-wide line dedup before the quality gate")
    ap.add_argument("--no-gopher", action="store_true")
    ap.add_argument("--no-minhash", action="store_true")
    ap.add_argument("--no-pii", action="store_true")
    ap.add_argument("--sample", default=None,
                    help='JSON per-language fractions, e.g. {"en": 0.5}')
    ap.add_argument("--sample-default", type=float, default=1.0)
    ap.add_argument("--seed", default="curate")
    ap.add_argument("--bench", default=None,
                    help="parquet dir of eval-benchmark docs (bench_id, text); "
                         "enables shared-n-gram decontamination")
    ap.add_argument("--bench-ngram", type=int, default=13)
    ap.add_argument("--bench-min-hits", type=int, default=1)
    ap.add_argument("--dedup-index", default=None,
                    help="persistent MinHash index dir: dedup new docs "
                         "against prior runs' shipped corpus, then index "
                         "this run's survivors")
    ap.add_argument("--surprisal-band", default=None, metavar="LO,HI",
                    help="keep docs whose corpus-self unigram surprisal is "
                         "in [LO, HI] (CCNet-style perplexity filter; "
                         "low = boilerplate, high = rare-token noise)")
    ap.add_argument("--span-dedup", type=int, default=None, metavar="K",
                    help="ExactSubstr repeated-span dedup: duplicated runs "
                         "of >= K tokens keep only their corpus-wide first "
                         "occurrence (strips shared boilerplate spans "
                         "before the quality gate)")
    ap.add_argument("--pack", type=int, default=None, metavar="CTX",
                    help="also emit training sequences: concat-and-cut the "
                         "curated corpus into CTX-token packs, written to "
                         "<output>_packs (doc -> pack span map)")
    ap.add_argument("--pack-shards", type=int, default=64,
                    help="independent packing shards (bounds the per-shard "
                         "sort; pack ids are (shard, pack))")
    ap.add_argument("--export-shards", type=int, default=None,
                    metavar="BUDGET",
                    help="after curation, export the corpus as char-cost-"
                         "balanced shards of ~BUDGET chars each to "
                         "<output>_shards (one dir per shard + "
                         "manifest.json with per-shard integrity hashes)")
    ap.add_argument("--report", action="store_true",
                    help="after curation, write the corpus report card "
                         "(rows/tokens/lang mix/quality/dup ratio as a tidy "
                         "metric frame) to <output>_report")
    ap.add_argument("--main-content", action="store_true",
                    help="re-derive text from the html column via block-"
                         "density boilerplate removal (X73) before any "
                         "curation stage — nav/footer chrome never reaches "
                         "the quality gates or the dedup signatures")
    ap.add_argument("--url-gate", action="store_true",
                    help="FineWeb-style URL filter before any text "
                         "processing (banned words, IP hosts, over-length, "
                         "digit-heavy paths)")
    ap.add_argument("--url-blocklist", default=None, metavar="FILE",
                    help="newline-separated registered domains to block "
                         "(UT1-style list); implies --url-gate")
    ap.add_argument("--dsir-target", default=None, metavar="SQL",
                    help="DSIR selection: SQL predicate defining the "
                         "target-domain sample (e.g. \"lang = 'en'\")")
    ap.add_argument("--dsir-top", type=int, default=None, metavar="N",
                    help="with --dsir-target: keep the N most target-like "
                         "documents")
    ap.add_argument("--dedup-index-epoch", type=int, default=None,
                    help="exactly-once ledger id for the index commit")
    ap.add_argument("--drop-soft404", action="store_true",
                    help="drop pages whose content is an error page "
                         "(soft-404 phrase + short-content signals)")
    ap.add_argument("--drop-mojibake", action="store_true",
                    help="drop pages with U+FFFD or control-char soup "
                         "(charset mis-decode)")
    ap.add_argument("--compression-band", default=None, metavar="LO,HI",
                    help="keep docs with LO <= zlib-compression ratio <= HI "
                         "(machine-generated-spam signal)")
    ap.add_argument("--media-dedup", default=None, metavar="PARQUET",
                    help="parquet of (url, content binary, media_type): "
                         "perceptual image near-dup dedup — pages whose "
                         "attached image near-duplicates another page's "
                         "keep only the cluster's canonical survivor")
    ap.add_argument("--media-hamming", type=int, default=6,
                    help="max dHash hamming distance for --media-dedup")
    args = ap.parse_args()
    if args.compression_band is not None:
        parts = args.compression_band.split(",")
        try:
            band = tuple(float(x) for x in parts)
        except ValueError:
            band = ()
        if len(band) != 2 or band[0] > band[1]:
            ap.error("--compression-band must be LO,HI with LO <= HI")
    if args.surprisal_band is not None:
        # Fail at argparse, not hours into the pipeline.
        parts = args.surprisal_band.split(",")
        try:
            band = tuple(float(x) for x in parts)
        except ValueError:
            band = ()
        if len(band) != 2 or band[0] > band[1]:
            ap.error("--surprisal-band must be LO,HI with LO <= HI")
    if args.pack is not None and args.pack < 1:
        ap.error("--pack must be >= 1")
    if args.pack_shards < 1:
        ap.error("--pack-shards must be >= 1")
    if args.export_shards is not None and args.export_shards < 1:
        ap.error("--export-shards must be >= 1")
    if args.as_of is not None and not args.from_lake:
        ap.error("--as-of requires --from-lake")
    if args.dedup_index_epoch is not None and args.dedup_index is None:
        ap.error("--dedup-index-epoch requires --dedup-index")
    if (args.dsir_target is None) != (args.dsir_top is None):
        ap.error("--dsir-target and --dsir-top must be given together")
    blocked_domains: tuple[str, ...] | None = None
    if args.url_blocklist is not None:
        with open(args.url_blocklist) as fh:
            blocked_domains = tuple(
                line.strip() for line in fh
                if line.strip() and not line.startswith("#")
            )
    elif args.url_gate:
        blocked_domains = ()

    # Import AFTER spark-submit has put the --py-files zip on sys.path.
    from pyspark.sql import SparkSession

    from data_pipeline_spark.operators.curate import CurateConfig, curate

    spark = SparkSession.builder.appName("curate").getOrCreate()
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    # Timestamp stats for lake range pruning (INT96 has none).
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")

    if args.from_lake:
        from data_pipeline_spark.lake.table import LakeTable

        t = LakeTable.load(spark, args.input)
        if args.as_of is None:
            df = t.read()
        elif args.as_of.isdigit():
            df = t.read(snapshot_id=int(args.as_of))
        else:
            df = t.read(ref=args.as_of)
    else:
        df = spark.read.parquet(args.input)

    if args.main_content:
        if "html" not in df.columns:
            ap.error("--main-content requires an html column in the input")
        import pyspark.sql.functions as F

        from data_pipeline_spark.functions.boilerplate import main_content

        df = df.withColumn(
            "__html_str", F.col("html").cast("string")
        ).withColumn("text", main_content("__html_str")).drop("__html_str")

    cfg = CurateConfig(
        lsn_col="lsn" if "lsn" in df.columns else None,
        line_dedup=args.line_dedup,
        span_dedup_k=args.span_dedup,
        apply_gopher=not args.no_gopher,
        mask_pii=not args.no_pii,
        minhash=None if args.no_minhash else CurateConfig().minhash,
        sample_fractions=json.loads(args.sample) if args.sample else None,
        sample_default=args.sample_default,
        seed=args.seed,
        decontaminate_ngram=args.bench_ngram,
        decontaminate_min_hits=args.bench_min_hits,
        dedup_index_path=args.dedup_index,
        dedup_index_epoch=args.dedup_index_epoch,
        surprisal_band=(
            tuple(float(x) for x in args.surprisal_band.split(","))
            if args.surprisal_band else None
        ),
        url_blocked_domains=blocked_domains,
        dsir_target=args.dsir_target,
        dsir_top=args.dsir_top,
        drop_soft404=args.drop_soft404,
        drop_mojibake=args.drop_mojibake,
        compression_band=(
            tuple(float(x) for x in args.compression_band.split(","))
            if args.compression_band else None
        ),
        media_max_hamming=args.media_hamming,
    )
    bench = spark.read.parquet(args.bench) if args.bench else None
    media = spark.read.parquet(args.media_dedup) if args.media_dedup else None
    out, stats = curate(df, cfg, bench=bench, media=media)
    out.write.mode("overwrite").parquet(args.output)
    if args.pack is not None:
        from data_pipeline_spark.operators.textprep import pack_sequences

        # Packing is keyed directly on the unique url (string-id path:
        # hash only picks the shard; ordering uses the url itself, so a
        # hash collision can never cross-attribute two documents' spans).
        packs = pack_sequences(
            out, cfg.url_col, cfg.text_col,
            ctx_tokens=args.pack, n_shards=args.pack_shards,
        )
        packs.write.mode("overwrite").parquet(f"{args.output}_packs")
        stats["pack_rows"] = spark.read.parquet(f"{args.output}_packs").count()
    if args.export_shards is not None:
        import pyspark.sql.functions as F

        from data_pipeline_spark.operators.export import export_shards

        manifest = export_shards(
            out.withColumn(
                "__cost", F.coalesce(F.length(cfg.text_col), F.lit(0)).cast("long")
            ),
            f"{args.output}_shards",
            "__cost",
            cfg.url_col,
            args.export_shards,
            # ship the curated columns only — the scratch __cost column
            # must not leak into the training shards or their hashes
            write_cols=list(out.columns),
        )
        stats["export_shards"] = len(manifest["shards"])
        stats["export_cost"] = manifest["total_cost"]
    if args.report:
        from data_pipeline_spark.operators.report import corpus_report

        corpus_report(
            out, text_col=cfg.text_col,
            lang_col=cfg.lang_col if cfg.lang_col in out.columns else None,
        ).write.mode("overwrite").parquet(f"{args.output}_report")
    print(json.dumps({"metric": "curate_stage_rows", **stats}))
    spark.stop()


if __name__ == "__main__":
    main()
