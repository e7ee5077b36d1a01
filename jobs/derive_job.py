"""spark-submit entrypoint: derivative generation from raw crawl segments.

What Common Crawl's derivative pipeline does per crawl — one distributed
pass over the ``.warc[.gz]`` segments producing any of the three standard
sidecars:

    spark-submit --py-files dist/data_pipeline_spark.zip jobs/derive_job.py \
        --warc-dir SEGMENTS [--cdx-dir CDX] [--wat-dir WAT] [--wet-dir WET] \
        [--resolve-revisits] [--wet-partitions N]

- CDX: SURT-keyed random-access index (url, ts, digest, file, offset,
  length, validators) — parquet, range-partitioned by SURT.
- WAT: per-record metadata + outlinks — JSON-lines.
- WET: extracted-text conversion segments (the engine's byte-exact
  extractor), one segment per partition (``--wet-partitions`` sizes them).

Each sink is an independent narrow derivation of the same parsed-records
frame; segments parse once per requested sink (re-parse is scan-speed and
cheaper than caching html bytes across jobs — the same trade documented
in ingest_job's CDX write).
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warc-dir", required=True)
    ap.add_argument("--cdx-dir", default=None)
    ap.add_argument("--wat-dir", default=None)
    ap.add_argument("--wet-dir", default=None)
    ap.add_argument("--resolve-revisits", action="store_true",
                    help="fill revisit records from their originals first "
                         "(digest equi-join) so WET/WAT cover them too")
    ap.add_argument("--wet-partitions", type=int, default=None,
                    help="repartition before the WET write: one text "
                         "segment per partition")
    args = ap.parse_args()
    if not (args.cdx_dir or args.wat_dir or args.wet_dir):
        ap.error("nothing to do: pass at least one of --cdx-dir/--wat-dir/--wet-dir")

    from pyspark.sql import SparkSession

    from data_pipeline_spark.sources.warc import (
        read_warc,
        resolve_revisits,
        to_wat,
        write_cdx,
        write_wet,
    )

    spark = SparkSession.builder.appName("crawl-derive").getOrCreate()
    out = {}

    def recs():
        r = read_warc(spark, args.warc_dir)
        return resolve_revisits(r) if args.resolve_revisits else r

    if args.cdx_dir:
        # overwrite like the WAT/WET sinks: a rerun after partial failure
        # must not double the index (ingest_job's CDX stays append — it
        # accumulates across bootstrap rounds by design)
        write_cdx(recs(), args.cdx_dir, mode="overwrite")
        out["cdx"] = args.cdx_dir
    if args.wat_dir:
        to_wat(recs()).write.mode("overwrite").json(args.wat_dir)
        out["wat"] = args.wat_dir
    if args.wet_dir:
        frame = recs().where("record_type = 'response' and html is not null")
        if args.wet_partitions:
            frame = frame.repartition(args.wet_partitions)
        manifest = write_wet(frame, args.wet_dir).collect()
        out["wet"] = args.wet_dir
        out["wet_records"] = sum(r["n_records"] for r in manifest)
        out["wet_segments"] = sum(1 for r in manifest if r["n_records"])
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
