"""spark-submit entrypoint: next crawl plan from the engine's own evidence.

Closes the CDC loop as a shippable job: the CDX index (what was captured
when, and whether it changed — sources/warc.py::build_cdx) drives per-url
change-rate estimates (operators/recrawl.py), optionally weighted by host
importance PageRank'd from the stored pages' link graph
(operators/webgraph.py), and emits the budgeted fetch plan the next crawl
round should execute:

    spark-submit --py-files dist/data_pipeline_spark.zip jobs/crawl_plan_job.py \
        --cdx-dir CDX --budget 100000 --out PLAN \
        [--default-period-s 604800] \
        [--table-dir LAKE --rank-weight 1.0] [--pagerank-iters 8]

Priority = due_score (expected missed changes) × (normalized host rank)
^ rank-weight, where host rank is normalized to mean 1 so rank-weight 0
(or no --table-dir) degrades exactly to pure change-rate scheduling. The
plan lands as parquet sorted by priority with the evidence columns kept
(due_score, change_period_s, staleness_s, host, host_rank) so the fetch
layer can re-cut the budget without recomputing.

Scale: stats are one window + one hash agg over the CDX (itself a narrow
derivative of the crawl); PageRank is per-round one join + one agg over
HOST-level edges (orders of magnitude smaller than the page graph); the
final cut is a TakeOrderedAndProject at the budget.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cdx-dir", required=True,
                    help="CDX parquet (url, warc_ts, payload_digest, ...)")
    ap.add_argument("--out", required=True, help="output plan parquet")
    ap.add_argument("--budget", type=int, required=True,
                    help="max urls in the plan")
    ap.add_argument("--default-period-s", type=float, default=None,
                    help="synthetic change period for never-changed pages "
                         "(cold-page rotation); default: they score 0")
    ap.add_argument("--sitemap-dir", default=None,
                    help="directory of fetched sitemap.xml files: entries "
                         "whose <lastmod> post-dates our last capture (or "
                         "whose url we never captured) are server-asserted "
                         "changes and jump the statistical queue")
    ap.add_argument("--feed-dir", default=None,
                    help="directory of fetched RSS/Atom feed files: entries "
                         "merge into the SAME server-asserted-change signal "
                         "as sitemaps (feeds announce changes minutes after "
                         "they happen; freshest assertion per url wins)")
    ap.add_argument("--robots-dir", default=None,
                    help="parquet of (host, robots_txt): disallowed urls "
                         "are dropped BEFORE the budget cut and the plan "
                         "carries each host's crawl-delay")
    ap.add_argument("--agent", default="*",
                    help="with --robots-dir: our user-agent product token")
    ap.add_argument("--table-dir", default=None,
                    help="lake table with (url, html): weight priorities "
                         "by link-graph host PageRank")
    ap.add_argument("--rank-weight", type=float, default=1.0,
                    help="exponent on the normalized host rank (0 = ignore)")
    ap.add_argument("--pagerank-iters", type=int, default=8)
    ap.add_argument("--max-per-host", type=int, default=None,
                    help="fairness cap: at most N urls per host (keeps "
                         "each host's highest-priority pages) BEFORE the "
                         "global budget cut — one mega-host's backlog "
                         "cannot consume the whole budget")
    ap.add_argument("--schedule", action="store_true",
                    help="add per-host fetch slots: scheduled_offset_s "
                         "spaces each host's queue by its crawl-delay "
                         "(robots value when present, else "
                         "--default-delay-s); hosts run in parallel")
    ap.add_argument("--default-delay-s", type=float, default=1.0)
    ap.add_argument("--url-filter", action="store_true",
                    help="drop urls failing the FineWeb-style URL gate "
                         "(banned words, raw-IP hosts, over-length, "
                         "digit-heavy paths) before the budget cut")
    ap.add_argument("--url-blocklist", default=None,
                    help="newline-separated registered domains (UT1-style "
                         "blocklist file); implies --url-filter")
    args = ap.parse_args()

    import pyspark.sql.functions as F
    from pyspark.sql import Observation, SparkSession

    from data_pipeline_spark.functions.weburl import url_host
    from data_pipeline_spark.operators.recrawl import (
        apply_default_period,
        attach_validators,
        recrawl_stats,
    )

    spark = SparkSession.builder.appName("crawl-plan").getOrCreate()

    cdx = spark.read.parquet(args.cdx_dir)
    stats = recrawl_stats(cdx)
    if "http_etag" in cdx.columns or "http_last_modified" in cdx.columns:
        # conditional-GET validators of the latest capture ride the plan:
        # a fetcher sends If-None-Match / If-Modified-Since and a 304
        # costs headers, not payload (either validator alone is enough)
        stats = attach_validators(stats, cdx)
    if args.default_period_s is not None:
        stats = apply_default_period(stats, args.default_period_s)
    assertions = []
    if args.sitemap_dir is not None:
        from data_pipeline_spark.sources.sitemap import parse_sitemap

        xml = (
            spark.read.option("wholetext", "true").text(args.sitemap_dir)
            .withColumnRenamed("value", "xml")
        )
        assertions.append(
            parse_sitemap(xml).select("loc", "lastmod")
        )
    if args.feed_dir is not None:
        from data_pipeline_spark.sources.feeds import (
            feed_assertions,
            parse_feed,
        )

        fxml = (
            spark.read.option("wholetext", "true").text(args.feed_dir)
            .withColumnRenamed("value", "xml")
        )
        assertions.append(feed_assertions(parse_feed(fxml)))
    if assertions:
        from data_pipeline_spark.sources.sitemap import sitemap_due

        merged = assertions[0]
        for a in assertions[1:]:
            merged = merged.unionByName(a)
        # sitemap_due maxes lastmod per url, so when both channels assert
        # the same url the freshest assertion wins
        stats = sitemap_due(stats, merged)
    else:
        stats = stats.withColumn("server_modified", F.lit(False))
    stats = stats.withColumn("host", url_host("url"))

    ranked_hosts = 0
    if args.table_dir is not None and args.rank_weight != 0.0:
        from data_pipeline_spark.lake.table import LakeTable
        from data_pipeline_spark.operators.webgraph import host_rank

        pages = LakeTable.load(spark, args.table_dir).read().select("url", "html")
        ranks = host_rank(pages, iterations=args.pagerank_iters)
        ranked_hosts = ranks.count()
        # normalize to mean 1 (ranks sum to 1 over n hosts) so the weight
        # is a pure shape parameter, not a scale change
        ranks = ranks.select(
            "host",
            (F.col("rank") * F.lit(float(ranked_hosts))).alias("host_rank"),
        )
        stats = stats.join(F.broadcast(ranks) if ranked_hosts < 1_000_000
                           else ranks, "host", "left")
        stats = stats.withColumn(
            "priority",
            F.col("due_score")
            * F.pow(F.coalesce(F.col("host_rank"), F.lit(1.0)),
                    F.lit(args.rank_weight)),
        )
    else:
        stats = stats.withColumn("host_rank", F.lit(None).cast("double"))
        stats = stats.withColumn("priority", F.col("due_score"))

    n_url_filtered = 0
    if args.url_filter or args.url_blocklist is not None:
        from data_pipeline_spark.functions.weburl import url_allowed

        blocked: tuple[str, ...] = ()
        if args.url_blocklist is not None:
            with open(args.url_blocklist) as fh:
                blocked = tuple(
                    line.strip() for line in fh
                    if line.strip() and not line.startswith("#")
                )
        ufobs = Observation()
        gated = stats.withColumn(
            "_url_ok", url_allowed("url", blocked_domains=blocked)
        ).observe(
            ufobs, F.sum((~F.col("_url_ok")).cast("long")).alias("dropped")
        )
        stats = gated.where(F.col("_url_ok")).drop("_url_ok")

    n_disallowed = 0
    if args.robots_dir is not None:
        from data_pipeline_spark.sources.robots import check_allowed, parse_robots

        rules = parse_robots(
            spark.read.parquet(args.robots_dir), agent=args.agent
        )
        checked = check_allowed(stats, rules)
        robs = Observation()
        checked = checked.observe(
            robs, F.sum((~F.col("allowed")).cast("long")).alias("blocked")
        )
        stats = checked.where(F.col("allowed")).drop("allowed", "matched_rule")

    if args.max_per_host is not None:
        from data_pipeline_spark.operators.recrawl import cap_per_host

        # asserted urls rank above statistical priority inside the cap,
        # matching the final plan sort below
        stats = cap_per_host(
            stats, args.max_per_host, asserted_col="server_modified"
        )

    # server-asserted changes jump the statistical queue: the origin said
    # the page changed; due_score ranks only the rest
    plan = stats.orderBy(
        F.col("server_modified").desc(), F.col("priority").desc(), F.col("url")
    ).limit(args.budget)
    if args.schedule:
        from data_pipeline_spark.operators.recrawl import schedule_fetches

        if "crawl_delay" not in plan.columns:
            plan = plan.withColumn("crawl_delay", F.lit(None).cast("double"))
        plan = schedule_fetches(plan, default_delay_s=args.default_delay_s)
    obs = Observation()
    plan.observe(
        obs,
        F.count(F.lit(1)).alias("n"),
        F.sum("due_score").alias("expected_missed_changes"),
        F.sum(F.col("server_modified").cast("long")).alias("asserted"),
    ).write.mode("overwrite").parquet(args.out)
    if args.robots_dir is not None:
        n_disallowed = int(robs.get["blocked"] or 0)
    if args.url_filter or args.url_blocklist is not None:
        n_url_filtered = int(ufobs.get["dropped"] or 0)
    print(json.dumps({
        "planned_urls": int(obs.get["n"]),
        "url_filtered": n_url_filtered,
        "expected_missed_changes": round(float(obs.get["expected_missed_changes"] or 0.0), 3),
        "server_asserted": int(obs.get["asserted"] or 0),
        "robots_disallowed": n_disallowed,
        "ranked_hosts": ranked_hosts,
        "out": args.out,
    }))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
