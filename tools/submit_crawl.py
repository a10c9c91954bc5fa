#!/usr/bin/env python
"""spark-submit entry point for the crawl frontier.

The engine is pure Python over stock PySpark (no JVM extensions, no
custom Catalyst rules — SURVEY.md §7 "Built-in vs custom"), so cluster
deployment is exactly:

    zip -r nipper_spark.zip nipper_spark
    spark-submit --py-files nipper_spark.zip tools/submit_crawl.py \\
        --pages <parquet dir> --state <state dir> \\
        --seeds <file: url[,score] per line> --rounds 8

Prints one JSON line of round stats. Resumable: re-running with the
same --state continues from the MANIFEST high-water mark.
"""

from __future__ import annotations

import argparse
import json


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--state", required=True)
    ap.add_argument("--seeds",
                    help="url[,score] per line; omit with "
                         "--seed-sitemaps to seed from the corpus")
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--tokens", type=int, default=50)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--harvest-robots", action="store_true")
    ap.add_argument("--seed-sitemaps", action="store_true",
                    help="seed the frontier from sitemap.xml rows of "
                         "the pages table (distributed — no driver-"
                         "side seed list)")
    args = ap.parse_args()
    if not args.seeds and not args.seed_sitemaps:
        ap.error("need --seeds and/or --seed-sitemaps")

    # SparkSession comes from spark-submit; builder config (master,
    # executors) belongs to the submit command line, not this script
    from pyspark.sql import SparkSession
    spark = SparkSession.builder.appName("nipper-crawl").getOrCreate()

    from nipper_spark.crawl.frontier import FrontierEngine
    from nipper_spark.crawl.politeness import CrawlPolicy
    from nipper_spark.crawl.robots import harvest_robots_tables

    seeds = []
    if args.seeds:
        with open(args.seeds) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                parts = line.split(",")
                seeds.append((parts[0],
                              float(parts[1]) if len(parts) > 1 else 1.0))

    pages = spark.read.parquet(args.pages)
    policy = CrawlPolicy(default_tokens=args.tokens,
                         n_buckets=args.buckets)
    rules = budgets = None
    if args.harvest_robots:
        # scale path: robots rules + crawl-delay budgets as per-host
        # TABLES joined per round (parse happens executor-side; nothing
        # host-count-sized ever lands on the driver)
        rules, budgets = harvest_robots_tables(
            pages, default_tokens=args.tokens)

    import os
    eng = FrontierEngine(spark, pages, args.state, policy,
                         rules=rules, budgets=budgets)
    if not os.path.isdir(os.path.join(args.state, "frontier", "round=0")):
        if args.seed_sitemaps:
            # distributed bootstrap: sitemap rows of the corpus →
            # frontier-shaped seed TABLE; an optional --seeds file
            # unions in as depth-0 rows (everything stays a DataFrame)
            from nipper_spark.crawl.sitemaps import (
                harvest_sitemap_tables, sitemap_seed_frontier)
            seed_df = sitemap_seed_frontier(
                harvest_sitemap_tables(pages), policy) \
                .select("url", "depth", "score")
            if seeds:
                listed = spark.createDataFrame(
                    [(u, 0, float(s)) for u, s in seeds],
                    "url string, depth int, score double")
                seed_df = seed_df.unionByName(listed)
            eng.bootstrap_from_df(seed_df)
        else:
            eng.bootstrap(seeds)
    stats = eng.run(max_rounds=args.rounds)
    print(json.dumps({
        "rounds": [s.__dict__ for s in stats],
        "total_scheduled": sum(s.scheduled for s in stats),
        "total_fresh": sum(s.fresh for s in stats)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
