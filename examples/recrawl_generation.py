"""Recrawl lifecycle: crawl generation N's fetch log → change-rate
backoff scores → due URLs re-seed generation N+1 (hot pages first).

Three discovery/refresh channels compose here:
- adaptive revisit (crawl/revisit.py): predicted change, exponential
  backoff per trailing unchanged fetch;
- sitemap refresh (crawl/sitemaps.py): advertised change (lastmod);
- robots `Sitemap:` advertisements (crawl/robots.py): discovery of
  unguessable sitemap paths.

Run: python examples/recrawl_generation.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))  # run from anywhere

import tempfile

from nipper_spark.crawl.frontier import FrontierEngine
from nipper_spark.crawl.politeness import CrawlPolicy
from nipper_spark.crawl.revisit import revisit_frontier, revisit_scores
from nipper_spark.crawl.state import SCHEDULE_SCHEMA, CrawlState
from nipper_spark.session import build_session
from nipper_spark.sources.synthetic import synth_pages_df

spark = build_session(master="local[8]", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")

pages = synth_pages_df(spark, n_pages=400, links_per_page=6,
                       n_hosts=8).cache()

# a synthetic fetch log from 4 past crawl generations: page i's
# content "changes" every (1 + i % 4) generations
rows = []
for r in pages.select("url").limit(60).collect():
    url = r["url"]
    period = 1 + (int(url.rsplit("/", 1)[1]) % 4)  # deterministic
    for gen in range(1, 5):
        rows.append((url, gen, f"v{gen // period}"))
log = spark.createDataFrame(rows, "url string, seq long, "
                                  "fingerprint string")

scores = revisit_scores(log).cache()
print("backoff state (5 hottest):")
for r in scores.orderBy("revisit_interval", "url").limit(5).collect():
    print(f"  {r['url']}: streak={r['unchanged_streak']} "
          f"interval={r['revisit_interval']} due@{r['next_due_seq']}")

policy = CrawlPolicy(default_tokens=20, n_buckets=8)
seeds = revisit_frontier(scores, at_seq=5, policy=policy)
print(f"due at generation 5: {seeds.count()} URLs")

state_dir = tempfile.mkdtemp(prefix="recrawl_example_")
eng = FrontierEngine(spark, pages, state_dir, policy)
eng.bootstrap_from_df(seeds)
eng.run_round(0)
sched = CrawlState(spark, state_dir).read("schedule", 0,
                                          SCHEDULE_SCHEMA)
print("first wave of the recrawl generation (hot pages outrank cold):")
for r in sched.orderBy("seq").limit(8).collect():
    print(f"  #{r['seq']} {r['url']} score={r['score']}")
spark.stop()
