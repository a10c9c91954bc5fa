"""End-to-end crawl: synthetic corpus → 4 deterministic frontier
rounds → extracted state tables, with robots harvested from the corpus.

Run: python examples/crawl_rounds.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))  # run from anywhere

import tempfile

from nipper_spark.crawl.frontier import FrontierEngine
from nipper_spark.crawl.politeness import CrawlPolicy
from nipper_spark.crawl.robots import harvest_robots_from_pages
from nipper_spark.session import build_session
from nipper_spark.sources.synthetic import synth_pages_df, page_url

spark = build_session(master="local[8]", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")

pages = synth_pages_df(spark, n_pages=2000, links_per_page=10,
                       n_hosts=40).cache()
policy = harvest_robots_from_pages(
    pages, CrawlPolicy(default_tokens=25, n_buckets=16))
seeds = [(page_url(i, 40, 1.2, 42), 1.0) for i in range(50)]

state_dir = tempfile.mkdtemp(prefix="crawl_example_")
eng = FrontierEngine(spark, pages, state_dir, policy)
eng.bootstrap(seeds)
for stats in eng.run(max_rounds=4):
    print(f"round {stats.round}: scheduled={stats.scheduled} "
          f"fetched={stats.fetched} fresh={stats.fresh} "
          f"frontier_next={stats.frontier_next}")
print("state tables under", state_dir)
