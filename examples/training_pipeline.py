"""End-to-end training-data curation over a documents table:

  quality + language gates → exact dedup → MinHash near-dup clustering
  (one survivor per cluster) → token budget → deterministic
  per-language sampling + train/test split.

Run:  python examples/training_pipeline.py [docs.parquet]
(defaults to the sandbox sf0.001 table).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))  # run from anywhere

from pyspark.sql import functions as F

from nipper_spark.functions.curate import curate_training_set  # noqa: E402
from nipper_spark.functions.dedup import (  # noqa: E402
    minhash_lsh_pairs, near_dup_survivors)
from nipper_spark.functions.sampling import (  # noqa: E402
    train_test_split_col)
from nipper_spark.session import build_session  # noqa: E402


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/testdata/sf0.001/documents.parquet"
    spark = build_session("training-pipeline", master="local[4]",
                          shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(path)

    # near-dup clustering: LSH pairs → connected components → min-id
    # survivor per cluster (exact dedup happens inside curate below)
    pairs = minhash_lsh_pairs(docs, threshold=0.85)
    docs = near_dup_survivors(docs, pairs)

    # gates + exact dedup + token budget (running sum, two-phase)
    curated = curate_training_set(docs, min_quality=0.4, langs=("en",),
                                  token_budget=200_000)

    # deterministic split — stable under repartitioning and reruns
    final = curated.select(
        "doc_id", "bpe_tokens", "quality",
        train_test_split_col(F.col("doc_id"), 0.1).alias("split"))

    final.groupBy("split").agg(
        F.count("*").alias("docs"),
        F.sum("bpe_tokens").alias("tokens")).show()
    final.orderBy("doc_id").show(8)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
