"""Stateful streaming operators (`applyInPandasWithState`).

``run_streaming_dedup``: incremental first-occurrence URL dedup over a
growing pages table — the streaming twin of the frontier's URL-seen
layer. State is keyed by ``host_bucket`` (the same partitioning the
batch engine uses), and each group's state holds the set of url hashes
already emitted, so an URL appears in the output exactly once across
all micro-batches and restarts.

Scale shape: state per key is a bucket's seen-hash set, stored as the
state store's binary value; the number of state keys = n_buckets
(bounded, not per-URL), and a bucket's state grows with its unique
URLs exactly like the batch engine's per-bucket bloom payload. For a
10^10-URL stream you'd raise n_buckets so each bucket's set stays
executor-memory-sized — the same knob the batch layer exposes.

Exact semantics (no false positives/negatives): the state holds the
EXACT url strings, mirroring the batch layer's exact-anti-join
authority rather than its bloom prefilter. Hashes would be smaller but
a 64-bit collision silently drops a distinct URL forever — a false
negative, the one failure mode the URL-seen invariant forbids (at the
10^10-URL scale this layer targets, the birthday expectation over 64
bits is not negligible). Exactness costs state bytes, not semantics;
n_buckets is the existing knob that keeps each bucket's set
executor-sized.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from nipper_spark.sources.synthetic import PAGES_SCHEMA

_OUT_SCHEMA = "url string, host_bucket int"
_STATE_SCHEMA = "seen array<string>"


def _dedup_fn(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
    """One host bucket: emit first occurrences, fold exact urls into
    state (exactness invariant: never a false negative)."""
    seen = set(state.get[0]) if state.exists else set()
    out_urls: list[str] = []
    n0 = len(seen)
    for pdf in pdfs:
        for url in pdf["url"]:
            if url not in seen:
                seen.add(url)
                out_urls.append(url)
    if len(seen) != n0:
        state.update((sorted(seen),))
    if out_urls:
        yield pd.DataFrame({"url": out_urls,
                            "host_bucket": [int(key[0])] * len(out_urls)})


def dedup_first_occurrences(pages: DataFrame, n_buckets: int = 32,
                            output_mode: str = "append") -> DataFrame:
    """Streaming DataFrame of (url, host_bucket) — each url exactly
    once across the stream's lifetime (streaming-only: Spark rejects
    applyInPandasWithState in batch queries)."""
    keyed = pages.select(
        "url",
        F.pmod(F.xxhash64(F.regexp_extract(
            "url", r"^https?://([^/:]+)", 1)), F.lit(n_buckets))
        .cast("int").alias("host_bucket"))
    return (keyed.groupBy("host_bucket")
            .applyInPandasWithState(
                _dedup_fn, outputStructType=_OUT_SCHEMA,
                stateStructType=_STATE_SCHEMA, outputMode=output_mode,
                timeoutConf=GroupStateTimeout.NoTimeout))


def run_streaming_dedup(spark: SparkSession, pages_dir: str,
                        out_dir: str, checkpoint_dir: str,
                        n_buckets: int = 32) -> None:
    """Drain available page files through the stateful dedup exactly
    once (Trigger.AvailableNow); restarts resume the state store from
    the checkpoint, so cross-run duplicates are suppressed too."""
    stream = (spark.readStream.schema(PAGES_SCHEMA)
              .format("parquet").load(pages_dir))
    deduped = dedup_first_occurrences(stream, n_buckets)
    q = (deduped.writeStream
         .format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
