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

from nipper_spark.functions.url import HOST_RE_SQL

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
            "url", HOST_RE_SQL, 1)), F.lit(n_buckets))
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


# ----------------------------------------------------------------------
# streaming revisit tracker — the incremental twin of
# crawl/revisit.revisit_scores (same backoff math, same streak rule)
# ----------------------------------------------------------------------

_REVISIT_OUT = ("url string, last_seq long, n_fetches long, "
                "unchanged_streak long, revisit_interval long, "
                "next_due_seq long, revisit_score double")
_REVISIT_STATE = ("last_fp string, last_seq long, n_fetches long, "
                  "unchanged_streak long")


def _revisit_fn_factory(base_interval: int, max_interval: int):
    def _fn(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
        """One url: fold this batch's fetches (in seq order) into
        (last_fp, last_seq, n, streak). The incremental streak rule —
        changed → 0, unchanged → +1 — equals the batch operator's
        count-after-last-change, so draining any prefix of the fetch
        log leaves state identical to the batch computation on it."""
        if state.exists:
            last_fp, last_seq, n, streak = state.get
        else:
            last_fp, last_seq, n, streak = None, None, 0, 0
        rows = []
        for pdf in pdfs:
            rows.extend(zip(pdf["seq"], pdf["fingerprint"]))
        if not rows:
            return
        rows.sort()
        for seq, fp in rows:
            changed = (n == 0) or (fp != last_fp)
            streak = 0 if changed else streak + 1
            last_fp = fp
            last_seq = int(seq)
            n += 1
        state.update((last_fp, last_seq, n, streak))
        interval = min(max_interval,
                       base_interval * (2 ** min(streak, 30)))
        yield pd.DataFrame({
            "url": [key[0]], "last_seq": [last_seq], "n_fetches": [n],
            "unchanged_streak": [streak], "revisit_interval": [interval],
            "next_due_seq": [last_seq + interval],
            "revisit_score": [1.0 / interval]})

    return _fn


def revisit_tracker(fetch_log: DataFrame, base_interval: int = 1,
                    max_interval: int = 64,
                    output_mode: str = "append") -> DataFrame:
    """Streaming per-URL revisit state over an incremental fetch log
    (url, seq, fingerprint) — emits the url's refreshed backoff row
    every micro-batch it appears in (append output: each emission is
    a per-batch snapshot row; the latest last_seq per url is the
    current state). State is four scalars per url
    (no history), so state size is O(distinct urls), not O(fetches);
    at 10^10 URLs the state store shards it across executors exactly
    like the batch engine's host buckets shard the seen set.

    Requires per-url seqs to arrive in non-decreasing batches (a crawl
    writes its fetch log in round order, so this holds by
    construction); within a batch any order is fine (sorted here)."""
    return (fetch_log.groupBy("url")
            .applyInPandasWithState(
                _revisit_fn_factory(base_interval, max_interval),
                outputStructType=_REVISIT_OUT,
                stateStructType=_REVISIT_STATE,
                outputMode=output_mode,
                timeoutConf=GroupStateTimeout.NoTimeout))
