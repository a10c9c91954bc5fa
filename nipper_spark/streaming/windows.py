"""Event-time windowed aggregation with watermarking — per-host crawl
telemetry over a page stream (fetch counts / bytes per host per
window), tolerant of out-of-order arrival up to the watermark delay.

Late data semantics: rows older than ``max(event_time) - delay`` are
dropped by the watermark; in append output mode a window is emitted
exactly once, when the watermark passes its end — so downstream
consumers (dashboards, budget controllers) see each (host, window)
row once, finalized. State store size is bounded by
hosts × open windows, not by rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nipper_spark.functions.url import HOST_RE_SQL


def host_fetch_windows(pages: DataFrame, window: str = "10 minutes",
                       delay: str = "5 minutes") -> DataFrame:
    """→ (host, window_start, window_end, n_pages, html_bytes) —
    finalized per-host per-window fetch stats (append-mode streaming
    aggregate; also runs on batch DataFrames, where every window
    finalizes immediately)."""
    hosts = pages.select(
        F.regexp_extract("url", HOST_RE_SQL, 1).alias("host"),
        F.col("warc_ts"),
        F.length("html").alias("n_bytes"))
    if pages.isStreaming:
        hosts = hosts.withWatermark("warc_ts", delay)
    return (hosts
            .groupBy("host", F.window("warc_ts", window).alias("w"))
            .agg(F.count("*").alias("n_pages"),
                 F.sum("n_bytes").alias("html_bytes"))
            .select("host",
                    F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "n_pages", "html_bytes"))


def run_host_fetch_windows(spark, pages_dir: str, out_dir: str,
                           checkpoint_dir: str,
                           window: str = "10 minutes",
                           delay: str = "5 minutes") -> None:
    """Drain available page files through the windowed aggregate
    (Trigger.AvailableNow, append mode): emits only windows the
    watermark has closed; restarts resume watermark + window state
    from the checkpoint."""
    from nipper_spark.sources.synthetic import PAGES_SCHEMA
    stream = (spark.readStream.schema(PAGES_SCHEMA)
              .format("parquet").load(pages_dir))
    agg = host_fetch_windows(stream, window, delay)
    q = (agg.writeStream
         .format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def user_sessions(events: DataFrame, gap: str = "30 minutes",
                  delay: str = "10 minutes") -> DataFrame:
    """→ (user_id, session_start, session_end, n_events, sum_value) —
    per-user SESSION windows split at ``gap`` inactivity
    (``F.session_window``: events merge while the next start lies
    strictly inside the previous window's ``ts + gap``). Streaming
    inputs get a watermark so session state closes and emits in append
    mode; on batch DataFrames every session finalizes immediately
    (the shape q:event_sessions oracle-checks against the DuckDB
    gaps-and-islands twin)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", delay)
    return (src.groupBy("user_id",
                        F.session_window("ts", gap).alias("s"))
            .agg(F.count("*").alias("n_events"),
                 F.sum("value").alias("sum_value"))
            .select("user_id",
                    F.col("s.start").alias("session_start"),
                    F.col("s.end").alias("session_end"),
                    "n_events", "sum_value"))
