"""Change-rate-adaptive recrawl scheduling.

A crawler that refetches every page at the same cadence wastes its
politeness budget on pages that never change and goes stale on pages
that change hourly. This operator turns the FETCH LOG (one row per
completed fetch: url, monotone sequence number, content fingerprint)
into per-URL revisit state:

- ``unchanged_streak``: consecutive trailing fetches whose fingerprint
  did not change (0 when the latest fetch saw new content);
- ``revisit_interval``: exponential backoff ``min(base·2^streak,
  max_interval)`` — the classic adaptive-revisit policy (cf. Cho &
  Garcia-Molina, "Effective Page Refresh Policies for Web Crawlers",
  TODS 2003: revisit frequency should track observed change rate);
- ``next_due_seq`` and ``revisit_score`` (= 1/interval): direct
  frontier score inputs — higher score = revisit sooner, and the
  score is comparable with discovery scores.

Scale shape: ONE shuffle on url (the change-detection window), and the
following aggregation reuses that partitioning — no second exchange.
Everything is built-in Catalyst expressions (lag/max/sum windows, bit
shifts); no Python UDF anywhere, so the whole operator stays inside
whole-stage codegen. Intervals are powers of two so ``1.0/interval``
is float-exact — the driver oracle hash-compares doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 1 << 30 comfortably exceeds any real max_interval; clamping the
# shift keeps the arithmetic in long range for arbitrarily long streaks
_MAX_SHIFT = 30


def fetch_log_changes(log: DataFrame, url_col: str = "url",
                      seq_col: str = "seq",
                      fp_col: str = "fingerprint") -> DataFrame:
    """Per-fetch change flags: a fetch 'changed' iff its fingerprint
    differs from the previous fetch of the same url (the first fetch
    of a url always counts as changed — it discovered content)."""
    w = Window.partitionBy(url_col).orderBy(seq_col)
    prev = F.lag(fp_col).over(w)
    return log.withColumn(
        "changed", prev.isNull() | (F.col(fp_col) != prev))


def revisit_scores(log: DataFrame, url_col: str = "url",
                   seq_col: str = "seq", fp_col: str = "fingerprint",
                   base_interval: int = 1,
                   max_interval: int = 64) -> DataFrame:
    """Fetch log → (url, last_seq, n_fetches, unchanged_streak,
    revisit_interval, next_due_seq, revisit_score).

    One url-keyed shuffle: the lag window detects changes, a second
    window over the same partitioning carries the last-changed seq to
    every row, and the final groupBy reuses the url partitioning."""
    ch = fetch_log_changes(log, url_col, seq_col, fp_col)
    wp = Window.partitionBy(url_col)
    ch = ch.withColumn(
        "_lcs", F.max(F.when(F.col("changed"),
                             F.col(seq_col))).over(wp))
    agg = (ch.groupBy(F.col(url_col).alias("url"))
           .agg(F.max(seq_col).alias("last_seq"),
                F.count("*").alias("n_fetches"),
                F.sum((F.col(seq_col) > F.col("_lcs")).cast("long"))
                .alias("unchanged_streak")))
    # 2^streak via pow (shiftleft takes only literal shift counts);
    # exact in double up to the _MAX_SHIFT clamp
    interval = F.least(
        F.lit(max_interval).cast("long"),
        (F.lit(base_interval) *
         F.pow(F.lit(2.0), F.least(F.col("unchanged_streak"),
                                   F.lit(_MAX_SHIFT)).cast("double")))
        .cast("long"))
    return (agg.withColumn("revisit_interval", interval)
            .withColumn("next_due_seq",
                        F.col("last_seq") + F.col("revisit_interval"))
            .withColumn("revisit_score",
                        F.lit(1.0) / F.col("revisit_interval")
                        .cast("double")))


def revisit_due(scores: DataFrame, at_seq: int) -> DataFrame:
    """URLs whose backoff interval has elapsed at ``at_seq`` — the
    rows a frontier round unions in as recrawl candidates, scored by
    revisit_score (comparable with discovery scores)."""
    return (scores.filter(F.col("next_due_seq") <= at_seq)
            .select("url", "revisit_score"))


def revisit_frontier(scores: DataFrame, at_seq: int, policy,
                     round_no: int = 0) -> DataFrame:
    """Due URLs as a FRONTIER_SCHEMA-shaped re-seed table — the
    recrawl sibling of ``sitemaps.sitemap_refresh_frontier``: where
    refresh re-seeds on an ADVERTISED change (lastmod newer than the
    last fetch), this re-seeds on a PREDICTED one (the backoff
    interval elapsed). Like refresh, the output bootstraps a new crawl
    generation (re-fetch despite seen = new generation by design);
    revisit_score carries straight into the wave's score ordering, so
    frequently-changing pages outrank static ones in the next wave."""
    from nipper_spark.crawl.frontier import _host_cols

    due = revisit_due(scores, at_seq) \
        .withColumnRenamed("revisit_score", "score")
    due = _host_cols(due, policy)
    return due.select(
        "url", "host", "host_bucket",
        F.lit(0).cast("int").alias("depth"),
        F.col("score").cast("double").alias("score"),
        F.lit(int(round_no)).cast("int").alias("discovered_round"))
