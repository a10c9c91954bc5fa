"""Per-host politeness budgets + robots rules.

Politeness is token accounting per host per round (north rule): a host
contributes at most ``tokens(host)`` URLs to a round's fetch wave; the
rest stay in the frontier for later rounds. Hosts are hashed into
buckets so all accounting for one host is local to one partition.

Robots: deterministic per-host disallow prefix rules (a parsed-robots
model — the sandbox has no live fetching, so rules come from config and
the single-threaded oracle applies the identical table).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nipper_spark.operators.topk import topk_per_key

# deterministic total order of a frontier/wave: closest-first BFS,
# then best score, then lexicographic URL tiebreak (required to match
# the reference crawl ordering — SURVEY.md §4.2)
WAVE_ORDER_COLS = ("depth", "score", "url")


def wave_order():
    return [F.col("depth").asc(), F.col("score").desc(), F.col("url").asc()]


def wave_order_specs():
    """Same total order as (name, direction) specs — the form the
    two-phase cumsum operator needs (it must rebuild the comparison as
    a literal bucketing expression)."""
    return [("depth", "asc"), ("score", "desc"), ("url", "asc")]


@dataclass
class CrawlPolicy:
    """Shared config for engine AND oracle — one object, two executors."""
    default_tokens: int = 4
    host_tokens: dict[str, int] = field(default_factory=dict)
    robots_disallow: dict[str, list[str]] = field(default_factory=dict)
    n_buckets: int = 8
    score_decay: float = 0.85
    max_depth: int = 64
    bloom_bits_per_key: int = 10
    salt: int = 16
    # URL-seen prefilter layer: "bloom" (insert-only) or "cuckoo"
    # (delete-capable, saturates instead of false-negating on overflow)
    filter_kind: str = "bloom"
    # fold seen-table round deltas every K rounds (0 = never): bounds
    # the per-round file count the exact anti-join has to list
    compact_every: int = 8
    # waves at or below this take a plain row_number window for the
    # schedule seq (one job; a single window task over ≤1M bounded rows
    # is cheap); above it the two-phase bucket-partitioned sequence
    # (operators/cumsum.py) keeps any one task from holding the wave
    seq_window_threshold: int = 1 << 20

    def tokens(self, host: str) -> int:
        return self.host_tokens.get(host, self.default_tokens)

    def allowed(self, host: str, url: str) -> bool:
        rules = self.robots_disallow.get(host)
        if not rules:
            return True
        # path = everything after scheme://host[:port]
        i = url.find("/", url.find("://") + 3)
        path = url[i:] if i != -1 else "/"
        return not any(path.startswith(p) for p in rules)


def budgets_df(spark, policy: CrawlPolicy) -> DataFrame:
    """Host-override budgets as a (small, broadcastable) dimension."""
    rows = [(h, t) for h, t in sorted(policy.host_tokens.items())]
    return spark.createDataFrame(rows or [("__none__", 0)],
                                 "host string, tokens int")


def select_wave(frontier: DataFrame, budgets: DataFrame,
                policy: CrawlPolicy) -> tuple[DataFrame, DataFrame]:
    """Split a round's frontier into (wave, residual).

    The budgets dim is broadcast (small); per-host top-k goes through
    the salted two-phase operator so a Zipf-hot host cannot pin a
    shuffle partition. Ordering inside a host — and globally — is the
    deterministic (depth, -score, url) key.
    """
    f = frontier.join(F.broadcast(budgets), "host", "left") \
        .withColumn("_tokens", F.coalesce(F.col("tokens"),
                                          F.lit(policy.default_tokens))) \
        .drop("tokens")
    ranked = topk_per_key(
        f, "host", wave_order(), F.col("_tokens"),
        salt=policy.salt, rank_col="_rk")
    wave = ranked.drop("_rk", "_tokens")
    # wave is budget-bounded → broadcast the anti-join so the (much
    # larger) frontier is never shuffled just to compute the residual
    residual = frontier.join(F.broadcast(wave.select("url")), "url",
                             "left_anti")
    return wave, residual


def robots_filter(candidates: DataFrame, policy: CrawlPolicy) -> DataFrame:
    """Drop disallowed URLs. The rule table is tiny config state, so it
    compiles into a literal CASE/filter expression — pure Catalyst, no
    UDF in this hot path."""
    if not policy.robots_disallow:
        return candidates
    cond = F.lit(True)
    path = F.regexp_replace("url", r"^https?://[^/]+", "")
    for host, prefixes in sorted(policy.robots_disallow.items()):
        for p in prefixes:
            bad = (F.col("host") == host) & path.startswith(p)
            cond = cond & ~bad
    return candidates.filter(cond)
