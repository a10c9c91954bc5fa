"""Change-rate-adaptive recrawl scheduling (crawl/revisit.py):
exponential backoff per trailing unchanged fetch, reset on change —
engine vs a single-threaded twin, plus the boundary semantics."""

import random

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from nipper_spark.session import build_session
    return build_session("revisit-tests", master="local[4]",
                         shuffle_partitions=4)


def _twin(rows, base=1, max_interval=64):
    """Single-threaded reference: rows = (url, seq, fingerprint)."""
    by_url = {}
    for u, s, fp in rows:
        by_url.setdefault(u, []).append((s, fp))
    out = {}
    for u, fetches in by_url.items():
        fetches.sort()
        changed_seqs = []
        prev = None
        for s, fp in fetches:
            if prev is None or fp != prev:
                changed_seqs.append(s)
            prev = fp
        lcs = max(changed_seqs)
        streak = sum(1 for s, _ in fetches if s > lcs)
        interval = min(max_interval, base * (2 ** min(streak, 30)))
        last = max(s for s, _ in fetches)
        out[u] = (last, len(fetches), streak, interval,
                  last + interval, 1.0 / interval)
    return out


def test_streak_and_backoff_semantics(spark):
    from nipper_spark.crawl.revisit import revisit_scores
    rows = [
        # a: changed on every fetch -> streak 0, interval 1
        ("a", 1, "x1"), ("a", 2, "x2"), ("a", 3, "x3"),
        # b: never changed after discovery -> streak 2, interval 4
        ("b", 1, "y"), ("b", 2, "y"), ("b", 3, "y"),
        # c: change in the middle resets the streak -> streak 1
        ("c", 1, "z"), ("c", 2, "z"), ("c", 3, "w"), ("c", 4, "w"),
        # d: single fetch -> streak 0 (discovery counts as change)
        ("d", 7, "q"),
    ]
    log = spark.createDataFrame(rows, "url string, seq long, "
                                      "fingerprint string")
    got = {r["url"]: (r["last_seq"], r["n_fetches"],
                      r["unchanged_streak"], r["revisit_interval"],
                      r["next_due_seq"], r["revisit_score"])
           for r in revisit_scores(log).collect()}
    assert got == _twin(rows)
    assert got["a"][2:4] == (0, 1)
    assert got["b"][2:4] == (2, 4)
    assert got["c"][2:4] == (1, 2)
    assert got["d"][2:4] == (0, 1)


def test_interval_clamped_at_max(spark):
    from nipper_spark.crawl.revisit import revisit_scores
    rows = [("u", i, "same") for i in range(1, 22)]  # streak 20
    log = spark.createDataFrame(rows, "url string, seq long, "
                                      "fingerprint string")
    r = revisit_scores(log, max_interval=64).collect()[0]
    assert r["unchanged_streak"] == 20
    assert r["revisit_interval"] == 64
    assert r["next_due_seq"] == 21 + 64
    assert r["revisit_score"] == 1.0 / 64


def test_engine_matches_twin_random(spark):
    from nipper_spark.crawl.revisit import revisit_scores
    rng = random.Random(11)
    rows = []
    for u in range(40):
        n = rng.randrange(1, 12)
        fp = "f0"
        for s in range(1, n + 1):
            if rng.random() < 0.3:
                fp = f"f{rng.randrange(5)}"
            rows.append((f"u{u}", s, fp))
    log = spark.createDataFrame(rows, "url string, seq long, "
                                      "fingerprint string")
    got = {r["url"]: (r["last_seq"], r["n_fetches"],
                      r["unchanged_streak"], r["revisit_interval"],
                      r["next_due_seq"], r["revisit_score"])
           for r in revisit_scores(log).collect()}
    assert got == _twin(rows)


def test_revisit_due_filter(spark):
    from nipper_spark.crawl.revisit import revisit_due, revisit_scores
    rows = [("hot", 1, "a"), ("hot", 2, "b"),       # due at 3
            ("cold", 1, "c"), ("cold", 2, "c"),     # interval 2, due 4
            ("ice", 1, "d"), ("ice", 2, "d"), ("ice", 3, "d")]  # due 7
    log = spark.createDataFrame(rows, "url string, seq long, "
                                      "fingerprint string")
    scores = revisit_scores(log)
    due3 = {r["url"] for r in revisit_due(scores, 3).collect()}
    due4 = {r["url"] for r in revisit_due(scores, 4).collect()}
    due7 = {r["url"] for r in revisit_due(scores, 7).collect()}
    assert due3 == {"hot"}
    assert due4 == {"hot", "cold"}
    assert due7 == {"hot", "cold", "ice"}
    # scores: hot changed last fetch -> max score
    s = {r["url"]: r["revisit_score"]
         for r in scores.select("url", "revisit_score").collect()}
    assert s["hot"] == 1.0 and s["cold"] == 0.5 and s["ice"] == 0.25


def test_plan_has_no_python_udf(spark):
    """The whole operator is Catalyst expressions — one url-keyed
    exchange, no Python workers in the plan."""
    rows = [("u", 1, "a"), ("u", 2, "a")]
    log = spark.createDataFrame(rows, "url string, seq long, "
                                      "fingerprint string")
    from nipper_spark.crawl.revisit import revisit_scores
    plan = revisit_scores(log)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_revisit_frontier_bootstraps_a_generation(spark, tmp_path):
    """revisit_frontier rows feed bootstrap_from_df directly: the due
    URLs become round-0 frontier state ordered by revisit score, and
    the next wave schedules hot pages before cold ones."""
    import datetime

    from nipper_spark.crawl.frontier import FrontierEngine
    from nipper_spark.crawl.politeness import CrawlPolicy
    from nipper_spark.crawl.revisit import revisit_frontier, revisit_scores
    from nipper_spark.crawl.state import SCHEDULE_SCHEMA, CrawlState
    from nipper_spark.sources.synthetic import PAGES_SCHEMA

    rows = [("http://h.test/hot", 1, "a"), ("http://h.test/hot", 2, "b"),
            ("http://h.test/cold", 1, "c"), ("http://h.test/cold", 2, "c"),
            ("http://h.test/ice", 1, "d"), ("http://h.test/ice", 2, "d"),
            ("http://h.test/ice", 3, "d")]
    log = spark.createDataFrame(rows, "url string, seq long, "
                                      "fingerprint string")
    policy = CrawlPolicy(default_tokens=4, n_buckets=2)
    seeds = revisit_frontier(revisit_scores(log), at_seq=7, policy=policy)
    got = {(r["url"], r["score"], r["depth"]) for r in seeds.collect()}
    assert got == {("http://h.test/hot", 1.0, 0),
                   ("http://h.test/cold", 0.5, 0),
                   ("http://h.test/ice", 0.25, 0)}

    ts = datetime.datetime(2026, 1, 1)
    pages = spark.createDataFrame(
        [(u, ts, b"<p>x</p>", None, "en") for u, _, _ in got],
        PAGES_SCHEMA)
    d = str(tmp_path / "regen")
    eng = FrontierEngine(spark, pages, d, policy)
    eng.bootstrap_from_df(seeds)
    eng.run_round(0)
    sched = CrawlState(spark, d).read("schedule", 0, SCHEDULE_SCHEMA) \
        .orderBy("seq").collect()
    assert [s["url"].rsplit("/", 1)[1] for s in sched] == \
        ["hot", "cold", "ice"]  # score-ordered wave
