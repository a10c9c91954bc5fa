#!/usr/bin/env python
"""Round-6 optimization profiling harness (guide §1).

NOT the driver bench — bench.py stays frozen. This file isolates each
expensive query with the noop sink, labels jobs, and dumps per-stage
wall/CPU/shuffle metrics from the AppStatusStore so optimization work
targets measured time, not guesses.

Usage:
    python bench_extra.py queries [--sf /root/testdata/sf1.0] [--only q5]
    python bench_extra.py q3 [--repeats 3]
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def build():
    # same config as nipper_spark.session.build_session, plus the UI so
    # the REST status API serves per-stage metrics for profiling
    from pyspark.sql import SparkSession
    spark = (
        SparkSession.builder.appName("nipper-bench-extra")
        .master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.shuffle.sort.bypassMergeThreshold", "2")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory",
                os.environ.get("NIPPER_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "true")
        .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def _stage_rows(spark, since_ms: int) -> list[dict]:
    """Completed-stage metrics from the UI REST API: wall, executor
    run/cpu time, shuffle bytes (python boundary time is inside
    executorRunTime)."""
    import datetime
    import urllib.request
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages?status=complete",
            timeout=10) as f:
        stages = json.load(f)

    def _ms(ts: str) -> int:
        # "2026-08-22T04:20:01.123GMT"
        dt = datetime.datetime.strptime(
            ts.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z")
        return int(dt.timestamp() * 1000)

    rows = []
    for s in stages:
        sub = _ms(s.get("firstTaskLaunchedTime",
                        s.get("submissionTime", "")) or
                  s.get("submissionTime"))
        if sub < since_ms:
            continue
        done = _ms(s.get("completionTime") or
                   s.get("firstTaskLaunchedTime"))
        rows.append({
            "stage": s["stageId"],
            "name": s["name"][:90],
            "wall_s": round((done - sub) / 1e3, 2),
            "task_s": round(s["executorRunTime"] / 1e3, 2),
            "cpu_s": round(s["executorCpuTime"] / 1e9, 2),
            "tasks": s["numCompleteTasks"],
            "sh_r_mb": round(s["shuffleReadBytes"] / 1e6, 1),
            "sh_w_mb": round(s["shuffleWriteBytes"] / 1e6, 1),
            "in_mb": round(s["inputBytes"] / 1e6, 1),
        })
    rows.sort(key=lambda r: r["stage"])
    return rows


def _job_rows(spark, since_ms: int) -> list[dict]:
    """Per-job wall + callsite from the UI REST API."""
    import datetime
    import urllib.request
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/jobs", timeout=10) as f:
        jobs = json.load(f)

    def _ms(ts: str) -> int:
        dt = datetime.datetime.strptime(
            ts.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z")
        return int(dt.timestamp() * 1000)

    rows = []
    for j in jobs:
        sub = _ms(j["submissionTime"])
        if sub < since_ms:
            continue
        done = _ms(j.get("completionTime") or j["submissionTime"])
        rows.append({
            "job": j["jobId"],
            "name": (j.get("description") or j["name"])[:100],
            "sub": round((sub - since_ms) / 1e3, 2),
            "wall_s": round((done - sub) / 1e3, 2),
            "tasks": j["numCompletedTasks"],
        })
    rows.sort(key=lambda r: r["job"])
    return rows


def profiled(spark, label: str, fn, dump_stages: bool = True):
    spark.sparkContext.setJobDescription(label)
    t0ms = int(time.time() * 1000)
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    spark.sparkContext.setJobDescription(None)
    print(f"== {label}: {dt:.2f}s")
    if dump_stages == "jobs":
        for r in _job_rows(spark, t0ms):
            print("   ", json.dumps(r))
    elif dump_stages:
        for r in _stage_rows(spark, t0ms):
            print("   ", json.dumps(r))
    return dt, out


def run_queries(only: str | None, repeats: int, stages: bool) -> None:
    from pyspark.sql import functions as F
    from nipper_spark.functions.dedup import (
        dedup_exact, minhash_lsh_pairs, near_dup_survivors,
        simhash_near_dups)
    from nipper_spark.functions.similarity import ann_brute_topk
    from nipper_spark.functions.text_udfs import with_text_features

    spark = build()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()
    n = docs.count()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    emb.count()
    print(f"docs={n} sf_dir={SF_DIR}")

    # warm python workers
    import pandas as pd_  # noqa: F401

    @F.pandas_udf("int")
    def _warm(u):
        import pandas as pd
        return pd.Series([0] * len(u), dtype="int32")

    docs.select(_warm("text").alias("w")).agg(F.max("w")).collect()

    def q4():
        return dedup_exact(docs).count()

    def q5():
        return minhash_lsh_pairs(docs, threshold=0.9).count()

    def q5b():
        pairs = minhash_lsh_pairs(docs, threshold=0.9).cache()
        pairs.count()
        c = near_dup_survivors(docs, pairs).count()
        pairs.unpersist()
        return c

    def q6():
        return simhash_near_dups(docs).count()

    def q7():
        return with_text_features(docs).agg(
            F.sum("bpe_tokens"), F.avg("quality")).collect()

    def q8():
        queries = [(r["vec_id"], r["embedding"])
                   for r in emb.orderBy("vec_id").limit(8).collect()]
        return ann_brute_topk(emb, queries, k=10).count()

    qs = {"q4": q4, "q5": q5, "q5b": q5b, "q6": q6, "q7": q7, "q8": q8}
    for name, fn in qs.items():
        if only and name != only:
            continue
        for rep in range(repeats):
            profiled(spark, f"{name}#{rep}", fn,
                     dump_stages=stages and rep == repeats - 1)
    spark.stop()


def run_q3(repeats: int, stages: bool) -> None:
    from nipper_spark.crawl.frontier import FrontierEngine
    from nipper_spark.crawl.politeness import CrawlPolicy
    from nipper_spark.sources.synthetic import page_url, synth_pages_df

    CORPUS = dict(n_pages=60000, links_per_page=20, n_hosts=200, seed=42)
    spark = build()
    from pyspark.sql import functions as F
    corpus = synth_pages_df(spark, **CORPUS).cache()
    corpus.count()

    import pandas as pd_  # noqa: F401

    @F.pandas_udf("int")
    def _warm(u):
        import nipper_spark.functions.html_udfs  # noqa: F401
        import pandas as pd
        return pd.Series([0] * len(u), dtype="int32")

    corpus.select(_warm("url").alias("w")).agg(F.max("w")).collect()

    policy = CrawlPolicy(default_tokens=150, n_buckets=32,
                         host_tokens={"host00.test": 60})
    seeds = [(page_url(i, CORPUS["n_hosts"], 1.2, CORPUS["seed"]), 1.0)
             for i in range(2000)]
    for rep in range(repeats):
        state_dir = tempfile.mkdtemp(prefix="nipper_prof_")
        eng = FrontierEngine(spark, corpus, state_dir, policy)
        eng.bootstrap(seeds)
        bound = None
        t0 = time.time()
        for r in range(3):
            dt, stats = profiled(
                spark, f"round{r}#{rep}",
                lambda: eng.run_round(r, known_nonempty=r > 0,
                                      wave_bound=bound),
                dump_stages="jobs" if (stages and rep == repeats - 1)
                else False)
            stats = stats  # noqa
            bound = stats.frontier_next
        print(f"== q3#{rep} total: {time.time() - t0:.2f}s")
    spark.stop()


def main():
    global SF_DIR
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["queries", "q3", "entry"])
    ap.add_argument("--sf", default=SF_DIR)
    ap.add_argument("--only", default=None)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--no-stages", action="store_true")
    args = ap.parse_args()
    SF_DIR = args.sf
    if args.mode == "queries":
        run_queries(args.only, args.repeats, not args.no_stages)
    elif args.mode == "entry":
        run_entry_queries(args.repeats)
    else:
        run_q3(args.repeats, not args.no_stages)




def run_entry_queries(repeats: int) -> None:
    """Time EVERY __spark_entry__ query at SF_DIR with the noop sink —
    the optimization-round coverage sweep (guide §1.4)."""
    import __spark_entry__ as e
    spark = build()
    times = {}
    for name, fn in e.queries().items():
        best = None
        try:
            for _ in range(repeats):
                t0 = time.time()
                noop(fn(spark, SF_DIR))
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: ERROR {ex}")
            continue
        times[name] = round(best, 2)
        print(f"{name}: {best:.2f}s", flush=True)
    print(json.dumps(dict(sorted(times.items(), key=lambda kv: -kv[1]))))
    spark.stop()

if __name__ == "__main__":
    main()
