"""Scale-adaptive minimum-parallelism guard for CPU-heavy operators.

Problem (guide §2.5 "input skew", §6 "input split size"): a parquet
source with few files / few row groups scans as 1-2 tasks no matter the
split config (a row group is the atomic split unit), and `.cache()`
freezes that layout — so a per-row-expensive operator (MinHash
signatures, SimHash, regex feature extraction) downstream of a small
scan runs on 2 of N cores. Measured on the bench corpus (one 50k-row
row group, local[32]): the MinHash signature stage held 5.3 s of a
6.6 s query wall on 2 tasks.

Fix: repartition UP to the session's default parallelism — but only
when the input's planned partitioning is actually narrower, so at
cluster scale (scans already hundreds of partitions wide) this is a
no-op and no shuffle is added. The added exchange moves the input once
(15 MB here) to unlock N-way compute; round-robin repartition keeps
Spark's sort-before-repartition determinism, and every caller is
order-insensitive downstream (groupBy / join / sorted aggregations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, factor: int = 1) -> DataFrame:
    """Repartition ``df`` up to ``defaultParallelism * factor``
    partitions iff its current plan yields fewer — a no-op on inputs
    that are already wide (the cluster-scale case)."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * factor
    try:
        cur = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 — unplannable (e.g. streaming)
        return df
    if 0 < cur < target:
        return df.repartition(target)
    return df
