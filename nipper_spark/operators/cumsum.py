"""Scalable global prefix aggregates (running sum / row sequence).

A global running sum is semantically `sum(x) OVER (ORDER BY …)`, but
that plan funnels the entire input through ONE task (a single-partition
window) — correct at sandbox scale, a straggler at 100 TB. This is the
classic two-phase replacement:

    1. range-partition by the total order (partition i holds keys that
       all sort before partition i+1's);
    2. per-partition running aggregate (a partitionBy window — parallel);
    3. per-partition totals (one tiny row per partition) get a prefix
       sum on the driver-sized side and are broadcast back as offsets;
    4. running value = local running value + partition offset.

The ordering MUST be a total order (unique tiebreak column) — results
are then independent of where the range boundaries happen to fall, so
sampling-based boundary placement cannot change the answer.

The range-partitioned intermediate is persisted (memory-and-disk):
RangePartitioner re-samples its boundaries on every action, so the
local-window branch and the offsets branch would otherwise each
materialize a DIFFERENT pid→range mapping and the offsets would be
added to the wrong rows. Persisting pins one physical plan instance
(boundaries included), which both branches — and any block-loss
recompute, which replays the same pinned partitioner — read
consistently. The persist is also the operator's natural barrier: a
global prefix sum cannot stream anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

_PID = "_cumsum_pid"
_LOCAL = "_cumsum_local"
_OFF = "_cumsum_offset"


def running_sum(df: DataFrame, order_cols: list[Column], value_col: str,
                out_col: str, num_partitions: int | None = None) -> DataFrame:
    """Add ``out_col`` = running sum of ``value_col`` over the global
    total order ``order_cols`` — same rows and values as a global
    window, without the single-partition exchange."""
    if num_partitions is None:
        num_partitions = int(df.sparkSession.conf.get(
            "spark.sql.shuffle.partitions"))
    part = (df.repartitionByRange(num_partitions, *order_cols)
            .withColumn(_PID, F.spark_partition_id())
            .persist(StorageLevel.MEMORY_AND_DISK))
    w_local = (Window.partitionBy(_PID).orderBy(*order_cols)
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = part.withColumn(_LOCAL, F.sum(value_col).over(w_local))
    # one row per partition → the offset window is driver-sized, and
    # range-partition ids are ordered, so exclusive-prefix over _PID is
    # exactly "everything in earlier partitions"
    w_off = (Window.orderBy(_PID)
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = (part.groupBy(_PID)
               .agg(F.sum(value_col).alias("_ptotal"))
               .withColumn(_OFF, F.coalesce(F.sum("_ptotal").over(w_off),
                                            F.lit(0)))
               .select(_PID, _OFF))
    out = (local.join(F.broadcast(offsets), _PID)
           .withColumn(out_col, F.col(_LOCAL) + F.col(_OFF))
           .drop(_PID, _LOCAL, _OFF))
    # handle for long-running callers (e.g. one call per crawl round)
    # to release the pinned partitioning once the result is consumed
    out.cumsum_persisted = part  # type: ignore[attr-defined]
    return out


def row_sequence(df: DataFrame, order_cols: list[Column], out_col: str,
                 start: int = 0,
                 num_partitions: int | None = None) -> DataFrame:
    """Add ``out_col`` = 0-based (or ``start``-based) dense sequence
    number over the global total order — `row_number() OVER (ORDER BY
    …) - 1 + start` without the single-partition window."""
    seq = running_sum(df.withColumn("_one", F.lit(1)), order_cols,
                      "_one", out_col, num_partitions)
    out = (seq.withColumn(out_col,
                          (F.col(out_col) - 1 + F.lit(start)))
           .drop("_one"))
    out.cumsum_persisted = seq.cumsum_persisted  # type: ignore[attr-defined]
    return out
