"""Scalable global prefix aggregates (running sum / row sequence).

A global running sum is semantically `sum(x) OVER (ORDER BY …)`, but
that plan funnels the entire input through ONE task (a single-partition
window) — correct at sandbox scale, a straggler at 100 TB. This is the
classic two-phase replacement:

    1. bucket rows by the total order against LITERAL boundaries
       sampled once on the driver (bucket i's keys all sort before
       bucket i+1's);
    2. per-bucket running aggregate (a partitionBy window — parallel);
    3. per-bucket totals (one tiny row per bucket) get a prefix sum on
       the driver-sized side and are broadcast back as offsets;
    4. running value = local running value + bucket offset.

The ordering MUST be a total order (unique tiebreak column) with
non-null keys — results are then independent of where the boundaries
happen to fall, so sampling-based boundary placement cannot change the
answer.

Why literal boundaries instead of ``repartitionByRange``: Spark's
RangePartitioner re-samples its boundaries on every action, so the
local-window branch and the offsets branch would each materialize a
DIFFERENT pid→range mapping unless the exchange is persisted — which
pins an input-sized cache for the lifetime of the result (and leaked
for the lifetime of the session in long-running callers). A bucket id
computed as a pure expression over literal boundaries is deterministic
across actions and across block-loss recomputes: nothing needs to be
persisted, both branches emit IDENTICAL exchanges (which AQE dedups via
ReusedExchange), and the operator holds no state beyond one bounded
driver-side boundary sample (≤ ~50k keys, collected once).
"""

from __future__ import annotations

from functools import cmp_to_key

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "_cumsum_pid"
_LOCAL = "_cumsum_local"
_OFF = "_cumsum_offset"

# OrderSpec: (column name, "asc" | "desc"). Directions are explicit
# because a Column carries its sort direction opaquely — the bucketing
# expression and the driver-side sample sort must agree on it exactly.
OrderSpec = tuple[str, str]

_SAMPLE_CAP = 50_000
_SAMPLE_MOD = 64  # deterministic ~1/64 hash sample of the order keys


def _check_specs(order_specs: list[OrderSpec]) -> list[OrderSpec]:
    specs = [(c, d.lower()) for c, d in order_specs]
    for c, d in specs:
        if d not in ("asc", "desc"):
            raise ValueError(f"order direction must be asc|desc: {c!r}/{d!r}")
    return specs


def order_columns(order_specs: list[OrderSpec]) -> list[Column]:
    """The Spark sort expressions for an order spec (shared with any
    window the caller compares against)."""
    return [F.col(c).asc() if d == "asc" else F.col(c).desc()
            for c, d in _check_specs(order_specs)]


def _key_cmp(specs: list[OrderSpec]):
    def cmp(a, b):
        for i, (_, d) in enumerate(specs):
            x, y = a[i], b[i]
            if x == y:
                continue
            lt = x < y
            if d == "desc":
                lt = not lt
            return -1 if lt else 1
        return 0
    return cmp


def _sample_boundaries(df: DataFrame, specs: list[OrderSpec],
                       num_partitions: int) -> list[tuple]:
    """One bounded driver-side sample of the order keys → ≤ P-1 literal
    boundary tuples, evenly spaced in the total order. Deterministic
    hash sample first (uniform under any input partitioning); if the
    input is too small for the hash sample to hit, fall back to a plain
    bounded head — boundary PLACEMENT affects only balance, never the
    result, so any deterministic bounded choice is sound."""
    cols = [c for c, _ in specs]
    sample = (df.select(*cols)
              .filter(F.pmod(F.xxhash64(*cols), F.lit(_SAMPLE_MOD)) == 0)
              .limit(_SAMPLE_CAP).collect())
    if len(sample) < num_partitions * 4:
        sample = df.select(*cols).limit(_SAMPLE_CAP).collect()
    keys = sorted((tuple(r) for r in sample), key=cmp_to_key(_key_cmp(specs)))
    if not keys:
        return []
    bounds: list[tuple] = []
    for i in range(1, num_partitions):
        b = keys[min((i * len(keys)) // num_partitions, len(keys) - 1)]
        if not bounds or _key_cmp(specs)(b, bounds[-1]) > 0:
            bounds.append(b)
    return bounds


def _at_or_after(specs: list[OrderSpec], boundary: tuple) -> Column:
    """row ≥ boundary in the lexicographic total order (non-null keys)."""
    expr: Column = F.lit(True)
    for (c, d), bv in reversed(list(zip(specs, boundary))):
        col = F.col(c)
        after = (col > F.lit(bv)) if d == "asc" else (col < F.lit(bv))
        expr = after | ((col == F.lit(bv)) & expr)
    return expr


def bucket_id(specs: list[OrderSpec], bounds: list[tuple]) -> Column:
    """Deterministic bucket id: the number of boundaries at or before
    the row — a pure expression, identical on every action/recompute."""
    if not bounds:
        return F.lit(0)
    terms = [F.when(_at_or_after(specs, b), 1).otherwise(0) for b in bounds]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def running_sum(df: DataFrame, order_specs: list[OrderSpec], value_col: str,
                out_col: str, num_partitions: int | None = None) -> DataFrame:
    """Add ``out_col`` = running sum of ``value_col`` over the global
    total order ``order_specs`` — same rows and values as a global
    window, without the single-partition exchange, without persisting
    anything (the bucket mapping is a literal expression).

    CONTRACT — one action per result: nothing is persisted, so each
    action over the returned DataFrame recomputes the full two-phase
    plan (boundary sampling included). Consumers needing several
    statistics must aggregate them in ONE action
    (``df.agg(F.count("*"), F.max(out_col))``) or cache explicitly.
    Results are deterministic across recomputes either way — the
    boundaries are driver-sampled literals baked into the plan, not a
    runtime RangePartitioner — so a second action wastes time, never
    correctness (pinned by test_cumsum's recompute-determinism test).
    """
    specs = _check_specs(order_specs)
    if num_partitions is None:
        num_partitions = int(df.sparkSession.conf.get(
            "spark.sql.shuffle.partitions"))
    bounds = _sample_boundaries(df, specs, num_partitions)
    part = df.withColumn(_PID, bucket_id(specs, bounds))
    w_local = (Window.partitionBy(_PID).orderBy(*order_columns(specs))
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = part.withColumn(_LOCAL, F.sum(value_col).over(w_local))
    # one row per bucket → the offset window is driver-sized, and
    # bucket ids are ordered by construction, so exclusive-prefix over
    # _PID is exactly "everything in earlier buckets"
    w_off = (Window.orderBy(_PID)
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = (part.groupBy(_PID)
               .agg(F.sum(value_col).alias("_ptotal"))
               .withColumn(_OFF, F.coalesce(F.sum("_ptotal").over(w_off),
                                            F.lit(0)))
               .select(_PID, _OFF))
    return (local.join(F.broadcast(offsets), _PID)
            .withColumn(out_col, F.col(_LOCAL) + F.col(_OFF))
            .drop(_PID, _LOCAL, _OFF))


def row_sequence(df: DataFrame, order_specs: list[OrderSpec], out_col: str,
                 start: int = 0,
                 num_partitions: int | None = None) -> DataFrame:
    """Add ``out_col`` = 0-based (or ``start``-based) dense sequence
    number over the global total order — `row_number() OVER (ORDER BY
    …) - 1 + start` without the single-partition window."""
    seq = running_sum(df.withColumn("_one", F.lit(1)), order_specs,
                      "_one", out_col, num_partitions)
    return (seq.withColumn(out_col,
                           (F.col(out_col) - 1 + F.lit(start)))
            .drop("_one"))
