"""Skew-safe top-k-per-key — the frontier wave selector's engine.

A plain ``row_number() OVER (PARTITION BY host ...)`` puts every row of
a hot host into one shuffle partition; with Zipf-distributed hosts (the
crawl's reality) that single partition becomes the round's wall-clock.
``topk_per_key`` runs the standard two-phase trick:

  phase 1: salt each key into S subgroups, take local top-k per
           (key, salt)  — bounds any partition to ~n/S of the hot key;
  phase 2: take global top-k per key over the ≤ S·k survivors.

Phase 2's input is at most S·k rows per key — tiny — so its window is
safe even for the hottest host. Results are identical to the direct
window because top-k is a monotone operator under union.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_key(df: DataFrame, key: str | list[str],
                 order: list[Column], k_col: Column | int,
                 salt: int = 16, rank_col: str = "rk") -> DataFrame:
    """Keep the top-``k`` rows per key under ``order``.

    ``k_col`` may be an int or a per-row Column (per-host politeness
    budgets). ``salt=0`` disables phase 1 (plain window) — useful to
    verify equivalence in tests.
    """
    keys = [key] if isinstance(key, str) else list(key)
    k_expr = F.lit(k_col) if isinstance(k_col, int) else k_col

    if salt and salt > 1:
        salted = df.withColumn(
            "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns
                                         if c not in keys]), F.lit(salt)))
        w1 = Window.partitionBy(*keys, "_salt").orderBy(*order)
        local = (salted
                 .withColumn("_lrk", F.row_number().over(w1))
                 .filter(F.col("_lrk") <= k_expr)
                 .drop("_salt", "_lrk"))
    else:
        local = df
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return (local
            .withColumn(rank_col, F.row_number().over(w2))
            .filter(F.col(rank_col) <= k_expr))
