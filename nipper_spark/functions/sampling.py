"""Deterministic hash-based sampling — the reproducible train/test
split and per-stratum sampling a training-data pipeline needs.

Bernoulli `df.sample()` is partition-layout-dependent (the same row
can flip in/out when the input repartitions), which is unacceptable
for dataset lineage. These operators decide membership from
`md5(key || ':' || salt)` instead: the decision is a pure function of
the row key, so it is stable under repartitioning, reproducible across
engines, and exactly SQL-expressible (the fraction threshold is a
fixed-width lowercase-hex string compared lexicographically — hex
strings of equal length order exactly like their numeric values, so
no bigint conversion is needed on either side).

All pure Catalyst (md5 + substring + string compare): codegen'd,
no shuffle, fully pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_WIDTH = 8  # first 8 md5 hex chars = 32 bits of decision entropy


def _hex_threshold(fraction: float) -> str:
    """fraction ∈ [0,1] → fixed-width lowercase hex cutoff."""
    if fraction <= 0.0:
        return "0" * _HEX_WIDTH
    if fraction >= 1.0:
        return "g" * _HEX_WIDTH  # sorts after every hex digit
    v = int(fraction * (16 ** _HEX_WIDTH))
    return format(v, "0%dx" % _HEX_WIDTH)


def _decision_hex(key: Column, salt: str) -> Column:
    return F.substring(
        F.md5(F.concat(key.cast("string"), F.lit(":" + salt))),
        1, _HEX_WIDTH)


def hash_sample(df: DataFrame, key_col: str, fraction: float,
                salt: str = "sample") -> DataFrame:
    """Keep ~fraction of rows, decided per key (stable, reproducible)."""
    return df.filter(
        _decision_hex(F.col(key_col), salt) < F.lit(
            _hex_threshold(fraction)))


def train_test_split_col(key: Column, test_fraction: float,
                         salt: str = "split") -> Column:
    """'test' / 'train' label column — a deterministic split that
    never leaks a key across sides, even across reruns and engines."""
    return F.when(
        _decision_hex(key, salt) < F.lit(_hex_threshold(test_fraction)),
        F.lit("test")).otherwise(F.lit("train"))


def stratified_hash_sample(df: DataFrame, strata_col: str,
                           fractions: dict[str, float], key_col: str,
                           default_fraction: float = 0.0,
                           salt: str = "strata") -> DataFrame:
    """Per-stratum keep fractions (e.g. per-language mixture weights):
    rows whose stratum is missing from ``fractions`` keep with
    ``default_fraction``. One codegen'd CASE WHEN — no shuffle."""
    thr = F.lit(_hex_threshold(default_fraction))
    for value, frac in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == value,
                     F.lit(_hex_threshold(frac))).otherwise(thr)
    return df.filter(_decision_hex(F.col(key_col), salt) < thr)
