"""Two-phase global prefix aggregates: exact equivalence with the
single-partition window they replace, plus the plan properties that
(a) the data-scale exchange is a hash partitioning on the literal
bucket id (parallel), with only the per-bucket totals (one row per
bucket) crossing a global window, and (b) nothing is persisted — the
bucket mapping is a deterministic literal expression, so no pinned
cache can leak.
"""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from nipper_spark.operators.cumsum import (
    bucket_id, order_columns, row_sequence, running_sum)
from nipper_spark.plans.inspect import plan_string


@pytest.fixture(scope="module")
def spark():
    from nipper_spark.session import build_session
    return build_session("cumsum-tests", master="local[4]",
                         shuffle_partitions=4)


@pytest.fixture(scope="module")
def df(spark):
    # non-trivial order: value desc with unique id tiebreak, values
    # deliberately collide across rows so the tiebreak matters
    return spark.range(0, 5000).select(
        F.col("id"),
        ((F.col("id") * 37) % 101).alias("v"),
        ((F.col("id") * 13) % 7).alias("w")).cache()


def SPECS():
    return [("v", "desc"), ("id", "asc")]


def ORDER():
    return order_columns(SPECS())


def test_running_sum_matches_global_window(spark, df):
    got = {r["id"]: r["run"] for r in
           running_sum(df, SPECS(), "w", "run").collect()}
    wref = (Window.orderBy(*ORDER())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    exp = {r["id"]: r["run"] for r in
           df.withColumn("run", F.sum("w").over(wref)).collect()}
    assert got == exp


def test_row_sequence_matches_row_number(spark, df):
    got = {r["id"]: r["seq"] for r in
           row_sequence(df, SPECS(), "seq").collect()}
    exp = {r["id"]: r["seq"] for r in df.withColumn(
        "seq", F.row_number().over(Window.orderBy(*ORDER())) - 1).collect()}
    assert got == exp


def test_running_sum_empty_input(spark):
    empty = spark.createDataFrame([], "id long, v long")
    assert running_sum(empty, [("id", "asc")], "v", "run").count() == 0


def test_bucket_id_is_order_monotone(spark, df):
    """Rows in later buckets must sort strictly after rows in earlier
    ones — the property the offset prefix relies on."""
    from nipper_spark.operators.cumsum import _sample_boundaries
    bounds = _sample_boundaries(df, SPECS(), 4)
    assert bounds, "5000 rows must yield at least one boundary"
    rows = (df.withColumn("_pid", bucket_id(SPECS(), bounds))
            .orderBy(*ORDER()).select("_pid").collect())
    pids = [r["_pid"] for r in rows]
    assert pids == sorted(pids)
    assert len(set(pids)) > 1, "boundaries must actually split the data"


def test_plan_is_bucket_partitioned_and_unpersisted(spark, df):
    out = running_sum(df, SPECS(), "w", "run")
    plan = plan_string(out)
    # data-scale exchange hashes the literal bucket id — never a
    # RangePartitioner (nondeterministic boundaries would need a pinned
    # cache) and never a data-scale single partition
    assert "hashpartitioning(_cumsum_pid" in plan.lower(), plan
    assert "rangepartitioning" not in plan.lower(), plan
    # the only SinglePartition exchange feeds the per-bucket totals
    # (≤ n_buckets rows), never the data-scale rows
    import re
    for m in re.finditer(
            r"\(\d+\) Exchange SinglePartition.*?\nInput \[\d+\]: "
            r"\[([^\]]*)\]", plan, re.DOTALL):
        cols = {c.strip().split("#")[0] for c in m.group(1).split(",")}
        assert cols <= {"_cumsum_pid", "_ptotal"}, cols
    # nothing persisted: over an UNCACHED source the whole plan must be
    # cache-free (the old RangePartitioner design pinned an input-sized
    # InMemoryRelation for the session lifetime — the leak)
    # NB: constants differ from the cached fixture's — an identical
    # logical plan would be silently substituted by the cache manager
    fresh = spark.range(0, 4000).select(
        F.col("id"), ((F.col("id") * 41) % 103).alias("v"),
        ((F.col("id") * 11) % 5).alias("w"))
    fresh_plan = plan_string(running_sum(fresh, SPECS(), "w", "run"))
    assert "inmemory" not in fresh_plan.lower(), fresh_plan


def test_recompute_determinism_across_actions(spark, df):
    """The single-action CONTRACT's safety half: nothing is persisted,
    so separate actions recompute the plan — and because the bucket
    boundaries are driver-sampled literals (not a runtime
    RangePartitioner), every recompute yields identical values. Two
    separate actions must agree exactly with one combined action."""
    from nipper_spark.operators.cumsum import running_sum
    out = running_sum(df, SPECS(), "v", "cum")
    n1 = out.count()                                  # action 1
    mx1 = out.agg(F.max("cum")).collect()[0][0]       # action 2 (recompute)
    n2, mx2 = out.agg(F.count("*"), F.max("cum")).collect()[0]  # combined
    assert (n1, mx1) == (n2, mx2)
    total = df.agg(F.sum("v")).collect()[0][0]
    assert mx1 == total
