"""Two-phase global prefix aggregates: exact equivalence with the
single-partition window they replace, plus the plan property that the
data-scale exchange is a range partitioning (parallel), with only the
per-partition totals (one row per partition) crossing a global window.
"""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from nipper_spark.operators.cumsum import row_sequence, running_sum
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


def ORDER():
    return [F.desc("v"), F.asc("id")]


def test_running_sum_matches_global_window(spark, df):
    got = {r["id"]: r["run"] for r in
           running_sum(df, ORDER(), "w", "run").collect()}
    wref = (Window.orderBy(*ORDER())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    exp = {r["id"]: r["run"] for r in
           df.withColumn("run", F.sum("w").over(wref)).collect()}
    assert got == exp


def test_row_sequence_matches_row_number(spark, df):
    got = {r["id"]: r["seq"] for r in
           row_sequence(df, ORDER(), "seq").collect()}
    exp = {r["id"]: r["seq"] for r in df.withColumn(
        "seq", F.row_number().over(Window.orderBy(*ORDER())) - 1).collect()}
    assert got == exp


def test_running_sum_empty_input(spark):
    empty = spark.createDataFrame([], "id long, v long")
    assert running_sum(empty, [F.asc("id")], "v", "run").count() == 0


def test_plan_is_range_partitioned(spark, df):
    plan = plan_string(running_sum(df, ORDER(), "w", "run"))
    assert "rangepartitioning" in plan.lower(), plan
    # the only SinglePartition exchange feeds the per-partition totals
    # (≤ n_partitions rows), never the data-scale rows
    import re
    for m in re.finditer(
            r"\(\d+\) Exchange SinglePartition.*?\nInput \[\d+\]: "
            r"\[([^\]]*)\]", plan, re.DOTALL):
        cols = {c.strip().split("#")[0] for c in m.group(1).split(",")}
        assert cols <= {"_cumsum_pid", "_ptotal"}, cols
