"""SparkSession construction with the engine's scale-oriented defaults.

Designed for a 1000-executor cluster reading ~100 TB; the sandbox runs
the same config on local[N]. Every setting is chosen for the frontier
workload, not copied boilerplate:

- AQE on (+ skew-join): frontier rounds have Zipf host skew by design;
- Arrow enabled with a bounded batch size: HTML pages are fat rows —
  10k-row default batches would make worker memory spiky;
- shuffle partitions sized for the sandbox; on a real cluster AQE
  coalesces from a high initial number instead.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(app: str = "nipper-spark", master: str | None = None,
                  shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or int(os.environ.get(
        "NIPPER_SHUFFLE_PARTITIONS", cpus))
    return (
        SparkSession.builder
        .appName(app)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory",
                os.environ.get("NIPPER_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
