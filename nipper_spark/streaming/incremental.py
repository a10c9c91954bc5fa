"""Incremental ingestion: Structured Streaming over a growing pages
table.

The FRONTIER stays batch-rounds by design (SURVEY.md §2.9): a crawl
round is a barrier computation (politeness budgets need the whole
round's frontier), and resume comes from the round-partitioned state
tables — no streaming state store needed.

What IS naturally streaming is *ingestion*: new WARC/parquet page
files landing continuously, each needing extract-once semantics. This
module runs the fused extraction UDF as an incremental pipeline:
``readStream`` file source → ``foreachBatch(extract_pages)`` → append
sink, with the checkpoint directory giving exactly-once file
processing across restarts (Trigger.AvailableNow drains whatever has
arrived, then stops — the cron-style deployment shape).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from pyspark.sql import DataFrame

from nipper_spark.functions.html_udfs import extract_pages
from nipper_spark.sources.synthetic import PAGES_SCHEMA


def write_extraction_batch(batch_df: DataFrame, out_dir: str,
                           batch_id: int) -> None:
    """Idempotent micro-batch sink: each batch overwrites its own
    ``ingest_batch=N`` partition directory. foreachBatch replays a
    batch when the process dies between the write and the checkpoint
    commit — with a plain append sink that duplicates rows; the
    partition overwrite makes the replay a no-op, so the pipeline is
    exactly-once end to end (file source dedup on input, idempotent
    partitioned overwrite on output)."""
    (extract_pages(batch_df)
     .write.mode("overwrite")
     .parquet(f"{out_dir}/ingest_batch={int(batch_id)}"))


def run_extraction_stream(spark: SparkSession, pages_dir: str,
                          out_dir: str, checkpoint_dir: str,
                          max_files_per_trigger: int | None = None) -> int:
    """Drain all currently-available page files through the extraction
    pipeline exactly once; returns the number of micro-batches run.

    Restarts resume from the checkpoint: files already processed are
    never re-extracted, files that arrived since are picked up; a
    replayed micro-batch overwrites its own output partition instead
    of appending duplicates (see :func:`write_extraction_batch`).
    """
    reader = (spark.readStream
              .schema(PAGES_SCHEMA)
              .format("parquet"))
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    stream = reader.load(pages_dir)

    batches = {"n": 0}

    def _process(batch_df, batch_id: int) -> None:
        batches["n"] += 1
        write_extraction_batch(batch_df, out_dir, batch_id)

    query = (stream.writeStream
             .foreachBatch(_process)
             .option("checkpointLocation", checkpoint_dir)
             .trigger(availableNow=True)
             .start())
    query.awaitTermination()
    return batches["n"]
