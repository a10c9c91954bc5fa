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

from nipper_spark.functions.html_udfs import extract_pages
from nipper_spark.sources.synthetic import PAGES_SCHEMA


def run_extraction_stream(spark: SparkSession, pages_dir: str,
                          out_dir: str, checkpoint_dir: str,
                          max_files_per_trigger: int | None = None) -> int:
    """Drain all currently-available page files through the extraction
    pipeline exactly once; returns the number of micro-batches run.

    Restarts resume from the checkpoint: files already processed are
    never re-extracted, files that arrived since are picked up.
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
        (extract_pages(batch_df)
         .write.mode("append").parquet(out_dir))

    query = (stream.writeStream
             .foreachBatch(_process)
             .option("checkpointLocation", checkpoint_dir)
             .trigger(availableNow=True)
             .start())
    query.awaitTermination()
    return batches["n"]
