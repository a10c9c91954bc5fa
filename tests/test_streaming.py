"""Incremental extraction: exactly-once file processing across
restarts (checkpointed Structured Streaming, Trigger.AvailableNow)."""

import pytest


@pytest.fixture(scope="module")
def spark():
    from nipper_spark.session import build_session
    return build_session("stream-tests", master="local[4]",
                         shuffle_partitions=4)


def test_exactly_once_across_restarts(spark, tmp_path):
    from nipper_spark.sources.synthetic import PAGES_SCHEMA, synth_pages_rows
    from nipper_spark.streaming.incremental import run_extraction_stream

    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "extracted")
    ckpt = str(tmp_path / "ckpt")

    rows = synth_pages_rows(n_pages=30, links_per_page=3, n_hosts=5)
    # batch 1: first 20 pages arrive
    spark.createDataFrame(rows[:20], PAGES_SCHEMA) \
        .write.mode("append").parquet(pages_dir)
    run_extraction_stream(spark, pages_dir, out_dir, ckpt)
    first = spark.read.parquet(out_dir)
    assert first.count() == 20

    # "restart": stream again with the same checkpoint — nothing new
    run_extraction_stream(spark, pages_dir, out_dir, ckpt)
    assert spark.read.parquet(out_dir).count() == 20

    # batch 2: 10 more pages land; only they get extracted
    spark.createDataFrame(rows[20:], PAGES_SCHEMA) \
        .write.mode("append").parquet(pages_dir)
    run_extraction_stream(spark, pages_dir, out_dir, ckpt)
    out = spark.read.parquet(out_dir)
    assert out.count() == 30
    assert out.select("url").distinct().count() == 30
    # extraction results identical to the batch path
    from nipper_spark.functions.html_udfs import extract_text_and_links
    got = {r["url"]: r["text"] for r in out.collect()}
    for (url, _, html, _, _) in rows:
        text, _, _, _ = extract_text_and_links(url, html)
        assert got[url] == text


def test_batch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch replays a micro-batch if the process dies between
    the write and the checkpoint commit — the sink must absorb the
    replay without duplicating rows."""
    from nipper_spark.sources.synthetic import PAGES_SCHEMA, synth_pages_rows
    from nipper_spark.streaming.incremental import write_extraction_batch

    rows = synth_pages_rows(n_pages=12, links_per_page=3, n_hosts=4)
    batch = spark.createDataFrame(rows, PAGES_SCHEMA)
    out_dir = str(tmp_path / "out")
    write_extraction_batch(batch, out_dir, batch_id=7)
    write_extraction_batch(batch, out_dir, batch_id=7)  # the replay
    out = spark.read.parquet(out_dir)
    assert out.count() == 12
    assert out.select("url").distinct().count() == 12
