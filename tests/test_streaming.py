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


def test_stateful_streaming_dedup(spark, tmp_path):
    """applyInPandasWithState URL-seen: first occurrences exactly once
    across micro-batches AND across a restart (state store resumes
    from the checkpoint)."""
    from nipper_spark.sources.synthetic import PAGES_SCHEMA, synth_pages_rows
    from nipper_spark.streaming.stateful import run_streaming_dedup

    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    rows = synth_pages_rows(n_pages=30, links_per_page=3, n_hosts=5)

    # batch 1: pages 0-19, with page 3 and 7 duplicated
    batch1 = rows[:20] + [rows[3], rows[7]]
    spark.createDataFrame(batch1, PAGES_SCHEMA) \
        .write.mode("append").parquet(pages_dir)
    run_streaming_dedup(spark, pages_dir, out_dir, ckpt, n_buckets=8)
    out1 = spark.read.parquet(out_dir)
    assert out1.count() == 20
    assert out1.select("url").distinct().count() == 20

    # restart with batch 2: 10 new pages + re-sends of old ones
    batch2 = rows[20:] + [rows[0], rows[19]]
    spark.createDataFrame(batch2, PAGES_SCHEMA) \
        .write.mode("append").parquet(pages_dir)
    run_streaming_dedup(spark, pages_dir, out_dir, ckpt, n_buckets=8)
    out = spark.read.parquet(out_dir)
    assert out.count() == 30                      # old urls suppressed
    assert out.select("url").distinct().count() == 30
    got = {r["url"] for r in out.collect()}
    assert got == {u for (u, _, _, _, _) in rows}


def test_watermarked_host_windows(spark, tmp_path):
    """Event-time windowed fetch stats: append mode emits a (host,
    window) exactly once when the watermark closes it, and a
    late-beyond-watermark row is dropped instead of reopening it."""
    import datetime as dt
    from nipper_spark.sources.synthetic import PAGES_SCHEMA
    from nipper_spark.streaming.windows import run_host_fetch_windows

    def page(minute, host="h0.test"):
        ts = dt.datetime(2026, 1, 1, 0, minute)
        return (f"http://{host}/p/{minute}", ts, b"<p>x</p>", None, "en")

    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: window A=[00:00,00:10) gets 2 rows; event at 00:21
    # advances the watermark to 00:16 > 00:10, closing A
    spark.createDataFrame([page(1), page(5), page(12), page(21)],
                          PAGES_SCHEMA) \
        .write.mode("append").parquet(pages_dir)
    run_host_fetch_windows(spark, pages_dir, out_dir, ckpt)
    out1 = {(r["window_start"].minute, r["n_pages"])
            for r in spark.read.parquet(out_dir).collect()}
    assert (0, 2) in out1            # window A finalized with 2 rows
    assert all(start != 20 for start, _ in out1)  # C still open

    # batch 2: a LATE row for window A (00:03 < watermark) must be
    # dropped; 00:35 advances the watermark past window B's end
    spark.createDataFrame([page(3), page(35)], PAGES_SCHEMA) \
        .write.mode("append").parquet(pages_dir)
    run_host_fetch_windows(spark, pages_dir, out_dir, ckpt)
    out2 = {(r["window_start"].minute, r["n_pages"])
            for r in spark.read.parquet(out_dir).collect()}
    assert (0, 2) in out2            # A emitted once, late row dropped
    assert sum(1 for s, _ in out2 if s == 0) == 1
    assert (10, 1) in out2           # B closed by the 00:35 event


def test_streaming_session_windows(spark, tmp_path):
    """Session windows over a file stream (append mode, availableNow):
    closed sessions match the batch run of the same operator on the
    same rows — streaming and batch session semantics are one code
    path."""
    import datetime

    from nipper_spark.streaming.windows import user_sessions
    base = datetime.datetime(2024, 1, 1)

    def ev(i, user, minutes, value):
        return (i, base + datetime.timedelta(minutes=minutes), user,
                "click", float(value), "{}")

    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    rows = [ev(0, 1, 0, 1.0), ev(1, 1, 10, 2.0),    # session A (u1)
            ev(2, 1, 50, 4.0),                      # gap 40m -> session B
            ev(3, 2, 5, 8.0),                       # u2 session
            # late-arriving far-future row advances the watermark so
            # all earlier sessions close and emit in append mode
            ev(4, 9, 600, 0.5)]
    src = tmp_path / "events_in"
    src.mkdir()
    spark.createDataFrame(rows, schema).write.parquet(
        str(src / "batch0.parquet"))

    stream = (spark.readStream.schema(schema).format("parquet")
              .load(str(src / "*")))
    q = (user_sessions(stream).writeStream
         .format("parquet").option("path", str(tmp_path / "out"))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()

    got = {(r["user_id"], r["session_start"], r["session_end"],
            r["n_events"], r["sum_value"])
           for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    batch = {(r["user_id"], r["session_start"], r["session_end"],
              r["n_events"], r["sum_value"])
             for r in user_sessions(
                 spark.createDataFrame(rows, schema)).collect()
             if r["user_id"] != 9}  # the open watermark-driver session
    assert batch  # non-trivial: 3 closed sessions
    assert batch <= got  # every closed session emitted exactly once
    # the u1 split really happened at the 30-minute gap
    u1 = sorted(t for t in batch if t[0] == 1)
    assert len(u1) == 2 and u1[0][3] == 2 and u1[1][3] == 1


def test_streaming_revisit_tracker_matches_batch(spark, tmp_path):
    """Incremental revisit state == the batch operator on the full
    fetch log, across micro-batches AND a restart: draining rounds
    1-2 then (after restart) rounds 3-4 leaves exactly the state
    revisit_scores computes over all four rounds."""
    from nipper_spark.crawl.revisit import revisit_scores
    from nipper_spark.streaming.stateful import revisit_tracker

    log_dir = str(tmp_path / "fetchlog")
    out_dir = str(tmp_path / "rout")
    ckpt = str(tmp_path / "rckpt")
    schema = "url string, seq long, fingerprint string"
    # 4 crawl rounds of fetches: hot changes every round, cold never
    # after discovery, warm changes once at round 3
    rounds = [
        [("hot", 1, "a"), ("cold", 1, "x"), ("warm", 1, "p")],
        [("hot", 2, "b"), ("cold", 2, "x"), ("warm", 2, "p")],
        [("hot", 3, "c"), ("cold", 3, "x"), ("warm", 3, "q")],
        [("hot", 4, "d"), ("cold", 4, "x"), ("warm", 4, "q")],
    ]

    def drain():
        stream = (spark.readStream.schema(schema)
                  .format("parquet").load(log_dir))
        q = (revisit_tracker(stream).writeStream
             .format("parquet").option("path", out_dir)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()

    for chunk in (rounds[0] + rounds[1], rounds[2] + rounds[3]):
        spark.createDataFrame(chunk, schema) \
            .write.mode("append").parquet(log_dir)
        drain()                       # second drain = restarted query

    # latest emitted row per url == final state
    out = spark.read.parquet(out_dir)
    latest = {}
    for r in out.collect():
        if r["url"] not in latest or r["last_seq"] > \
                latest[r["url"]]["last_seq"]:
            latest[r["url"]] = r
    batch_log = spark.createDataFrame(
        [e for rnd in rounds for e in rnd], schema)
    want = {r["url"]: r for r in revisit_scores(batch_log).collect()}
    assert set(latest) == set(want)
    for u in want:
        for f in ("last_seq", "n_fetches", "unchanged_streak",
                  "revisit_interval", "next_due_seq", "revisit_score"):
            assert latest[u][f] == want[u][f], (u, f)
    # semantics spot-check: cold has 3 trailing unchanged fetches
    assert latest["cold"]["unchanged_streak"] == 3
    assert latest["hot"]["unchanged_streak"] == 0
    assert latest["warm"]["unchanged_streak"] == 1
