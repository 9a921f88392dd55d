"""Streaming layer tests: routing, checkpointed ingest with retry/DLQ,
and batch/stream parity of the windowed aggregation."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from acuvate_spark.streaming import blob_ingest, windows


def _touch(path: str, content: bytes = b"x") -> None:
    with open(path, "wb") as f:
        f.write(content)


def test_route_filenames(spark):
    rows = [
        ("c/E17-A_A4010-0001.pdf",),  # pid-coded
        ("c/E17-B_A4511-0002.png",),  # pid-coded (A45\d{2,})
        ("c/E17-C_B5-0003.pdf",),  # standard
        ("c/notes.txt",),  # unsupported
        ("c/scan.jpeg",),  # standard
    ]
    df = spark.createDataFrame(rows, "path string").withColumn(
        "route", blob_ingest.route(F.col("path"))
    )
    got = {r["path"]: r["route"] for r in df.collect()}
    assert got == {
        "c/E17-A_A4010-0001.pdf": "pid",
        "c/E17-B_A4511-0002.png": "pid",
        "c/E17-C_B5-0003.pdf": "standard",
        "c/notes.txt": "unsupported",
        "c/scan.jpeg": "standard",
    }


def test_blob_ingest_checkpoint_and_dlq(spark, tmp_path):
    input_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    input_dir.mkdir()

    _touch(str(input_dir / "E17-A_A4010-0001.pdf"))
    _touch(str(input_dir / "E17-C_B5-0003.pdf"))
    _touch(str(input_dir / "bad.corrupt.pdf"))

    q = blob_ingest.start_blob_ingest(spark, str(input_dir), str(ckpt), str(out_dir))
    q.awaitTermination()

    routed = spark.read.parquet(os.path.join(str(out_dir), "routed"))
    paths = {os.path.basename(r["path"]) for r in routed.collect()}
    assert paths == {"E17-A_A4010-0001.pdf", "E17-C_B5-0003.pdf"}
    pend = blob_ingest.retry_pending(spark, str(out_dir)).collect()
    assert len(pend) == 1 and pend[0]["attempts"] == 1

    # second pass: only the NEW file is processed (checkpoint = ledger)
    _touch(str(input_dir / "E17-D_A6-0004.png"))
    q = blob_ingest.start_blob_ingest(spark, str(input_dir), str(ckpt), str(out_dir))
    q.awaitTermination()
    routed = spark.read.parquet(os.path.join(str(out_dir), "routed"))
    assert routed.count() == 3  # 2 + 1, no reprocessing of old files


def test_windowed_counts_stream_matches_batch(spark, sf_dir, tmp_path):
    from acuvate_spark.tables import load_table

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    in_dir = tmp_path / "events_json"
    events.coalesce(1).write.json(str(in_dir))

    stream = windows.stream_events_from_json(spark, str(in_dir))
    agg = windows.windowed_counts(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    batch = (
        events.groupBy(F.date_trunc("hour", F.col("ts")).alias("ws"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("s"))
        .collect()
    )
    expected = {(r["ws"], r["event_type"]): (r["n"], r["s"]) for r in batch}
    assert got == expected


def test_daily_sync_job(spark, sf_dir, tmp_path):
    n = windows.run_daily_sync(spark, sf_dir, str(tmp_path / "sync_out"))
    assert n > 0
