"""Sink adapters — SURVEY §2.1 (S7-S13).

* Warehouse append (S7/S8): ``df.write.mode("append")`` — writer
  batching is Spark's native behavior; the reference's 100-row VALUES
  batches (app.py:983-1014) exist because it drove a cursor by hand.
* REST sink (S10): the reference bulk-POSTs sync rows to an external
  API (app.py:6707-6733). Spark-side this is ``foreachPartition`` with
  a pluggable poster and a bounded batch size — each executor posts
  its partition; no driver collect.
* Excel sink (S11): presentation-layer export via pandas on the
  driver (only ever for human-sized result pages, never for data
  movement).
* Ledger (S13): subsumed by the streaming checkpoint
  (streaming/blob_ingest.py); kept here only as an explicit append
  helper for non-streaming callers.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame


def append_parquet(df: DataFrame, path: str, partition_cols: list[str] | None = None) -> None:
    """S7/S8 — append-mode warehouse write."""
    writer = df.write.mode("append")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def rest_sink(df: DataFrame, poster: Callable[[list[dict]], None], batch_size: int = 100) -> None:
    """S10 — POST rows to an external endpoint in bounded batches, one
    worker per partition (the reference's single-threaded bulk POST
    app.py:6707-6733 becomes partition-parallel). ``poster`` receives a
    list of row dicts; inject the real HTTP call (or a collector in
    tests)."""

    def send_partition(rows: Iterable) -> None:
        batch: list[dict] = []
        for row in rows:
            batch.append(row.asDict(recursive=True))
            if len(batch) >= batch_size:
                poster(batch)
                batch = []
        if batch:
            poster(batch)

    df.foreachPartition(send_partition)


def export_excel(df: DataFrame, path: str, header_map: dict[str, str] | None = None,
                 exclude: list[str] | None = None, max_rows: int = 100_000) -> str:
    """S11 — styled-export shape (reference export_to_excel_endpoint
    app.py:7379-7483): column exclusion (P4) + human header rename
    (P3) + driver-side export. Falls back to CSV when no Excel engine
    is installed; returns the path written. Guarded by ``max_rows`` —
    this is a presentation sink, not a data path."""
    out = df
    if exclude:
        out = out.drop(*exclude)
    if header_map:
        out = out.withColumnsRenamed(header_map)
    pdf = out.limit(max_rows).toPandas()
    try:
        pdf.to_excel(path, index=False)  # needs openpyxl
        return path
    except (ImportError, ModuleNotFoundError):
        root, _ = os.path.splitext(path)  # rsplit('.') would truncate at a dotted dir name
        csv_path = root + ".csv"
        pdf.to_csv(csv_path, index=False)
        return csv_path


def append_ledger(entries: list[str], path: str) -> None:
    """S13 — processed-file ledger append (reference app.py:6921-6931);
    the streaming checkpoint replaces this for stream sources."""
    with open(path, "a") as f:
        for e in entries:
            f.write(json.dumps({"path": e}) + "\n")
