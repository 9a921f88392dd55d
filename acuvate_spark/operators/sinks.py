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


def move_records(
    spark,
    src_path: str,
    dst_path: str,
    tomb_path: str,
    predicate,
    key_cols: list[str],
    move_id: str,
    on_between: Callable[[], None] | None = None,
) -> None:
    """M5/M6 WRITE SIDE — the reference's transactional insert->delete
    move (app.py:5365-5444; promote-approved is the same shape with a
    status predicate) re-expressed for a parquet warehouse with no
    transaction manager: two commits that are each an OVERWRITE of a
    DETERMINISTIC target, so replaying the job after a crash at any
    point converges to exactly-once final state instead of
    double-inserting or double-deleting.

    1. insert side: matching src rows overwrite ``dst/moves/<move_id>``
       — recomputed from the RAW src files (tombstones are
       merge-on-read, so the raw rows are still there on replay),
       hence byte-stable across replays;
    2. delete side: the moved rows' keys overwrite
       ``tomb/<move_id>`` — readers drop tombstoned keys via
       :func:`read_with_moves` (merge-on-read, the Delta/Iceberg
       delete-file pattern), so no src rewrite happens in the commit
       path at all.

    ``on_between`` is the chaos seam tests use to kill the job between
    the two commits (tests/test_sinks.py)."""
    src = spark.read.parquet(src_path)
    moved = src.where(predicate)
    delta = os.path.join(dst_path, "moves", move_id)
    moved.write.mode("overwrite").parquet(delta)
    if on_between is not None:
        on_between()
    # tombstone keys come from the COMMITTED delta, not a recompute of
    # the src filter: the delete side then exactly matches what the
    # insert side durably wrote, with no assumption that src was
    # stable between the two actions (and no double evaluation of the
    # filter scan)
    spark.read.parquet(delta).select(*key_cols).distinct().write.mode(
        "overwrite"
    ).parquet(os.path.join(tomb_path, move_id))


def read_with_moves(
    spark, base_path: str, moves_for: str | None = None, tomb_path: str | None = None,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Merge-on-read view over :func:`move_records` state: a table's
    effective rows are its base files, plus every committed
    ``moves/*`` delta when it is a move DESTINATION (``moves_for`` =
    its own path), minus tombstoned keys when it is a move SOURCE
    (left-anti join on ``key_cols`` — keys shuffle, full rows never
    do; at warehouse scale the tombstone side is broadcast-sized)."""
    import glob as _glob

    # list committed FILES, not directories: a job that crashed mid-
    # write leaves a delta dir holding only _temporary/ (no committed
    # part files), and globbing dirs would feed that to schema
    # inference and fail every reader until the job is replayed —
    # whereas an uncommitted delta must simply be invisible
    def _committed(root: str) -> list[str]:
        return sorted(_glob.glob(os.path.join(root, "*", "*.parquet")))

    df = spark.read.parquet(base_path)
    if moves_for is not None:
        files = _committed(os.path.join(moves_for, "moves"))
        if files:
            df = df.unionByName(spark.read.parquet(*files))
    if tomb_path is not None:
        files = _committed(tomb_path)
        if files:
            tombs = spark.read.parquet(*files).select(*key_cols).distinct()
            df = df.join(tombs, key_cols, "left_anti")
    return df


def append_ledger(entries: list[str], path: str) -> None:
    """S13 — processed-file ledger append (reference app.py:6921-6931);
    the streaming checkpoint replaces this for stream sources."""
    with open(path, "a") as f:
        for e in entries:
            f.write(json.dumps({"path": e}) + "\n")
