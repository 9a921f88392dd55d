"""Streaming MERGE sink — M1 (conditional upsert, reference
insert_tag_endpoint app.py:4544-4690) under Structured Streaming via
``foreachBatch``, the r03 verdict's stretch item.

Each micro-batch is applied as a Delta-style MERGE against a
versioned parquet target (the same copy-on-write scheme
``api.TagRegistry`` uses): read the current version, full-outer join
on the key, coalesce updated values over existing ones, write the
post-state as a NEW version directory named by batch_id, then the
reader picks the max version. Naming versions by batch_id makes the
sink IDEMPOTENT under foreachBatch's at-least-once contract — a
replayed batch overwrites its own version with identical content
instead of double-applying. On a deployment with Delta/Iceberg the
body of ``_apply`` is literally ``MERGE INTO``; everything around it
(dedupe-within-batch, version commit) is what the table format's
transaction log would do.

At 100 TB the per-batch cost is one key-shuffle join of
(batch x current) — batches are micro (bounded by the trigger), so
broadcast joins apply; the rewrite cost is bounded by partition
pruning on a real table format (this emulation rewrites the whole
small register, exactly like api.TagRegistry's mutations).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _current_version(target_dir: str, max_num: int | None = None) -> str | None:
    """Newest COMMITTED version at or below ``max_num``. A version dir
    counts only with its ``_SUCCESS`` marker — a writer killed mid
    job-commit (part files promoted, marker absent) must stay
    invisible to readers, the same crash-invisibility rule the move/
    promote sinks enforce; the next replay overwrites the partial dir
    (same batch_id -> same target) and commits it properly."""
    if not os.path.isdir(target_dir):
        return None
    versions = [
        v
        for v in os.listdir(target_dir)
        if v.startswith("v")
        and v[1:].isdigit()
        and (max_num is None or int(v[1:]) <= max_num)
        and os.path.isfile(os.path.join(target_dir, v, "_SUCCESS"))
    ]
    if not versions:
        return None
    return os.path.join(target_dir, max(versions, key=lambda v: int(v[1:])))


def read_current(
    spark: SparkSession, target_dir: str, max_num: int | None = None
) -> DataFrame | None:
    path = _current_version(target_dir, max_num)
    return None if path is None else spark.read.parquet(path)


def merge_batch(
    target: DataFrame | None,
    batch: DataFrame,
    key: str,
    seq_col: str,
) -> DataFrame:
    """One MERGE step as dataflow: latest-per-key within the batch
    (by ``seq_col`` — micro-batches can carry several updates for one
    key), then full-outer join against the target; matched keys take
    the batch values only when the batch row is at least as new
    (``seq_col`` >=) as the target row — the WHEN MATCHED AND
    condition of a real MERGE INTO. The guard matters beyond replays:
    the file source can split one logical batch's same-key rows
    across micro-batches in either order (maxFilesPerTrigger), and an
    unconditional overwrite would let the stale row win. Pure
    function of (target, batch) so streaming and batch share it."""
    w = Window.partitionBy(key).orderBy(F.col(seq_col).desc())
    latest = (
        batch.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    if target is None:
        return latest
    value_cols = [c for c in latest.columns if c != key]
    src = latest.select(
        F.col(key).alias("__k"), *[F.col(c).alias(f"__s_{c}") for c in value_cols]
    )
    j = target.join(src, target[key] == src["__k"], "full_outer")
    take_src = F.col(f"__s_{seq_col}").isNotNull() & (
        F.col(seq_col).isNull() | (F.col(f"__s_{seq_col}") >= F.col(seq_col))
    )
    return j.select(
        F.coalesce(F.col(key), F.col("__k")).alias(key),
        *[
            F.when(take_src, F.col(f"__s_{c}")).otherwise(F.col(c)).alias(c)
            for c in value_cols
        ],
    )


def start_merge_stream(
    stream: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    key: str,
    seq_col: str,
):
    """writeStream.foreachBatch MERGE with availableNow trigger: drain
    the source, applying each micro-batch as one idempotent MERGE
    version. Returns the StreamingQuery."""
    spark = stream.sparkSession

    def _apply(batch: DataFrame, batch_id: int) -> None:
        # base state = newest version at or below batch_id: a REPLAYED
        # batch (at-least-once) merges against its original base, never
        # against its own post-state — which also means the read path
        # and the overwrite path are always different directories
        current = read_current(spark, target_dir, max_num=batch_id)
        post = merge_batch(current, batch, key, seq_col)
        out = os.path.join(target_dir, f"v{batch_id + 1:010d}")
        post.write.mode("overwrite").parquet(out)

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
