#!/usr/bin/env python3
"""Interleaved A/B for the r15 connected_components changes (self-loop
dedupe + label seed from materialized self-loop rows + superseded-
checkpoint release): OLD (r14 form, inlined below) vs NEW (committed
operator), over the graph_connected_components edge set at sf0.1."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "5"))

from pyspark.sql import functions as F

from acuvate_spark.operators.checkpoints import CheckpointRing
from acuvate_spark.operators.graph import (
    _broadcast_threshold_bytes,
    connected_components as new_cc,
)
from acuvate_spark.queries.graph import _edges
from acuvate_spark.session import get_spark


def old_cc(edges, src="src", dst="dst", max_iter=25):
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    sym = sym.unionByName(sym.select(F.col("a"), F.col("a").alias("b")).distinct())
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    sym = sym.localCheckpoint(eager=True)
    if sym.rdd.getNumPartitions() >= 8:
        n_nodes = sym.where(F.col("a") == F.col("b")).count()
        if n_nodes * 32 > _broadcast_threshold_bytes(edges.sparkSession):
            n_part = sym.sparkSession.sparkContext.defaultParallelism * 2
            sym = sym.repartition(n_part, F.col("b")).localCheckpoint(eager=True)
    ring = CheckpointRing(labels.sparkSession)
    labels = labels.localCheckpoint(eager=True)
    ring.rotate()
    for _ in range(max_iter):
        new_labels = (
            sym.join(labels, sym.b == labels.node)
            .select(F.col("a").alias("node"), F.col("b").alias("nbr"), "component")
            .groupBy("node")
            .agg(
                F.min("component").alias("component"),
                F.min(F.when(F.col("nbr") == F.col("node"), F.col("component"))).alias(
                    "old"
                ),
            )
            .select(
                "node",
                "component",
                (F.col("component") != F.col("old")).cast("int").alias("changed"),
            )
            .localCheckpoint(eager=False)
        )
        n_changed = new_labels.agg(F.sum("changed")).collect()[0][0]
        ring.rotate()
        labels = new_labels.drop("changed")
        if not n_changed:
            break
    return labels


def main() -> None:
    spark = get_spark("r15-ab-cc")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(1).collect()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    e = _edges(spark, SF_DIR)
    ra = sorted(map(tuple, old_cc(e).select("node", "component").collect()))
    rb = sorted(map(tuple, new_cc(e).select("node", "component").collect()))
    print(f"old rows={len(ra)} new rows={len(rb)} equal={ra == rb}", flush=True)
    spark.catalog.clearCache()
    times = {"old": [], "new": []}
    for _ in range(REPS):
        for tag, fn in (("old", old_cc), ("new", new_cc)):
            t0 = time.perf_counter()
            fn(_edges(spark, SF_DIR)).select("node", "component").write.format(
                "noop"
            ).mode("overwrite").save()
            times[tag].append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
    print(
        f"old min={min(times['old']):.3f} runs={times['old']}  |  "
        f"new min={min(times['new']):.3f} runs={times['new']}  "
        f"loadavg={os.getloadavg()[0]:.2f}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
