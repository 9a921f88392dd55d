#!/usr/bin/env python3
"""Interleaved A/B for the r15 batched NMS kernel: OLD (applyInPandas
per (document_id, cls) group) vs NEW (mapInPandas over key-sorted
batches with trailing-group carry), over the two kernel consumers."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "5"))

import pandas as pd
from pyspark.sql import functions as F

from acuvate_spark.operators import kernels
from acuvate_spark.operators.kernels import NMS_SCHEMA
from acuvate_spark.queries.pid import _ip_segments, _ip_tail
from acuvate_spark.queries.synth import synth_detections
from acuvate_spark.session import get_spark
from acuvate_spark.tables import load_table

new_nms = kernels.nms


def old_nms(detections, iou_threshold=0.5):
    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(
            ["conf", "x1", "y1"], ascending=[False, True, True]
        ).reset_index(drop=True)
        x1 = pdf["x1"].to_numpy()
        y1 = pdf["y1"].to_numpy()
        x2 = pdf["x2"].to_numpy()
        y2 = pdf["y2"].to_numpy()
        areas = np.maximum(0.0, x2 - x1) * np.maximum(0.0, y2 - y1)
        kept = []
        for i in range(len(pdf)):
            if kept:
                k = np.array(kept)
                ix = np.maximum(0.0, np.minimum(x2[i], x2[k]) - np.maximum(x1[i], x1[k]))
                iy = np.maximum(0.0, np.minimum(y2[i], y2[k]) - np.maximum(y1[i], y1[k]))
                inter = ix * iy
                union = areas[i] + areas[k] - inter
                if np.any(
                    (union > 0) & (inter / np.maximum(union, 1e-12) >= iou_threshold)
                ):
                    continue
            kept.append(i)
        return pdf.iloc[kept]

    return detections.groupBy("document_id", "cls").applyInPandas(
        kernel, schema=NMS_SCHEMA
    )


def build_nms_detections(spark, sf_dir, impl):
    p = load_table(spark, sf_dir, "part")
    return impl(synth_detections(p, size=10), iou_threshold=0.5)


def build_imageprocess(spark, sf_dir, impl):
    p = load_table(spark, sf_dir, "part")
    boxes = impl(synth_detections(p, size=12), iou_threshold=0.5).withColumn(
        "box_id",
        F.xxhash64(F.col("document_id"), F.col("cls"), F.col("x1"), F.col("y1")),
    )
    return _ip_tail(boxes, _ip_segments(p))


def main() -> None:
    spark = get_spark("r15-ab-nms")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(1).collect()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    ra = sorted(map(tuple, build_nms_detections(spark, SF_DIR, old_nms).collect()))
    rb = sorted(map(tuple, build_nms_detections(spark, SF_DIR, new_nms).collect()))
    print(f"nms rows old={len(ra)} new={len(rb)} equal={ra == rb}", flush=True)
    for name, build in (
        ("nms_detections", build_nms_detections),
        ("imageprocess_pipeline", build_imageprocess),
    ):
        times = {"old": [], "new": []}
        for _ in range(REPS):
            for tag, impl in (("old", old_nms), ("new", new_nms)):
                t0 = time.perf_counter()
                build(spark, SF_DIR, impl).write.format("noop").mode(
                    "overwrite"
                ).save()
                times[tag].append(round(time.perf_counter() - t0, 3))
                spark.catalog.clearCache()
        print(
            f"{name}: old min={min(times['old']):.3f} runs={times['old']}  |  "
            f"new min={min(times['new']):.3f} runs={times['new']}  "
            f"loadavg={os.getloadavg()[0]:.2f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
