#!/usr/bin/env python3
"""Regenerate the committed imageprocess kernel-output fixtures

    acuvate_spark/resources/ip_boxes.parquet
    acuvate_spark/resources/ip_segments.parquet
    acuvate_spark/resources/nms_detections.parquet

— the deterministic outputs of the two SEQUENTIAL kernels (per-class
greedy NMS, pixel-BFS segmentation) of ``imageprocess_pipeline`` at
sf0.01, plus the full output of the ``nms_detections`` registry query
at the driver's correctness scale. The ``imageprocess_tail`` registry
query replays the pipeline's declarative tail (touch join -> pairwise
edges -> cached LLM labels) from the first two fixtures against a
DuckDB oracle, hash-pinning every relational stage; the third golden-
pins the one remaining rows-only kernel surface (VERDICT r05 item 3).
``tests/test_kernels.py::test_imageprocess_fixture_matches_kernels``
and ``::test_nms_detections_matches_golden_fixture`` assert the
committed files still equal the live outputs, so no fixture can
silently go stale and no kernel can silently change behavior.

    python tools/make_imageprocess_fixture.py
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
RES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "acuvate_spark",
    "resources",
)


def _write_single(df, order_cols, out_name):
    """One sorted parquet FILE (not a directory) so the fixture commits
    as a single blob and DuckDB/Spark read it by plain path."""
    with tempfile.TemporaryDirectory() as tmp:
        staged = os.path.join(tmp, "staged")
        df.coalesce(1).sortWithinPartitions(*order_cols).write.mode("overwrite").parquet(staged)
        part = glob.glob(os.path.join(staged, "part-*.parquet"))
        assert len(part) == 1, part
        shutil.copyfile(part[0], os.path.join(RES, out_name))


def main() -> None:
    from acuvate_spark.queries import REGISTRY
    from acuvate_spark.queries.pid import _ip_boxes, _ip_segments
    from acuvate_spark.session import get_spark
    from acuvate_spark.tables import load_table

    spark = get_spark(cpus=8)
    p = load_table(spark, SF_DIR, "part")
    _write_single(_ip_boxes(p), ["box_id"], "ip_boxes.parquet")
    _write_single(_ip_segments(p), ["image_id", "segment_id"], "ip_segments.parquet")
    _write_single(
        REGISTRY["nms_detections"].fn(spark, SF_DIR),
        ["document_id", "cls", "x1", "y1"],
        "nms_detections.parquet",
    )
    for name in ("ip_boxes", "ip_segments", "nms_detections"):
        print("wrote", os.path.join(RES, f"{name}.parquet"))


if __name__ == "__main__":
    main()
