#!/usr/bin/env python3
"""Regenerate the committed imageprocess kernel-output fixtures

    acuvate_spark/resources/ip_boxes.parquet
    acuvate_spark/resources/ip_segments.parquet

— the deterministic outputs of the two SEQUENTIAL kernels (per-class
greedy NMS, pixel-BFS segmentation) of ``imageprocess_pipeline`` at
sf0.01. The ``imageprocess_tail`` registry query replays the
pipeline's declarative tail (touch join -> pairwise edges -> cached
LLM labels) from these fixtures against a DuckDB oracle, hash-pinning
every relational stage; only the kernels themselves stay rows-only.
``tests/test_kernels.py::test_imageprocess_fixture_matches_kernels``
asserts the committed files still equal the live kernel outputs, so
the fixture cannot silently go stale.

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
    from acuvate_spark.queries.pid import _ip_boxes, _ip_segments
    from acuvate_spark.session import get_spark
    from acuvate_spark.tables import load_table

    spark = get_spark(cpus=8)
    p = load_table(spark, SF_DIR, "part")
    _write_single(_ip_boxes(p), ["box_id"], "ip_boxes.parquet")
    _write_single(_ip_segments(p), ["image_id", "segment_id"], "ip_segments.parquet")
    print("wrote", os.path.join(RES, "ip_boxes.parquet"))
    print("wrote", os.path.join(RES, "ip_segments.parquet"))


if __name__ == "__main__":
    main()
