"""Shared synthetic-geometry builders for the spatial queries.

Several queries derive deterministic boxes/detections from the TPC-H
tables; each shape is defined ONCE here with its SQL rendering so the
Spark inputs and the DuckDB oracles can't drift (the same
define-once-render-twice rule as functions/).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Boxes from supplier: 8x8 boxes scattered over a 100x100 per-document
# drawing, BOXES_PER_DOC boxes per document (doc_id = s_suppkey div
# BOXES_PER_DOC). The document dimension is what carries corpus scale:
# more data means MORE documents of constant per-document complexity —
# the reference's per-drawing reality (app.py:3171-3201) — never a
# denser single canvas. Keys are integer-divided (never float), so doc
# ids stay exact at any key magnitude, and the driver's replica-offset
# scale-ups (tools/make_scaled_sf.py: s_suppkey + r * max) map replica
# r to its own doc-id range, preserving per-document density. The
# 20:1 part:supplier row ratio makes ``p_partkey div (20 *
# BOXES_PER_DOC)`` the matching per-document line key.
BOXES_PER_DOC = 10
SYNTH_BOXES_SQL = f"""
boxes AS (
  SELECT s_suppkey AS box_id, s_suppkey // {BOXES_PER_DOC} AS doc_id,
         (s_suppkey * 7) % 100 AS bx1, (s_suppkey * 13) % 100 AS by1,
         (s_suppkey * 7) % 100 + 8 AS bx2, (s_suppkey * 13) % 100 + 8 AS by2
  FROM supplier
)
"""


def synth_boxes(supplier: DataFrame) -> DataFrame:
    return supplier.select(
        F.col("s_suppkey").alias("box_id"),
        F.expr(f"s_suppkey div {BOXES_PER_DOC}").alias("doc_id"),
        ((F.col("s_suppkey") * 7) % 100).alias("bx1"),
        ((F.col("s_suppkey") * 13) % 100).alias("by1"),
        ((F.col("s_suppkey") * 7) % 100 + 8).alias("bx2"),
        ((F.col("s_suppkey") * 13) % 100 + 8).alias("by2"),
    )


# Detections per DOCUMENT (image): DETS_PER_DOC detections per
# document, doc = 'D' + (p_partkey div DETS_PER_DOC) — the same
# corpus-scale-in-the-key rule as SYNTH_BOXES_SQL. The pre-r07 form
# keyed documents by p_brand, a FIXED 25-value set, so per-(document,
# class) NMS group sizes grew linearly with the corpus and the O(n²)
# suppression quadratically — the last member of the fixed-domain
# density class (SCALING.md). With the div key, per-doc detection
# count (and per-(doc, class) group size, ~13 rows over ~150 classes)
# is constant at ANY corpus size, matching per-image reality.
DETS_PER_DOC = 2000


def synth_detections(part: DataFrame, size: int) -> DataFrame:
    """Detection boxes from part: per (document, class=type) with
    ``size``-px squares; confidence from the retail price. Used by
    nms_detections (size=10) and imageprocess_pipeline (size=12 —
    slightly larger so the composed pipeline produces denser overlaps;
    the parameter makes the variation explicit)."""
    return part.select(
        F.concat(
            F.lit("D"), F.expr(f"p_partkey div {DETS_PER_DOC}").cast("string")
        ).alias("document_id"),
        F.col("p_type").alias("cls"),
        ((F.col("p_size") * 3) % 80).cast("double").alias("x1"),
        ((F.col("p_partkey") * 7) % 80).cast("double").alias("y1"),
        (((F.col("p_size") * 3) % 80) + size).cast("double").alias("x2"),
        (((F.col("p_partkey") * 7) % 80) + size).cast("double").alias("y2"),
        F.round(F.col("p_retailprice") - 900.0, 2).alias("conf"),
    )


def synth_dets_sql(size: int) -> str:
    """DuckDB rendering of synth_detections (same shapes, same conf)."""
    return f"""dets AS (
  SELECT 'D' || CAST(p_partkey // {DETS_PER_DOC} AS VARCHAR) AS document_id,
         p_type AS cls,
         CAST((p_size * 3) % 80 AS DOUBLE) AS x1,
         CAST((p_partkey * 7) % 80 AS DOUBLE) AS y1,
         CAST((p_size * 3) % 80 + {size} AS DOUBLE) AS x2,
         CAST((p_partkey * 7) % 80 + {size} AS DOUBLE) AS y2,
         round(p_retailprice - 900.0, 2) AS conf
  FROM part
)"""
