"""Tiling with overlap — SURVEY §4 O10 (reference compute_tile_starts
app.py:2816-2821; tile/overlap params at app.py:1813, 1850, 3955-3957).

Large-image inference decomposes an image into overlapping tiles; in
dataflow terms that's a 1-row-to-N-tiles expansion, which makes the
inference stage data-parallel: each tile row carries (image_id, tx,
ty, tile_w, tile_h) and feeds the mapInPandas detection kernel
independently. Pure ``sequence``+``explode`` expressions — the tile
grid never touches Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tile_starts(size: Column, tile: int, overlap: int) -> Column:
    """Start offsets covering ``size`` with ``tile``-sized windows and
    ``overlap`` px of overlap; the final tile is clamped so it ends
    exactly at the edge (reference semantics: last start = size-tile
    when it would overrun). An image smaller than one tile yields the
    single whole-image start [0] — dropping it entirely would silently
    exclude small pages from inference. Returns an array<long>."""
    step = tile - overlap
    # starts: 0, step, 2*step, ... while start + tile < size, plus the clamped tail
    n_full = F.greatest(F.ceil((size - F.lit(tile)).cast("double") / F.lit(step)).cast("long"), F.lit(0))
    starts = F.transform(
        F.sequence(F.lit(0), n_full), lambda i: F.least(i * F.lit(step), size - F.lit(tile))
    )
    covering = F.array_distinct(F.filter(starts, lambda s: s >= 0))
    return F.when(size < tile, F.array(F.lit(0).cast("long"))).otherwise(covering)


def explode_tiles(images: DataFrame, width_col: str, height_col: str, tile: int, overlap: int) -> DataFrame:
    """images(image_id, width, height, ...) -> one row per (tx, ty)
    tile, preserving the other columns."""
    w = F.col(width_col).cast("long")
    h = F.col(height_col).cast("long")
    return (
        images.withColumn("tx", F.explode(tile_starts(w, tile, overlap)))
        .withColumn("ty", F.explode(tile_starts(h, tile, overlap)))
        .withColumn("tile_w", F.least(F.lit(tile), w - F.col("tx")))
        .withColumn("tile_h", F.least(F.lit(tile), h - F.col("ty")))
    )
