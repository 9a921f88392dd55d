"""Unit tests for the expression libraries where the oracle harness
can't pin semantics (order-preserving merge U3, tiling starts O10)."""

from __future__ import annotations

from pyspark.sql import functions as F

from acuvate_spark.functions import tags
from acuvate_spark.operators.tiling import tile_starts


def test_merge_semicolon_append_preserves_order(spark):
    # reference merge_semicolon_values (app.py:5911-5926): existing
    # order kept, new values appended once, dups dropped
    df = spark.createDataFrame(
        [("b;a", "c;a"), ("x", None), (None, "y;y"), ("", "z; ;z")],
        "a string, b string",
    ).select(tags.merge_semicolon_append(F.col("a"), F.col("b")).alias("m"))
    got = [r["m"] for r in df.collect()]
    assert got == ["b;a;c", "x", "y", "z"]


def test_merge_semicolon_sorted_is_set_union(spark):
    df = spark.createDataFrame(
        [("b;a", "c;a")], "a string, b string"
    ).select(tags.merge_semicolon_sorted(F.col("a"), F.col("b")).alias("m"))
    assert df.collect()[0]["m"] == "a;b;c"


def _py_starts(size: int, tile: int, overlap: int) -> list[int]:
    """Reference semantics (app.py:2816-2821): stride tile-overlap,
    last tile clamped to end at the image edge."""
    step = tile - overlap
    if size < tile:
        return [0]
    starts, s = [], 0
    while s + tile < size:
        starts.append(s)
        s += step
    starts.append(size - tile)
    return sorted(set(starts))


def test_tile_starts_matches_reference_semantics(spark):
    sizes = [600, 640, 641, 800, 1280, 1824, 2000, 3104]
    df = spark.createDataFrame([(s,) for s in sizes], "size long").select(
        "size", F.array_sort(tile_starts(F.col("size"), 640, 100)).alias("starts")
    )
    got = {r["size"]: list(r["starts"]) for r in df.collect()}
    for s in sizes:
        assert got[s] == _py_starts(s, 640, 100), f"size={s}"


def test_word_shingles_short_documents_yield_empty(spark):
    # regression: sequence(1, 0) is DESCENDING in Spark — docs shorter
    # than n words must produce [] (matching DuckDB's empty range), not
    # crash element_at with out-of-range indices
    from acuvate_spark.functions import textual

    df = spark.createDataFrame(
        [("",), ("one",), ("one two",), ("one two three",), ("a b c d",)],
        "text string",
    ).select(textual.word_shingles(textual.words(F.col("text")), 3).alias("sh"))
    got = [list(r["sh"]) for r in df.collect()]
    assert got[0] == [""] or got[0] == []  # split('') -> [''] edge
    assert got[1] == [] and got[2] == []
    assert got[3] == ["one two three"]
    assert got[4] == ["a b c", "b c d"]
