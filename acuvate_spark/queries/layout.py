"""Data-layout queries — the storage-clustering half of the 100 TB
story (SURVEY §4; operators/storage.py holds the writers).

The reference leaves physical layout to Snowflake's automatic
micro-partition clustering; a Spark-native engine owns it. The
registry query here pins the Morton-interleave bit math against the
DuckDB oracle; the layout BENEFIT (footer min/max pruning in every
interleaved dimension) is asserted by tests/test_storage.py on real
parquet files, where SQL can't see.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.storage import zorder_key
from ..tables import load_table
from .registry import register


@register(
    "zorder_orders",
    oracle="""
SELECT o_orderkey,
       CAST(list_sum(list_transform(range(0, 16), i ->
            (((x >> i) & 1) << (2 * i)) + (((y >> i) & 1) << (2 * i + 1))
       )) AS BIGINT) AS zkey
FROM (
  SELECT o_orderkey,
         o_custkey % 65536 AS x,
         date_diff('day', DATE '1992-01-01', o_orderdate::DATE) % 65536 AS y
  FROM orders
  WHERE o_orderkey % 97 = 0
) t
""",
    survey_ref="O-layout §4",
)
def zorder_orders(spark, sf_dir):
    """Morton (Z-order) clustering key over (custkey, order-day) —
    the sort key ``write_zordered`` lays files out by.

    The interleave is pure unrolled bit arithmetic inside one
    whole-stage-codegen projection: zero shuffles, zero UDFs; the scan
    reads exactly three columns. The mod-65536 reduction (instead of
    ``write_zordered``'s min/max scaling) keeps the bit math exactly
    reproducible in the oracle; the ``% 97`` sample bounds the
    result set the driver hashes. 16 bits x 2 dims = 32-bit key, the
    standard width Delta/Iceberg use per dimension pair.
    """
    orders = load_table(spark, sf_dir, "orders")
    x = (F.col("o_custkey") % 65536).cast("long")
    y = (
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")) % 65536
    ).cast("long")
    return (
        orders.where(F.col("o_orderkey") % 97 == 0)
        .select("o_orderkey", zorder_key([x, y], bits=16).alias("zkey"))
    )


_EXPORT_SHARDS = 16


@register(
    "export_manifest",
    oracle=f"""
WITH s AS (
  SELECT doc_id,
         md5('shard|' || CAST(doc_id AS VARCHAR)) AS h,
         CAST(('0x' || substring(md5('shard|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
              % {_EXPORT_SHARDS} AS BIGINT) AS shard,
         n_chars
  FROM documents
)
SELECT shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS n_chars,
       min(h) AS min_h,
       max(h) AS max_h
FROM s GROUP BY shard
""",
    survey_ref="O-layout §4: sharded-export manifest (deterministic "
    "global shuffle; write path = operators/storage.write_sharded)",
)
def export_manifest(spark, sf_dir):
    """Manifest of the deterministic sharded export
    (``storage.write_sharded``): per shard, the doc count, total
    chars, and the first/last shuffle keys — the audit record a
    training job checks before consuming an export (uniform shard
    sizes, contiguous key ranges, nothing missing). Every column is a
    map-side-combinable aggregate over the same md5 shard key the
    writer uses — deliberately NO per-shard row_number (a within-shard
    position would funnel each shard through one window task; the
    writer gets in-shard order for free from its sortWithinPartitions).
    One |shards|-group shuffle at any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.lit("shard|"), F.col("doc_id").cast("string")))
    s = d.select(
        h.alias("h"),
        (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % _EXPORT_SHARDS)
        .cast("long")
        .alias("shard"),
        "n_chars",
    )
    return s.groupBy("shard").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("n_chars"),
        F.min("h").alias("min_h"),
        F.max("h").alias("max_h"),
    )
