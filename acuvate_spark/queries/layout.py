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
