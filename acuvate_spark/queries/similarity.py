"""Similarity search over the ``embeddings`` table: brute-force cosine
top-k as the exact baseline, and random-hyperplane LSH bucketing as
the approximate scale path.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import vectors
from ..tables import load_table, repartition_for_compute
from .registry import register

_TOP_K = 5

# Rendered by the same library function as the Spark side (the
# define-once-render-twice invariant of functions/): editing
# vectors.dot/cosine updates BOTH engines.
_COS_SQL = vectors.cosine_rounded_sql("q.embedding", "n.embedding", 4)


@register(
    "ann_cosine_topk",
    oracle=f"""
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 100 = 0),
pairs AS (
  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, {_COS_SQL} AS cos_sim
  FROM q, embeddings n
  WHERE n.vec_id <> q.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rn
  FROM pairs
)
SELECT query_id, neighbor_id, cos_sim, rn AS rank
FROM ranked WHERE rn <= {_TOP_K}
""",
    survey_ref="training-data: ANN brute-force cosine top-k",
)
def ann_cosine_topk(spark, sf_dir):
    """Exact top-k: broadcast the query set against the corpus, rank
    per query by rounded cosine (ties broken by id so both engines
    agree). At scale the corpus side stays partitioned and only the
    (tiny) query set is broadcast — a map-side-only pass plus a
    per-query top-k window on k*|queries| rows."""
    e = repartition_for_compute(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )
    q = e.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    pairs = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .withColumn("cos_sim", vectors.cosine_rounded(F.col("qe"), F.col("embedding"), 4))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= _TOP_K)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


# Fixed pseudo-random hyperplanes (seeded, embedded as literals so the
# Spark plan and the DuckDB oracle share them exactly).
_rng = random.Random(7)
_PLANES = [[round(_rng.gauss(0.0, 1.0), 6) for _ in range(64)] for _ in range(4)]


@register(
    "ann_lsh_bucketed",
    oracle=f"""
WITH b AS (
  SELECT vec_id, embedding,
         {vectors.hyperplane_bucket_sql('embedding', _PLANES)} AS bucket
  FROM embeddings
),
q AS (SELECT * FROM b WHERE vec_id % 100 = 0),
pairs AS (
  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, q.bucket, {_COS_SQL} AS cos_sim
  FROM q JOIN b n ON n.bucket = q.bucket AND n.vec_id <> q.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, bucket, cos_sim,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rn
  FROM pairs
)
SELECT query_id, neighbor_id, bucket, cos_sim, rn AS rank
FROM ranked WHERE rn <= 3
""",
    survey_ref="training-data: LSH-bucketed ANN (scale path)",
)
def ann_lsh_bucketed(spark, sf_dir):
    """Approximate top-k: 4 random-hyperplane sign bits partition the
    corpus into 16 buckets; candidates are same-bucket only. The
    bucket is an equi-join key, so at 100 TB this is a plain hash
    join on (bucket) instead of an all-pairs scan — recall traded for
    a ~16x candidate reduction per extra plane."""
    e = repartition_for_compute(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )
    b = e.withColumn("bucket", vectors.hyperplane_bucket(F.col("embedding"), _PLANES))
    q = b.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("bucket").alias("qbucket"),
    )
    pairs = (
        b.join(
            F.broadcast(q),
            (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("query_id")),
        )
        .withColumn("cos_sim", vectors.cosine_rounded(F.col("qe"), F.col("embedding"), 4))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "bucket", "cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", "bucket", "cos_sim", "rank")
    )
