#!/usr/bin/env python3
"""Interleaved A/B for the r15 contamination_substring one-pass
rewrite: OLD (persist cg; counts agg + semi-join hits agg + outer
join) vs NEW (broadcast left join with hit marker, one aggregation)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "5"))

from pyspark.sql import functions as F

from acuvate_spark.queries.dedup import _SUB_MIN_HITS, _SUB_N, _materialize_and_release
from acuvate_spark.session import get_spark
from acuvate_spark.tables import load_table, repartition_for_compute


def build(spark, sf_dir, form):
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bench = d.where(F.col("doc_id") % 10 == 0)
    corpus = d.where(F.col("doc_id") % 10 != 0).unionByName(
        bench.select(
            (F.col("doc_id") + 500000).alias("doc_id"),
            F.expr("substring(text, 50, 200)").alias("text"),
        )
    )
    grams = F.expr(
        f"array_distinct(transform(sequence(1, size(ch) - {_SUB_N - 1}), "
        f"i -> array_join(slice(ch, i, {_SUB_N}), '')))"
    )

    def _char_grams(frame):
        return frame.where(F.length("text") >= _SUB_N).select(
            "doc_id", F.split(F.col("text"), "").alias("ch")
        )

    bg = _char_grams(bench).select(F.explode(grams).alias("gram")).distinct()
    if form == "old":
        cg = (
            repartition_for_compute(_char_grams(corpus))
            .select("doc_id", F.explode(grams).alias("gram"))
            .persist()
        )
        counts = cg.groupBy("doc_id").agg(F.count("*").cast("long").alias("n_grams"))
        hits = (
            cg.join(F.broadcast(bg), "gram", "left_semi")
            .groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_hit"))
        )
        result = counts.join(hits, "doc_id", "left").select(
            "doc_id",
            "n_grams",
            F.coalesce(F.col("n_hit"), F.lit(0).cast("long")).alias("n_hit"),
            (F.coalesce(F.col("n_hit"), F.lit(0)) >= _SUB_MIN_HITS).alias("flagged"),
        )
        return _materialize_and_release(result, cg)
    cg = repartition_for_compute(_char_grams(corpus)).select(
        "doc_id", F.explode(grams).alias("gram")
    )
    marked = cg.join(F.broadcast(bg.withColumn("__hit", F.lit(1))), "gram", "left")
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.count("__hit").cast("long").alias("n_hit"),
        )
        .select(
            "doc_id", "n_grams", "n_hit",
            (F.col("n_hit") >= _SUB_MIN_HITS).alias("flagged"),
        )
    )


def main() -> None:
    spark = get_spark("r15-ab-contamination")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(1).collect()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    ra = sorted(map(tuple, build(spark, SF_DIR, "old").collect()))
    rb = sorted(map(tuple, build(spark, SF_DIR, "new").collect()))
    print(f"old rows={len(ra)} new rows={len(rb)} equal={ra == rb}", flush=True)
    spark.catalog.clearCache()
    times = {"old": [], "new": []}
    for _ in range(REPS):
        for tag in ("old", "new"):
            t0 = time.perf_counter()
            build(spark, SF_DIR, tag).write.format("noop").mode("overwrite").save()
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
