#!/usr/bin/env python3
"""Interleaved A/B for the r15 dedup_span_removal rewrite: OLD
(min(struct) argmin + join back — occ computed twice, SortAggregate
pair) vs NEW (one row_number window over gkey). Same session,
alternating, min-of-N."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "5"))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from acuvate_spark.functions import textual
from acuvate_spark.queries.dedup import (
    _REMOVE_SPAN_N,
    _docs_plus_clones,
    _materialize_and_release,
)
from acuvate_spark.session import get_spark
from acuvate_spark.tables import repartition_for_compute


def build(spark, sf_dir, form):
    docs = _docs_plus_clones(spark, sf_dir)
    wf = F.filter(textual.words(F.trim(F.col("text"))), lambda x: x != "")
    base = repartition_for_compute(docs).select("doc_id", wf.alias("w")).persist()
    wp = base.select("doc_id", F.posexplode("w").alias("pos", "word"))
    occ = (
        base.select(
            "doc_id",
            F.posexplode(textual.word_shingles(F.col("w"), _REMOVE_SPAN_N)).alias(
                "start0", "gram"
            ),
        )
        .select("doc_id", "start0", F.md5("gram").alias("gkey"))
    )
    if form == "old":
        firsts = occ.groupBy("gkey").agg(
            F.min(F.struct("doc_id", "start0")).alias("first_occ")
        )
        nonfirst = occ.join(firsts, "gkey").where(
            (F.col("doc_id") != F.col("first_occ.doc_id"))
            | (F.col("start0") != F.col("first_occ.start0"))
        )
    else:
        first_w = Window.partitionBy("gkey").orderBy("doc_id", "start0")
        nonfirst = occ.withColumn("rn", F.row_number().over(first_w)).where(
            F.col("rn") > 1
        )
    covered = nonfirst.select(
        "doc_id",
        F.explode(
            F.sequence(F.col("start0"), F.col("start0") + _REMOVE_SPAN_N - 1)
        ).alias("pos"),
    ).distinct()
    kept = wp.join(covered, ["doc_id", "pos"], "left_anti")
    clean = kept.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "word"))),
                lambda x: x["word"],
            ),
            " ",
        ).alias("cleaned"),
    )
    out = (
        base.select("doc_id", F.size("w").cast("long").alias("n_words"))
        .join(clean, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.md5(F.coalesce("cleaned", F.lit(""))).alias("clean_md5"),
        )
    )
    return _materialize_and_release(out, base)


def main() -> None:
    spark = get_spark("r15-ab-span")
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
