#!/usr/bin/env python3
"""Stage profile for the two OCR-kernel consumers at sf0.1 (guide §1):
time, with the noop sink and interleaved min-of-N,
  - the pre-kernel page frame alone,
  - the kernel output alone,
  - the full query,
for scanner_tag_etl (token-sparse pages: one tag token per page) and
ocr_page_words (token-dense pages: real document text)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "5"))

from pyspark.sql import functions as F

from acuvate_spark.operators import kernels
from acuvate_spark.queries import REGISTRY
from acuvate_spark.queries.etl import _FILES
from acuvate_spark.session import get_spark
from acuvate_spark.tables import load_table, repartition_for_compute


def scanner_pages(spark, sf_dir):
    p = load_table(spark, sf_dir, "part")
    k = F.col("p_partkey")
    file_name = F.element_at(
        F.array(*[F.lit(f) for f in _FILES]), (k % 4 + 1).cast("int")
    )
    raw_tag = (
        F.when(k % 6 == 0, F.concat(F.lit("(F-"), (k + 1000).cast("string"), F.lit("A/B)")))
        .when(k % 6 == 1, k.cast("string"))
        .when(k % 6 == 2, F.lit("BY-PASS"))
        .when(k % 6 == 3, F.concat(F.lit("PIT-"), (k + 1000).cast("string")))
        .when(k % 6 == 4, F.concat(F.lit("E17-F-"), (k + 1000).cast("string")))
        .otherwise(
            F.concat(F.lit('8"-CS150-AB'), ((k % 90) + 10).cast("string"), F.lit("-CD34"))
        )
    )
    raw = repartition_for_compute(
        p.select(k.alias("row_id"), file_name.alias("file_name"), raw_tag.alias("raw_tag"))
    )
    return raw.select(
        F.col("row_id").alias("page_id"),
        F.col("raw_tag").alias("content"),
        "file_name",
    )


def ocr_pages(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    content = F.concat(
        F.trim(F.col("text")),
        F.lit(" x PIT-"),
        (F.col("doc_id") + 1000).cast("string"),
        F.lit(" F-"),
        (F.col("doc_id") % 90 + 10).cast("string"),
        F.lit("A"),
    )
    return repartition_for_compute(
        d.select(F.col("doc_id").alias("page_id"), content.alias("content"))
    )


def main() -> None:
    spark = get_spark("r15-profile-ocr")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(1).collect()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    cases = {
        "scanner/pages": lambda: scanner_pages(spark, SF_DIR),
        "scanner/kernel": lambda: kernels.ocr_words_stub(
            scanner_pages(spark, SF_DIR), passthrough=("file_name",)
        ),
        "scanner/full": lambda: REGISTRY["scanner_tag_etl"].fn(spark, SF_DIR),
        "ocr/pages": lambda: ocr_pages(spark, SF_DIR),
        "ocr/kernel": lambda: kernels.ocr_words_stub(ocr_pages(spark, SF_DIR)),
        "ocr/full": lambda: REGISTRY["ocr_page_words"].fn(spark, SF_DIR),
    }
    times = {k: [] for k in cases}
    for _ in range(REPS):
        for tag, fn in cases.items():
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            times[tag].append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
    for tag in cases:
        print(f"{tag}: min={min(times[tag]):.3f} runs={times[tag]}", flush=True)
    print(f"loadavg={os.getloadavg()[0]:.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
