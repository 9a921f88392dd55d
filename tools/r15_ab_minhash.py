#!/usr/bin/env python3
"""Interleaved A/B for the r15 minhash-signature long-lane change:
alternate the OLD (min over hex strings -> SortAggregate) and NEW
(min over conv longs -> HashAggregate) forms of
operators.dedup.minhash_signature inside ONE session, min-of-N each,
over the consumer queries. Drift hits both variants equally."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "5"))

from pyspark.sql import functions as F

from acuvate_spark.operators import dedup as dedup_ops
from acuvate_spark.operators.dedup import minhash_strings
from acuvate_spark.queries import REGISTRY
from acuvate_spark.session import get_spark


def old_minhash_signature(shingles_df, key, shingle_col, n_hashes, *, with_count=False):
    aggs = [
        F.min(c).alias(f"mh{i}")
        for i, c in enumerate(minhash_strings(F.col(shingle_col), n_hashes))
    ]
    if with_count:
        aggs.append(F.count("*").alias("n"))
    return shingles_df.groupBy(key).agg(*aggs)


new_minhash_signature = dedup_ops.minhash_signature


def main() -> None:
    spark = get_spark("r15-ab-minhash")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(1).collect()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    queries = sys.argv[1:] or ["dedup_minhash_lsh", "dedup_incremental"]
    for name in queries:
        times = {"old": [], "new": []}
        for _ in range(REPS):
            for tag, impl in (("old", old_minhash_signature), ("new", new_minhash_signature)):
                dedup_ops.minhash_signature = impl
                t0 = time.perf_counter()
                REGISTRY[name].fn(spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                times[tag].append(round(time.perf_counter() - t0, 3))
                spark.catalog.clearCache()
        dedup_ops.minhash_signature = new_minhash_signature
        print(
            f"{name}: old min={min(times['old']):.3f} runs={times['old']}  |  "
            f"new min={min(times['new']):.3f} runs={times['new']}  "
            f"loadavg={os.getloadavg()[0]:.2f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
