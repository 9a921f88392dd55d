#!/usr/bin/env python3
"""Focused per-query timing with the bench methodology (noop sink,
min-of-N, clearCache between runs, warm session) — the measurement
loop for optimization work, so a single query's before/after can be
read without paying a full bench run.

    python tools/time_queries.py [-nN] query [query ...]

Honors SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and
SPARK_GRAFT_CPUS like bench.py. Prints one line per query:
``name: min=X.XXXs  runs=[...]`` plus the loadavg so a noisy-box
record is self-describing.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    n = 3
    if args and args[0].startswith("-n"):
        n = int(args[0][2:])
        args = args[1:]
    from acuvate_spark.queries import REGISTRY
    from acuvate_spark.session import get_spark

    spark = get_spark("time-queries")
    # same warmups as bench.py
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(1).collect()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    for name in args:
        runs = []
        for _ in range(n):
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        print(
            f"{name}: min={min(runs):.3f}s  runs={runs}  "
            f"loadavg={os.getloadavg()[0]:.2f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
