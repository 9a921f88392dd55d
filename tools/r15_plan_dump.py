#!/usr/bin/env python3
"""Dump .explain('formatted') for named registry queries into
plans/r15/<query>_<tag>.txt — the before/after evidence files for
OPTIMIZATION_r15.md.

    python tools/r15_plan_dump.py before dedup_minhash_lsh ...
    python tools/r15_plan_dump.py after  dedup_minhash_lsh ...

Queries whose construction runs driver-side loops (graph CC, k-center)
execute those loops here; the dump is the plan of the RETURNED frame,
which for iterative queries is the post-loop join/aggregate tail.

Set R15_PLAN_FULL_LINEAGE=1 to stub localCheckpoint to a no-op before
building the query, so mid-plan materializations don't truncate the
dump to a Scan ExistingRDD tail (the r14 left-alone table's evidence
gap — VERDICT r14 item 3). pyspark 4 defines localCheckpoint on the
concrete pyspark.sql.classic.dataframe.DataFrame class, so the stub
must patch that class — a base-class patch would be shadowed.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15")


def main() -> None:
    tag, names = sys.argv[1], sys.argv[2:]
    from acuvate_spark.queries import REGISTRY
    from acuvate_spark.session import get_spark

    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("r15-plan-dump")
    if os.environ.get("R15_PLAN_FULL_LINEAGE") == "1":
        from pyspark.sql.classic.dataframe import DataFrame

        DataFrame.localCheckpoint = lambda self, eager=True: self
    for name in names:
        df = REGISTRY[name].fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"== {name} ({tag}) @ {SF_DIR} ==\n\n" + plan)
        print(f"wrote {path} ({len(plan)} chars)")
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
