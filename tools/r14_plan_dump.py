#!/usr/bin/env python3
"""Dump .explain('formatted') for named registry queries into
plans/r14/<query>_<tag>.txt — the before/after evidence files for
OPTIMIZATION_r14.md.

    python tools/r14_plan_dump.py before dedup_embedding_cosine ...
    python tools/r14_plan_dump.py after  dedup_embedding_cosine ...

Queries whose construction runs driver-side loops (graph CC, k-center)
execute those loops here; the dump is the plan of the RETURNED frame,
which for iterative queries is the post-loop join/aggregate tail.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14")


def main() -> None:
    tag, names = sys.argv[1], sys.argv[2:]
    from acuvate_spark.queries import REGISTRY
    from acuvate_spark.session import get_spark

    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("r14-plan-dump")
    if os.environ.get("R14_PLAN_FULL_LINEAGE") == "1":
        # The materialize_and_release epilogue localCheckpoints the
        # result, leaving only a Scan ExistingRDD in the dump — stub
        # localCheckpoint to a no-op (the plan-audit trick) so the
        # evidence shows the real lineage. The patch must target the
        # CONCRETE class: pyspark 4 defines localCheckpoint on
        # classic.DataFrame, which shadows any base-class patch.
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
