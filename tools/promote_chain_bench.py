#!/usr/bin/env python3
"""Promote delta-chain read amplification (VERDICT r09 item 7):
``read_with_promotes`` serves base + N committed deltas merge-on-read
— a winners window over the deltas plus a key anti-join against the
base — so per-read cost grows with the chain. ``compact_promotes``
folds the chain; this tool measures the growth curve and the
before/after-compaction read cost so SCALING.md can state a cadence
backed by numbers instead of folklore.

Protocol: base = the sf0.1 supplier table (or --dir). Each promote
cycle edits every even key (+i on the balance) through the REAL
``promote_records`` path. At each checkpoint chain length, time the
merged read (count + a column aggregate, min of --reps), then at the
end compact and time the same read again.

    python tools/promote_chain_bench.py [--chain 50] [--dir sfdir]
Prints one JSON line: {"chain": [...], "read_s": {...},
"compacted_read_s": ..., "compacted_deltas": N}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    chain = int(sys.argv[sys.argv.index("--chain") + 1]) if "--chain" in sys.argv else 50
    d = (
        sys.argv[sys.argv.index("--dir") + 1]
        if "--dir" in sys.argv
        else "/root/testdata/sf0.1"
    )
    reps = int(sys.argv[sys.argv.index("--reps") + 1]) if "--reps" in sys.argv else 3
    from acuvate_spark.operators import sinks
    from acuvate_spark.session import get_spark
    from acuvate_spark.tables import load_table

    spark = get_spark("promote-chain-bench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JIT warmup

    work = tempfile.mkdtemp(prefix="promote_chain_")
    main_path = os.path.join(work, "main")
    status = os.path.join(work, "status")
    tomb = os.path.join(work, "tomb")
    sup = load_table(spark, d, "supplier").select("s_suppkey", "s_acctbal")
    sup.write.parquet(main_path)

    def promote_cycle(i: int) -> None:
        staging = os.path.join(work, "staging")
        shutil.rmtree(staging, ignore_errors=True)
        sup.where(F.col("s_suppkey") % 2 == 0).select(
            "s_suppkey",
            F.lit(i).alias("submission_id"),
            (F.col("s_acctbal") + float(i)).alias("s_acctbal"),
            F.lit("Edit").alias("action"),
            F.lit(True).alias("approved"),
        ).write.parquet(staging)
        sinks.promote_records(
            spark,
            staging_path=staging,
            main_path=main_path,
            status_path=status,
            staging_tomb_path=tomb,
            predicate=F.col("approved"),
            key_cols=["s_suppkey"],
            staging_key_cols=["s_suppkey", "submission_id"],
            action_col="action",
            promote_id=f"pr-{i}",
        )

    def timed_read() -> float:
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            v = sinks.read_with_promotes(spark, main_path, ["s_suppkey"])
            v.agg(F.count("*"), F.sum("s_acctbal")).collect()
            el = time.perf_counter() - t0
            best = el if best is None or el < best else best
        return round(best, 3)

    checkpoints = sorted({0, 1, 2, 5, 10, 20, chain // 2, chain})
    read_s = {}
    done = 0
    for cp in checkpoints:
        while done < cp:
            promote_cycle(done)
            done += 1
        read_s[str(cp)] = timed_read()
        print(f"  chain={cp}: read {read_s[str(cp)]}s", file=sys.stderr)

    folded = sinks.compact_promotes(spark, main_path, ["s_suppkey"])
    compacted = timed_read()
    print(f"  compacted ({folded} deltas): read {compacted}s", file=sys.stderr)
    print(
        json.dumps(
            {
                "dir": d,
                "chain_read_s": read_s,
                "compacted_read_s": compacted,
                "compacted_deltas": folded,
                "amp_at_chain_vs_compacted": round(
                    read_s[str(chain)] / compacted, 2
                ),
            }
        )
    )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
