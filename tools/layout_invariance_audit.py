"""One-off audit: registry queries must be invariant to physical data
layout and shuffle parallelism.

At cluster scale the row order inside parquet files and the number of
files per table are arbitrary, and shuffle partition counts differ from
the local[32] default.  Any query whose answer changes under either is
nondeterministic in a way the driver's fixed-layout gate cannot see.

Two perturbations, both checked against the SAME DuckDB oracle over the
SAME perturbed files (so the comparison is still exact):

1. --layout: copy each sf table into /tmp with rows globally reshuffled
   (ORDER BY a hash in DuckDB) and split into a different file count.
2. --partitions N: run the sweep with spark.sql.shuffle.partitions=N.

Usage:
    python tools/layout_invariance_audit.py --layout --partitions 5
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_reshuffled(src_dir: str, dst_dir: str, seed: int = 7) -> None:
    import duckdb

    from acuvate_spark.tables import TABLES

    os.makedirs(dst_dir, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        src = f"{src_dir}/{t}.parquet"
        dst = f"{dst_dir}/{t}.parquet"
        if os.path.isdir(dst) or os.path.isfile(dst):
            continue
        # Reorder rows by a keyed hash so the layout shares nothing with
        # the generator's order, and write multiple row groups so Spark
        # splits differ too.
        con.execute(
            f"COPY (SELECT * EXCLUDE (__rn) FROM "
            f"(SELECT *, row_number() OVER () AS __rn FROM '{src}') "
            f"ORDER BY hash(__rn + {seed})) "
            f"TO '{dst}' (FORMAT PARQUET, ROW_GROUP_SIZE 997)"
        )
    con.close()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--layout", action="store_true", help="reshuffle rows + regroup files")
    ap.add_argument("--seed", type=int, default=7, help="reshuffle permutation seed")
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument(
        "--conf",
        action="append",
        default=[],
        metavar="K=V",
        help="extra runtime spark conf, e.g. spark.sql.adaptive.enabled=false",
    )
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    sf_dir = args.sf_dir
    if args.layout:
        tag = os.path.basename(sf_dir.rstrip("/"))
        dst = f"/tmp/layout_audit_{tag}_s{args.seed}"
        build_reshuffled(sf_dir, dst, seed=args.seed)
        sf_dir = dst
        print(f"reshuffled copy at {sf_dir}")

    from acuvate_spark.queries import REGISTRY
    from acuvate_spark.session import get_spark
    from tests.oracle_harness import compare, duck_con

    spark = get_spark("layout-audit", cpus=8)
    if args.partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(args.partitions))
    for kv in args.conf:
        k, _, v = kv.partition("=")
        spark.conf.set(k, v)

    names = args.only or sorted(REGISTRY)
    con = duck_con(sf_dir)
    failed: list[str] = []
    for i, name in enumerate(names, 1):
        spec = REGISTRY[name]
        t0 = time.time()
        try:
            spark_pdf = spec.fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001 - audit must keep going
            failed.append(name)
            print(f"[{i}/{len(names)}] {name}: CRASH {type(e).__name__}: {e}")
            continue
        if spec.oracle is None:
            status = f"rows-only ({len(spark_pdf)} rows)"
        else:
            oracle_pdf = con.execute(spec.oracle).fetchdf()
            problems = compare(spark_pdf, oracle_pdf, name)
            if problems:
                failed.append(name)
                status = "MISMATCH\n  " + "\n  ".join(problems)
            else:
                status = "ok"
        print(f"[{i}/{len(names)}] {name}: {status} ({time.time() - t0:.1f}s)")

    print(f"\n{len(failed)} failures: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
