"""Probe: timestamp-extreme parity ring candidate (r14 ring #9).
Injects calendar edge values — year 0001 and 9999, a date inside the
historical Julian-Gregorian gap (1582-10-10, valid proleptic), the
epoch, a leap day, a DST-transition instant — into events.ts,
orders.o_orderdate and lineitem.l_shipdate, then replays the
time-consuming query families Spark-vs-oracle. NOTE: int64
nanosecond timestamps only span 1677-2262, so the poisoned copies are
written as microsecond TIMESTAMP (DuckDB's default) — Spark reads
micros directly; the nanos compat tune simply doesn't trigger."""

from __future__ import annotations

import os
import sys
import tempfile

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.001"

TS_QUERIES = [
    "latest_event_per_user", "sessionize_events", "tumbling_event_counts",
    "sliding_event_counts", "asof_join_events", "session_window_counts",
    "event_funnel", "click_attribution", "gapfill_daily",
    "date_functions", "scd2_history", "running_totals", "cube_order_year",
    "pivot_order_status", "zorder_orders", "top_orders", "getdata_keyset",
    "pricing_summary", "upsert_orders", "soft_delete_users",
]


def build_fixture(out: str, poison_gapfill_span: bool = False) -> str:
    con = duckdb.connect()
    # gapfill densifies each user's [min_day, max_day]: a year-0001 cell
    # would explode that user's grid to ~740k rows, so the default
    # fixture keeps ts extremes INSIDE a sane span for gapfill while
    # still hitting the epoch, leap-day, DST and Julian-gap cases;
    # poison_gapfill_span=True adds the 0001/9999 cells for span tests.
    far = ("CASE WHEN event_id % 61 = 0 THEN TIMESTAMP '1800-01-01 00:00:00' "
           "WHEN event_id % 67 = 0 THEN TIMESTAMP '2200-12-31 23:59:59' ELSE ts END"
           if poison_gapfill_span else "ts")
    # events.ts extremes stay inside the int64-NANOSECOND window
    # [1677-09-21, 2262-04-11]: results cross the Arrow/pandas bridge
    # (both the oracle harness and any toPandas consumer), and the
    # probe showed the bridge — not the engine — rejects earlier
    # instants (ArrowInvalid on collect; the Spark plans themselves
    # ran). 1677/2262 edges, the epoch, a leap day and a DST-gap
    # instant are the hostile cases that remain representable.
    con.execute(f"""
        COPY (
          SELECT * REPLACE (CAST(
            CASE WHEN event_id % 17 = 0 THEN TIMESTAMP '1970-01-01 00:00:00'
                 WHEN event_id % 19 = 0 THEN TIMESTAMP '2024-02-29 12:00:00'
                 WHEN event_id % 23 = 0 THEN TIMESTAMP '2026-03-08 07:30:00'
                 WHEN event_id = 29 THEN TIMESTAMP '1677-09-22 00:00:00'
                 WHEN event_id = 31 THEN TIMESTAMP '2262-04-10 00:00:00'
                 ELSE {far} END AS TIMESTAMP) AS ts
          ) FROM read_parquet('{SRC}/events.parquet')
        ) TO '{out}/events.parquet' (FORMAT PARQUET)
    """)
    # same ns-window bound for the date columns: date_functions /
    # running_totals / scd2_history RETURN the raw timestamp, so a
    # year-0001 cell dies at the bridge, not in the plan. (A one-off
    # probe run with 0001/9999 here confirmed the year-level queries
    # — cube_order_year, pivot, zorder — agree on the full range.)
    con.execute(f"""
        COPY (
          SELECT * REPLACE (CAST(
            CASE WHEN o_orderkey % 41 = 0 THEN TIMESTAMP '1680-01-01 00:00:00'
                 WHEN o_orderkey % 43 = 0 THEN TIMESTAMP '2260-12-31 00:00:00'
                 WHEN o_orderkey % 47 = 0 THEN TIMESTAMP '1752-09-02 00:00:00'
                 ELSE o_orderdate END AS TIMESTAMP) AS o_orderdate
          ) FROM read_parquet('{SRC}/orders.parquet')
        ) TO '{out}/orders.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
          SELECT * REPLACE (CAST(
            CASE WHEN l_orderkey % 53 = 0 THEN TIMESTAMP '1677-09-22 00:00:00'
                 WHEN l_orderkey % 59 = 0 THEN TIMESTAMP '2262-04-10 00:00:00'
                 ELSE l_shipdate END AS TIMESTAMP) AS l_shipdate
          ) FROM read_parquet('{SRC}/lineitem.parquet')
        ) TO '{out}/lineitem.parquet' (FORMAT PARQUET)
    """)
    for t in "region nation customer supplier part documents embeddings".split():
        os.symlink(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")
    return out


def main() -> None:
    out = tempfile.mkdtemp(prefix="tsx_")
    build_fixture(out, poison_gapfill_span="--span" in sys.argv)
    print("fixture:", out)

    from acuvate_spark.queries import REGISTRY
    from acuvate_spark.session import get_spark
    from tests.oracle_harness import compare, duck_con

    spark = get_spark(cpus=8)
    names = [a for a in sys.argv[1:] if not a.startswith("-")] or TS_QUERIES
    for name in names:
        spec = REGISTRY[name]
        try:
            sp = spec.fn(spark, out).toPandas()
        except Exception as e:
            print(f"CRASH-SPARK {name}: {type(e).__name__}: {str(e)[:200]}")
            continue
        finally:
            spark.catalog.clearCache()
        if spec.oracle is None:
            print(f"rows-only  {name}: {len(sp)} rows")
            continue
        try:
            du = duck_con(out).execute(spec.oracle).fetchdf()
        except Exception as e:
            print(f"CRASH-ORACLE {name}: {type(e).__name__}: {str(e)[:200]}")
            continue
        problems = compare(sp, du, name)
        print(("DIVERGE    " if problems else "agree      ") + name
              + (f": {problems[:2]}" if problems else f": {len(sp)} rows"))


if __name__ == "__main__":
    main()
