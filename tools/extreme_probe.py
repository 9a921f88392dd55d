"""Probe: extreme-value parity ring candidate (r14). Injects IEEE
edge values — NaN, +/-Inf, +/-1e300, -0.0, denormal 5e-324 — into
lineitem / events / embeddings via DuckDB SQL (pandas round-trips
would fold NaN into NULL; COPY TO preserves it) and replays the
numeric query families Spark-vs-oracle. Findings graduate into
tests/test_extreme_parity.py with pinned contracts."""

from __future__ import annotations

import os
import sys
import tempfile

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.001"

LINEITEM_QUERIES = [
    "pricing_summary", "agg_order_stats", "salted_agg_lineitem",
    "running_totals", "rollup_sales", "cube_order_year",
    "price_equidepth_bins", "sketch_stats", "group_envelope",
    "top_orders", "unpivot_part_metrics", "sketch_hll_distinct",
    "collect_list_per_group", "pivot_order_status", "zorder_orders",
    "salted_skew_join",
]
EVENT_QUERIES = [
    "latest_event_per_user", "sessionize_events", "tumbling_event_counts",
    "sliding_event_counts", "gapfill_daily", "asof_join_events",
    "session_window_counts", "event_funnel", "click_attribution",
    "json_props_extract", "regexp_extract_props",
]
EMBEDDING_QUERIES = [
    "ann_cosine_topk", "ann_lsh_bucketed", "ann_ivf_flat", "ann_ivf_lloyd",
    "dedup_embedding_cosine", "semdedup_clusters", "knn_label_vote",
    "embedding_quantize", "coreset_kcenter",
]


def build_fixture(out: str) -> None:
    con = duckdb.connect()
    con.execute(f"""
        COPY (
          SELECT * REPLACE (
            -- same-sign extremes only: mixed-sign 1e300 makes a raw double
            -- SUM order-dependent (catastrophic cancellation) in EVERY
            -- engine pair — pinned as a documented contract, not fixable
            CASE WHEN l_orderkey % 31 = 0 THEN 1e300
                 WHEN l_orderkey % 37 = 0 THEN 1e290
                 ELSE l_quantity END AS l_quantity,
            CASE WHEN l_orderkey % 41 = 0 THEN 'NaN'::DOUBLE
                 WHEN l_orderkey % 43 = 0 THEN 5e-324
                 ELSE l_extendedprice END AS l_extendedprice,
            CASE WHEN l_orderkey % 47 = 0 THEN -0.0
                 ELSE l_discount END AS l_discount
          ) FROM read_parquet('{SRC}/lineitem.parquet')
        ) TO '{out}/lineitem.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
          SELECT * REPLACE (
            CASE WHEN event_id % 17 = 0 THEN 'Infinity'::DOUBLE
                 WHEN event_id % 19 = 0 THEN '-Infinity'::DOUBLE
                 WHEN event_id % 23 = 0 THEN 'NaN'::DOUBLE
                 WHEN event_id % 29 = 0 THEN 1e308
                 ELSE value END AS value
          ) FROM read_parquet('{SRC}/events.parquet')
        ) TO '{out}/events.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
          SELECT * REPLACE (
            -- offsets keep vec_id 0 clean: poisoning the k-center seed
            -- just exercises the (already pinned) empty-selection path
            CASE WHEN vec_id % 13 = 5 THEN ['NaN'::FLOAT] || embedding[2:]
                 WHEN vec_id % 11 = 3 THEN ['Infinity'::FLOAT] || embedding[2:]
                 ELSE embedding END AS embedding
          ) FROM read_parquet('{SRC}/embeddings.parquet')
        ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
          SELECT * REPLACE (
            CASE WHEN o_orderkey % 53 = 0 THEN 'NaN'::DOUBLE
                 WHEN o_orderkey % 59 = 0 THEN 'Infinity'::DOUBLE
                 WHEN o_orderkey % 61 = 0 THEN -1e300
                 ELSE o_totalprice END AS o_totalprice
          ) FROM read_parquet('{SRC}/orders.parquet')
        ) TO '{out}/orders.parquet' (FORMAT PARQUET)
    """)
    for t in "region nation customer supplier part documents".split():
        os.symlink(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")


def main() -> None:
    out = tempfile.mkdtemp(prefix="extreme_")
    build_fixture(out)
    print("fixture:", out)

    from acuvate_spark.queries import REGISTRY
    from acuvate_spark.session import get_spark
    from tests.oracle_harness import compare, duck_con

    spark = get_spark(cpus=8)
    only = sys.argv[1:] or None
    names = only or (LINEITEM_QUERIES + EVENT_QUERIES + EMBEDDING_QUERIES)
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
