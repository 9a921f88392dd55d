"""Empty-input robustness: at 100 TB a filter or partition that
matches nothing is routine, so every operator must handle 0-row
tables — no crashes, and agreement with the ANSI oracle where one
exists.

The round-8 full-registry sweep over a schema-correct 0-row table set
(``layout_invariance_audit.py --sf-dir <empty>``) found three real
defects, all fixed and pinned here:

* ``coreset_kcenter`` crashed (``.first()[0]`` on a missing seed);
  now returns the empty selection, with the oracle EXISTS-guarded to
  match.
* ``cube_order_year`` / ``rollup_sales``: Spark's Expand-based
  CUBE/ROLLUP emits ZERO rows on empty input where ANSI (and DuckDB)
  emit the () grouping-set grand-total row (count 0, sums NULL) —
  appended via ``core._with_ansi_empty_grand_total``, an input-side
  1-row count guard (r09 removed the r08 localCheckpoint form, which
  cost an eager materialization job; the grouped frame is now
  single-consumer and the guard is a column-pruned map-side count).

The parametrized subset keeps suite time bounded; the full-registry
sweep is the per-round audit tool run.
"""

from __future__ import annotations

import pytest

from acuvate_spark.queries import REGISTRY

from .oracle_harness import compare, duck_con

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# The three fixed queries plus one representative per major shape:
# global agg, windowed agg, join, iterative graph, LSH dedup, sketch,
# grouping sets, streaming batch twin, multimodal kernel feed.
EMPTY_PINNED = [
    "coreset_kcenter",
    "cube_order_year",
    "rollup_sales",
    "agg_order_stats",
    "running_totals",
    "lookup_first_match",
    "graph_connected_components",
    "dedup_minhash_lsh",
    "sketch_hll_distinct",
    "pivot_order_status",
    "tumbling_event_counts",
    "nms_detections",
]


@pytest.fixture(scope="module")
def empty_sf(sf_dir, tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    dst = tmp_path_factory.mktemp("empty") / "sf0"
    dst.mkdir()
    for t in TABLES:
        schema = pq.read_schema(f"{sf_dir}/{t}.parquet")
        pq.write_table(
            pa.table({f.name: pa.array([], type=f.type) for f in schema}, schema=schema),
            str(dst / f"{t}.parquet"),
        )
    return str(dst)


@pytest.mark.parametrize("name", EMPTY_PINNED)
def test_empty_input(spark, empty_sf, name):
    spec = REGISTRY[name]
    spark_pdf = spec.fn(spark, empty_sf).toPandas()  # must not crash
    if spec.oracle is None:
        assert len(spark_pdf.columns) > 0
        return
    con = duck_con(empty_sf)
    oracle_pdf = con.execute(spec.oracle).fetchdf()
    con.close()
    problems = compare(spark_pdf, oracle_pdf, name)
    assert not problems, "\n".join(problems)
