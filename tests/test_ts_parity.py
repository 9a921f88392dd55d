"""Timestamp-extreme parity ring (r14 ring #9): calendar edge cells —
the epoch, a leap day, a DST-gap instant, the int64-nanosecond window
edges (1677-09-22 / 2262-04-10), and the 1752 calendar-switch date —
injected into events.ts / orders.o_orderdate / lineitem.l_shipdate,
with the ALL-AGREE contract over every timestamp-consuming family.

Probe outcome (tools/ts_extreme_probe.py): the ENGINES already agree
on every case — both use the proleptic Gregorian calendar over
microsecond instants — so this ring pins guarantees rather than fixes
(zero code changes, zero version bumps). Two boundaries it documents:

* The Arrow/pandas bridge, NOT the engine, rejects instants outside
  the int64-ns window [1677-09-21, 2262-04-11]: a year-0001 cell
  computes fine (year-level aggregates over 0001/9999 inputs agreed
  in a one-off probe run) but dies in toPandas()/fetchdf() — and a
  DERIVED instant can leave the window even when inputs are inside
  (date_trunc('year', 1677-09-22) -> 1677-01-01 crashed the bridge).
  Collection-side consumers of raw-timestamp columns inherit that
  window; year/day-level aggregates do not.
* gapfill_daily densifies each user's [min_day, max_day]: ONE
  poisoned 1677 cell explodes that user's grid to ~213k rows (both
  engines agree — and both pay it). Resample span is a data-quality
  invariant the pipeline must validate upstream; the ring pins the
  agreement at one exploded user (~500k total rows), not the guard.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

from acuvate_spark.queries import REGISTRY

from .oracle_harness import compare, duck_con

ROOT = Path(__file__).resolve().parent.parent

TS_QUERIES = [
    "latest_event_per_user", "sessionize_events", "tumbling_event_counts",
    "sliding_event_counts", "asof_join_events", "session_window_counts",
    "event_funnel", "click_attribution", "gapfill_daily",
    "date_functions", "scd2_history", "running_totals", "cube_order_year",
    "pivot_order_status", "zorder_orders", "top_orders", "getdata_keyset",
    "pricing_summary", "upsert_orders", "soft_delete_users",
]


@pytest.fixture(scope="module")
def ts_dir(tmp_path_factory):
    sys.path.insert(0, str(ROOT / "tools"))
    import ts_extreme_probe as probe

    return probe.build_fixture(str(tmp_path_factory.mktemp("tsx")))


@pytest.mark.parametrize("name", TS_QUERIES)
def test_family_agrees_on_calendar_edges(spark, ts_dir, name):
    spec = REGISTRY[name]
    sp = spec.fn(spark, ts_dir).toPandas()
    spark.catalog.clearCache()
    if spec.oracle is None:
        return
    du = duck_con(ts_dir).execute(spec.oracle).fetchdf()
    assert not compare(sp, du, name)


def test_gapfill_span_explosion_is_shared_and_bounded(spark, ts_dir):
    """The single 1677 event cell explodes exactly its user's grid;
    the two engines agree on the exploded result. Pins the magnitude
    so a future fixture edit cannot silently stop exercising it."""
    spec = REGISTRY["gapfill_daily"]
    sp = spec.fn(spark, ts_dir).toPandas()
    spark.catalog.clearCache()
    assert len(sp) > 100_000  # one user's span reaches back to 1677
    du = duck_con(ts_dir).execute(spec.oracle).fetchdf()
    assert not compare(sp, du, "gapfill_daily")
