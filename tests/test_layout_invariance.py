"""Physical-layout invariance: answers must not depend on parquet row
order, row-group boundaries, or the shuffle partition count.

At cluster scale all three are arbitrary, but the driver's gate always
sees the same canonical files, so a layout-sensitive query can ride
green indefinitely. The round-6 full-registry audit
(``tools/layout_invariance_audit.py``) caught exactly one: a float SUM
over money doubles is not associative, and ``pricing_summary``'s
``sum_charge`` flipped its last cent under a reshuffle. The fix — exact
per-row integer cents before the sum (``queries/core._cents``) — was
applied to the whole money-sum family; this test pins the family on a
reshuffled, re-grouped copy of sf0.001 at a non-default shuffle
partition count so the class cannot regress.
"""

from __future__ import annotations

import pytest

from acuvate_spark.queries import REGISTRY

from .oracle_harness import compare, duck_con

# Every query whose output includes a SUM/AVG over a double money/value
# column (the class fixed in round 6), plus the two grouping-set and
# pivot variants that aggregate the same columns.
MONEY_AGG_QUERIES = [
    "pricing_summary",
    "agg_order_stats",
    "event_funnel",
    "rollup_sales",
    "cube_order_year",
    "pivot_order_status",
    "price_equidepth_bins",
    "tumbling_event_counts",
    "sliding_event_counts",
    # exact already (integral quantities / longs), pinned as guards:
    "salted_agg_lineitem",
    "corpus_report_by_source",
]


@pytest.fixture(scope="module")
def shuffled_sf(sf_dir, tmp_path_factory):
    from tools.layout_invariance_audit import build_reshuffled

    dst = tmp_path_factory.mktemp("layout") / "sfshuf"
    build_reshuffled(sf_dir, str(dst), seed=13)
    return str(dst)


@pytest.mark.parametrize("name", MONEY_AGG_QUERIES)
def test_layout_invariant_vs_oracle(spark, shuffled_sf, name):
    spec = REGISTRY[name]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "5")
    try:
        spark_pdf = spec.fn(spark, shuffled_sf).toPandas()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    con = duck_con(shuffled_sf)
    oracle_pdf = con.execute(spec.oracle).fetchdf()
    con.close()
    problems = compare(spark_pdf, oracle_pdf, name)
    assert not problems, "\n".join(problems)


# --- Session-timezone invariance ------------------------------------
#
# ``spark.sql.session.timeZone`` varies across real clusters (and
# between a cluster and the notebook that reads its output). Every
# registry query keeps time as epoch numbers, DATE values, or
# formatted strings — none leaks a session-local rendering — so the
# answers must be bit-identical under any session timezone. The
# round-8 full-registry audit (``layout_invariance_audit.py --conf
# spark.sql.session.timeZone=America/New_York``) passed 134/134; this
# pins the time-heavy subset so the class cannot regress.
TIME_SENSITIVE_QUERIES = [
    "date_functions",
    "gapfill_daily",
    "scd2_history",
    "sessionize_events",
    "tumbling_event_counts",
    "sliding_event_counts",
    "session_window_counts",
    "click_attribution",
    "asof_join_events",
    "latest_event_per_user",
]


@pytest.mark.parametrize("name", TIME_SENSITIVE_QUERIES)
def test_session_timezone_invariant(spark, sf_dir, name):
    from .oracle_harness import canon

    spec = REGISTRY[name]
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        utc_pdf = spec.fn(spark, sf_dir).toPandas()
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        ny_pdf = spec.fn(spark, sf_dir).toPandas()
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    assert canon(utc_pdf) == canon(ny_pdf), f"{name}: session timezone leaked into results"


# --- AQE on/off invariance -------------------------------------------
#
# Adaptive execution re-plans joins and coalesces partitions at
# runtime; a query whose answer depends on it (e.g. one that snuck
# order- or partition-count-sensitive logic past the layout sweep)
# would break on any cluster with a different AQE policy. The round-8
# full-registry audit with ``spark.sql.adaptive.enabled=false`` passed
# 134/134; this pins the join/skew-heavy subset.
AQE_SENSITIVE_QUERIES = [
    "salted_skew_join",
    "salted_agg_lineitem",
    "fuzzy_match_blocked",
    "dedup_minhash_lsh",
    "top_orders",
]


@pytest.mark.parametrize("name", AQE_SENSITIVE_QUERIES)
def test_aqe_off_matches_oracle(spark, sf_dir, name):
    spec = REGISTRY[name]
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        spark_pdf = spec.fn(spark, sf_dir).toPandas()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)
    con = duck_con(sf_dir)
    oracle_pdf = con.execute(spec.oracle).fetchdf()
    con.close()
    problems = compare(spark_pdf, oracle_pdf, name)
    assert not problems, "\n".join(problems)
