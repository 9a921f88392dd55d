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
