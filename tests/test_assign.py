"""The broadcast/shuffled nearest-centroid assign swap (VERDICT r08
item 1): ``operators.assign.nearest_centroids`` must produce
IDENTICAL rows from either physical strategy, and the shuffled
strategy's plan must contain no K-row broadcast nested loop — its
only nested loops are the two 1-row array attaches, and the exact
compare is an equi-join on the cell id.
"""

from __future__ import annotations

import contextlib

import pytest
from pyspark.sql import functions as F

from acuvate_spark.operators import assign
from acuvate_spark.queries import REGISTRY
from acuvate_spark.tables import load_table


@contextlib.contextmanager
def _mode(spark, mode):
    spark.conf.set(assign._MODE_CONF, mode)
    try:
        yield
    finally:
        spark.conf.unset(assign._MODE_CONF)


def _frames(spark, sf_dir, k):
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cent = e.orderBy("vec_id").limit(k).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("ce")
    )
    return e, cent


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("k,n_best", [(16, 1), (16, 2), (50, 3), (3, 2)])
def test_shuffled_assign_identical_to_broadcast(spark, sf_dir, k, n_best):
    e, cent = _frames(spark, sf_dir, k)
    with _mode(spark, "broadcast"):
        b = _rows(assign.nearest_centroids(e, cent, k_hint=k, n_best=n_best))
    with _mode(spark, "shuffled"):
        s = _rows(assign.nearest_centroids(e, cent, k_hint=k, n_best=n_best))
    assert len(b) > 0
    assert b == s


def test_shuffled_assign_empty_centroids_matches_broadcast(spark, sf_dir):
    e, cent = _frames(spark, sf_dir, 5)
    empty_cent = cent.limit(0)
    with _mode(spark, "shuffled"):
        assert assign.nearest_centroids(e, empty_cent, k_hint=0).count() == 0
    empty_vec = e.limit(0)
    with _mode(spark, "shuffled"):
        assert assign.nearest_centroids(empty_vec, cent, k_hint=5).count() == 0


@pytest.mark.parametrize("name", ["semdedup_clusters", "ann_ivf_flat", "ann_ivf_lloyd"])
def test_swapped_queries_identical_on_fixture(spark, sf_dir, name):
    """End-to-end: the three assign-pass consumers return identical
    result sets under either strategy (the VERDICT's done-condition
    for the swap)."""
    with _mode(spark, "broadcast"):
        b = _rows(REGISTRY[name].fn(spark, sf_dir))
    with _mode(spark, "shuffled"):
        s = _rows(REGISTRY[name].fn(spark, sf_dir))
    assert len(b) > 0
    assert b == s


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _node_count(plan: str, name: str) -> int:
    """Count physical nodes by their detail-section header — the tree
    rendering repeats each node name once more."""
    import re

    return len(re.findall(rf"^\(\d+\) {name}", plan, re.M))


def test_shuffled_plan_has_no_krow_broadcast_nested_loop(spark, sf_dir):
    """Plan pin: in shuffled mode the ONLY BroadcastNestedLoopJoins
    are the 1-row collect_list array attaches — the supers attach
    (appearing twice: the member-assign subtree feeds both the radius
    aggregate and the probe join, a documented recompute) and the
    cells attach. The K-row centroid frame itself never rides a
    nested loop, and the exact compare is an equi-join (hash or
    sort-merge) on the cell id. In broadcast mode the single nested
    loop IS the K-row cross — the shape the swap removes."""
    e, cent = _frames(spark, sf_dir, 16)
    with _mode(spark, "shuffled"):
        plan = _plan(assign.nearest_centroids(e, cent, k_hint=16))
    assert "CartesianProduct" not in plan
    assert _node_count(plan, "BroadcastNestedLoopJoin") == 3
    # both nested-loop build sides are the 1-row collect_list frames
    assert plan.count("collect_list") >= 2
    # the exact compare reaches the corpus through an equi-join
    assert any(
        m in plan for m in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    )
    with _mode(spark, "broadcast"):
        bplan = _plan(assign.nearest_centroids(e, cent, k_hint=16))
    assert _node_count(bplan, "BroadcastNestedLoopJoin") == 1


def test_auto_mode_threshold(spark, sf_dir):
    e, cent = _frames(spark, sf_dir, 4)
    plan_small = _plan(assign.nearest_centroids(e, cent, k_hint=4))
    # k_hint <= threshold: broadcast shape (one K-row nested loop)
    assert _node_count(plan_small, "BroadcastNestedLoopJoin") == 1
    plan_mid = _plan(
        assign.nearest_centroids(e, cent, k_hint=assign.AUTO_SHUFFLE_MIN_K)
    )
    # at the crossover: still broadcast
    assert _node_count(plan_mid, "BroadcastNestedLoopJoin") == 1
    plan_big = _plan(
        assign.nearest_centroids(e, cent, k_hint=assign.AUTO_SHUFFLE_MIN_K + 1)
    )
    # past the measured crossover (r10): shuffled shape
    assert _node_count(plan_big, "BroadcastNestedLoopJoin") == 3


def test_shuffled_assign_on_skewed_corpus_matches_broadcast(spark, sf_dir):
    """VERDICT r09 item 6 (skew audit): candidate cells inherit the
    centroid distribution, so a lumpy corpus concentrates probes in
    few cells. Correctness half of the audit: a corpus where ~80% of
    vectors are one tight cluster (exact duplicates of a single
    direction — the worst case, every probe hits ONE cell) must still
    produce rows identical to the broadcast form. The throughput half
    is measured by tools/assign_skew_check.py (SCALING.md)."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dom = (
        e.orderBy("vec_id")
        .limit(1)
        .select(
            F.explode(F.sequence(F.lit(500_000), F.lit(502_000))).alias("vec_id"),
            "embedding",
        )
    )
    skewed = e.unionByName(dom)
    cent = skewed.orderBy("vec_id").limit(50).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("ce")
    )
    with _mode(spark, "broadcast"):
        b = _rows(assign.nearest_centroids(skewed, cent, k_hint=50, n_best=2))
    with _mode(spark, "shuffled"):
        s = _rows(assign.nearest_centroids(skewed, cent, k_hint=50, n_best=2))
    assert len(b) > 0
    assert b == s
