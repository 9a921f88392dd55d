"""Property tests for the non-SQL-expressible kernels (SURVEY §5:
geometry/graph operators get rows-only driver checks, so invariants
are asserted here)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from acuvate_spark.operators import multimodal
from acuvate_spark.operators.graph import connected_components
from acuvate_spark.queries import REGISTRY


def _iou(a, b):
    ix = max(0.0, min(a["x2"], b["x2"]) - max(a["x1"], b["x1"]))
    iy = max(0.0, min(a["y2"], b["y2"]) - max(a["y1"], b["y1"]))
    inter = ix * iy
    aa = (a["x2"] - a["x1"]) * (a["y2"] - a["y1"])
    ab = (b["x2"] - b["x1"]) * (b["y2"] - b["y1"])
    return inter / (aa + ab - inter) if aa + ab - inter > 0 else 0.0


def test_nms_output_is_conflict_free(spark, sf_dir):
    rows = REGISTRY["nms_detections"].fn(spark, sf_dir).collect()
    assert rows
    by_group: dict = {}
    for r in rows:
        by_group.setdefault((r["document_id"], r["cls"]), []).append(r)
    for group in by_group.values():
        for i, a in enumerate(group):
            for b in group[i + 1 :]:
                assert _iou(a, b) < 0.5, "kept boxes must not conflict"


def test_nms_keeps_max_conf_per_group(spark, sf_dir):
    det = REGISTRY["nms_detections"].fn(spark, sf_dir)
    # the highest-confidence detection of every (doc, cls) group always survives
    from acuvate_spark.tables import load_table

    from acuvate_spark.queries.synth import DETS_PER_DOC

    p = load_table(spark, sf_dir, "part")
    src = p.select(
        F.concat(
            F.lit("D"), F.expr(f"p_partkey div {DETS_PER_DOC}").cast("string")
        ).alias("document_id"),
        F.col("p_type").alias("cls"),
        F.round(F.col("p_retailprice") - 900.0, 2).alias("conf"),
    )
    max_conf = src.groupBy("document_id", "cls").agg(F.max("conf").alias("conf"))
    kept_max = det.join(max_conf, ["document_id", "cls", "conf"], "inner")
    assert kept_max.select("document_id", "cls").distinct().count() == max_conf.count()


def test_simhash_finds_planted_clones(spark, sf_dir):
    pairs = REGISTRY["dedup_simhash"].fn(spark, sf_dir).collect()
    clone_pairs = {(r["doc_a"], r["doc_b"]) for r in pairs if r["hamming"] == 0}
    # every planted clone (doc_id + 100000) must be found at hamming 0
    from acuvate_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    planted = {
        (r["doc_id"], r["doc_id"] + 100000)
        for r in docs.where(F.col("doc_id") % 50 == 0).select("doc_id").collect()
    }
    assert planted <= clone_pairs


def test_connected_components_fixpoint(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (3, 4)], "src long, dst long"
    )
    labels = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_multimodal_strict_decode_raises(spark, sf_dir):
    from acuvate_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents").limit(2)
    df = multimodal.decode_media(multimodal.attach_binary(d), strict=True)
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        df.collect()


def test_multimodal_feature_dim(spark, sf_dir):
    from acuvate_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents").limit(5)
    feats = multimodal.extract_features(multimodal.attach_binary(d)).collect()
    assert len(feats) == 5
    assert all(len(r["feature"]) == multimodal.FEATURE_DIM for r in feats)


def test_extract_segments_partitions_pixels(spark):
    from acuvate_spark.operators.kernels import extract_segments

    # two images: a horizontal stroke + a separate diagonal stroke, and
    # one image with a single long line
    rows = []
    rows += [(1, x, 5) for x in range(0, 30)]          # stroke A (30 px)
    rows += [(1, 50 + i, 50 + i) for i in range(12)]   # stroke B (12 px, diagonal)
    rows += [(2, x, 0) for x in range(0, 100)]         # one 100 px line
    pixels = spark.createDataFrame(rows, "image_id long, x int, y int")
    segs = extract_segments(pixels, downsample=10).collect()

    by_img = {}
    for r in segs:
        by_img.setdefault(r["image_id"], []).append(r)
    assert len(by_img[1]) == 2 and len(by_img[2]) == 1

    # polylines are downsampled but keep endpoints
    img2 = by_img[2][0]["points"]
    assert [0, 0] in [list(p) for p in img2] and [99, 0] in [list(p) for p in img2]
    assert len(img2) == 11  # 100 px / 10 + endpoint

    # 8-connectivity: the diagonal stroke is ONE segment
    diag = [s for s in by_img[1] if [50, 50] in [list(p) for p in s["points"]]]
    assert len(diag) == 1


def test_parallel_nms_is_conservative_subset_of_greedy(spark, sf_dir):
    """Parallel suppression kills a superset of greedy's kills (any
    dominated overlap suppresses, even by a box greedy discarded), so
    its kept set must be a subset of greedy's — and the per-group
    max-conf box survives both."""
    par = REGISTRY["nms_parallel"].fn(spark, sf_dir).toPandas()
    greedy = REGISTRY["nms_detections"].fn(spark, sf_dir).toPandas()
    key = ["document_id", "cls", "x1", "y1", "x2", "y2", "conf"]
    par_kept = {tuple(r) for r in par[~par.suppressed][key].itertuples(index=False)}
    greedy_kept = {tuple(r) for r in greedy.drop_duplicates()[key].itertuples(index=False)}
    assert par_kept <= greedy_kept
    top = par.sort_values("conf").groupby(["document_id", "cls"]).tail(1)
    assert not top.suppressed.any()


def test_connected_components_rounds_track_diameter_not_size(spark):
    """r03 stretch: label-propagation CC on a graph 30x larger than
    the fixture graphs must converge in rounds ~ diameter (the min
    label needs eccentricity(min-node) rounds to reach everyone), NOT
    rounds ~ node count. 2000 components x 10-node paths = 20k nodes,
    diameter 9: rounds must stay <= 12 regardless of graph size, and
    every path must collapse to its own min node id."""
    from acuvate_spark.operators.graph import connected_components
    from pyspark.sql import functions as F

    # component c occupies ids [100*c, 100*c+9] chained as a path;
    # build edges relationally (no driver-side 20k-row list)
    base = spark.range(2000).select(F.col("id").alias("c"))
    hops = base.select(
        "c", F.explode(F.sequence(F.lit(0), F.lit(8))).alias("i")
    )
    edges = hops.select(
        (F.col("c") * 100 + F.col("i")).alias("src"),
        (F.col("c") * 100 + F.col("i") + 1).alias("dst"),
    )
    rounds: list = []
    labels = connected_components(edges, max_iter=15, rounds_out=rounds)
    stats = labels.agg(
        F.count("*").alias("n"),
        F.countDistinct("component").alias("n_comp"),
        F.sum((F.col("component") != (F.floor(F.col("node") / 100) * 100)).cast("int")).alias(
            "mislabeled"
        ),
    ).collect()[0]
    assert stats["n"] == 20000
    assert stats["n_comp"] == 2000
    assert stats["mislabeled"] == 0
    # diameter 9 -> min label propagates 9 hops; +1 fixpoint-confirm round
    assert rounds[0] <= 12, f"rounds {rounds[0]} should track diameter (~10), not size"


def test_imageprocess_fixture_matches_kernels(spark):
    """The committed kernel-output fixtures behind imageprocess_tail
    must equal the LIVE kernel outputs at their pinned scale (sf0.01)
    — otherwise the hash-pinned tail would be verifying stale inputs.
    Regenerate with tools/make_imageprocess_fixture.py."""
    from acuvate_spark.queries.pid import (
        _IP_BOXES_FIX,
        _IP_SEGMENTS_FIX,
        _ip_boxes,
        _ip_segments,
    )
    from acuvate_spark.tables import load_table

    p = load_table(spark, "/root/testdata/sf0.01", "part")
    live_boxes = {tuple(r) for r in _ip_boxes(p).collect()}
    fix_boxes = {tuple(r) for r in spark.read.parquet(_IP_BOXES_FIX).collect()}
    assert live_boxes == fix_boxes and len(fix_boxes) > 100

    def seg_key(r):
        return (r["image_id"], r["segment_id"], tuple(map(tuple, r["points"])))

    live_segs = {seg_key(r) for r in _ip_segments(p).collect()}
    fix_segs = {seg_key(r) for r in spark.read.parquet(_IP_SEGMENTS_FIX).collect()}
    assert live_segs == fix_segs and len(fix_segs) > 10


def test_star_cc_matches_label_propagation(spark):
    """connected_components_star must produce exactly the min-label
    result on a multi-component graph with merging chains."""
    from acuvate_spark.operators.graph import connected_components_star

    hops = spark.range(30).select((F.col("id") * 1000).alias("c")).select(
        "c", F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i")
    )
    edges = hops.select(
        (F.col("c") + F.col("i")).alias("src"),
        (F.col("c") + F.col("i") + 1).alias("dst"),
    )
    expected = {
        (r["node"], r["component"])
        for r in connected_components(edges).collect()
    }
    got = {
        (r["node"], r["component"])
        for r in connected_components_star(edges).collect()
    }
    assert got == expected and len(got) == 30 * 8


def test_star_cc_rounds_are_logarithmic_on_long_chain(spark):
    """The 100 TB caveat the star variant exists for: a 1500-node
    chain has diameter 1499 — min-label would need ~1500 rounds —
    while large-star/small-star contracts it in O(log n) rounds and
    still labels every node with the chain min."""
    from acuvate_spark.operators.graph import connected_components_star

    n = 1500
    edges = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    rounds: list = []
    labels = connected_components_star(edges, rounds_out=rounds)
    stats = labels.agg(
        F.count("*").alias("n"),
        F.sum((F.col("component") != 0).cast("int")).alias("mislabeled"),
    ).collect()[0]
    assert stats["n"] == n and stats["mislabeled"] == 0
    # ~log2(1500) = 10.6; the two-phase bound is log^2 in theory but
    # ~log n observed — 2*log2(n) is a generous ceiling that a
    # diameter-bound algorithm (1499 rounds) can never meet
    assert rounds[0] <= 22, f"rounds {rounds[0]} should be ~log n, not diameter"


def test_star_cc_signature_collision_cannot_stop_early(spark, monkeypatch):
    """ADVICE r05: a 64-bit signature collision between DIFFERENT edge
    sets must not end contraction before fixpoint. Stub the signature
    to a constant — the worst case, every round 'collides' — and the
    exact set-equality confirm must keep the loop going until the edge
    set is genuinely stable, yielding exactly the min-label result."""
    from acuvate_spark.operators import graph as graph_mod

    monkeypatch.setattr(graph_mod, "_edge_signature", lambda df: (0, 0))
    hops = spark.range(8).select((F.col("id") * 100).alias("c")).select(
        "c", F.explode(F.sequence(F.lit(0), F.lit(5))).alias("i")
    )
    edges = hops.select(
        (F.col("c") + F.col("i")).alias("src"),
        (F.col("c") + F.col("i") + 1).alias("dst"),
    )
    got = {
        (r["node"], r["component"])
        for r in graph_mod.connected_components_star(edges).collect()
    }
    expected = {
        (r["node"], r["component"]) for r in connected_components(edges).collect()
    }
    assert got == expected and len(got) == 8 * 7


def test_nms_detections_matches_golden_fixture(spark):
    """VERDICT r05 item 3: the nms_detections registry query is
    rows-only at the driver (greedy NMS is inherently sequential per
    group, so no SQL oracle) — this golden pin makes a silent
    behavioral change in the NMS kernel fail even when row counts and
    property tests hold. Regenerate with
    tools/make_imageprocess_fixture.py."""
    import os

    from acuvate_spark.queries import REGISTRY
    from acuvate_spark.queries.pid import _IP_BOXES_FIX

    fix_path = os.path.join(os.path.dirname(_IP_BOXES_FIX), "nms_detections.parquet")
    live = {tuple(r) for r in REGISTRY["nms_detections"].fn(spark, "/root/testdata/sf0.01").collect()}
    fix = {tuple(r) for r in spark.read.parquet(fix_path).collect()}
    assert live == fix and len(fix) > 1000


def test_imageprocess_pipeline_equals_fixture_tail(spark):
    """The live end-to-end imageprocess_pipeline (kernels + tail in
    one lazy plan) must equal imageprocess_tail (the same tail over
    the committed kernel-output fixtures). Together with the fixture
    staleness test and the tail's DuckDB hash oracle, this closes the
    loop: pipeline == tail(fixtures), fixtures == live kernels, tail
    is oracle-hashed — no rows-only surface is left unpinned."""
    from acuvate_spark.queries import REGISTRY

    live = {
        tuple(r)
        for r in REGISTRY["imageprocess_pipeline"].fn(spark, "/root/testdata/sf0.01").collect()
    }
    tail = {
        tuple(r)
        for r in REGISTRY["imageprocess_tail"].fn(spark, "/root/testdata/sf0.01").collect()
    }
    assert live == tail and len(live) > 500


@pytest.mark.parametrize("shape", ["dispersed", "clustered", "mixed"])
def test_nms_grid_identical_to_linear_scan(spark, shape):
    """r12 kernel audit: the grid-prescreened NMS must keep EXACTLY the
    rows the linear-scan form keeps — the prescreen is a cost lever
    (dispersed 20k-box page: 9.0 s -> ~0.1 s per group), never a
    result lever. Dispersed = nothing suppresses (worst case for the
    scan); clustered = everything lands in few cells (worst case for
    the grid, degrades to the scan); mixed = both plus a HUGE box that
    inflates the cell size."""
    import numpy as np

    from acuvate_spark.operators import kernels

    rng = np.random.RandomState(11)
    n = 600
    if shape == "dispersed":
        xs, ys = rng.uniform(0, 2000, n), rng.uniform(0, 2000, n)
        w = np.ones(n)
    elif shape == "clustered":
        xs, ys = rng.uniform(0, 8, n), rng.uniform(0, 8, n)
        w = np.full(n, 5.0)
    else:
        xs, ys = rng.uniform(0, 200, n), rng.uniform(0, 200, n)
        w = rng.uniform(0.5, 8.0, n)
        w[0] = 150.0  # one huge box degrades the cell size
    rows = [
        (
            f"doc{i % 3}",
            f"c{i % 2}",
            float(xs[i]),
            float(ys[i]),
            float(xs[i] + w[i]),
            float(ys[i] + w[i]),
            round(float(rng.uniform(0, 1)), 6),
        )
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, kernels.NMS_SCHEMA)
    want = sorted(tuple(r) for r in kernels.nms(df).collect())
    got = sorted(tuple(r) for r in kernels.nms_grid(df).collect())
    assert len(want) > 0
    assert got == want


def test_ocr_words_stub_sparse_and_dense_paths_agree(spark):
    """r14: the OCR word-explosion kernel picks a row-loop or a numpy
    path per batch by token density (threshold: 8 tokens/page). Both
    paths must emit the identical word rows — pinned against a naive
    reference on one sparse batch (1 token/page, loop path) and one
    dense batch (40 tokens/page, numpy path), None text and 1-char
    no-polygon words included."""
    from acuvate_spark.operators.kernels import ocr_words_stub

    def reference(rows):
        out = []
        for page_id, text, fname in rows:
            toks = str(text).split() if text is not None else []
            for i, w in enumerate(toks):
                has_poly = len(w) >= 2
                out.append(
                    (
                        page_id,
                        i,
                        w,
                        float(10 * i) if has_poly else None,
                        float(page_id % 100) if has_poly else None,
                        fname,
                    )
                )
        return sorted(out)

    sparse = [(101, "(TAG-1)", "f1.pdf"), (102, None, "f2.pdf"), (103, "x", "f3.pdf")]
    dense = [
        (201, " ".join(f"w{i}" if i % 7 else "y" for i in range(40)), "g1.pdf"),
        (202, " ".join(f"t{i}" for i in range(40)), "g2.pdf"),
    ]
    for rows in (sparse, dense):
        pages = spark.createDataFrame(
            rows, "page_id long, content string, file_name string"
        ).coalesce(1)
        got = sorted(
            tuple(r) for r in ocr_words_stub(pages, passthrough=("file_name",)).collect()
        )
        assert got == reference(rows)
