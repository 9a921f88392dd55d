"""Semantic property tests for the round-4 training-pipeline
operators — invariants the value-hash oracle implies but doesn't
STATE (the oracle would agree with a shared bug; these pin the
intended semantics independently).
"""

from __future__ import annotations

from acuvate_spark.queries import REGISTRY


def test_token_budget_mix_selects_budget_bounded_prefix(spark, sf_dir):
    from acuvate_spark.queries.training import _TOKEN_BUDGETS

    rows = REGISTRY["token_budget_mix"].fn(spark, sf_dir).collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    for source, rs in by_source.items():
        budget = _TOKEN_BUDGETS[source]
        # selection rule is exactly "tokens before me under budget"
        for r in rs:
            assert r.selected == (r.cum_before < budget)
        sel = [r for r in rs if r.selected]
        assert sel, f"{source} selected nothing"
        total = sum(r.n_tokens for r in sel)
        # overshoot is bounded by one document
        assert total < budget + max(r.n_tokens for r in sel)


def test_span_removal_bounds_and_internal_consistency(spark, sf_dir):
    import hashlib

    rows = REGISTRY["dedup_span_removal"].fn(spark, sf_dir).collect()
    empty_md5 = hashlib.md5(b"").hexdigest()
    clones = [r for r in rows if r.doc_id >= 100000]
    assert clones, "planted clones missing from span-removal output"
    for r in rows:
        assert 0 <= r.n_kept <= r.n_words
        # empty reassembly <=> md5('')
        assert (r.n_kept == 0) == (r.clean_md5 == empty_md5)
    # clone docs duplicate an entire original => every span is non-first
    assert all(r.n_kept == 0 for r in clones)


def test_mlm_span_mask_span_accounting(spark, sf_dir):
    rows = REGISTRY["mlm_span_mask"].fn(spark, sf_dir).collect()
    masked_any = 0
    for r in rows:
        assert 0 <= r.n_masked <= r.n_words
        assert 0 <= r.n_spans <= r.n_masked  # spans merge >=1 position each
        assert (r.n_spans == 0) == (r.n_masked == 0)
        masked_any += r.n_masked
    assert masked_any > 0


def test_coreset_kcenter_distances_monotone_nonincreasing(spark, sf_dir):
    """Greedy max-min selection: each round's selection distance can
    never exceed the previous round's (the selected point was in the
    previous round's candidate pool)."""
    rows = sorted(
        REGISTRY["coreset_kcenter"].fn(spark, sf_dir).collect(),
        key=lambda r: r.sel_rank,
    )
    assert [r.sel_rank for r in rows] == list(range(1, len(rows) + 1))
    dists = [r.dist_micro for r in rows[1:]]  # rank 1 is the seed (0)
    assert all(a >= b for a, b in zip(dists, dists[1:]))
    assert len({r.vec_id for r in rows}) == len(rows), "centers must be distinct"


def test_knn_label_vote_votes_bounded_by_k(spark, sf_dir):
    from acuvate_spark.queries.similarity import _KNN_K

    rows = REGISTRY["knn_label_vote"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_votes <= _KNN_K
        assert r.correct == (r.pred_label == r.true_label)
