"""Null-dense corpus parity (r13 ring #7): null CELLS (text,
embedding), not empty tables — the empty-input sweep covers those.
At web scale both happen: extraction failures leave null text,
embedding-service failures leave null vectors.

What the probe found (r13), all fixed:

* null ``embedding`` rows CRASHED the blas hot-bucket kernel and the
  coreset kernel (``None`` is not a float array), silently skewed
  ann_ivf_lloyd's k-means trajectory, and rendered as '' vs NULL in
  embedding_quantize. Contract now: a null embedding carries nothing
  to index/search/cluster — ``tables.load_embeddings`` excludes them
  at the scan (pushed IsNotNull) and every family oracle shadows the
  view with the same filter.
* ``stratified_sample`` ordered by ``md5('smpl|' || text)``, which is
  NULL for null text — and the engines disagree on NULL sort position
  (Spark NULLS FIRST asc, DuckDB NULLS LAST), so the SAMPLES silently
  differed. The key now coalesces to '' (defined, engine-agnostic).
"""

from __future__ import annotations

import os

import duckdb
import pytest

from acuvate_spark.queries import REGISTRY

from .oracle_harness import compare, duck_con

TEXT_QUERIES = [
    "token_stats", "quality_scores", "lang_id_heuristic", "doc_fingerprints",
    "dedup_exact", "line_dedup_docs", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "tfidf_top_terms", "inverted_index", "chunk_documents", "heavy_hitters",
    "redact_pii", "ngram_lm_counts", "bpe_pair_counts", "rarity_score",
    "length_quartiles", "repetition_metrics", "unigram_logprob_score",
    "corpus_report_by_source", "hashed_text_classifier", "mlm_span_mask",
    "dedup_span_removal", "repeated_ngram_spans", "contamination_check",
    "contamination_substring", "dedup_simhash", "length_outlier_trim",
    "quality_weighted_sample", "stratified_sample", "train_test_split",
    "token_budget_mix", "pack_sequences",
]
EMBEDDING_QUERIES = [
    "ann_cosine_topk", "ann_lsh_bucketed", "ann_ivf_flat", "ann_ivf_lloyd",
    "dedup_embedding_cosine", "semdedup_clusters", "knn_label_vote",
    "embedding_quantize", "coreset_kcenter",
]


@pytest.fixture(scope="module")
def null_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("nulls"))
    con = duckdb.connect()
    docs = con.execute(
        "select * from read_parquet('/root/testdata/sf0.001/documents.parquet')"
    ).fetchdf()
    docs.loc[docs.index % 7 == 0, "text"] = None
    docs.loc[docs.index % 11 == 0, "text"] = ""
    if len(docs) > 3:
        docs.loc[3, "text"] = "   "
    docs.to_parquet(f"{out}/documents.parquet", index=False)
    emb = con.execute(
        "select * from read_parquet('/root/testdata/sf0.001/embeddings.parquet')"
    ).fetchdf()
    emb.loc[emb.index % 9 == 0, "embedding"] = None
    emb.to_parquet(f"{out}/embeddings.parquet", index=False)
    for t in "region nation customer supplier part orders lineitem events".split():
        os.symlink(f"/root/testdata/sf0.001/{t}.parquet", f"{out}/{t}.parquet")
    return out


@pytest.mark.parametrize("name", TEXT_QUERIES + EMBEDDING_QUERIES)
def test_family_agrees_on_null_dense_corpus(spark, null_dir, name):
    spec = REGISTRY[name]
    sp = spec.fn(spark, null_dir).toPandas()
    spark.catalog.clearCache()
    if spec.oracle is None:
        return  # rows-only query: evaluating without a crash IS the test
    du = duck_con(null_dir).execute(spec.oracle).fetchdf()
    assert not compare(sp, du, name)
