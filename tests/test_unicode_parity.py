"""Unicode-corpus oracle parity (r13 ring #6): the driver corpora are
ASCII-heavy, but 100 TB of web text is not — Java (Spark) and DuckDB
regex/case semantics could diverge silently on exactly the text the
engine exists to process. This sweep runs the text-query family on a
corpus built from the hazards: NBSP (U+00A0), ideographic space
(U+3000), zero-width space (U+200B — NOT whitespace, must join),
CJK with no spaces, emoji + ZWJ sequences, combining vs precomposed
accents, RTL runs, and literal tab/newline/CR.

Probe result (r13): every hazard AGREES between engines — both treat
``\\s`` as Unicode whitespace (U+3000 splits, U+200B does not) — with
ONE documented divergence: ``lower('İ')`` (U+0130, Turkish dotted
capital I). Java follows the Unicode spec (İ -> i + combining dot
U+0307, two codepoints); DuckDB folds to plain ``i``. Neither is a
plan bug — the Spark side is the per-spec behavior — so the sweep
corpus excludes İ and a dedicated test pins the divergence itself so
it stays known instead of resurfacing as a mystery hash mismatch.
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from acuvate_spark.queries import REGISTRY

from .oracle_harness import compare, duck_con

TEXTS = [
    (0, "hello world plain nbsp", "web"),
    (1, "ideographic　space test", "web"),
    (2, "café CAFÉ straße words", "web"),
    (3, "emoji \U0001f600 test \U0001f44d\U0001f3fd zwj "
        "\U0001f469‍\U0001f469‍\U0001f467", "web"),
    (4, "中文文本没有空格。"
        "第二句话。", "cjk"),
    (5, "mixed 中文 and english words", "cjk"),
    (6, "rtl العربية end", "web"),
    (7, "combining á vs precomposed á", "web"),
    (8, "tab\tand\nnewline\rand cr", "web"),
    (9, "zero​width​space joined", "web"),
]

TEXT_QUERIES = [
    "token_stats", "quality_scores", "lang_id_heuristic", "doc_fingerprints",
    "dedup_exact", "line_dedup_docs", "repeated_ngram_spans", "tfidf_top_terms",
    "inverted_index", "chunk_documents", "heavy_hitters", "redact_pii",
    "ngram_lm_counts", "bpe_pair_counts", "rarity_score", "length_quartiles",
    "repetition_metrics", "unigram_logprob_score", "corpus_report_by_source",
    "hashed_text_classifier", "mlm_span_mask", "dedup_span_removal",
    "contamination_check", "contamination_substring", "dedup_simhash",
    "dedup_minhash_lsh", "dedup_ngram_jaccard",
]


@pytest.fixture(scope="module")
def uni_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("uni"))
    pdf = pd.DataFrame(
        {
            "doc_id": [t[0] for t in TEXTS],
            "text": [t[1] for t in TEXTS],
            "source": [t[2] for t in TEXTS],
        }
    )
    real = duckdb.connect().execute(
        "select * from read_parquet('/root/testdata/sf0.001/documents.parquet') limit 1"
    ).fetchdf()
    for c in real.columns:
        if c not in pdf.columns:
            pdf[c] = real[c].iloc[0]
    pdf[real.columns].to_parquet(f"{out}/documents.parquet", index=False)
    for t in (
        "region nation customer supplier part orders lineitem events embeddings"
    ).split():
        os.symlink(f"/root/testdata/sf0.001/{t}.parquet", f"{out}/{t}.parquet")
    return out


@pytest.mark.parametrize("name", TEXT_QUERIES)
def test_text_family_agrees_on_unicode_corpus(spark, uni_dir, name):
    spec = REGISTRY[name]
    sp = spec.fn(spark, uni_dir).toPandas()
    spark.catalog.clearCache()
    if spec.oracle is None:
        assert len(sp) >= 0  # rows-only query: must at least evaluate
        return
    du = duck_con(uni_dir).execute(spec.oracle).fetchdf()
    assert not compare(sp, du, name)


def test_dotted_capital_i_divergence_is_the_known_one(spark):
    """Pin the single known lower() divergence so a future engine
    upgrade changing EITHER side surfaces here, with context, instead
    of as an anonymous hash mismatch in a driver round."""
    got = spark.sql("select lower('İ') as l").collect()[0]["l"]
    assert got == "i̇"  # Java: Unicode-spec two-codepoint lowering
    duck = duckdb.connect().execute("select lower('İ')").fetchone()[0]
    assert duck == "i"  # DuckDB: simple fold
    assert got != duck
