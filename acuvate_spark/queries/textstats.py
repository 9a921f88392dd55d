"""Text-analysis queries over ``documents`` — the per-document text
pipeline a training-data engine runs at 100 TB (language ID, quality
scoring, token counting, fingerprinting). All narrow, shuffle-free
column expressions from ``functions.textual``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import textual
from ..tables import load_table
from .registry import register


@register(
    "token_stats",
    oracle=f"""
SELECT doc_id,
       len(regexp_split_to_array(trim(text), '\\s+')) AS n_words,
       {textual.token_count_sql('text')} AS n_tokens,
       length(text) AS n_chars_actual
FROM documents
""",
    survey_ref="training-data: token counting",
)
def token_stats(spark, sf_dir):
    """Whitespace word count + BPE-ish regex token count per doc."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        textual.word_count(F.col("text")).cast("long").alias("n_words"),
        textual.token_count(F.col("text")).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_actual"),
    )


@register(
    "quality_scores",
    oracle=f"""
SELECT doc_id, source,
       {textual.punct_ratio_sql('text')} AS punct_ratio,
       {textual.stopword_ratio_sql('text')} AS stopword_ratio,
       {textual.quality_score_sql('text')} AS quality
FROM documents
""",
    survey_ref="training-data: quality scoring",
)
def quality_scores(spark, sf_dir):
    """Length/punctuation/stopword quality heuristic per document.
    Ratios are unrounded: both engines divide the same exact integers,
    so the doubles are bit-identical; the composite score is integer
    points (see functions.textual.quality_score)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "source",
        textual.punct_ratio(F.col("text")).alias("punct_ratio"),
        textual.stopword_ratio(F.col("text")).alias("stopword_ratio"),
        textual.quality_score(F.col("text")).alias("quality"),
    )


@register(
    "lang_id_heuristic",
    oracle=f"""
SELECT doc_id, lang AS labeled_lang,
       {textual.lang_id_sql('text')} AS predicted_lang
FROM documents
""",
    survey_ref="training-data: language ID",
)
def lang_id_heuristic(spark, sf_dir):
    """Marker-word language identification vs the labeled lang col."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        textual.lang_id(F.col("text")).alias("predicted_lang"),
    )


@register(
    "doc_fingerprints",
    oracle=f"""
SELECT doc_id, {textual.fingerprint_sql('text')} AS fingerprint,
       len(list_distinct(regexp_split_to_array(trim(lower(text)), '\\s+'))) AS n_distinct_words
FROM documents
""",
    survey_ref="training-data: document fingerprinting; A8",
)
def doc_fingerprints(spark, sf_dir):
    """Order-insensitive content fingerprint (md5 of sorted word set)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        textual.fingerprint(F.col("text")).alias("fingerprint"),
        F.size(F.array_distinct(textual.words(F.lower(F.col("text")))))
        .cast("long")
        .alias("n_distinct_words"),
    )
