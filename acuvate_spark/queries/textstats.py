"""Text-analysis queries over ``documents`` — the per-document text
pipeline a training-data engine runs at 100 TB (language ID, quality
scoring, token counting, fingerprinting). All narrow, shuffle-free
column expressions from ``functions.textual``.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

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


@register(
    "curation_pipeline",
    oracle=f"""
WITH docs AS (
  SELECT doc_id, text, source FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text, source FROM documents WHERE doc_id % 50 = 0
),
hashed AS (
  SELECT doc_id, text, md5(lower(trim(text))) AS content_hash FROM docs
),
canon AS (
  SELECT doc_id, text,
         doc_id = min(doc_id) OVER (PARTITION BY content_hash) AS is_canonical
  FROM hashed
),
scored AS (
  SELECT doc_id, is_canonical,
         {textual.lang_id_sql('text')} AS predicted_lang,
         {textual.token_count_sql('text')} AS n_tokens,
         {textual.quality_score_sql('text')} AS quality
  FROM canon
)
SELECT doc_id, predicted_lang, CAST(n_tokens AS BIGINT) AS n_tokens, quality,
       is_canonical,
       (is_canonical AND n_tokens >= 10 AND quality >= 450
        AND predicted_lang = 'en') AS keep
FROM scored
""",
    survey_ref="training-data: end-to-end curation trace (dedup + lang + quality gate)",
)
def curation_pipeline(spark, sf_dir):
    """End-to-end curation decision table — the composed pass a
    training-data pipeline runs per corpus snapshot: exact-dedup
    canonicalization (md5 window, the cheap first stage every corpus
    pass starts with), language ID, token gate, quality gate, one
    ``keep`` verdict per document with the full reasoning trace kept
    as columns (auditable filtering, not silent drops). Everything is
    narrow expressions plus ONE window over content_hash — at 100 TB
    this is a single shuffle on a 32-byte key, then map-only."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    clones = docs.where(F.col("doc_id") % 50 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(100000)
    )
    d = docs.unionByName(clones)
    w = Window.partitionBy(F.md5(F.lower(F.trim(F.col("text")))))
    scored = d.select(
        "doc_id",
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("is_canonical"),
        textual.lang_id(F.col("text")).alias("predicted_lang"),
        textual.token_count(F.col("text")).cast("long").alias("n_tokens"),
        textual.quality_score(F.col("text")).alias("quality"),
    )
    keep = (
        F.col("is_canonical")
        & (F.col("n_tokens") >= 10)
        & (F.col("quality") >= 450)
        & (F.col("predicted_lang") == "en")
    )
    return scored.select(
        "doc_id", "predicted_lang", "n_tokens", "quality", "is_canonical", keep.alias("keep")
    )


@register(
    "stratified_sample",
    oracle="""
WITH ranked AS (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5('smpl|' || coalesce(text, '')), doc_id) AS sample_rank
  FROM documents
)
SELECT source, doc_id, sample_rank FROM ranked WHERE sample_rank <= 50
""",
    survey_ref="training-data: deterministic stratified sampling (dataset mixing)",
)
def stratified_sample(spark, sf_dir):
    """Deterministic k-per-stratum sample — the dataset-mixing
    primitive (k docs per source, selection order = md5 of the text,
    so the sample is reproducible across runs and engines with no RNG
    state). One shuffle on the stratum key. For proportional sampling
    at 100 TB the shuffle disappears entirely: filter on a hash-prefix
    threshold (md5 < rate) is map-only and needs no window; the
    rank-based form here is for exact-k quotas.

    The sort key coalesces NULL text to '' (r13 null-corpus audit):
    ``md5('smpl|' || text)`` is NULL for NULL text, and the engines
    disagree on NULL sort position (Spark NULLS FIRST asc, DuckDB
    NULLS LAST) — the coalesce gives null-text rows a defined,
    engine-agnostic place in the sample order instead of silently
    different samples."""
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.concat(F.lit("smpl|"), F.coalesce(F.col("text"), F.lit("")))),
        "doc_id",
    )
    return (
        d.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .where(F.col("sample_rank") <= 50)
        .select("source", "doc_id", "sample_rank")
    )


@register(
    "heavy_hitters",
    oracle="""
WITH words AS (
  SELECT lower(unnest(regexp_split_to_array(trim(text), '\\s+'))) AS word
  FROM documents
),
counts AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS n
  FROM words WHERE word <> '' GROUP BY word
),
ranked AS (
  SELECT word, n, row_number() OVER (ORDER BY n DESC, word) AS rank
  FROM counts
)
SELECT CAST(rank AS BIGINT) AS rank, word, n FROM ranked WHERE rank <= 25
""",
    survey_ref="training-data: vocabulary heavy hitters (exact top-k)",
)
def heavy_hitters(spark, sf_dir):
    """Exact corpus-wide top-25 most frequent words — the vocabulary /
    stopword-discovery pass of a training-data pipeline. The canonical
    map-reduce: tokenize narrow, groupBy word with map-side partial
    counts (the only shuffle moves (word, partial_count) pairs, never
    text), then a global top-k. The top-k is orderBy+limit, which
    Spark plans as TakeOrderedAndProject — each partition keeps only
    its local top 25 and the driver merges heaps, so no single-
    partition global sort exists at any scale. Ties break on the word
    itself so both engines rank identically."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("raw")
    ).select(F.lower(F.col("raw")).alias("word"))
    counts = (
        words.where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("n"))
    )
    top = counts.orderBy(F.col("n").desc(), "word").limit(25)
    # rank window runs over 25 rows only — post-top-k, scale-free.
    # The constant-valued (but non-foldable — a literal would be
    # optimized away) partition key keeps WindowExec from logging its
    # single-partition scale warning on every bench run, which is a
    # false positive on this bounded frame.
    w = Window.partitionBy(F.pmod(F.col("n"), F.lit(1))).orderBy(
        F.col("n").desc(), "word"
    )
    return top.select(
        F.row_number().over(w).cast("long").alias("rank"), "word", "n"
    )


# PII patterns shared by the Spark and DuckDB renderings (ASCII-scoped
# so Java regex and RE2 agree).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"555-[0-9]{4}"


@register(
    "redact_pii",
    oracle=f"""
WITH planted AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or 555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t, '{PHONE_RE}')) AS BIGINT) AS n_phones,
       md5(regexp_replace(regexp_replace(t, '{EMAIL_RE}', '<EMAIL>', 'g'),
                          '{PHONE_RE}', '<PHONE>', 'g')) AS redacted_hash
FROM planted
""",
    survey_ref="training-data: PII redaction (regex scrub before training)",
)
def redact_pii(spark, sf_dir):
    """PII scrub — count and redact email/phone patterns per document
    (every curation pipeline runs this before text reaches a training
    corpus). PII is planted deterministically so both engines must
    find and redact the identical spans; the comparison pins the full
    redacted text via md5, not just the counts. Pure narrow JVM
    expressions — no shuffle, no UDF; at 100 TB this is a map-only
    pass fused into the scan."""
    d = load_table(spark, sf_dir, "documents")
    planted = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("t"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("t"), EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return planted.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("t"), F.lit(EMAIL_RE), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("t"), F.lit(PHONE_RE), F.lit(0)))
        .cast("long")
        .alias("n_phones"),
        F.md5(redacted).alias("redacted_hash"),
    )


@register(
    "corpus_report_by_source",
    oracle=f"""
WITH e AS (
  SELECT source,
         len(regexp_split_to_array(trim(text), '{textual.WS_REGEX}')) AS n_words,
         {textual.quality_score_sql('text')} AS q,
         CASE WHEN ({textual.lang_id_sql('text')}) = 'en' THEN 1 ELSE 0 END AS is_en,
         {textual.fingerprint_sql('text')} AS fp
  FROM documents
),
g AS (
  SELECT source, fp, count(*) AS cnt, sum(n_words) AS w, sum(q) AS sq, sum(is_en) AS se
  FROM e GROUP BY source, fp
)
SELECT source,
       CAST(sum(cnt) AS BIGINT) AS n_docs,
       CAST(sum(w) AS BIGINT) AS total_words,
       round(sum(sq)::DOUBLE / sum(cnt), 4) AS avg_quality,
       round(sum(se)::DOUBLE / sum(cnt), 4) AS pct_en,
       round(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END)::DOUBLE / sum(cnt), 4) AS dup_doc_rate
FROM g GROUP BY source
""",
    survey_ref="T62 corpus report",
)
def corpus_report_by_source(spark, sf_dir):
    """Per-source curation report card — the one-table answer to "what
    is each ingest feed contributing?": volume (docs, words), quality
    (mean heuristic score), language mix (english fraction), and the
    within-source exact-duplicate rate by content fingerprint.

    Scale shape: every per-doc signal is a narrow expression fused
    into the scan; the dup rate rides the SAME two-level aggregate —
    (source, fingerprint) partial counts, then per-source rollup — so
    the whole report is two map-side-combinable shuffles over 32-byte
    keys and small ints. Text never shuffles; no joins at all.
    """
    d = load_table(spark, sf_dir, "documents")
    e = d.select(
        "source",
        textual.word_count(F.col("text")).cast("long").alias("n_words"),
        textual.quality_score(F.col("text")).alias("q"),
        (textual.lang_id(F.col("text")) == "en").cast("long").alias("is_en"),
        textual.fingerprint(F.col("text")).alias("fp"),
    )
    g = e.groupBy("source", "fp").agg(
        F.count("*").alias("cnt"),
        F.sum("n_words").alias("w"),
        F.sum("q").alias("sq"),
        F.sum("is_en").alias("se"),
    )
    cnt = F.sum("cnt").cast("double")
    return g.groupBy("source").agg(
        F.sum("cnt").alias("n_docs"),
        F.sum("w").alias("total_words"),
        F.round(F.sum("sq") / cnt, 4).alias("avg_quality"),
        F.round(F.sum("se") / cnt, 4).alias("pct_en"),
        F.round(
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(F.lit(0))) / cnt, 4
        ).alias("dup_doc_rate"),
    )
