"""Text-analysis expression library (training-data pipeline ops).

Language-ID, quality scoring, token counting and fingerprinting over
the ``documents`` table — all pure column expressions (JVM-side,
whole-stage codegen) with matching DuckDB-SQL renderings for the
correctness oracle. These are the text-pipeline primitives a 100 TB
pretraining-data pipeline runs per-document; they scale linearly and
shuffle-free (narrow transformations only).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish tokenizer: letter runs, digit runs, single punctuation marks.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
WS_REGEX = r"\s+"

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")

# Marker-word tables for the n-gram/stopword language-ID heuristic.
LANG_MARKERS = {
    "de": ("der", "die", "das", "und", "nicht"),
    "es": ("el", "la", "los", "que", "y"),
    "fr": ("le", "les", "des", "est", "une"),
    "zh": ("de5", "shi4", "bu4", "le5", "zai4"),
}
DEFAULT_LANG = "en"


def words(text: Column) -> Column:
    return F.split(F.trim(text), WS_REGEX)


def word_count(text: Column) -> Column:
    return F.size(words(text))


def token_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), 0))


def token_count_sql(expr: str) -> str:
    return f"len(regexp_extract_all({expr}, '{TOKEN_REGEX}'))"


def stopword_ratio(text: Column) -> Column:
    w = words(F.lower(text))
    hits = F.size(F.filter(w, lambda x: x.isin(*STOPWORDS)))
    return hits.cast("double") / F.greatest(F.size(w), F.lit(1)).cast("double")


def stopword_ratio_sql(expr: str) -> str:
    stop = ", ".join(f"'{s}'" for s in STOPWORDS)
    w = f"regexp_split_to_array(trim(lower({expr})), '{WS_REGEX}')"
    return (
        f"(len(list_filter({w}, x -> x IN ({stop})))::DOUBLE"
        f" / greatest(len({w}), 1)::DOUBLE)"
    )


def punct_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, r"[^A-Za-z0-9\s]", "")
    n = F.greatest(F.length(text), F.lit(1))
    return (F.length(text) - F.length(stripped)).cast("double") / n.cast("double")


def punct_ratio_sql(expr: str) -> str:
    return (
        f"((length({expr}) - length(regexp_replace({expr}, '[^A-Za-z0-9\\s]', '', 'g')))::DOUBLE"
        f" / greatest(length({expr}), 1)::DOUBLE)"
    )


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in integer points [0, 800]: length
    saturation + low punctuation + stopword presence (a C4/Gopher-style
    quality filter). Integer arithmetic keeps the score bit-identical
    across engines (round() on derived doubles is not portable: Spark
    rounds the exact binary expansion, DuckDB the shortest decimal
    representation, and they disagree at .5 boundaries)."""
    n_words = word_count(text)
    n_chars = F.greatest(F.length(text), F.lit(1))
    stripped = F.regexp_replace(text, r"[^A-Za-z0-9\s]", "")
    punct_pct = F.floor((F.length(text) - F.length(stripped)) * F.lit(100.0) / n_chars)
    w = words(F.lower(text))
    hits = F.size(F.filter(w, lambda x: x.isin(*STOPWORDS)))
    stop_pct4 = F.least(
        F.floor(hits * F.lit(400.0) / F.greatest(n_words, F.lit(1))), F.lit(100.0)
    )
    return (
        F.lit(4) * F.least(n_words, F.lit(50))
        + F.lit(3) * (F.lit(100) - punct_pct)
        + F.lit(3) * stop_pct4
    ).cast("long")


def quality_score_sql(expr: str) -> str:
    w = f"regexp_split_to_array(trim({expr}), '{WS_REGEX}')"
    wl = f"regexp_split_to_array(trim(lower({expr})), '{WS_REGEX}')"
    stop = ", ".join(f"'{s}'" for s in STOPWORDS)
    n_words = f"len({w})"
    n_chars = f"greatest(length({expr}), 1)"
    stripped = f"regexp_replace({expr}, '[^A-Za-z0-9\\s]', '', 'g')"
    punct_pct = f"floor((length({expr}) - length({stripped})) * 100.0 / {n_chars})"
    hits = f"len(list_filter({wl}, x -> x IN ({stop})))"
    stop_pct4 = f"least(floor({hits} * 400.0 / greatest({n_words}, 1)), 100.0)"
    return (
        f"CAST(4 * least({n_words}, 50) + 3 * (100 - {punct_pct})"
        f" + 3 * {stop_pct4} AS BIGINT)"
    )


def lang_id(text: Column) -> Column:
    """Marker-word language ID: first language whose marker appears."""
    lowered = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    expr = F.lit(DEFAULT_LANG)
    result = None
    chain = None
    for lang, markers in LANG_MARKERS.items():
        cond = None
        for m in markers:
            c = lowered.contains(f" {m} ")
            cond = c if cond is None else (cond | c)
        chain = F.when(cond, F.lit(lang)) if chain is None else chain.when(cond, F.lit(lang))
    result = chain.otherwise(expr)
    return result


def lang_id_sql(expr: str) -> str:
    lowered = f"(' ' || lower({expr}) || ' ')"
    whens = []
    for lang, markers in LANG_MARKERS.items():
        cond = " OR ".join(f"{lowered} LIKE '% {m} %'" for m in markers)
        whens.append(f"WHEN {cond} THEN '{lang}'")
    return "CASE " + " ".join(whens) + f" ELSE '{DEFAULT_LANG}' END"


def fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 over the sorted distinct word set
    (order-insensitive doc identity, the batch analogue of a rolling
    hash)."""
    w = F.array_sort(F.array_distinct(words(F.lower(text))))
    return F.md5(F.array_join(w, " "))


def fingerprint_sql(expr: str) -> str:
    w = f"list_sort(list_distinct(regexp_split_to_array(trim(lower({expr})), '{WS_REGEX}')))"
    return f"md5(array_to_string({w}, ' '))"


def word_shingles(words_col: Column, n: int) -> Column:
    """Word n-gram shingles from a words array (dedup'd downstream).

    Documents shorter than n words yield an EMPTY array (matching the
    DuckDB rendering, whose ``range(1, 1)`` is empty).

    Built by CHAINED ``zip_with`` against shifted slices, NOT by a
    ``transform`` whose lambda does per-element ``element_at`` (the
    r13 agg-state/payload skew audit): Catalyst does not eliminate a
    common subexpression INSIDE a lambda, so when ``words_col`` is a
    raw ``split(text)`` expression — which several call sites pass —
    the old form re-tokenized the whole document for every shingle
    element, O(words^2 * n) per document. One 100k-word document made
    ``repeated_ngram_spans`` run for over nine minutes in one task.
    Here ``words_col`` appears only as a top-level array argument
    (evaluated once per row per chain step, n-1 steps), so the cost is
    O(words * n) regardless of what expression the caller passes.

    Value-identical to the old form: ``zip_with`` pads the shorter
    (shifted) side with nulls, ``concat_ws`` skips nulls exactly as
    the old n-ary ``concat_ws`` did, and the partial tail entries are
    sliced off before the guard."""
    out = words_col
    for j in range(1, n):
        out = F.zip_with(
            out,
            F.slice(
                words_col,
                j + 1,
                F.greatest(F.size(words_col) - j, F.lit(0)),
            ),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    shingles = F.slice(
        out, 1, F.greatest(F.size(words_col) - F.lit(n - 1), F.lit(0))
    )
    return F.when(F.size(words_col) >= n, shingles).otherwise(
        F.array().cast("array<string>")
    )


def word_shingles_sql(words_expr: str, n: int) -> str:
    parts = " || ' ' || ".join(f"{words_expr}[i + {j}]" for j in range(n))
    return (
        f"[{parts} FOR i IN range(1, greatest(len({words_expr}) - {n - 1}, 0) + 1)]"
    )
