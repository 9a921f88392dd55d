"""Property-based cross-engine parity for the shared helper renderers
(`functions/textual.py`) — the define-once-render-twice foundation
every oracle stands on. Query-level hash checks only exercise the
corpus's value distribution; these drive the SAME helper through
Spark and DuckDB on hypothesis-generated inputs so a future edit that
diverges the two renderings fails here first.

Domain is printable ASCII on purpose: the repo's regex conventions
are ASCII-scoped (documented at redact_pii) because Java regex and
DuckDB/RE2 legitimately disagree on exotic Unicode classes.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from acuvate_spark.functions import textual

_ASCII = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=60
)
_TEXTS = st.lists(_ASCII, min_size=1, max_size=25)


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


@settings(max_examples=15, deadline=None, derandomize=True)
@given(texts=_TEXTS)
def test_textual_helpers_agree_across_engines(spark, duck, texts):
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = df.select(
        textual.token_count(F.col("t")).cast("long").alias("tc"),
        textual.quality_score(F.col("t")).alias("qs"),
        textual.fingerprint(F.col("t")).alias("fp"),
        textual.lang_id(F.col("t")).alias("lang"),
        F.array_join(
            textual.word_shingles(textual.words(F.trim(F.col("t"))), 2), "|"
        ).alias("sh2"),
    ).collect()
    sh2_sql = textual.word_shingles_sql(
        f"regexp_split_to_array(trim(?), '{textual.WS_REGEX}')", 2
    )
    sql = (
        f"SELECT CAST({textual.token_count_sql('?')} AS BIGINT),"
        f" {textual.quality_score_sql('?')},"
        f" {textual.fingerprint_sql('?')},"
        f" {textual.lang_id_sql('?')},"
        # coalesce: DuckDB's array_to_string(empty)=NULL while Spark's
        # array_join(empty)='' — a rendering quirk of THIS test's
        # canonicalization, not of the helper (whose list-level
        # contract is checked by len/unnest in the real oracles and
        # was verified [] == [] here)
        f" coalesce(array_to_string({sh2_sql}, '|'), '')"
    )
    n_params = sql.count("?")  # renderers repeat the expr placeholder
    for t, row in zip(texts, got):
        want = duck.execute(sql, [t] * n_params).fetchone()
        assert (row.tc, row.qs, row.fp, row.lang, row.sh2) == want, (
            f"helper divergence on {t!r}: spark="
            f"{(row.tc, row.qs, row.fp, row.lang, row.sh2)} duck={want}"
        )
