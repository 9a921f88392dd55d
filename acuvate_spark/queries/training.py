"""Training-data pipeline extensions, batch 3 (SURVEY.md §2.13
T34-T41): repetition filtering, sequence packing, inverted index,
TF-IDF, deterministic splits, fixed-point PageRank, session windows,
length-percentile bucketing.

Design rules are the same as the rest of the registry: declarative
DataFrame plans only (no Python row UDFs), every arithmetic that
reaches the result is engine-portable (integer, or a SINGLE IEEE
division of exact integers — correctly rounded, hence bit-identical
in Spark and DuckDB), and every query states its 100 TB shuffle
story in the docstring.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import textual
from ..tables import load_table, materialize_and_release, repartition_for_compute
from .graph import _EDGES_SQL, _edges
from .registry import register

_WS = textual.WS_REGEX


def _lower_words(text_col):
    return textual.words(F.lower(text_col))


def _lower_words_sql(expr: str) -> str:
    return f"regexp_split_to_array(trim(lower({expr})), '{_WS}')"


# Gopher-style repetition thresholds (Rae et al. 2021, table A1 uses
# 0.18 for top-2-gram fraction; the duplicate-word bound is adapted to
# this synthetic corpus's tiny vocabulary).
TOP_BIGRAM_MAX = 0.18
DUP_WORD_MAX = 0.90


@register(
    "repetition_metrics",
    oracle=f"""
WITH ws AS (
  SELECT doc_id, {_lower_words_sql('text')} AS w FROM documents
),
bg AS (
  SELECT doc_id, unnest({textual.word_shingles_sql('w', 2)}) AS bigram FROM ws
),
bgc AS (
  SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY doc_id, bigram
),
per_doc AS (
  SELECT doc_id, max(c) AS top_bigram_n, sum(c) AS n_bigrams
  FROM bgc GROUP BY doc_id
),
wstats AS (
  SELECT doc_id, len(w) AS n_words, len(list_distinct(w)) AS n_distinct
  FROM ws
)
SELECT s.doc_id,
       CAST(s.n_words AS BIGINT) AS n_words,
       CAST(COALESCE(p.top_bigram_n, 0) AS BIGINT) AS top_bigram_n,
       CAST(COALESCE(p.top_bigram_n, 0) AS DOUBLE)
         / CAST(greatest(COALESCE(p.n_bigrams, 0), 1) AS DOUBLE) AS top_bigram_frac,
       CAST(s.n_words - s.n_distinct AS DOUBLE)
         / CAST(greatest(s.n_words, 1) AS DOUBLE) AS dup_word_frac,
       (CAST(COALESCE(p.top_bigram_n, 0) AS DOUBLE)
          / CAST(greatest(COALESCE(p.n_bigrams, 0), 1) AS DOUBLE) <= {TOP_BIGRAM_MAX}
        AND CAST(s.n_words - s.n_distinct AS DOUBLE)
          / CAST(greatest(s.n_words, 1) AS DOUBLE) <= {DUP_WORD_MAX}) AS keep
FROM wstats s LEFT JOIN per_doc p USING (doc_id)
""",
    survey_ref="training-data: repetition/boilerplate filter (Gopher rules)",
)
def repetition_metrics(spark, sf_dir):
    """Gopher-style repetition filter: per-document top-2-gram
    fraction and duplicate-word fraction, with the keep verdict kept
    as an auditable column. The bigram counts shuffle on (doc_id,
    bigram) and immediately re-aggregate per doc_id — both map-side
    combinable, and nothing wider than a 2-gram string ever moves.
    The word-level stats are narrow array expressions fused into the
    scan. At 100 TB this is two partial-agg shuffles keyed by doc,
    i.e. embarrassingly parallel. Fractions are single divisions of
    exact integers, so Spark and DuckDB agree bitwise."""
    d = load_table(spark, sf_dir, "documents")
    ws = d.select("doc_id", _lower_words(F.col("text")).alias("w"))
    bigrams = ws.select(
        "doc_id", F.explode(textual.word_shingles(F.col("w"), 2)).alias("bigram")
    )
    per_doc = (
        bigrams.groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bigram_n"), F.sum("c").alias("n_bigrams"))
    )
    wstats = ws.select(
        "doc_id",
        F.size("w").cast("long").alias("n_words"),
        F.size(F.array_distinct("w")).cast("long").alias("n_distinct"),
    )
    j = wstats.join(per_doc, "doc_id", "left")
    top_n = F.coalesce(F.col("top_bigram_n"), F.lit(0)).cast("long")
    top_frac = top_n.cast("double") / F.greatest(
        F.coalesce(F.col("n_bigrams"), F.lit(0)), F.lit(1)
    ).cast("double")
    dup_frac = (F.col("n_words") - F.col("n_distinct")).cast("double") / F.greatest(
        F.col("n_words"), F.lit(1)
    ).cast("double")
    return j.select(
        "doc_id",
        "n_words",
        top_n.alias("top_bigram_n"),
        top_frac.alias("top_bigram_frac"),
        dup_frac.alias("dup_word_frac"),
        ((top_frac <= TOP_BIGRAM_MAX) & (dup_frac <= DUP_WORD_MAX)).alias("keep"),
    )


SEQ_BUDGET = 512  # tokens per packed training sequence


@register(
    "pack_sequences",
    oracle=f"""
WITH t AS (
  SELECT doc_id, source,
         CAST({textual.token_count_sql('text')} AS BIGINT) AS n_tokens
  FROM documents
),
s AS (
  SELECT doc_id, source, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
  FROM t
)
SELECT doc_id, source, n_tokens, start_offset,
       CAST(start_offset // {SEQ_BUDGET} AS BIGINT) AS chunk_id,
       CAST(start_offset % {SEQ_BUDGET} AS BIGINT) AS offset_in_chunk
FROM s
""",
    survey_ref="training-data: concat-and-chunk sequence packing",
)
def pack_sequences(spark, sf_dir):
    """Concat-and-chunk sequence packing — the GPT-style pretraining
    layout: within each source shard, documents are concatenated in
    doc_id order and cut into fixed 512-token training sequences;
    each doc gets its global token start offset, its chunk id, and its
    offset inside the chunk. One running-sum window PARTITIONED BY
    source — the packing is shard-parallel, never a global funnel
    (packing across shard boundaries buys nothing: a chunk boundary at
    a shard edge costs at most one partial sequence per shard). All
    integer arithmetic, so the oracle is exact."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        "source",
        textual.token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    s = t.withColumn("start_offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    return s.select(
        "doc_id",
        "source",
        "n_tokens",
        "start_offset",
        F.expr(f"start_offset div {SEQ_BUDGET}").alias("chunk_id"),
        (F.col("start_offset") % SEQ_BUDGET).alias("offset_in_chunk"),
    )


@register(
    "inverted_index",
    oracle=f"""
WITH w AS (
  SELECT doc_id, unnest({_lower_words_sql('text')}) AS term FROM documents
)
SELECT term,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
       CAST(COUNT(*) AS BIGINT) AS tf_total,
       array_to_string(list_sort(list_distinct(list(doc_id)))[1:5], ',') AS postings_head
FROM w WHERE term <> '' GROUP BY term
""",
    survey_ref="training-data: inverted index build (term -> postings)",
)
def inverted_index(spark, sf_dir):
    """Postings-list build: one row per term with document frequency,
    total term frequency, and the first five doc ids of the sorted
    postings list rendered as a string (the driver's canonicalizer
    can't hash array cells, and a full postings column in a RESULT
    would be presentation anyway — the real sink writes term-bucketed
    parquet). Shuffle story: (doc, term) counts first — that key is
    near-unique, so its agg buffer is bounded — then per-term df/tf
    re-aggregate the tiny tf frame with map-side combine. The
    5-doc postings head comes from a row_number window on the distinct
    (term, doc) frame, NOT from a collect_set of the full postings: a
    stopword term's aggregation state stays O(5) while the window's
    per-term sort is disk-spillable (sorts spill; hash-agg buffers on
    one key don't). A true 100 TB run still caps stopwords upstream —
    heavy_hitters is the profiling pass that drives that cap."""
    d = load_table(spark, sf_dir, "documents")
    w = d.select(
        "doc_id", F.explode(_lower_words(F.col("text"))).alias("term")
    ).where(F.col("term") != "")
    td = w.groupBy("term", "doc_id").agg(F.count("*").cast("long").alias("tf"))
    stats = td.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("tf").cast("long").alias("tf_total"),
    )
    rn = Window.partitionBy("term").orderBy("doc_id")
    head = (
        td.withColumn("rn", F.row_number().over(rn))
        .where(F.col("rn") <= 5)
        .groupBy("term")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list("doc_id")), lambda x: x.cast("string")
                ),
            ).alias("postings_head")
        )
    )
    return stats.join(head, "term").select("term", "df", "tf_total", "postings_head")


@register(
    "tfidf_top_terms",
    oracle=f"""
WITH w AS (
  SELECT doc_id, unnest({_lower_words_sql('text')}) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM w WHERE term <> '' GROUP BY doc_id, term
),
df AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         CAST(tf.tf * (SELECT COUNT(*) FROM documents) AS DOUBLE)
           / CAST(df.df AS DOUBLE) AS score
  FROM tf JOIN df USING (term)
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, term) AS rank
  FROM scored
)
SELECT doc_id, term, tf, df, score, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 3
""",
    survey_ref="training-data: TF-IDF salient terms per document",
)
def tfidf_top_terms(spark, sf_dir):
    """Top-3 salient terms per document by a rational TF-IDF score
    (tf * N / df — deliberately log-free: one IEEE division of exact
    integers is bit-identical across engines, while log() is
    implementation-defined in its last bit). tf is a (doc, term)
    partial-agg shuffle; df re-aggregates the (already tiny) tf frame
    by term; the tf-df join is a plain equi-join on term with NO
    broadcast hint — the vocabulary is unbounded in principle, so the
    strategy is left to Catalyst/AQE, which broadcasts only when df
    actually fits under the threshold and otherwise shuffles both
    sides on term. The final top-3 is a row_number window per doc_id —
    each partition ranks its own docs. N arrives via a broadcast 1-row
    frame, not a collect."""
    d = load_table(spark, sf_dir, "documents")
    w = d.select(
        "doc_id", F.explode(_lower_words(F.col("text"))).alias("term")
    ).where(F.col("term") != "")
    tf = w.groupBy("doc_id", "term").agg(F.count("*").cast("long").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    n_docs = d.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            ((F.col("tf") * F.col("n_docs")).cast("double") / F.col("df").cast("double")).alias(
                "score"
            ),
        )
    )
    rk = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("rank", F.row_number().over(rk).cast("long"))
        .where(F.col("rank") <= 3)
        .select("doc_id", "term", "tf", "df", "score", "rank")
    )


# Hash-range split bounds on the first two md5 hex chars (256 cells):
# < 'cd' (205/256 ~ 80%) train, < 'e6' (230/256 ~ 90%) val, else test.
SPLIT_TRAIN_UB = "cd"
SPLIT_VAL_UB = "e6"


@register(
    "train_test_split",
    oracle=f"""
SELECT doc_id,
       substring(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 2) AS h2,
       CASE WHEN substring(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 2) < '{SPLIT_TRAIN_UB}'
              THEN 'train'
            WHEN substring(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 2) < '{SPLIT_VAL_UB}'
              THEN 'val'
            ELSE 'test' END AS split
FROM documents
""",
    survey_ref="training-data: deterministic hash train/val/test split",
)
def train_test_split(spark, sf_dir):
    """Deterministic train/val/test assignment by md5 hash range —
    the split every training pipeline needs to be reproducible across
    runs, engines, and data arrival order (no RNG state, no global
    count). Pure map-only narrow expressions fused into the scan; at
    100 TB this costs exactly one pass and zero shuffles. The hash
    range comparison is on the hex string itself (ASCII compare —
    collation-free in both engines), sidestepping hex->int conversion
    portability."""
    d = load_table(spark, sf_dir, "documents")
    h2 = F.substring(F.md5(F.concat(F.lit("split|"), F.col("doc_id").cast("string"))), 1, 2)
    split = (
        F.when(h2 < SPLIT_TRAIN_UB, "train")
        .when(h2 < SPLIT_VAL_UB, "val")
        .otherwise("test")
    )
    return d.select("doc_id", h2.alias("h2"), split.alias("split"))


PR_SCALE = 1_000_000_000  # fixed-point rank scale (10^9)
PR_ITERS = 3


def _pagerank_oracle() -> str:
    """Unrolled PR_ITERS(=3)-iteration integer PageRank CTE chain."""
    base = (15 * PR_SCALE) // 100
    steps = []
    prev = "r0"
    for i in range(1, PR_ITERS + 1):
        steps.append(
            f"""
it{i} AS (
  SELECT nodes.n,
         CAST({base} + (85 * COALESCE(s.inc, 0)) // 100 AS BIGINT) AS r
  FROM nodes LEFT JOIN (
    SELECT ue.b AS n, SUM({prev}.r // deg.d) AS inc
    FROM ue JOIN {prev} ON {prev}.n = ue.a JOIN deg ON deg.a = ue.a
    GROUP BY ue.b) s USING (n))"""
        )
        prev = f"it{i}"
    return f"""
WITH {_EDGES_SQL},
ue AS (SELECT src AS a, dst AS b FROM edges UNION SELECT dst, src FROM edges),
deg AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS d FROM ue GROUP BY a),
nodes AS (SELECT a AS n FROM deg),
r0 AS (SELECT n, CAST({PR_SCALE} AS BIGINT) AS r FROM nodes),
{",".join(steps)}
SELECT n AS node, r AS rank_scaled FROM {prev}
"""


@register(
    "pagerank_fixed",
    oracle=_pagerank_oracle(),
    survey_ref="training-data / graph: fixed-point PageRank (O4 family)",
)
def pagerank_fixed(spark, sf_dir):
    """3-iteration PageRank over the lineitem part-supplier
    graph in scaled INTEGER fixed-point (rank x 10^9, damping 0.85 as
    85//100): floating-point PageRank is order-of-summation dependent
    and can't be oracle-checked bit-exactly, while integer sums are
    associative — so this is the portable formulation. Each iteration
    is one join (rank onto edge source) + one groupBy(dst) with
    map-side combine; the edge set and degrees are computed once and
    checkpointed so the 3-iteration plan doesn't recompute lineitem.
    Fixed small iteration count = bounded lineage (the CC operator
    documents the convergence-loop variant of this pattern)."""
    e = _edges(spark, sf_dir)
    ue = (
        e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .union(e.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = ue.groupBy("a").agg(F.count("*").cast("long").alias("d"))
    nodes = deg.select(F.col("a").alias("n"), "d").localCheckpoint(eager=True)
    base = (15 * PR_SCALE) // 100
    ranks = nodes.select("n", F.lit(PR_SCALE).cast("long").alias("r"))
    for _ in range(PR_ITERS):
        contribs = (
            ue.join(ranks.join(deg, ranks.n == deg.a).select("n", "r", "d"), ue.a == F.col("n"))
            .select(F.col("b"), F.expr("r div d").alias("contrib"))
            .groupBy("b")
            .agg(F.sum("contrib").alias("inc"))
        )
        ranks = (
            nodes.select("n")
            .join(contribs, nodes.n == contribs.b, "left")
            .select(
                "n",
                (
                    F.lit(base)
                    + F.expr("85 * coalesce(inc, 0) div 100")
                ).cast("long").alias("r"),
            )
        )
    return ranks.select(F.col("n").alias("node"), F.col("r").alias("rank_scaled"))


SESSION_GAP_MIN = 30


@register(
    "session_window_counts",
    oracle=f"""
WITH e AS (
  SELECT user_id, ts::TIMESTAMP AS ts FROM events WHERE ts IS NOT NULL
),
flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL {SESSION_GAP_MIN} MINUTE AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM sess GROUP BY user_id, sid
""",
    survey_ref="training-data / §2.9: session windows (batch twin of streaming)",
)
def session_window_counts(spark, sf_dir):
    """Session-window aggregation via Spark's native session_window —
    gap-based sessions (30 min) per user with event
    counts; window end = last event + gap, which the oracle reproduces
    with the lag/cumsum formulation (the same one sessionize_events
    uses row-wise). One shuffle on user_id; session merging happens
    inside the aggregation operator, and the identical expression runs
    under Structured Streaming with a watermark (the streaming parity
    test drives it).

    NULL contract (r14): a NULL-ts event belongs to no session window
    and is excluded at the scan — Spark's session_window silently
    drops NULL timestamps while the oracle's lag/cumsum formulation
    sorts them (NULLS LAST) into the final session, so without the
    filter the session row sets disagree. Identity on a null-free
    corpus."""
    ev = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    return (
        ev.groupBy("user_id", F.session_window("ts", f"{SESSION_GAP_MIN} minutes"))
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "length_quartiles",
    oracle="""
SELECT doc_id, source, n_chars,
       CAST(ntile(4) OVER (PARTITION BY source
                           ORDER BY n_chars, doc_id) AS BIGINT) AS quartile
FROM documents
""",
    survey_ref="training-data: length-percentile bucketing (outlier trim)",
)
def length_quartiles(spark, sf_dir):
    """Per-source length quartile assignment — the percentile-bucket
    primitive behind 'trim the shortest/longest X% per shard' outlier
    filtering. ntile is rank-based (no floating point at all) and the
    (n_chars, doc_id) order is total, so bucket assignment is exact in
    both engines. Window partitioned by source: shard-parallel, no
    global sort. For corpus-wide percentile cuts at 100 TB the right
    tool is the mergeable quantile sketch (sketch_stats) feeding a
    broadcast threshold filter — that pairing is the scale path; this
    is the exact per-shard form."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    return d.select(
        "doc_id",
        "source",
        "n_chars",
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@register(
    "bpe_pair_counts",
    oracle=f"""
WITH w AS (
  SELECT unnest({_lower_words_sql('text')}) AS word FROM documents
),
w2 AS (SELECT word FROM w WHERE length(word) >= 2),
p AS (
  SELECT unnest([substr(word, i, 2) FOR i IN range(1, length(word))]) AS pair
  FROM w2
)
SELECT pair, CAST(count(*) AS BIGINT) AS n
FROM p GROUP BY pair
ORDER BY n DESC, pair LIMIT 20
""",
    survey_ref="training-data: BPE merge-step pair counting (tokenizer induction)",
)
def bpe_pair_counts(spark, sf_dir):
    """One BPE induction step: count adjacent character pairs across
    the corpus and rank the merge candidates — the inner loop of
    byte-pair-encoding tokenizer training (each round merges the top
    pair and recounts; this query is that round as a dataflow). Words
    explode to their length-1 adjacent pairs via a JVM transform over
    sequence() — no Python — then one map-side-combinable groupBy and
    a TakeOrderedAndProject top-20 (no global sort). At 100 TB the
    pair-key space is tiny (alphabet^2), so the shuffle is bounded by
    distinct pairs per partition, not corpus size; ties break on the
    pair string so both engines pick the identical top-20."""
    d = load_table(spark, sf_dir, "documents")
    w = (
        d.select(F.explode(_lower_words(F.col("text"))).alias("word"))
        .where(F.length("word") >= 2)
    )
    p = w.select(
        F.explode(
            F.expr("transform(sequence(1, length(word)-1), i -> substring(word, i, 2))")
        ).alias("pair")
    )
    return (
        p.groupBy("pair")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(20)
    )


# Target-mix acceptance rates per source shard, expressed in 65536ths
# and compared against the first 4 md5 hex chars — the same
# hash-threshold trick train_test_split uses, so acceptance is
# deterministic, engine-portable, and needs no RNG state. Rendered
# once into both the Spark CASE and the SQL CASE.
_MIX_RATES = {f"src{k}": (5 + (k * 3) % 11) / 16 for k in range(20)}


def _mix_bound(rate: float) -> str:
    return format(int(rate * 65536), "04x")


@register(
    "quality_weighted_sample",
    oracle=f"""
SELECT doc_id, source,
       substring(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 4) AS h4,
       CAST(CASE {' '.join(f"WHEN source = '{s}' THEN {int(r * 65536)}" for s, r in _MIX_RATES.items())} ELSE 0 END AS BIGINT) AS rate_64k,
       substring(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 4)
         < CASE {' '.join(f"WHEN source = '{s}' THEN '{_mix_bound(r)}'" for s, r in _MIX_RATES.items())} ELSE '0000' END AS accepted
FROM documents
""",
    survey_ref="training-data: domain-mix importance resampling",
)
def quality_weighted_sample(spark, sf_dir):
    """Domain-mix resampling — accept each document with a per-source
    target rate (the importance-sampling step that rebalances a corpus
    toward a desired domain mix, e.g. upweight books / downweight
    boilerplate web). Acceptance is md5-hash-thresholded per doc:
    deterministic across runs, engines, and data order, and exactly
    proportional in expectation. Pure map-only narrow expressions
    fused into the scan — zero shuffles at any scale. The rate table
    is a literal CASE rendered from ONE Python dict into both engines
    (the define-once-render-twice invariant), reported as rate_64k so
    the audit trail shows the exact threshold applied."""
    d = load_table(spark, sf_dir, "documents")
    h4 = F.substring(F.md5(F.concat(F.lit("mix|"), F.col("doc_id").cast("string"))), 1, 4)
    rate = F.lit(0)
    bound = F.lit("0000")
    for s, r in _MIX_RATES.items():
        rate = F.when(F.col("source") == s, F.lit(int(r * 65536))).otherwise(rate)
        bound = F.when(F.col("source") == s, F.lit(_mix_bound(r))).otherwise(bound)
    return d.select(
        "doc_id",
        "source",
        h4.alias("h4"),
        rate.cast("long").alias("rate_64k"),
        (h4 < bound).alias("accepted"),
    )


RARE_DF_MEAN_MAX = 40  # mean token document-frequency above this = boilerplate-ish


@register(
    "rarity_score",
    oracle=f"""
WITH w AS (
  SELECT doc_id, unnest({_lower_words_sql('text')}) AS term FROM documents
),
w2 AS (SELECT doc_id, term FROM w WHERE term <> ''),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM w2 GROUP BY doc_id, term
),
df AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
)
SELECT tf.doc_id,
       CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
       CAST(SUM(tf.tf * df.df) AS BIGINT) AS df_sum,
       SUM(tf.tf * df.df)::DOUBLE / SUM(tf.tf) AS mean_df,
       SUM(tf.tf * df.df)::DOUBLE / SUM(tf.tf) <= {RARE_DF_MEAN_MAX} AS keep
FROM tf JOIN df USING (term)
GROUP BY tf.doc_id
""",
    survey_ref="training-data: token-rarity quality scoring (perplexity-filter "
    "stand-in with engine-exact arithmetic)",
)
def rarity_score(spark, sf_dir):
    """Token-rarity scoring: each document's mean corpus document
    frequency over its token occurrences — the quality signal a
    perplexity filter approximates (common-token-heavy docs score
    high/boilerplate, rare-token-dense docs low), built from integer
    counts and ONE final IEEE division so the oracle is exact (a real
    LM perplexity needs log(), which is implementation-defined in its
    last bit and therefore never hash-matches across engines). Shuffle
    story: (doc, term) tf partial agg; term-level df re-aggregates the
    tf frame; df joins back on term (strategy left to AQE — unbounded
    vocabulary, same rule as tfidf_top_terms); final per-doc sum is
    map-side combinable. Nothing wider than a term string shuffles."""
    d = load_table(spark, sf_dir, "documents")
    w = d.select(
        "doc_id", F.explode(_lower_words(F.col("text"))).alias("term")
    ).where(F.col("term") != "")
    tf = w.groupBy("doc_id", "term").agg(F.count("*").cast("long").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    per_doc = (
        tf.join(df, "term")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("df")).cast("long").alias("df_sum"),
        )
    )
    mean_df = F.col("df_sum").cast("double") / F.col("n_tokens")
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "df_sum",
        mean_df.alias("mean_df"),
        (mean_df <= RARE_DF_MEAN_MAX).alias("keep"),
    )


@register(
    "length_outlier_trim",
    oracle="""
WITH ranked AS (
  SELECT n_chars,
         row_number() OVER (ORDER BY n_chars) AS rn,
         count(*) OVER () AS n
  FROM documents
),
th AS (
  SELECT CAST(max(CASE WHEN rn = CAST(ceil(0.05 * n) AS BIGINT) THEN n_chars END) AS BIGINT) AS lo,
         CAST(max(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT) THEN n_chars END) AS BIGINT) AS hi
  FROM ranked
)
SELECT d.doc_id, CAST(d.n_chars AS BIGINT) AS n_chars, th.lo, th.hi,
       d.n_chars BETWEEN th.lo AND th.hi AS kept
FROM documents d CROSS JOIN th
""",
    survey_ref="training-data: corpus-wide length outlier trim (sketch-threshold "
    "scale path promised by length_quartiles)",
)
def length_outlier_trim(spark, sf_dir):
    """Corpus-wide length outlier trim — the sketch-threshold pairing
    length_quartiles' docstring names as the 100 TB path: ONE mergeable
    quantile-sketch aggregate computes the p5/p95 length cut points
    (map-side combinable, no global sort of the corpus), the 1-row
    threshold frame broadcasts back, and the trim verdict is a pure
    map-side comparison. At fixture scale the sketch runs at accuracy
    >> n, degenerating to the exact order statistic the oracle pins
    via row_number (same knob as sketch_stats); production lowers the
    accuracy and accepts rank error n/accuracy. Integer thresholds,
    so the result is engine-exact."""
    d = load_table(spark, sf_dir, "documents")
    acc = 1_000_000  # >> corpus size at test SFs => exact order stats
    th = d.agg(
        F.percentile_approx("n_chars", 0.05, acc).cast("long").alias("lo"),
        F.percentile_approx("n_chars", 0.95, acc).cast("long").alias("hi"),
    )
    return d.crossJoin(F.broadcast(th)).select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        "lo",
        "hi",
        F.col("n_chars").between(F.col("lo"), F.col("hi")).alias("kept"),
    )


CHUNK_TOKENS = 64


@register(
    "chunk_documents",
    oracle=f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '{_WS}') AS w FROM documents
),
c AS (
  SELECT doc_id,
         unnest([struct_pack(
           chunk_idx := i,
           chunk_text := array_to_string(
             w[i * {CHUNK_TOKENS} + 1 : i * {CHUNK_TOKENS} + {CHUNK_TOKENS}], ' '),
           chunk_tokens := least({CHUNK_TOKENS}, len(w) - i * {CHUNK_TOKENS}))
          FOR i IN range(0, ((len(w) - 1) // {CHUNK_TOKENS}) + 1)]) AS ck
  FROM t
)
SELECT doc_id, CAST(ck.chunk_idx AS BIGINT) AS chunk_idx, ck.chunk_text AS chunk_text,
       CAST(ck.chunk_tokens AS BIGINT) AS chunk_tokens
FROM c
""",
    survey_ref="training-data: fixed-token document chunking (RAG/pretraining "
    "splitter; carries text, unlike pack_sequences' offset math)",
)
def chunk_documents(spark, sf_dir):
    """Document chunking — split every document into fixed 64-token
    chunks WITH the chunk text and exact token count: the splitter
    feeding embedding/RAG indexes and the text-carrying complement of
    pack_sequences (which only assigns offsets). Pure array
    expressions fused into the scan: tokenize once, slice per chunk
    index, explode — narrow start to finish, ZERO shuffles at any
    scale, and chunk boundaries depend only on the document itself so
    the layout is reproducible under any partitioning. The oracle
    renders the same slicing with DuckDB list ranges (its lateral
    range() is bounded and filtered by length, matching sequence())."""
    d = load_table(spark, sf_dir, "documents")
    C = CHUNK_TOKENS
    chunks = F.expr(
        f"transform(sequence(0, CAST(floor((size(w) - 1) / {C}) AS INT)), "
        f"i -> struct(i AS chunk_idx, "
        f"array_join(slice(w, i * {C} + 1, {C}), ' ') AS chunk_text, "
        f"size(slice(w, i * {C} + 1, {C})) AS chunk_tokens))"
    )
    return (
        d.select("doc_id", textual.words(F.trim(F.col("text"))).alias("w"))
        .select("doc_id", F.explode(chunks).alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_idx").cast("long").alias("chunk_idx"),
            F.col("c.chunk_text").alias("chunk_text"),
            F.col("c.chunk_tokens").cast("long").alias("chunk_tokens"),
        )
    )


LM_TOP_BIGRAMS = 500


@register(
    "ngram_lm_counts",
    oracle=f"""
WITH w AS (
  SELECT doc_id, {_lower_words_sql('text')} AS toks FROM documents
),
bg0 AS (
  SELECT unnest([[toks[i], toks[i + 1]] FOR i IN range(1, len(toks))]) AS pr FROM w
),
bg AS (
  SELECT pr[1] AS w1, pr[2] AS w2 FROM bg0 WHERE pr[1] <> '' AND pr[2] <> ''
),
bgc AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_bigram FROM bg GROUP BY w1, w2
),
ug AS (
  SELECT w1, CAST(sum(c_bigram) AS BIGINT) AS c_w1 FROM bgc GROUP BY w1
),
cont AS (
  SELECT w2, CAST(count(*) AS BIGINT) AS n_continuations FROM bgc GROUP BY w2
)
SELECT b.w1, b.w2, b.c_bigram, u.c_w1, c.n_continuations
FROM bgc b JOIN ug u USING (w1) JOIN cont c USING (w2)
ORDER BY b.c_bigram DESC, b.w1, b.w2
LIMIT {LM_TOP_BIGRAMS}
""",
    survey_ref="training-data: n-gram LM count tables (KN-style continuation "
    "counts; the count-collection pass of KenLM-type training)",
)
def ngram_lm_counts(spark, sf_dir):
    """Bigram language-model count tables — the distributed
    count-collection pass of KenLM-style LM training: per-bigram
    counts, left-context totals c(w1), and Kneser-Ney CONTINUATION
    counts (distinct left contexts per w2 — counted over the already
    unique bigram-type frame, so no count_distinct shuffle). The
    result keeps raw integers rather than smoothed probabilities: the
    smoothing arithmetic is driver-side float math over these exact
    tables, and integers are what an oracle can pin. Shuffle story:
    bigrams explode narrowly from the token array, one (w1, w2)
    partial-agg shuffle dominates; the two marginals re-aggregate the
    (much smaller) bigram-type frame; top-500 via
    TakeOrderedAndProject with full tie-break so both engines pick
    the identical set."""
    d = load_table(spark, sf_dir, "documents")
    toks = _lower_words(F.col("text"))
    pairs = F.expr(
        "filter(transform(sequence(1, greatest(size(toks) - 1, 1)), "
        "i -> struct(element_at(toks, i) AS w1, element_at(toks, i + 1) AS w2)), "
        "p -> p.w1 <> '' AND p.w2 IS NOT NULL AND p.w2 <> '')"
    )
    bg = (
        d.select(toks.alias("toks"))
        .where(F.size("toks") >= 2)
        .select(F.explode(pairs).alias("p"))
        .select("p.w1", "p.w2")
    )
    bgc = bg.groupBy("w1", "w2").agg(F.count("*").cast("long").alias("c_bigram"))
    ug = bgc.groupBy("w1").agg(F.sum("c_bigram").cast("long").alias("c_w1"))
    cont = bgc.groupBy("w2").agg(F.count("*").cast("long").alias("n_continuations"))
    return (
        bgc.join(ug, "w1")
        .join(cont, "w2")
        .select("w1", "w2", "c_bigram", "c_w1", "n_continuations")
        .orderBy(F.col("c_bigram").desc(), "w1", "w2")
        .limit(LM_TOP_BIGRAMS)
    )


# ---------------------------------------------------------------------------
# Unigram LM log-probability scoring (fixed-point, hash-exact)
# ---------------------------------------------------------------------------

NATS_SCALE = 1_000_000  # micro-nats: ln() rounded to 6 decimals, then integer


@register(
    "unigram_logprob_score",
    oracle=f"""
WITH w AS (
  SELECT doc_id, unnest({_lower_words_sql('text')}) AS term FROM documents
),
w2 AS (SELECT doc_id, term FROM w WHERE term <> ''),
ug AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM w2 GROUP BY term),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM ug),
nats AS (
  SELECT term,
         CAST(round(ln(c::DOUBLE / tot.n) * {NATS_SCALE}) AS BIGINT) AS micro_nats
  FROM ug CROSS JOIN tot
)
SELECT w2.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(nats.micro_nats) AS BIGINT) AS micro_nats_sum,
       sum(nats.micro_nats)::DOUBLE / ({NATS_SCALE}.0 * count(*)) AS avg_logprob
FROM w2 JOIN nats USING (term)
GROUP BY w2.doc_id
""",
    survey_ref="training-data: unigram-LM log-prob scoring (the actual "
    "perplexity-style filter, made hash-exact with fixed-point ln; "
    "rarity_score is the log-free integer stand-in)",
)
def unigram_logprob_score(spark, sf_dir):
    """Per-document average token log-probability under the corpus's
    own unigram LM — the classic perplexity-style quality filter.
    ln() is implementation-defined in its last bit, so each TERM's
    log-prob is rounded to micro-nats (the cosine_rounded pattern: a
    1-ulp ln() divergence cannot survive 6-decimal rounding) and the
    per-document total is then an EXACT integer sum — order-
    independent, so Spark and DuckDB hash-match; the final average is
    one IEEE division of exact integers. Shuffle story: unigram
    counts are one map-side-combinable shuffle on the term; the
    corpus total is a 1-row broadcast; scoring re-joins terms on the
    same key (strategy left to AQE — unbounded vocabulary) and the
    per-doc sum is map-side combinable. Only terms and longs ever
    shuffle."""
    d = load_table(spark, sf_dir, "documents")
    w = repartition_for_compute(d).select(
        "doc_id", F.explode(_lower_words(F.col("text"))).alias("term")
    ).where(F.col("term") != "")
    ug = w.groupBy("term").agg(F.count("*").cast("long").alias("c"))
    tot = ug.agg(F.sum("c").cast("long").alias("n"))
    nats = ug.crossJoin(F.broadcast(tot)).select(
        "term",
        F.round(F.log(F.col("c").cast("double") / F.col("n")) * NATS_SCALE, 0)
        .cast("long")
        .alias("micro_nats"),
    )
    return (
        w.join(nats, "term")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("micro_nats").cast("long").alias("micro_nats_sum"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "micro_nats_sum",
            (
                F.col("micro_nats_sum").cast("double")
                / (F.lit(float(NATS_SCALE)) * F.col("n_tokens"))
            ).alias("avg_logprob"),
        )
    )


# Per-source token budgets for the mixture prefix-selection. Rendered
# once into both engines (define-once-render-twice); ~57 tokens/doc at
# fixture scale means every source selects a partial prefix.
_TOKEN_BUDGETS = {f"src{k}": 200 + 61 * k for k in range(20)}


def _budget_case_sql() -> str:
    whens = " ".join(
        f"WHEN source = '{s}' THEN {b}" for s, b in _TOKEN_BUDGETS.items()
    )
    return f"CASE {whens} ELSE 0 END"


def _nonempty_words_sql(expr: str) -> str:
    return f"list_filter({_lower_words_sql(expr)}, x -> x <> '')"


@register(
    "token_budget_mix",
    oracle=f"""
WITH t AS (
  SELECT doc_id, source,
         CAST(len({_nonempty_words_sql('text')}) AS BIGINT) AS n_tokens,
         md5('mixv2|' || CAST(doc_id AS VARCHAR)) AS h
  FROM documents
),
c AS (
  SELECT doc_id, source, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (
           PARTITION BY source ORDER BY h
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
  FROM t
)
SELECT doc_id, source, n_tokens, cum_before,
       cum_before < {_budget_case_sql()} AS selected
FROM c
""",
    survey_ref="training-data: mixture sampling to a per-source token "
    "budget (the data-mixing step that assembles a training set from "
    "per-domain token targets)",
)
def token_budget_mix(spark, sf_dir):
    """Token-budget mixture selection: each source contributes documents
    in deterministic md5 order until its token budget is exhausted —
    the step that assembles a training mix from per-domain token
    targets (e.g. 30% code / 50% web / 20% books by TOKENS, not docs).
    A doc is selected iff the tokens accumulated BEFORE it are under
    budget, so every source overshoots by less than one document.

    The per-source running token total is a prefix sum — the textbook
    scale trap, because ``sum() OVER (PARTITION BY source ORDER BY h)``
    sends each source's ENTIRE corpus through one window task (sources
    are few and huge at 100 TB). This plan computes it as a
    DISTRIBUTED two-level prefix sum instead: rows hash into 256
    buckets by their md5's first 2 hex chars (bucket order is a PREFIX
    of the md5 order, so semantics are unchanged); the in-bucket
    cumulative runs partitioned by (source, bucket) — 256-way parallel
    per source; the per-bucket base offsets come from a tiny
    (sources x 256)-row aggregate whose own prefix sum is trivially
    cheap and which re-joins as a broadcast. The oracle runs the
    single-window form — identical semantics, which is exactly the
    point: same answer, scalable shape."""
    d = repartition_for_compute(load_table(spark, sf_dir, "documents"))
    h = F.md5(F.concat(F.lit("mixv2|"), F.col("doc_id").cast("string")))
    rows = d.select(
        "doc_id",
        "source",
        F.size(F.filter(_lower_words(F.col("text")), lambda x: x != ""))
        .cast("long")
        .alias("n_tokens"),
        h.alias("h"),
    ).withColumn("bucket", F.substring("h", 1, 2))
    w_in = (
        Window.partitionBy("source", "bucket")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    in_bucket = rows.withColumn(
        "cum_in", F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0)).cast("long")
    )
    bucket_sums = rows.groupBy("source", "bucket").agg(
        F.sum("n_tokens").cast("long").alias("bt")
    )
    w_base = (
        Window.partitionBy("source")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bases = bucket_sums.select(
        "source",
        "bucket",
        F.coalesce(F.sum("bt").over(w_base), F.lit(0)).cast("long").alias("base"),
    )
    budget = F.lit(0)
    for s, b in _TOKEN_BUDGETS.items():
        budget = F.when(F.col("source") == s, F.lit(b)).otherwise(budget)
    return (
        in_bucket.join(F.broadcast(bases), ["source", "bucket"])
        .select(
            "doc_id",
            "source",
            "n_tokens",
            (F.col("base") + F.col("cum_in")).cast("long").alias("cum_before"),
            ((F.col("base") + F.col("cum_in")) < budget).alias("selected"),
        )
    )


# Hashed-linear classifier: D feature buckets, deterministic weights
# derived from the bucket id by a Knuth multiplicative mix — integer
# end to end, so the score is bit-identical across engines. (In
# production the weights are a trained model loaded as a broadcast
# (bucket, weight) table; the dataflow — explode, hash, weight-sum —
# is identical.)
_CLF_BUCKETS = 4096
_CLF_MIX = 2654435761  # Knuth's 2^32 / phi multiplier
_CLF_MOD = 8191
_CLF_BIAS = 4095


@register(
    "hashed_text_classifier",
    oracle=f"""
WITH ws AS (
  SELECT doc_id, {_nonempty_words_sql('text')} AS w FROM documents
),
terms AS (
  SELECT doc_id, unnest(list_concat(w, {textual.word_shingles_sql('w', 2)})) AS term
  FROM ws
),
feats AS (
  SELECT doc_id,
         ('0x' || substring(md5(term), 1, 8))::BIGINT % {_CLF_BUCKETS} AS bucket
  FROM terms
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_terms,
       CAST(sum(bucket * {_CLF_MIX} % {_CLF_MOD} - {_CLF_BIAS}) AS BIGINT) AS score,
       sum(bucket * {_CLF_MIX} % {_CLF_MOD} - {_CLF_BIAS}) > 0 AS label
FROM feats
GROUP BY doc_id
""",
    survey_ref="training-data: hashed-n-gram linear classifier (fastText-"
    "style model-based quality/domain filter as a pure column-expression "
    "plan)",
)
def hashed_text_classifier(spark, sf_dir):
    """fastText-shaped linear text classifier: unigram + bigram
    features hashed into 4096 buckets (first 8 md5 hex chars mod 4096
    — the hashing trick), each bucket carrying a weight, document score
    = sum of feature weights, label = sign. This is the model-based
    quality/domain filter of a pretraining pipeline (fastText langid /
    quality classifiers) expressed as a declarative plan: the weights
    here derive deterministically from the bucket id (Knuth
    multiplicative mix, integer-exact in both engines); a trained
    model swaps in as a broadcast (bucket, weight) join against the
    same exploded feature frame without touching the dataflow.

    100 TB story: explode + hash + weight are narrow codegen
    expressions; the only data-bearing shuffle is the per-doc partial
    aggregate on doc_id (map-side combinable — a doc's features
    combine within each task before shuffling one row per doc; the
    round-robin input spread is the local single-row-group
    compensation tables.repartition_for_compute documents). Nothing
    wider than (doc_id, two longs) ever moves."""
    d = repartition_for_compute(load_table(spark, sf_dir, "documents"))
    w = F.filter(_lower_words(F.col("text")), lambda x: x != "")
    terms = d.select(
        "doc_id",
        F.explode(F.concat(w, textual.word_shingles(w, 2))).alias("term"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("term")), 1, 8), 16, 10).cast("long")
        % _CLF_BUCKETS
    )
    weight = (bucket * F.lit(_CLF_MIX)) % _CLF_MOD - _CLF_BIAS
    return (
        terms.select("doc_id", weight.alias("wgt"))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_terms"),
            F.sum("wgt").cast("long").alias("score"),
        )
        .select("doc_id", "n_terms", "score", (F.col("score") > 0).alias("label"))
    )


# BM25 probe-query ranking. ln() is fixed-pointed to micro-nats per
# term (the unigram_logprob_score pattern); every other factor is one
# mirrored IEEE expression tree, so the final rounded integer score is
# engine-exact.
_BM25_TERMS = ("spark", "window", "hash")
_BM25_K1 = 1.2
_BM25_B = 0.75


@register(
    "bm25_probe_ranking",
    oracle=f"""
WITH tokd AS (
  SELECT doc_id, unnest({_nonempty_words_sql('text')}) AS term FROM documents
),
dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tokd GROUP BY 1),
stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM tokd WHERE term IN ({", ".join(f"'{t}'" for t in _BM25_TERMS)}) GROUP BY 1, 2
),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
sc AS (
  SELECT tf.doc_id,
         CAST(round(
           CAST(round(ln((s.n_docs - df.df + 0.5) / (df.df + 0.5)) * 1000000) AS BIGINT)
           * (tf.tf * {_BM25_K1 + 1})
           / (tf.tf + {_BM25_K1} * ({1 - _BM25_B} + {_BM25_B} * (dl.dl / (CAST(s.sum_dl AS DOUBLE) / s.n_docs))))
         ) AS BIGINT) AS score_micro
  FROM tf JOIN df USING (term) JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_terms_matched,
       CAST(sum(score_micro) AS BIGINT) AS bm25_micro
FROM sc GROUP BY 1
""",
    survey_ref="training-data: BM25 probe-query relevance ranking "
    "(retrieval scoring / relevance-filter stand-in, engine-exact "
    "fixed-point idf)",
)
def bm25_probe_ranking(spark, sf_dir):
    """BM25 relevance of every document against a fixed probe-term
    query — the retrieval scorer used both for search-style ranking
    and for relevance filtering of pretraining data against a topic
    seed set. Okapi BM25 with k1=1.2, b=0.75: idf is fixed-pointed to
    micro-nats per TERM (3 values — the only ln() in the query), and
    the tf/length normalization is one mirrored IEEE expression tree,
    so the per-(doc, term) rounded integer scores — and their exact
    integer sums — hash-match across engines.

    100 TB story: doc lengths are one map-side-combinable aggregate;
    corpus stats a 1-row broadcast; the probe filter prunes the token
    stream BEFORE the (doc, term) aggregate so tf is |probes|-bounded
    per doc; df is a |probes|-row frame that broadcasts back. Nothing
    unbounded shuffles except the (doc_id, dl) frame, keyed on
    doc_id."""
    d = repartition_for_compute(load_table(spark, sf_dir, "documents"))
    # One tokenize pass for EVERYTHING (r14, guide §2.3 "aggregate
    # before you shuffle"): the old form exploded the full token stream
    # twice — once for per-doc lengths, once (term-filtered after the
    # explode) for tf — and then joined dl back onto tf. dl is just the
    # size of the word array and tf the count of equal elements, so one
    # narrow per-doc projection (doc_id + 4 longs) replaces both
    # Generates, the full-token dl shuffle AND the dl join. The w
    # column is computed once per row (column-level reuse inside the
    # codegen stage); docs with zero tokens had no tokd rows, so the
    # dl > 0 filter reproduces the old stats/n_docs base exactly.
    # Persisted: stats and the tf unpivot are separate consumers that
    # would otherwise re-run the tokenize; released via the registry's
    # standard epilogue.
    w = F.filter(_lower_words(F.col("text")), lambda x: x != "")

    def _tf(term):
        # NB: the lambda must be unary — a second parameter would be
        # bound to the array INDEX by the higher-order-function API
        return F.size(F.filter(F.col("w"), lambda x: x == F.lit(term))).cast("long")

    per_doc = (
        d.select("doc_id", w.alias("w"))
        .select(
            "doc_id",
            F.size("w").cast("long").alias("dl"),
            *[_tf(t).alias(f"tf{i}") for i, t in enumerate(_BM25_TERMS)],
        )
        .where(F.col("dl") > 0)
        .persist()
    )
    stats = per_doc.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
    )
    tf = per_doc.select(
        "doc_id",
        "dl",
        F.expr(
            "stack({}, {}) AS (term, tf)".format(
                len(_BM25_TERMS),
                ", ".join(f"'{t}', tf{i}" for i, t in enumerate(_BM25_TERMS)),
            )
        ),
    ).where(F.col("tf") > 0)
    df = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    joined = tf.join(F.broadcast(df), "term").crossJoin(F.broadcast(stats))
    idf_micro = F.round(
        F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)) * 1000000
    ).cast("long")
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    score_micro = F.round(
        idf_micro
        * (F.col("tf") * F.lit(_BM25_K1 + 1))
        / (
            F.col("tf")
            + F.lit(_BM25_K1)
            * (F.lit(1 - _BM25_B) + F.lit(_BM25_B) * (F.col("dl") / avgdl))
        )
    ).cast("long")
    result = (
        joined.select("doc_id", score_micro.alias("score_micro"))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_terms_matched"),
            F.sum("score_micro").cast("long").alias("bm25_micro"),
        )
    )
    return materialize_and_release(result, per_doc)


# T5-style span corruption: ~15% of word positions are noise-seeded
# (md5 hash-threshold, the train_test_split idiom), adjacent noised
# positions merge into spans, span k is replaced by <extra_id_k>.
_MASK_BOUND = "2666"  # 0x2666 / 0x10000 ~= 0.15


@register(
    "mlm_span_mask",
    oracle=f"""
WITH ws AS (
  SELECT doc_id, {_nonempty_words_sql('text')} AS w FROM documents
),
wp AS (
  SELECT doc_id, i AS pos, w[i + 1] AS word,
         substring(md5('mask|' || CAST(doc_id AS VARCHAR) || '|' || CAST(i AS VARCHAR)), 1, 4)
           < '{_MASK_BOUND}' AS noised
  FROM ws, LATERAL (SELECT unnest(range(0, len(w))) AS i) t
),
marked AS (
  SELECT doc_id, pos, word, noised,
         (noised AND NOT coalesce(lag(noised) OVER (PARTITION BY doc_id ORDER BY pos), FALSE)) AS span_start
  FROM wp
),
spanned AS (
  SELECT doc_id, pos, word, noised, span_start,
         CAST(sum(CASE WHEN span_start THEN 1 ELSE 0 END) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - 1 AS k
  FROM marked
),
agg AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_words,
         CAST(sum(CASE WHEN noised THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
         CAST(sum(CASE WHEN span_start THEN 1 ELSE 0 END) AS BIGINT) AS n_spans,
         string_agg(
           CASE WHEN NOT noised THEN word
                WHEN span_start THEN '<extra_id_' || CAST(k AS VARCHAR) || '>'
           END, ' ' ORDER BY pos) AS input_text,
         string_agg(
           CASE WHEN span_start THEN '<extra_id_' || CAST(k AS VARCHAR) || '> ' || word
                WHEN noised THEN word
           END, ' ' ORDER BY pos) AS target_text
  FROM spanned GROUP BY doc_id
)
SELECT ws.doc_id,
       CAST(coalesce(a.n_words, 0) AS BIGINT) AS n_words,
       CAST(coalesce(a.n_masked, 0) AS BIGINT) AS n_masked,
       CAST(coalesce(a.n_spans, 0) AS BIGINT) AS n_spans,
       md5(coalesce(a.input_text, '')) AS input_md5,
       md5(coalesce(a.target_text, '')) AS target_md5
FROM ws LEFT JOIN agg a USING (doc_id)
""",
    survey_ref="training-data: T5-style span-corruption objective "
    "preparation (masked input + sentinel target pairs)",
)
def mlm_span_mask(spark, sf_dir):
    """Span-corruption objective preparation (T5 / UL2 denoising):
    ~15% of word positions are noise-selected by a deterministic
    md5 hash-threshold per (doc, position); ADJACENT noised positions
    merge into one span (gaps-and-islands: span starts where noised
    flips on, span index = running count of starts); the input
    replaces span k with ``<extra_id_k>`` and the target lists each
    sentinel followed by the words it hides. Ships (n_words, n_masked,
    n_spans, md5(input), md5(target)) per document — the md5s pin the
    exact corrupted strings without shipping text.

    100 TB story: position explode is narrow; the lag/run-count
    windows and the ordered reassembly aggregate are all PARTITIONED
    BY doc_id — per-task state is bounded by document length, the
    same bound every reassembly op in this repo relies on (no global
    window anywhere). One doc-keyed shuffle end to end."""
    d = repartition_for_compute(load_table(spark, sf_dir, "documents"))
    wf = F.filter(_lower_words(F.col("text")), lambda x: x != "")
    base = d.select("doc_id", wf.alias("w"))
    wp = base.select("doc_id", F.posexplode("w").alias("pos", "word")).withColumn(
        "noised",
        F.substring(
            F.md5(
                F.concat(
                    F.lit("mask|"),
                    F.col("doc_id").cast("string"),
                    F.lit("|"),
                    F.col("pos").cast("string"),
                )
            ),
            1,
            4,
        )
        < _MASK_BOUND,
    )
    w_lag = Window.partitionBy("doc_id").orderBy("pos")
    marked = wp.withColumn(
        "span_start",
        F.col("noised") & ~F.coalesce(F.lag("noised").over(w_lag), F.lit(False)),
    )
    w_run = w_lag.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spanned = marked.withColumn(
        "k",
        (
            F.sum(F.when(F.col("span_start"), 1).otherwise(0)).over(w_run) - 1
        ).cast("long"),
    )
    sentinel = F.concat(F.lit("<extra_id_"), F.col("k").cast("string"), F.lit(">"))
    input_tok = (
        F.when(~F.col("noised"), F.col("word"))
        .when(F.col("span_start"), sentinel)
        .otherwise(F.lit(None).cast("string"))
    )
    target_tok = (
        F.when(F.col("span_start"), F.concat(sentinel, F.lit(" "), F.col("word")))
        .when(F.col("noised"), F.col("word"))
        .otherwise(F.lit(None).cast("string"))
    )

    def _ordered_join(tok_col):
        # collect (pos, tok), sort by pos in-row, drop the masked-out
        # nulls, join — string_agg(... ORDER BY pos) equivalent
        lst = F.array_sort(F.collect_list(F.struct(F.col("pos"), tok_col.alias("tok"))))
        toks = F.filter(
            F.transform(lst, lambda x: x["tok"]), lambda x: x.isNotNull()
        )
        return F.array_join(toks, " ")

    agg = spanned.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_words"),
        F.sum(F.when(F.col("noised"), 1).otherwise(0)).cast("long").alias("n_masked"),
        F.sum(F.when(F.col("span_start"), 1).otherwise(0)).cast("long").alias("n_spans"),
        _ordered_join(input_tok).alias("input_text"),
        _ordered_join(target_tok).alias("target_text"),
    )
    return (
        base.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
            F.coalesce("n_masked", F.lit(0)).cast("long").alias("n_masked"),
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.md5(F.coalesce("input_text", F.lit(""))).alias("input_md5"),
            F.md5(F.coalesce("target_text", F.lit(""))).alias("target_md5"),
        )
    )
