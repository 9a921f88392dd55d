"""Core relational queries — SURVEY.md §2.2 (filters/projections),
§2.4 (aggregations), §2.5 (windows), §2.6 (sorts/limits), §2.7 (set
ops), §2.8 (scalar functions), §3.3 (GetData pagination shape).

Every query is declarative DataFrame API — Catalyst gets full freedom
(pushdown, pruning, codegen). Scale notes are per-query where a choice
matters at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import tags
from ..tables import load_table, materialize_and_release, repartition_for_compute
from .registry import register


# running_totals hot-key crossover (r12, tools/window_skew_check.py):
# below this max-per-key row count the classic single window wins (the
# two-level form's offsets join measured ~4x uniform overhead at the
# 100x dir); past it a single task's sort+cumsum of the hot key
# dominates the stage (4.25x measured at 4.5M rows). 256k rows is a
# ~0.3 s single-task sort — the order of magnitude where the trade
# flips — and the probe that reads it is one map-side-combined
# aggregate, linear and cheap at any scale.
_RT_HOT_KEY_MIN = 1 << 18


_CENTS_DOMAIN = 9e13  # |x| bound where a 2-decimal double is cents-exact


def _cents(col):
    """Exact per-row integer cents for a 2-decimal money column.

    Float SUM is not associative, so summing money doubles flips the
    last cent with row order / partition count (the round-6
    layout-invariance audit caught this in pricing_summary). Since the
    money columns carry exactly two decimals, floor(x*100 + 0.5) is
    the exact integer per row in BOTH engines; sums over it are
    associative and layout-invariant.

    Domain guard (r14 extreme-value ring): the idiom is only exact for
    |x| < 9e13 (past that, a double cannot carry two decimals — and
    2^53/100 ≈ 9.007e13 is where integer cents stop being
    representable). Outside the domain the engines silently disagreed:
    Spark's floor(double)->long SATURATES (±Inf -> ±Long.MAX) and
    folds NaN to 0 — a NaN price quietly became $0.00 — while the
    DuckDB twin's HUGEINT conversion crashes outright. The guard makes
    both engines treat an out-of-domain cell as NULL cents (no
    contribution to sums, identical on every clean corpus); corrupted
    money columns are a validation concern, not something to absorb
    into a report. DuckDB oracle twin:
    CASE WHEN abs(x) < 9e13 THEN CAST(floor(x * 100 + 0.5) AS HUGEINT) END.
    """
    return F.when(F.abs(col) < _CENTS_DOMAIN, F.floor(col * 100 + F.lit(0.5)))


def _money_sum(col, alias):
    """Exact cents sum rendered back to the conventional rounded
    double. The decimal accumulator cannot overflow at any scale
    (a raw long sum would ANSI-overflow around 9.2e16 dollars).
    DuckDB oracle twin: round(sum(<cents>)::DOUBLE / 100, 2)."""
    return (
        F.round(F.sum(_cents(col).cast("decimal(25,0)")).cast("double") / 100, 2).alias(alias)
    )


def _with_ansi_empty_grand_total(agg, src, row_exprs):
    """Spark's Expand-based CUBE/ROLLUP emits ZERO rows on empty input;
    ANSI (and the DuckDB oracles) emit the () grouping-set row — the
    grand total aggregated over zero rows (count 0, sums NULL). Append
    exactly that row when — and only when — the INPUT is empty: the
    marker is a 1-row global count over ``src`` (the cube's input
    frame) filtered to ``count == 0``, so on non-empty input it
    contributes nothing and on empty input it contributes exactly the
    () row, whose aggregate values over zero rows are the
    ``row_exprs`` literals. Guarding from the input side keeps the
    grouped frame single-consumer — the r08 form localCheckpoint-ed
    it to feed a grouped-output marker, which cost an eager
    materialization job and a +20% pin on cube_order_year (VERDICT
    r08 finding 2). The input scan is consumed twice, but the second
    consumer is a column-pruned map-side-combined COUNT that reduces
    to one row before the shuffle."""
    marker = (
        src.groupBy()
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") == 0)
    )
    return agg.unionByName(marker.select(*row_exprs))


# ---------------------------------------------------------------------------
# Flagship: GetData paginated read (reference app.py:5029-5109, SURVEY §3.3)
# ---------------------------------------------------------------------------

_GETDATA_COLS = [
    ("o_orderkey", "orderKey"),
    ("o_custkey", "custKey"),
    ("o_orderstatus", "orderStatus"),
    ("o_totalprice", "totalPrice"),
    ("o_orderdate", "orderDate"),
    ("o_orderpriority", "orderPriority"),
]


@register(
    "getdata_page",
    oracle="""
WITH f AS (
  SELECT * FROM orders WHERE o_orderpriority ILIKE '%urg%'
), w AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority,
         count(*) OVER () AS "totalCount",
         row_number() OVER (ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM f
)
SELECT o_orderkey AS "orderKey", o_custkey AS "custKey", o_orderstatus AS "orderStatus",
       o_totalprice AS "totalPrice", o_orderdate AS "orderDate",
       o_orderpriority AS "orderPriority", "totalCount"
FROM w WHERE rn > 10 AND rn <= 20
""",
    survey_ref="W1 W2 P2 P6 §3.3",
)
def getdata_page(spark, sf_dir):
    """Scan -> ILIKE filter -> distributed top-(offset+n) page ->
    broadcast 1-row total -> camelCase rename (reference
    app.py:5070-5096).

    Scale shape (r03 verdict item 1): the page is
    ``orderBy().offset(start).limit(n)``, which Catalyst plans as ONE
    distributed TakeOrderedAndProject (per-partition top-k heaps, then
    a merge of offset+n rows) — no partition-less Window and no global
    Sort funnel, so the plan survives 100x. ``totalCount`` is a 1-row
    map-side-combinable count aggregate cross-joined back as a
    broadcast, replacing the old ``COUNT(*) OVER ()`` that dragged the
    whole filtered table through a single WindowExec partition. The
    keyset twin ``api.get_data_after`` removes even the offset scan for
    deep pages.
    """
    page, page_size = 2, 10
    orders = load_table(spark, sf_dir, "orders")
    filtered = orders.where(F.col("o_orderpriority").ilike("%urg%"))
    start = (page - 1) * page_size
    total = filtered.agg(F.count("*").alias("totalCount"))
    page_rows = (
        filtered.orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
        .offset(start)
        .limit(page_size)
        .select(*[F.col(src).alias(dst) for src, dst in _GETDATA_COLS])
    )
    return page_rows.crossJoin(F.broadcast(total))


@register(
    "getdata_keyset",
    oracle="""
WITH f AS (
  SELECT * FROM orders WHERE o_orderpriority ILIKE '%urg%'
),
cur AS (
  SELECT o_orderdate AS cd, o_orderkey AS ck
  FROM f ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1 OFFSET 9
),
page AS (
  SELECT f.* FROM f, cur
  WHERE f.o_orderdate < cur.cd
     OR (f.o_orderdate = cur.cd AND f.o_orderkey < cur.ck)
  ORDER BY f.o_orderdate DESC, f.o_orderkey DESC LIMIT 10
)
SELECT o_orderkey AS "orderKey", o_custkey AS "custKey",
       o_orderstatus AS "orderStatus", o_totalprice AS "totalPrice",
       o_orderdate AS "orderDate", o_orderpriority AS "orderPriority"
FROM page
""",
    survey_ref="W2 keyset variant §3.3 (the deep-page 100 TB form)",
)
def getdata_keyset(spark, sf_dir):
    """Keyset (cursor) pagination — the deep-page form of the GetData
    flagship: page 2 is addressed by the (orderDate, orderKey) of page
    1's last row, so the page query is a pushable range predicate plus
    ONE distributed top-k — no OFFSET scan, which at page 10,000 of a
    100 TB register means skipping 10,000 pages of work that
    ``getdata_page``'s offset form still performs. Returns exactly
    ``getdata_page``'s page-2 rows (sans totalCount, which keyset
    clients don't re-fetch per page).

    In production the cursor arrives FROM THE CLIENT
    (``api.get_data_after``); here it is derived in-query (top-10
    tail via offset(9).limit(1), a 1-row TakeOrderedAndProject
    broadcast) so the registry query is self-contained and
    oracle-checkable end to end."""
    orders = load_table(spark, sf_dir, "orders")
    filtered = orders.where(F.col("o_orderpriority").ilike("%urg%"))
    cursor = (
        filtered.orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
        .offset(9)
        .limit(1)
        .select(F.col("o_orderdate").alias("cd"), F.col("o_orderkey").alias("ck"))
    )
    after = (F.col("o_orderdate") < F.col("cd")) | (
        (F.col("o_orderdate") == F.col("cd")) & (F.col("o_orderkey") < F.col("ck"))
    )
    return (
        filtered.crossJoin(F.broadcast(cursor))
        .where(after)
        .orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
        .limit(10)
        .select(*[F.col(src).alias(dst) for src, dst in _GETDATA_COLS])
    )


# ---------------------------------------------------------------------------
# TPC-H Q1-shaped pricing summary — the classic scan+agg benchmark shape
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum((CASE WHEN abs(l_extendedprice) < 9e13 THEN CAST(floor(l_extendedprice * 100 + 0.5) AS HUGEINT) END))::DOUBLE / 100, 2)
           AS sum_base_price,
       round(sum(CASE WHEN abs(l_extendedprice) < 9e13 AND abs(l_discount) < 9e13
                      THEN CAST(floor(l_extendedprice * 100 + 0.5)
                           * (100 - floor(l_discount * 100 + 0.5)) AS HUGEINT) END)::DOUBLE
             / 10000, 2) AS sum_disc_price,
       round(sum(CASE WHEN abs(l_extendedprice) < 9e13 AND abs(l_discount) < 9e13
                           AND abs(l_tax) < 9e13
                      THEN CAST(floor(l_extendedprice * 100 + 0.5)
                           * (100 - floor(l_discount * 100 + 0.5))
                           * (100 + floor(l_tax * 100 + 0.5)) AS HUGEINT) END)::DOUBLE
             / 1000000, 2) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(sum((CASE WHEN abs(l_extendedprice) < 9e13 THEN CAST(floor(l_extendedprice * 100 + 0.5) AS HUGEINT) END))::DOUBLE / 100
             / count(*), 4) AS avg_price,
       round(sum((CASE WHEN abs(l_discount) < 9e13 THEN CAST(floor(l_discount * 100 + 0.5) AS HUGEINT) END))::DOUBLE / 100
             / count(*), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    survey_ref="A1 A3 S1 O1",
)
def pricing_summary(spark, sf_dir):
    """Pure map-side-combinable hash aggregate over the fact table: the
    filter + projection push into the parquet scan, partial aggregation
    happens before the (tiny, 6-group) shuffle. This plan scales
    linearly to any data size.

    Money math is exact fixed-point: every input column carries exactly
    two decimals, so per-row integer cents (and integer cent-products
    for the discount/tax terms) make each SUM associative — a float sum
    is not, and its last cent flips with row order / partitioning (the
    round-6 layout-invariance audit caught exactly that in sum_charge).
    Per-row products stay < 2^63; the accumulators are decimal so the
    sums cannot overflow at any scale. Quantity is integral-valued, so
    its double sum/avg is already exact.
    """
    li = load_table(spark, sf_dir, "lineitem")
    pc = _cents(F.col("l_extendedprice"))
    dc = _cents(F.col("l_discount"))
    tc = _cents(F.col("l_tax"))
    disc_u = pc * (F.lit(100) - dc)  # units of 1e-4
    charge_u = disc_u * (F.lit(100) + tc)  # units of 1e-6
    dec = "decimal(25,0)"
    n = F.count("*")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum(pc.cast(dec)).cast("double") / 100, 2).alias("sum_base_price"),
            F.round(F.sum(disc_u.cast(dec)).cast("double") / 10000, 2).alias("sum_disc_price"),
            F.round(F.sum(charge_u.cast(dec)).cast("double") / 1000000, 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.sum(pc.cast(dec)).cast("double") / 100 / n, 4).alias("avg_price"),
            F.round(F.sum(dc.cast(dec)).cast("double") / 100 / n, 6).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Predicate family — SURVEY §2.2 P5/P6/P7
# ---------------------------------------------------------------------------


@register(
    "filter_like_family",
    oracle="""
SELECT o_orderkey, o_orderpriority, o_orderstatus
FROM orders
WHERE (o_orderpriority LIKE '1%' OR o_orderpriority ILIKE '%medium%')
  AND o_orderstatus IN ('O', 'F')
  AND o_orderpriority NOT ILIKE '%low%'
""",
    survey_ref="P5",
)
def filter_like_family(spark, sf_dir):
    """LIKE / ILIKE / IN / NOT ILIKE predicate family
    (reference app.py:1227-1235). All are Catalyst-pushable
    StringContains/StartsWith filters — they reach the parquet scan."""
    o = load_table(spark, sf_dir, "orders")
    return o.where(
        (F.col("o_orderpriority").like("1%") | F.col("o_orderpriority").ilike("%medium%"))
        & F.col("o_orderstatus").isin("O", "F")
        & ~F.col("o_orderpriority").ilike("%low%")
    ).select("o_orderkey", "o_orderpriority", "o_orderstatus")


@register(
    "filter_null_safe",
    oracle="""
SELECT o_orderkey, nullif(o_orderstatus, 'P') AS status_norm
FROM orders
WHERE nullif(o_orderstatus, 'P') <> 'F' OR nullif(o_orderstatus, 'P') IS NULL
""",
    survey_ref="P7 F11",
)
def filter_null_safe(spark, sf_dir):
    """Null-safe status predicate ``x != 'F' OR x IS NULL``
    (reference app.py:1271-1272) over a null-normalized column."""
    o = load_table(spark, sf_dir, "orders")
    status = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return o.select(
        "o_orderkey", status.alias("status_norm")
    ).where((F.col("status_norm") != "F") | F.col("status_norm").isNull())


# ---------------------------------------------------------------------------
# Tag classification — SURVEY §2.8 F7 (reference app.py:783-837)
# ---------------------------------------------------------------------------

_SYNTH_TAG = (
    "concat('E17-A_', ['F','PIT','CBL','P'][(p_partkey % 4) + 1], '-', "
    "CAST(1000 + p_partkey AS VARCHAR), "
    "CASE WHEN p_partkey % 5 = 0 THEN '-A' ELSE '' END)"
)
_SYNTH_FT = "['A7001','A6','A7','A40','B5','A42','A3','XX'][(p_partkey % 8) + 1]"


@register(
    "classify_tags",
    oracle=f"""
WITH synth AS (
  SELECT p_partkey,
         {_SYNTH_TAG} AS tag_no,
         {_SYNTH_FT} AS file_type
  FROM part
)
SELECT p_partkey, tag_no, file_type,
       {tags.classify_tag_type_sql('tag_no', 'file_type')} AS tag_type
FROM synth
""",
    survey_ref="F7 P8",
)
def classify_tags(spark, sf_dir):
    """The reference's classify_tag_type rule cascade as a pure
    when/rlike column expression over synthesized tag strings — zero
    UDF, fully codegen'd, trivially scalable."""
    p = load_table(spark, sf_dir, "part")
    func = F.element_at(
        F.array(F.lit("F"), F.lit("PIT"), F.lit("CBL"), F.lit("P")),
        (F.col("p_partkey") % 4 + 1).cast("int"),
    )
    ft = F.element_at(
        F.array(*[F.lit(x) for x in ["A7001", "A6", "A7", "A40", "B5", "A42", "A3", "XX"]]),
        (F.col("p_partkey") % 8 + 1).cast("int"),
    )
    tag_no = F.concat(
        F.lit("E17-A_"),
        func,
        F.lit("-"),
        (F.lit(1000) + F.col("p_partkey")).cast("string"),
        F.when(F.col("p_partkey") % 5 == 0, F.lit("-A")).otherwise(F.lit("")),
    )
    return p.select(
        "p_partkey",
        tag_no.alias("tag_no"),
        ft.alias("file_type"),
    ).withColumn("tag_type", tags.classify_tag_type(F.col("tag_no"), F.col("file_type")))


# ---------------------------------------------------------------------------
# Scalar function family — SURVEY §2.8
# ---------------------------------------------------------------------------


@register(
    "regexp_extract_props",
    oracle="""
SELECT event_id, TRY_CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INTEGER) AS k_val
FROM events
""",
    survey_ref="F1",
)
def regexp_extract_props(spark, sf_dir):
    """Regex field extraction from a JSON-ish string column
    (reference extract_doc_id_from_url app.py:7046-7075)."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.regexp_extract("props", r'"k": (\d+)', 1).try_cast("int").alias("k_val"),
    )


@register(
    "split_project_rename",
    oracle="""
SELECT p_partkey,
       split_part(p_name, ' ', 1) AS first_word,
       string_split(p_name, ' ')[-1] AS last_word,
       upper(trim(p_brand)) AS brand_uc,
       concat(p_brand, '_', p_type) AS brand_type
FROM part
""",
    survey_ref="F3 F5 F6 P1",
)
def split_project_rename(spark, sf_dir):
    """split/part-extraction + case/trim + concat projections
    (reference app.py:874-875, app.py:784-785, app.py:987)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.substring_index("p_name", " ", 1).alias("first_word"),
        F.substring_index("p_name", " ", -1).alias("last_word"),
        F.upper(F.trim(F.col("p_brand"))).alias("brand_uc"),
        F.concat_ws("_", "p_brand", "p_type").alias("brand_type"),
    )


@register(
    "explode_words",
    oracle="""
SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word
FROM part
""",
    survey_ref="F4 X4",
)
def explode_words(spark, sf_dir):
    """1-row->N-rows expansion (reference slash/newline tag splits
    app.py:933-953, app.py:3780-3796)."""
    p = load_table(spark, sf_dir, "part")
    return p.select("p_partkey", F.explode(F.split("p_name", " ")).alias("word"))


@register(
    "slash_expand_tags",
    oracle=f"""
WITH synth AS (
  SELECT p_partkey,
         CASE WHEN p_partkey % 3 = 0
              THEN concat('F-', CAST(1000 + p_partkey AS VARCHAR), 'A/B')
              ELSE concat('PIT-', CAST(1000 + p_partkey AS VARCHAR)) END AS raw_tag
  FROM part
)
SELECT p_partkey, raw_tag, unnest({tags.slash_expand_sql('raw_tag')}) AS tag
FROM synth
""",
    survey_ref="F4 X4",
)
def slash_expand_tags(spark, sf_dir):
    """The reference's slash-suffix expansion 'F-1158A/B' ->
    [F-1158A, F-1158B] (app.py:933-953) as array expr + explode."""
    p = load_table(spark, sf_dir, "part")
    raw = F.when(
        F.col("p_partkey") % 3 == 0,
        F.concat(F.lit("F-"), (F.lit(1000) + F.col("p_partkey")).cast("string"), F.lit("A/B")),
    ).otherwise(F.concat(F.lit("PIT-"), (F.lit(1000) + F.col("p_partkey")).cast("string")))
    return (
        p.select("p_partkey", raw.alias("raw_tag"))
        .withColumn("tag", F.explode(tags.slash_expand(F.col("raw_tag"))))
    )


@register(
    "date_functions",
    oracle="""
SELECT o_orderkey,
       strftime(o_orderdate, '%m/%d/%Y %H:%M:%S') AS date_str,
       date_trunc('month', o_orderdate) AS order_month,
       o_orderdate + INTERVAL 5 HOUR AS plus_5h,
       year(o_orderdate) AS order_year
FROM orders
""",
    survey_ref="F8",
)
def date_functions(spark, sf_dir):
    """Date formatting (reference '%m/%d/%Y %H:%M:%S' app.py:692),
    truncation, interval arithmetic (DATEADD app.py:6640-6642)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "MM/dd/yyyy HH:mm:ss").alias("date_str"),
        F.date_trunc("month", F.col("o_orderdate")).cast("timestamp_ntz").alias("order_month"),
        (F.col("o_orderdate") + F.expr("INTERVAL 5 HOURS")).alias("plus_5h"),
        F.year("o_orderdate").cast("long").alias("order_year"),
    )


@register(
    "hash_functions",
    oracle="""
SELECT c_custkey, md5(c_name) AS name_md5,
       md5(concat(c_name, '|', c_mktsegment)) AS row_md5
FROM customer
""",
    survey_ref="F9 O8",
)
def hash_functions(spark, sf_dir):
    """MD5 hashing (reference image_hash app.py:3448-3450, LLM cache
    key). md5 agrees bit-for-bit across Spark and DuckDB — it is the
    cross-engine deterministic hash used throughout the dedup layer."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.md5(F.concat(F.col("c_name"), F.lit("|"), F.col("c_mktsegment"))).alias("row_md5"),
    )


@register(
    "null_normalize_counts",
    oracle=f"""
WITH dirty AS (
  SELECT source,
         CASE doc_id % 4 WHEN 0 THEN '' WHEN 1 THEN 'nan' WHEN 2 THEN lang
              ELSE ' ' || lang || ' ' END AS val
  FROM documents
)
SELECT source,
       count(*) AS n_rows,
       count({tags.null_normalize_sql('val')}) AS n_valid,
       sum(CASE WHEN {tags.null_normalize_sql('val')} IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null
FROM dirty GROUP BY source
""",
    survey_ref="F11 A9",
)
def null_normalize_counts(spark, sf_dir):
    """''/'nan'/None -> null unification (reference app.py:6117-6122)
    plus conditional aggregation (per-file summary app.py:6038-6045)."""
    d = load_table(spark, sf_dir, "documents")
    dirty = d.select(
        "source",
        F.when(F.col("doc_id") % 4 == 0, F.lit(""))
        .when(F.col("doc_id") % 4 == 1, F.lit("nan"))
        .when(F.col("doc_id") % 4 == 2, F.col("lang"))
        .otherwise(F.concat(F.lit(" "), F.col("lang"), F.lit(" ")))
        .alias("val"),
    )
    norm = tags.null_normalize(F.col("val"))
    return dirty.groupBy("source").agg(
        F.count("*").alias("n_rows"),
        F.count(norm).alias("n_valid"),
        F.sum(F.when(norm.isNull(), 1).otherwise(0)).alias("n_null"),
    )


@register(
    "semicolon_merge",
    oracle=f"""
WITH pairs AS (
  SELECT p_partkey,
         concat(p_brand, ';', p_type) AS a,
         concat(p_type, ';DOC-', CAST(p_partkey % 7 AS VARCHAR)) AS b
  FROM part
)
SELECT p_partkey, {tags.merge_semicolon_sorted_sql('a', 'b')} AS merged
FROM pairs
""",
    survey_ref="U2 U3 F12",
)
def semicolon_merge(spark, sf_dir):
    """Semicolon-packed multi-value set-union merge
    (reference app.py:5771-5781): split -> set union -> sort -> repack."""
    p = load_table(spark, sf_dir, "part")
    pairs = p.select(
        "p_partkey",
        F.concat_ws(";", "p_brand", "p_type").alias("a"),
        F.concat(F.col("p_type"), F.lit(";DOC-"), (F.col("p_partkey") % 7).cast("string")).alias("b"),
    )
    return pairs.select(
        "p_partkey",
        tags.merge_semicolon_sorted(F.col("a"), F.col("b")).alias("merged"),
    )


# ---------------------------------------------------------------------------
# Aggregation family — SURVEY §2.4
# ---------------------------------------------------------------------------


@register(
    "agg_order_stats",
    oracle="""
SELECT o_orderstatus,
       count(*) AS n_orders,
       count(DISTINCT o_custkey) AS n_customers,
       sum(CASE WHEN o_totalprice > 50000 THEN 1 ELSE 0 END)::BIGINT AS n_big,
       round(sum((CASE WHEN abs(o_totalprice) < 9e13 THEN CAST(floor(o_totalprice * 100 + 0.5) AS HUGEINT) END))::DOUBLE / 100, 2) AS sum_price,
       round(min(o_totalprice), 2) AS min_price,
       round(max(o_totalprice), 2) AS max_price
FROM orders GROUP BY o_orderstatus
""",
    survey_ref="A1 A8 A9 A3",
)
def agg_order_stats(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.sum(F.when(F.col("o_totalprice") > 50000, 1).otherwise(0)).alias("n_big"),
        _money_sum(F.col("o_totalprice"), "sum_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


@register(
    "distinct_pairs",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    survey_ref="A2",
)
def distinct_pairs(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@register(
    "group_envelope",
    oracle="""
SELECT l_orderkey,
       min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
       round(max(l_extendedprice), 2) AS max_price,
       count(*) AS n_lines
FROM lineitem GROUP BY l_orderkey
""",
    survey_ref="A3",
)
def group_envelope(spark, sf_dir):
    """Envelope merge per group: min/max bounds (reference
    merge_envelope app.py:2852-2859 computes bbox envelopes the same
    way). Map-side combinable -> scales to any group count."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        F.count("*").alias("n_lines"),
    )


@register(
    "collect_list_per_group",
    oracle="""
SELECT l_orderkey,
       array_to_string(list(l_linenumber ORDER BY l_linenumber), ',') AS linenumbers_csv
FROM lineitem GROUP BY l_orderkey
""",
    survey_ref="A7",
)
def collect_list_per_group(spark, sf_dir):
    """collect_list per key (reference polyline point collection
    app.py:3069-3078), sorted for determinism and emitted as CSV string
    so the value-hash is representation-stable across engines.

    Per-group state bound (r13 agg-state skew audit): the whole group
    sits in one hash-agg buffer — which, unlike a sort, does not
    spill — and in the output ROW itself, so cost and memory are
    output-proportional by SEMANTICS (the graph_two_hop class). Order
    keys are data-model-bounded (7 lines/order); a corpus with a
    degenerate key (tools/agg_state_skew_check.py plants one key
    owning 30% of lineitem: 1.06x wall at the 5x dir, the map-side
    partials parallelize) scales linearly until the single merged
    buffer approaches executor memory — at which point the mitigation
    is the inverted_index pattern (row_number window head + counts,
    sorts spill) or an upstream cap, not a bigger heap."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.array_join(F.array_sort(F.collect_list("l_linenumber")), ",").alias("linenumbers_csv")
    )


# ---------------------------------------------------------------------------
# Window family — SURVEY §2.5
# ---------------------------------------------------------------------------


@register(
    "latest_event_per_user",
    oracle="""
WITH w AS (
  SELECT user_id, event_id, ts::TIMESTAMP AS ts, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, event_id, ts, event_type FROM w WHERE rn = 1
""",
    survey_ref="W3 A5",
)
def latest_event_per_user(spark, sf_dir):
    """Latest-row-per-key (reference ORDER BY DATE_UPDATED DESC LIMIT 1
    app.py:4825-4833). Partitioned window -> fully parallel."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type")
    )


@register(
    "sessionize_events",
    oracle="""
WITH g AS (
  SELECT event_id, user_id, ts::TIMESTAMP AS ts,
         lag(ts::TIMESTAMP) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events WHERE ts IS NOT NULL
), f AS (
  SELECT event_id, user_id, ts,
         CASE WHEN prev_ts IS NULL THEN 1
              WHEN epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1
              ELSE 0 END AS new_session
  FROM g
)
SELECT event_id, user_id, ts,
       (sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING))::BIGINT AS session_idx
FROM f
""",
    survey_ref="W2+ (analytic superset: lag + running sum)",
)
def sessionize_events(spark, sf_dir):
    """Sessionization: 30-min-gap session ids via lag + running sum —
    the analytic-window superset the reference's event loop implies.
    Integer microsecond arithmetic keeps both engines bit-identical.

    NULL contract (r14 events parity ring): an event with a NULL
    timestamp cannot be placed on a session timeline and is excluded
    at the scan — without the filter the engines silently DISAGREE on
    where NULL sorts in the ASC session ordering (Spark NULLS FIRST,
    DuckDB NULLS LAST), shifting every session boundary in the
    partition. Identity on a null-free corpus."""
    e = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    new_session = (
        F.when(F.lag("ts").over(w).isNull(), 1).when(gap_us > 1_800_000_000, 1).otherwise(0)
    )
    return (
        e.withColumn("new_session", new_session)
        .withColumn(
            "session_idx",
            F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .select("event_id", "user_id", "ts", "session_idx")
    )


# ---------------------------------------------------------------------------
# Sorts / limits / top-k — SURVEY §2.6
# ---------------------------------------------------------------------------


@register(
    "top_orders",
    oracle="""
SELECT o_orderkey, o_totalprice, o_orderdate
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
""",
    survey_ref="§2.6 top-k",
)
def top_orders(spark, sf_dir):
    """Global top-k: Spark's TakeOrderedAndProject — per-partition
    heaps then a k-merge on the driver; no full sort, no full shuffle."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Set operations — SURVEY §2.7
# ---------------------------------------------------------------------------


@register(
    "union_all_sync",
    oracle="""
SELECT o_orderkey AS tag_key, o_totalprice AS price, '1-URGENT' AS register
  FROM orders WHERE o_orderpriority = '1-URGENT'
   AND coalesce(o_orderdate, o_orderdate) BETWEEN TIMESTAMP '1996-01-01 05:00:00'
                                              AND TIMESTAMP '1997-01-01 05:00:00'
UNION ALL
SELECT o_orderkey, o_totalprice, '2-HIGH' FROM orders WHERE o_orderpriority = '2-HIGH'
   AND coalesce(o_orderdate, o_orderdate) BETWEEN TIMESTAMP '1996-01-01 05:00:00'
                                              AND TIMESTAMP '1997-01-01 05:00:00'
UNION ALL
SELECT o_orderkey, o_totalprice, '3-MEDIUM' FROM orders WHERE o_orderpriority = '3-MEDIUM'
   AND coalesce(o_orderdate, o_orderdate) BETWEEN TIMESTAMP '1996-01-01 05:00:00'
                                              AND TIMESTAMP '1997-01-01 05:00:00'
UNION ALL
SELECT o_orderkey, o_totalprice, '5-LOW' FROM orders WHERE o_orderpriority = '5-LOW'
   AND coalesce(o_orderdate, o_orderdate) BETWEEN TIMESTAMP '1996-01-01 05:00:00'
                                              AND TIMESTAMP '1997-01-01 05:00:00'
""",
    survey_ref="U1 F8",
)
def union_all_sync(spark, sf_dir):
    """The reference's 4-register UNION ALL sync with per-branch
    COALESCE date-window (sync_tags app.py:6638-6668), with 'now'
    frozen to a literal for determinism (SURVEY §7.4). unionByName of
    identically-projected branches — Catalyst collapses the 4 scans
    into one pass over the table when sources match."""
    o = load_table(spark, sf_dir, "orders")
    lo = F.lit("1996-01-01 05:00:00").cast("timestamp_ntz")
    hi = F.lit("1997-01-01 05:00:00").cast("timestamp_ntz")

    def branch(priority):
        return (
            o.where(
                (F.col("o_orderpriority") == priority)
                & F.coalesce(F.col("o_orderdate"), F.col("o_orderdate")).between(lo, hi)
            )
            .select(
                F.col("o_orderkey").alias("tag_key"),
                F.col("o_totalprice").alias("price"),
                F.lit(priority).alias("register"),
            )
        )

    out = branch("1-URGENT")
    for pr in ["2-HIGH", "3-MEDIUM", "5-LOW"]:
        out = out.unionByName(branch(pr))
    return out


@register(
    "except_customers",
    oracle="""
SELECT c_custkey FROM customer
EXCEPT
SELECT o_custkey AS c_custkey FROM orders
""",
    survey_ref="U4",
)
def except_customers(spark, sf_dir):
    """Set difference (reference remaining_for_pipe app.py:955)."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.subtract(o)


# ---------------------------------------------------------------------------
# Streaming-batch analogue — SURVEY §2.9 (tumbling windows over events)
# ---------------------------------------------------------------------------


@register(
    "tumbling_event_counts",
    oracle="""
SELECT date_trunc('hour', ts::TIMESTAMP) AS window_start, event_type,
       count(*) AS n_events,
       round(sum((CASE WHEN abs(value) < 9e13 THEN CAST(floor(value * 100 + 0.5) AS HUGEINT) END))::DOUBLE / 100, 2) AS sum_value
FROM events GROUP BY 1, 2
""",
    survey_ref="§2.9 (batch view of the streaming tumbling-window agg)",
)
def tumbling_event_counts(spark, sf_dir):
    """Tumbling 1-hour windowed aggregation — the batch-mode twin of
    acuvate_spark.streaming's windowed stream (same logical plan shape
    Structured Streaming runs incrementally with a watermark)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(_cents(F.col("value")).cast("decimal(25,0)")).cast("double") / 100, 2)
            .alias("sum_value"),
        )
    )


@register(
    "sliding_event_counts",
    oracle="""
WITH ev AS (SELECT ts::TIMESTAMP AS ts, event_type, value
            FROM events WHERE ts IS NOT NULL),
exp AS (
  SELECT time_bucket(INTERVAL '30 minutes', ts) - to_minutes(30 * k) AS window_start,
         event_type, value
  FROM ev, unnest([0, 1]) AS t(k)
)
SELECT window_start, event_type, count(*) AS n_events,
       round(sum((CASE WHEN abs(value) < 9e13 THEN CAST(floor(value * 100 + 0.5) AS HUGEINT) END))::DOUBLE / 100, 2) AS sum_value
FROM exp GROUP BY 1, 2
""",
    survey_ref="§2.9 (batch view of the streaming sliding-window agg)",
)
def sliding_event_counts(spark, sf_dir):
    """Sliding 1-hour/30-minute windowed aggregation — batch twin of
    the hopping-window stream (F.window with a slide expands each
    event into its overlapping windows before the partial agg, so the
    shuffle carries window-expanded partial aggregates, not raw rows).
    The oracle expands the same two windows per event from the 30-min
    time bucket.

    NULL contract (r14): a NULL-ts event belongs to no window and is
    excluded at the scan — Spark's window(NULL) yields one NULL group
    while the oracle's two-window expansion double-counts the row
    into a NULL bucket, so without the filter the engines disagree
    structurally. Identity on a null-free corpus."""
    e = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(_cents(F.col("value")).cast("decimal(25,0)")).cast("double") / 100, 2)
            .alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


# ---------------------------------------------------------------------------
# Skew-safe salted aggregation — SURVEY §4 (salting); proves the
# two-phase rewrite is result-identical to the plain GROUP BY.
# ---------------------------------------------------------------------------


@register(
    "salted_agg_lineitem",
    oracle="""
SELECT l_returnflag,
       count(*) AS n_rows,
       round(sum(l_quantity), 2) AS sum_qty,
       min(l_quantity) AS min_qty,
       max(l_quantity) AS max_qty
FROM lineitem GROUP BY l_returnflag
""",
    survey_ref="§4 skew salting (two-phase agg == plain GROUP BY)",
)
def salted_agg_lineitem(spark, sf_dir):
    """Hot-key aggregation via salting: phase 1 groups on (key, salt)
    so one giant key spreads across 16 tasks; phase 2 merges partials
    by key. l_returnflag has only 3 values — exactly the
    few-huge-groups shape where salting matters — and the oracle is
    the plain GROUP BY, proving the rewrite changes placement, never
    results."""
    from ..operators.skew import salted_agg

    li = load_table(spark, sf_dir, "lineitem")
    return salted_agg(
        li,
        ["l_returnflag"],
        partial_aggs=[
            F.count("*").alias("c"),
            F.sum("l_quantity").alias("s"),
            F.min("l_quantity").alias("mn"),
            F.max("l_quantity").alias("mx"),
        ],
        final_aggs=[
            F.sum("c").alias("n_rows"),
            F.round(F.sum("s"), 2).alias("sum_qty"),
            F.min("mn").alias("min_qty"),
            F.max("mx").alias("max_qty"),
        ],
    )


@register(
    "json_props_extract",
    oracle="""
SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
       json_valid(props) AS is_valid
FROM events
""",
    survey_ref="F13 (JSON parse; inverse of to_json serialization)",
)
def json_props_extract(spark, sf_dir):
    """Schema-on-read JSON parsing of a string column with from_json
    (the inverse of the reference's to_json at app.py:2443): the props
    column parses against an explicit schema; malformed rows yield
    null, surfaced by the validity flag.

    NULL contract (r14): a NULL props cell has NULL validity — the
    SQL convention (json_valid(NULL) IS NULL) — not False; Spark's
    from_json(NULL).isNotNull() rendered False and silently diverged
    from the oracle on null-dense input."""
    e = load_table(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), "k int")
    return e.select(
        "event_id",
        parsed["k"].alias("k_val"),
        F.when(F.col("props").isNull(), F.lit(None).cast("boolean"))
        .otherwise(parsed.isNotNull())
        .alias("is_valid"),
    )


@register(
    "event_funnel",
    oracle="""
WITH ev AS (
  SELECT * FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
), signup AS (
  SELECT user_id, min(ts::TIMESTAMP) AS first_signup
  FROM ev WHERE event_type = 'signup' GROUP BY user_id
), purchases AS (
  SELECT e.user_id, count(*) AS n_purchases,
         round(sum((CASE WHEN abs(e.value) < 9e13 THEN CAST(floor(e.value * 100 + 0.5) AS HUGEINT) END))::DOUBLE / 100, 2) AS purchase_value
  FROM ev e JOIN signup s
    ON e.user_id = s.user_id AND e.event_type = 'purchase'
   AND e.ts::TIMESTAMP > s.first_signup
  GROUP BY e.user_id
)
SELECT s.user_id, s.first_signup,
       coalesce(p.n_purchases, 0) AS n_purchases,
       coalesce(p.purchase_value, 0.0) AS purchase_value,
       (p.user_id IS NOT NULL) AS converted
FROM signup s LEFT JOIN purchases p ON p.user_id = s.user_id
""",
    survey_ref="idiomatic analytic superset: funnel conversion over events",
)
def event_funnel(spark, sf_dir):
    """Signup -> purchase funnel: first signup per user, then
    purchases strictly after it; conversion flag per user.

    ONE shuffle: a user_id-partitioned window pins each row's
    first_signup, and the follow-on groupBy(user_id, first_signup)
    reuses that hash partitioning (user_id is a subset of the
    grouping keys), so the r03 shape's localCheckpoint + two
    aggregate/join shuffles collapse into conditional aggregates.

    NULL contract (r14): an event with no user or no timestamp cannot
    be attributed to a funnel and is excluded at the scan. Without the
    filter the two formulations disagree: the window form groups all
    NULL users into ONE partition whose purchases qualify against the
    group's first signup, while the oracle's equi-joins drop NULL
    user_id (NULL never equals NULL), and a user whose only signup has
    NULL ts survives the oracle with a NULL first_signup but is
    filtered by the window form. Identity on a null-free corpus."""
    e = load_table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    w = Window.partitionBy("user_id")
    is_purchase = F.col("event_type") == "purchase"
    funnel = (
        e.where(F.col("event_type").isin("signup", "purchase"))
        .withColumn(
            "first_signup",
            F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w),
        )
        .where(F.col("first_signup").isNotNull())
    )
    qualifies = is_purchase & (F.col("ts") > F.col("first_signup"))
    return (
        funnel.groupBy("user_id", "first_signup")
        .agg(
            F.count(F.when(qualifies, F.lit(1))).alias("n_purchases"),
            F.coalesce(
                F.round(
                    F.sum(
                        F.when(qualifies, _cents(F.col("value"))).cast("decimal(25,0)")
                    ).cast("double")
                    / 100,
                    2,
                ),
                F.lit(0.0),
            ).alias("purchase_value"),
        )
        .withColumn("converted", F.col("n_purchases") > 0)
    )


@register(
    "sketch_stats",
    oracle="""
WITH ranked AS (
  SELECT o_orderstatus, o_totalprice,
         row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice) AS rn,
         count(*) OVER (PARTITION BY o_orderstatus) AS n
  FROM orders
)
SELECT o_orderstatus,
       max(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT) THEN o_totalprice END) AS p25,
       max(CASE WHEN rn = CAST(ceil(0.50 * n) AS BIGINT) THEN o_totalprice END) AS p50,
       max(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT) THEN o_totalprice END) AS p75,
       count(*) AS n_rows
FROM ranked GROUP BY o_orderstatus
""",
    survey_ref="A8 approximate variant: quantile sketch for 100TB profiling",
)
def sketch_stats(spark, sf_dir):
    """Quantile-sketch profiling per order status — the mergeable
    (map-side combinable) aggregate every 100 TB profiling pass uses
    where an exact sort would shuffle the world. Accuracy is the knob:
    at fixture scale we run the GK sketch at accuracy >> n, where it
    degenerates to the exact order statistic at rank ceil(p*n) — which
    is what the oracle pins via row_number; production runs lower the
    accuracy (memory ~ accuracy) and accept rank error n/accuracy.
    Scalar p25/p50/p75 columns (one percentile_approx each) rather
    than one array column: the sketch buffer is shared per-column by
    Catalyst, and scalar outputs keep the result frame canonical for
    downstream consumers. The HLL distinct-count twin lives in
    sketch_hll_distinct (rows-only: HLL values are engine-specific)."""
    o = load_table(spark, sf_dir, "orders")
    acc = 1_000_000  # >> max group size at test SFs => exact order stats
    return o.groupBy("o_orderstatus").agg(
        F.percentile_approx("o_totalprice", 0.25, acc).alias("p25"),
        F.percentile_approx("o_totalprice", 0.50, acc).alias("p50"),
        F.percentile_approx("o_totalprice", 0.75, acc).alias("p75"),
        F.count("*").alias("n_rows"),
    )


@register(
    "sketch_hll_distinct",
    oracle="""
SELECT o_orderstatus,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
       TRUE AS hll_ok
FROM orders GROUP BY o_orderstatus
""",
    survey_ref="A8 approximate variant: HLL++ distinct sketch",
)
def sketch_hll_distinct(spark, sf_dir):
    """HyperLogLog++ distinct customers per order status, fully
    hash-verifiable (r03 verdict item 4): the engine-specific HLL
    register value stays OUT of the result; what ships is the exact
    count (DuckDB reproduces it) plus ``hll_ok`` — Spark's HLL++
    estimate landing within 3x its configured rsd (0.02) of exact.
    The oracle pins ``hll_ok`` to TRUE, so an out-of-bound sketch is
    a hash MISMATCH the driver flags, not a silent pass. At 100 TB
    the exact column is dropped and only the mergeable sketch runs."""
    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", 0.02).alias("approx_customers"),
        F.countDistinct("o_custkey").alias("exact_customers"),
    )
    err = F.abs(F.col("approx_customers") - F.col("exact_customers"))
    return agg.select(
        "o_orderstatus",
        "exact_customers",
        (err <= 0.06 * F.col("exact_customers")).alias("hll_ok"),
    )


@register(
    "rollup_sales",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
       count(*) AS n_rows,
       round(sum((CASE WHEN abs(l_extendedprice) < 9e13 THEN CAST(floor(l_extendedprice * 100 + 0.5) AS HUGEINT) END))::DOUBLE / 100, 2) AS revenue
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
    survey_ref="A-family extension: hierarchical rollup (grouping sets)",
)
def rollup_sales(spark, sf_dir):
    """Hierarchical totals in ONE pass: (flag, status), per-flag
    subtotals, and the grand total via ROLLUP — the multi-resolution
    aggregate a warehouse serves from a single shuffle instead of
    three queries. grouping_id disambiguates subtotal rows from real
    NULL groups (both engines use the same bitmask order). On empty
    input ANSI still emits the grand-total row (gid 3, count 0, sum
    NULL) — appended via _with_ansi_empty_grand_total, where Spark's
    Expand aggregate alone would return nothing."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").alias("n_rows"),
            _money_sum(F.col("l_extendedprice"), "revenue"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "n_rows", "revenue")
    )
    return _with_ansi_empty_grand_total(
        agg,
        li,
        [
            F.lit(None).cast("string").alias("l_returnflag"),
            F.lit(None).cast("string").alias("l_linestatus"),
            F.lit(3).cast("long").alias("gid"),
            F.lit(0).cast("long").alias("n_rows"),
            F.lit(None).cast("double").alias("revenue"),
        ],
    )


@register(
    "pivot_order_status",
    oracle="""
SELECT CAST(year(o_orderdate::TIMESTAMP) AS BIGINT) AS order_year,
       round(coalesce(sum(CASE WHEN o_orderstatus = 'F'
                          THEN (CASE WHEN abs(o_totalprice) < 9e13 THEN CAST(floor(o_totalprice * 100 + 0.5) AS HUGEINT) END) END),
                      0)::DOUBLE / 100, 2) AS f_total,
       round(coalesce(sum(CASE WHEN o_orderstatus = 'O'
                          THEN (CASE WHEN abs(o_totalprice) < 9e13 THEN CAST(floor(o_totalprice * 100 + 0.5) AS HUGEINT) END) END),
                      0)::DOUBLE / 100, 2) AS o_total,
       round(coalesce(sum(CASE WHEN o_orderstatus = 'P'
                          THEN (CASE WHEN abs(o_totalprice) < 9e13 THEN CAST(floor(o_totalprice * 100 + 0.5) AS HUGEINT) END) END),
                      0)::DOUBLE / 100, 2) AS p_total
FROM orders GROUP BY 1
""",
    survey_ref="A-family extension: pivot (long -> wide conditional aggregation)",
)
def pivot_order_status(spark, sf_dir):
    """Long-to-wide pivot: total price per order year with one column
    per status. An explicit pivot value list keeps the plan one-pass
    (Spark otherwise runs an extra distinct job to discover values —
    never do that at 100 TB) and pins the output schema for the
    oracle, which renders the same thing as conditional aggregation."""
    o = load_table(spark, sf_dir, "orders")
    wide = (
        o.select(
            F.year(F.col("o_orderdate")).cast("long").alias("order_year"),
            "o_orderstatus",
            _cents(F.col("o_totalprice")).cast("decimal(25,0)").alias("cents"),
        )
        .groupBy("order_year")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .sum("cents")
    )

    def dollars(col_name, alias):
        return F.round(
            F.coalesce(F.col(col_name), F.lit(0)).cast("double") / 100, 2
        ).alias(alias)

    return wide.select(
        "order_year",
        dollars("F", "f_total"),
        dollars("O", "o_total"),
        dollars("P", "p_total"),
    )


@register(
    "cube_order_year",
    oracle="""
WITH v AS (
  SELECT o_orderstatus,
         CAST(year(o_orderdate::TIMESTAMP) AS BIGINT) AS order_year,
         o_totalprice
  FROM orders
)
SELECT o_orderstatus, order_year,
       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(order_year) AS BIGINT) AS gid,
       count(*) AS n_orders,
       round(sum((CASE WHEN abs(o_totalprice) < 9e13 THEN CAST(floor(o_totalprice * 100 + 0.5) AS HUGEINT) END))::DOUBLE / 100, 2) AS total
FROM v
GROUP BY CUBE (o_orderstatus, order_year)
""",
    survey_ref="A-family extension: cube (all grouping-set resolutions)",
)
def cube_order_year(spark, sf_dir):
    """CUBE — every resolution of (status, year) including both
    one-dimensional margins and the grand total, from ONE shuffle.
    Completes the grouping-sets trio next to rollup_sales and
    pivot_order_status; grouping_id's bitmask disambiguates margin
    rows from genuine NULL groups identically in both engines. On
    empty input the ANSI grand-total row (gid 3, count 0, sum NULL)
    is appended via _with_ansi_empty_grand_total."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus",
        F.year(F.col("o_orderdate")).cast("long").alias("order_year"),
        "o_totalprice",
    )
    agg = (
        o.cube("o_orderstatus", "order_year")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").alias("n_orders"),
            _money_sum(F.col("o_totalprice"), "total"),
        )
        .select("o_orderstatus", "order_year", "gid", "n_orders", "total")
    )
    return _with_ansi_empty_grand_total(
        agg,
        o,
        [
            F.lit(None).cast("string").alias("o_orderstatus"),
            F.lit(None).cast("long").alias("order_year"),
            F.lit(3).cast("long").alias("gid"),
            F.lit(0).cast("long").alias("n_orders"),
            F.lit(None).cast("double").alias("total"),
        ],
    )


@register(
    "running_totals",
    oracle="""
WITH v AS (
  SELECT o_custkey, o_orderdate, o_orderkey,
         CASE WHEN isfinite(o_totalprice)
              THEN TRY_CAST(o_totalprice AS DECIMAL(12,2)) END AS p
  FROM orders
)
SELECT o_custkey AS cust_id, o_orderdate, o_orderkey,
       CAST(count(*) OVER w AS BIGINT) AS n_orders_so_far,
       CAST(sum(p) OVER w AS DOUBLE) AS spend_so_far
FROM v
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
    survey_ref="W-family extension: rows-frame running aggregate",
)
def running_totals(spark, sf_dir):
    """Running per-customer order count and cumulative spend — the
    rows-frame window family (UNBOUNDED PRECEDING .. CURRENT ROW)
    none of W1-W4 exercises. The money column goes through
    DECIMAL(12,2) so the running sum is exact (float accumulation
    order would differ between engines); the final cast back to double
    is deterministic. o_orderkey breaks same-day ties so every prefix
    is uniquely defined. The cast is TRY_CAST in both engines (r14
    extreme-value ring): a non-finite or beyond-DECIMAL(12,2) cell is
    out of the money domain — NULL, skipped by the running sum —
    where a plain cast ANSI-crashed Spark and errored DuckDB alike.

    ADAPTIVE TWO-LEVEL CUMSUM (r12, tools/window_skew_check.py): the
    single `partitionBy(custkey)` window serializes each customer into
    one task — a hot customer owning 30% of a 15M-row log measured
    4.25x uniform at the 100x dir. The always-two-level form is no
    answer either: its offsets equi-join costs every corpus ~4x at the
    same dir (1.98 -> 8.03 s uniform). So the routing follows the
    repo's adaptive pattern (assign modes, hot-bucket knee): one cheap
    map-side-combined probe finds the max per-key row count, and only
    a corpus with a genuinely hot key (>= _RT_HOT_KEY_MIN rows — a
    single-task sort past that dominates the window stage) takes the
    token_budget_mix decomposition keyed on a PREFIX of the sort
    order: the row-level window partitions by (custkey, calendar
    month) — a hot entity spreads over its months — and per-month base
    offsets come from a per-customer bucket aggregate whose own
    exclusive-prefix window is |customers| x |months| rows. Month is a
    prefix of (o_orderdate, o_orderkey), and DECIMAL sums are
    associative, so offset + intra-bucket prefix equals the global
    prefix EXACTLY — the oracle stays the single-window SQL and both
    routes are pinned identical (tests/test_window_skew.py). Measured
    at the 100x dir: hot 8.4 -> 6.3 s (0.78x of the two-level
    uniform), uniform keeps the 1.98 s single-window plan + a 0.4 s
    probe."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderdate",
        "o_orderkey",
        F.expr("try_cast(o_totalprice AS decimal(12,2))").alias("p"),
    )
    # metadata-only short-circuit: when the WHOLE table is under the
    # knee, no key can be hot — bench/gate scales skip the probe job
    # entirely (same footer source as the adaptive-LSH gates)
    from .dedup import _footer_rows

    total = _footer_rows(spark, f"{sf_dir}/orders.parquet")
    if total is not None and total < _RT_HOT_KEY_MIN:
        max_key = 0
    else:
        max_key = (
            o.groupBy("o_custkey").agg(F.count("*").alias("n")).agg(F.max("n")).first()[0]
        )
    if max_key is None or max_key < _RT_HOT_KEY_MIN:
        w = (
            Window.partitionBy("o_custkey")
            .orderBy("o_orderdate", "o_orderkey")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return o.select(
            F.col("o_custkey").alias("cust_id"),
            "o_orderdate",
            "o_orderkey",
            F.count("*").over(w).cast("long").alias("n_orders_so_far"),
            F.sum("p").over(w).cast("double").alias("spend_so_far"),
        )
    o = o.withColumn("__b", F.year("o_orderdate") * 12 + F.month("o_orderdate"))
    wi = (
        Window.partitionBy("o_custkey", "__b")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    intra = o.select(
        "o_custkey",
        "o_orderdate",
        "o_orderkey",
        "__b",
        F.count("*").over(wi).alias("__in"),
        F.sum("p").over(wi).alias("__is"),
    )
    wb = (
        Window.partitionBy("o_custkey")
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        o.groupBy("o_custkey", "__b")
        .agg(F.count("*").alias("__bn"), F.sum("p").alias("__bs"))
        .select(
            "o_custkey",
            "__b",
            F.coalesce(F.sum("__bn").over(wb), F.lit(0)).alias("__on"),
            F.coalesce(F.sum("__bs").over(wb), F.lit(0).cast("decimal(22,2)")).alias(
                "__os"
            ),
        )
    )
    return intra.join(offsets, ["o_custkey", "__b"]).select(
        F.col("o_custkey").alias("cust_id"),
        "o_orderdate",
        "o_orderkey",
        (F.col("__on") + F.col("__in")).cast("long").alias("n_orders_so_far"),
        (F.col("__os") + F.col("__is")).cast("double").alias("spend_so_far"),
    )


@register(
    "unpivot_part_metrics",
    oracle="""
SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS value FROM part
UNION ALL
SELECT p_partkey, 'size', CAST(p_size AS DOUBLE) FROM part
""",
    survey_ref="A-family extension: unpivot (wide -> long melt)",
)
def unpivot_part_metrics(spark, sf_dir):
    """UNPIVOT/melt — the inverse of pivot_order_status: one wide row
    becomes one long row per metric. Spark plans this as a single
    Expand node: a narrow, shuffle-free map-side expansion, so at
    100 TB it costs exactly one scan regardless of how many metric
    columns melt. The oracle renders the same thing as UNION ALL
    branches over one table."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_retailprice").alias("retailprice"),
        F.col("p_size").cast("double").alias("size"),
    )
    return p.unpivot("p_partkey", ["retailprice", "size"], "metric", "value")


@register(
    "click_attribution",
    oracle="""
SELECT c2.user_id,
       c2.event_id AS purchase_id, c2.ts::TIMESTAMP AS purchase_ts,
       c1.event_id AS click_id, c1.ts::TIMESTAMP AS click_ts
FROM events c1 JOIN events c2
  ON c1.user_id = c2.user_id
 AND c1.event_type = 'click' AND c2.event_type = 'purchase'
 AND c2.ts::TIMESTAMP > c1.ts::TIMESTAMP
 AND c2.ts::TIMESTAMP <= c1.ts::TIMESTAMP + INTERVAL 1 HOUR
""",
    survey_ref="§2.9 extension: interval attribution join (batch twin of the "
    "stream-stream join in streaming/windows.py)",
)
def click_attribution(spark, sf_dir):
    """Click-to-purchase attribution: every (click, purchase) pair for
    the same user where the purchase lands within an hour after the
    click — the batch twin of the stream-stream watermarked join in
    ``streaming.windows.click_purchase_attribution`` (parity-tested).
    The join is an equi-join on user_id with the time-range predicate
    evaluated inside each co-partitioned user group — one shuffle per
    side, pair volume bounded by per-user activity within the horizon,
    never |clicks| x |purchases|."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    return clicks.join(
        purchases,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select("user_id", "purchase_id", "purchase_ts", "click_id", "click_ts")


@register(
    "price_equidepth_bins",
    oracle="""
WITH b AS (
  SELECT quantile_cont(l_extendedprice, [0.25, 0.5, 0.75]) AS bs
  FROM lineitem WHERE isfinite(l_extendedprice)
)
SELECT CASE WHEN l_extendedprice <= bs[1] THEN 1
            WHEN l_extendedprice <= bs[2] THEN 2
            WHEN l_extendedprice <= bs[3] THEN 3
            ELSE 4 END AS bin,
       count(*) AS n_rows,
       round(sum((CASE WHEN abs(l_extendedprice) < 9e13 THEN CAST(floor(l_extendedprice * 100 + 0.5) AS HUGEINT) END))::DOUBLE / 100, 2) AS sum_price,
       round(min(l_extendedprice), 2) AS min_price,
       round(max(l_extendedprice), 2) AS max_price
FROM lineitem, b
GROUP BY 1
""",
    survey_ref="T63 equi-depth binning",
)
def price_equidepth_bins(spark, sf_dir):
    """Equi-depth (quartile-boundary) feature binning: one 1-row
    quantile aggregate, broadcast back, then a map-side CASE assign +
    hash aggregate. Two passes over the fact table, zero row-level
    joins or sorts.

    This is the boundary-based twin of ``length_quartiles``' rank-based
    ntile: ranks need a per-group sort of every row, while boundaries
    need only a quantile AGGREGATE — which is the piece that swaps for
    a mergeable sketch (``approx_percentile`` / the GK sketch behind
    ``sketch_stats``) on the 100 TB path, keeping the identical plan
    shape. The oracle uses the exact interpolated quantile, which
    Spark's ``percentile`` matches bit-for-bit (same (n-1)*p linear
    interpolation over IEEE doubles as DuckDB's ``quantile_cont``).

    Boundary estimation ignores non-finite cells (r14 extreme-value
    ring: a single NaN collapsed DuckDB's interpolation into one
    all-rows bin while Spark binned normally). Non-finite rows are
    still BINNED — NaN/+Inf fall to the last bin under both engines'
    shared NaN-greatest total order.

    r15 (guide §1.2 per-task work — measured): the quantile aggregate
    itself is now order statistics over a row_number window plus
    Spark's own interpolation formula replicated expression-for-
    expression, not the built-in ``percentile``. The built-in is a
    TypedImperativeAggregate whose buffer is a boxed value->count
    OpenHashMap, Java-serialized per partial and merged into one final
    map — at sf0.1 the prices are ~97% distinct, so that map holds
    ~every row and the boundary stage alone profiled at 1.6-1.8 s. The
    window form sorts the bare doubles once and reads 6 ranks:
    1.615 s -> 0.746 s on the boundary stage, boundaries verified
    BIT-identical (struct.pack compare; the ``(higher - position) *
    lowerKey + (position - lower) * higherKey`` expression below is
    Percentile.getPercentile's arithmetic in the same operation
    order). Single-task state note: the global window moves every
    price into one sort — but the built-in's final merge ALSO held
    every distinct price in one task's map, so the swap does not
    change the scale class; at warehouse scale both swap to the
    mergeable GK sketch as documented.
    """
    li = load_table(spark, sf_dir, "lineitem")
    fin = li.where(F.abs(F.col("l_extendedprice")) < F.lit(float("inf")))
    n1 = fin.agg(F.count("*").alias("n"))
    rn = fin.select(F.col("l_extendedprice").alias("v")).withColumn(
        "rn", F.row_number().over(Window.orderBy("v"))
    )
    aggs, outs = [], []
    for i, p in enumerate((0.25, 0.5, 0.75)):
        pos = (F.col("n") - F.lit(1)).cast("double") * F.lit(p)
        lo = F.floor(pos).cast("long")
        hi = F.ceil(pos).cast("long")
        aggs += [
            F.min(F.when(F.col("rn") == lo + 1, F.col("v"))).alias(f"lk{i}"),
            F.min(F.when(F.col("rn") == hi + 1, F.col("v"))).alias(f"hk{i}"),
            F.min(pos).alias(f"pos{i}"),
            F.min(lo).alias(f"lo{i}"),
            F.min(hi).alias(f"hi{i}"),
        ]
    for i in range(3):
        pos, lo, hi = F.col(f"pos{i}"), F.col(f"lo{i}"), F.col(f"hi{i}")
        lk, hk = F.col(f"lk{i}"), F.col(f"hk{i}")
        outs.append(
            F.when(hi == lo, lk).otherwise(
                (hi.cast("double") - pos) * lk + (pos - lo.cast("double")) * hk
            )
        )
    b = (
        rn.crossJoin(F.broadcast(n1))
        .groupBy()
        .agg(*aggs)
        .select(F.array(*outs).alias("bs"))
    )
    j = li.crossJoin(F.broadcast(b))
    price = F.col("l_extendedprice")
    bin_col = (
        F.when(price <= F.col("bs").getItem(0), 1)
        .when(price <= F.col("bs").getItem(1), 2)
        .when(price <= F.col("bs").getItem(2), 3)
        .otherwise(4)
    )
    return j.groupBy(bin_col.alias("bin")).agg(
        F.count("*").alias("n_rows"),
        _money_sum(price, "sum_price"),
        F.round(F.min(price), 2).alias("min_price"),
        F.round(F.max(price), 2).alias("max_price"),
    )


# ---------------------------------------------------------------------------
# Count-min sketch point query (completes the sketch family: GK
# quantiles, HLL distinct, KMV overlap -> +CMS frequency)
# ---------------------------------------------------------------------------

_CMS_D = 4  # hash rows
_CMS_W = 256  # counters per row
_CMS_PROBES = (
    "spark", "table", "fast", "row", "hash",
    "the", "window", "sort", "value", "zzz_absent",
)


@register(
    "cms_point_query",
    oracle=f"""
WITH tok AS (
  SELECT unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                x -> x <> '')) AS term
  FROM documents
),
jb AS (
  SELECT j, ('0x' || substring(md5(CAST(j AS VARCHAR) || '|' || term), 1, 8))::BIGINT
            % {_CMS_W} AS bucket
  FROM tok, LATERAL (SELECT unnest(range(0, {_CMS_D})) AS j) t
),
sk AS (SELECT j, bucket, CAST(count(*) AS BIGINT) AS c FROM jb GROUP BY 1, 2),
probes AS (SELECT unnest([{", ".join(f"'{w}'" for w in _CMS_PROBES)}]) AS word),
pj AS (
  SELECT word, j,
         ('0x' || substring(md5(CAST(j AS VARCHAR) || '|' || word), 1, 8))::BIGINT
         % {_CMS_W} AS bucket
  FROM probes, LATERAL (SELECT unnest(range(0, {_CMS_D})) AS j) t
),
est AS (
  SELECT word, CAST(min(coalesce(sk.c, 0)) AS BIGINT) AS cms_est
  FROM pj LEFT JOIN sk USING (j, bucket) GROUP BY word
),
exact AS (
  SELECT term AS word, CAST(count(*) AS BIGINT) AS exact_count
  FROM tok WHERE term IN ({", ".join(f"'{w}'" for w in _CMS_PROBES)}) GROUP BY 1
)
SELECT p.word,
       CAST(coalesce(e.exact_count, 0) AS BIGINT) AS exact_count,
       est.cms_est,
       CAST(est.cms_est - coalesce(e.exact_count, 0) AS BIGINT) AS overestimate,
       est.cms_est >= coalesce(e.exact_count, 0) AS sound
FROM probes p JOIN est USING (word) LEFT JOIN exact e ON e.word = p.word
""",
    survey_ref="A8 approximate variant: count-min sketch frequency "
    "estimation (mergeable bounded-state counter matrix + point queries)",
)
def cms_point_query(spark, sf_dir):
    """Count-min sketch over the corpus token stream: a fixed
    4 x 256 counter matrix (each token increments one counter per
    hash row), then point-queries for a probe word set — estimate =
    min over the 4 counters, which can only OVERestimate (``sound``
    pins the one-sided guarantee; the oracle replays the identical
    sketch so every value hash-matches). This is the
    frequency-estimation member of the sketch family (GK quantiles =
    sketch_stats, HLL distinct = sketch_hll_distinct, KMV overlap =
    source_overlap_kmv): at 100 TB the exact per-word count needs a
    vocabulary-sized shuffle, while the CMS is 1024 mergeable longs —
    constant state, map-side combinable, streamable.

    Plan: tokens explode x4 into (j, bucket) rows — narrow, fused
    into the scan; ONE 1024-group partial aggregate builds the
    sketch; probes are a literal frame whose lookups broadcast-join
    the sketch. The exact side (for the audit columns) is a probe-
    filtered count — the isin filter prunes the token stream before
    its tiny aggregate."""
    d = repartition_for_compute(load_table(spark, sf_dir, "documents"))
    words = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"), lambda x: x != ""
    )
    tok = d.select(F.explode(words).alias("term"))
    # Aggregate the token stream to (term, count) BEFORE hashing (r14,
    # guide §2.3): the 4 md5(j|term) bucket hashes were computed per
    # token INSTANCE — 4 x |tokens| md5 calls, the measured hotspot —
    # and the exact-count audit side re-tokenized the whole corpus in a
    # second pass. One map-side-combinable wordcount reduces the stream
    # to its vocabulary; the sketch hashes each distinct term once and
    # sums counts into the same 1024 counters (sum of per-term counts
    # per bucket == count of token instances per bucket, so every
    # counter — and every result row — is bit-identical), and the exact
    # side is now a filter on the same frame instead of a second scan.
    # Persisted: sketch and exact are separate consumers; released via
    # the standard epilogue.
    tcounts = (
        tok.groupBy("term").agg(F.count("*").cast("long").alias("tc")).persist()
    )

    def bucket(j, col):
        return (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{j}|"), col)), 1, 8), 16, 10
            ).cast("long")
            % _CMS_W
        )

    jb = tcounts.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).cast("long").alias("j"),
                        bucket(j, F.col("term")).alias("bucket"),
                    )
                    for j in range(_CMS_D)
                ]
            )
        ).alias("jb"),
        "tc",
    ).select("jb.j", "jb.bucket", "tc")
    sketch = jb.groupBy("j", "bucket").agg(F.sum("tc").cast("long").alias("c"))
    probes = spark.range(1).select(
        F.explode(F.array(*[F.lit(w) for w in _CMS_PROBES])).alias("word")
    )
    pj = probes.select(
        "word",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).cast("long").alias("j"),
                        bucket(j, F.col("word")).alias("bucket"),
                    )
                    for j in range(_CMS_D)
                ]
            )
        ).alias("jb"),
    ).select("word", "jb.j", "jb.bucket")
    est = (
        pj.join(sketch, ["j", "bucket"], "left")
        .groupBy("word")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("cms_est"))
    )
    exact = tcounts.where(F.col("term").isin(*_CMS_PROBES)).select(
        F.col("term").alias("word"), F.col("tc").alias("exact_count")
    )
    result = (
        probes.join(est, "word")
        .join(exact, "word", "left")
        .select(
            "word",
            F.coalesce(F.col("exact_count"), F.lit(0)).cast("long").alias("exact_count"),
            "cms_est",
            (F.col("cms_est") - F.coalesce(F.col("exact_count"), F.lit(0)))
            .cast("long")
            .alias("overestimate"),
            (F.col("cms_est") >= F.coalesce(F.col("exact_count"), F.lit(0))).alias("sound"),
        )
    )
    return materialize_and_release(result, tcounts)
