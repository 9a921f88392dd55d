"""Join family — SURVEY.md §2.3 (J1-J11).

Warehouse joins (anti/semi/lookup) are equi-joins on keys; geometric
joins (nearest-neighbor, containment, overlap, distance-dedupe) are
theta joins re-expressed over the synthetic numeric columns. Every
small side is broadcast explicitly so the plans Catalyst produces are
the ones that survive a 1000-executor scale-up: broadcast-hash for
dim-sized sides, sort-merge for fact-fact, and bucketed grid keys to
turn unbounded theta joins into bounded equi-joins (SURVEY §4 O3).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..tables import load_table, repartition_for_compute
from .registry import register

# ---------------------------------------------------------------------------
# J1/J2 — anti & semi joins (dedupe-vs-warehouse, existence probes)
# ---------------------------------------------------------------------------


@register(
    "anti_join_customers",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
    survey_ref="J1",
)
def anti_join_customers(spark, sf_dir):
    """Left-anti join: new-tags-minus-existing dedupe shape
    (reference app.py:962-977). The per-row Python membership test
    becomes one distributed hash join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "semi_join_customers",
    oracle="""
SELECT c_custkey, c_mktsegment FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
    survey_ref="J2",
)
def semi_join_customers(spark, sf_dir):
    """Left-semi join: the reference's per-row COUNT(*) existence
    probes (app.py:6131-6141) collapsed into one join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_mktsegment")


# ---------------------------------------------------------------------------
# J3 — lookup join: first match across a priority-ordered union of tables
# ---------------------------------------------------------------------------


@register(
    "lookup_first_match",
    oracle="""
WITH regs AS (
  SELECT c_nationkey AS key, c_name AS name, 'customer' AS src, 1 AS prio FROM customer
  UNION ALL
  SELECT s_nationkey, s_name, 'supplier', 2 FROM supplier
), ranked AS (
  SELECT key, name, src, row_number() OVER (PARTITION BY key ORDER BY prio, name) AS rn
  FROM regs
)
SELECT n.n_nationkey, n.n_name, r.src AS found_in, r.name AS match_name
FROM nation n LEFT JOIN ranked r ON r.key = n.n_nationkey AND r.rn = 1
""",
    survey_ref="J3 W4",
)
def lookup_first_match(spark, sf_dir):
    """EditData's search-tables-in-order-return-first-hit
    (reference app.py:5186-5209): union the registers with a priority
    tag, pick first per key by window, left-join the probe side.
    One shuffle instead of N sequential probes."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("key"),
        F.col("c_name").alias("name"),
        F.lit("customer").alias("src"),
        F.lit(1).alias("prio"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("key"),
        F.col("s_name").alias("name"),
        F.lit("supplier").alias("src"),
        F.lit(2).alias("prio"),
    )
    ranked = (
        c.unionByName(s)
        .withColumn(
            "rn", F.row_number().over(Window.partitionBy("key").orderBy("prio", "name"))
        )
        .where(F.col("rn") == 1)
    )
    n = load_table(spark, sf_dir, "nation")
    return n.join(
        F.broadcast(ranked), ranked.key == n.n_nationkey, "left"
    ).select(
        "n_nationkey",
        "n_name",
        F.col("src").alias("found_in"),
        F.col("name").alias("match_name"),
    )


# ---------------------------------------------------------------------------
# J4 — nearest-neighbor spatial join (closest Tag box within threshold)
# ---------------------------------------------------------------------------

# Synthetic geometry: parts are "components" at (p_size, (p_retailprice-900)),
# suppliers are "tag boxes" at (s_suppkey*5 % 50, (s_acctbal % 100)).
# Both carry a per-document (per-drawing) id — p_partkey div 200 and
# s_suppkey div 10, aligned by the 20:1 part:supplier row ratio — so
# nearest-tag search happens WITHIN a drawing, the reference's regime
# (find_closest_tag runs per processed sheet). The doc dimension is
# what keeps the grid join linear in corpus size: more documents, not
# denser cells (r06 verdict item 1).
_PX = "CAST(p_size AS DOUBLE)"
_PY = "(p_retailprice - 900.0)"
_SX = "CAST((s_suppkey * 5) % 50 AS DOUBLE)"
_SY = "CAST(s_acctbal AS DOUBLE) % 100"
_PDOC = "p_partkey // 200"
_SDOC = "s_suppkey // 10"


@register(
    "nearest_tag_join",
    oracle=f"""
WITH comp AS (SELECT p_partkey, {_PDOC} AS doc_id, {_PX} AS px, {_PY} AS py FROM part),
     tag  AS (SELECT s_suppkey, {_SDOC} AS doc_id, {_SX} AS sx, {_SY} AS sy FROM supplier),
     pairs AS (
       SELECT c.p_partkey, t.s_suppkey,
              sqrt((c.px - t.sx) * (c.px - t.sx) + (c.py - t.sy) * (c.py - t.sy)) AS dist
       FROM comp c JOIN tag t ON c.doc_id = t.doc_id
     ), ranked AS (
       SELECT p_partkey, s_suppkey, dist,
              row_number() OVER (PARTITION BY p_partkey ORDER BY dist, s_suppkey) AS rn
       FROM pairs
     )
SELECT p_partkey, s_suppkey AS nearest_tag, round(dist, 6) AS dist
FROM ranked WHERE rn = 1 AND dist < 40
""",
    survey_ref="J4",
)
def nearest_tag_join(spark, sf_dir):
    """find_closest_tag (reference app.py:2025-2041): nearest Tag box
    by Euclidean distance under a threshold, per drawing. Grid-bucketed
    (SURVEY §4 O3, same scheme as distance_dedupe): cell size = the
    40-unit threshold, the tag side explodes to its 3x3 neighbor cells
    and is broadcast, so the theta join becomes a broadcast-hash
    EQUI-join on (doc_id, cellx, celly). Any tag within distance < 40
    of a point differs by < 40 per axis, hence lies in one of the
    point's 9 neighbor cells — same result as the per-document cross
    join, but candidate pairs track per-document grid collisions, a
    constant per doc: corpus growth adds documents, not density. The
    tag side stays dim-like (10 tags/doc) so the broadcast holds at
    bench scales; at warehouse scale drop the hint and the same
    (doc, cell) key runs as a shuffle equi-join. sqrt is
    IEEE-deterministic so distances are bit-identical across
    engines."""
    CELL = 40.0
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.expr("p_partkey div 200").alias("doc_id"),
        F.col("p_size").cast("double").alias("px"),
        (F.col("p_retailprice") - 900.0).alias("py"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.expr("s_suppkey div 10").alias("doc_id"),
        ((F.col("s_suppkey") * 5) % 50).cast("double").alias("sx"),
        (F.col("s_acctbal").cast("double") % 100).alias("sy"),
    )
    scx = F.floor(F.col("sx") / CELL).cast("long")
    scy = F.floor(F.col("sy") / CELL).cast("long")
    neighbor_cells = F.array(
        *[
            F.struct((scx + dx).alias("cellx"), (scy + dy).alias("celly"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    tags = s.withColumn("c", F.explode(neighbor_cells)).select(
        "s_suppkey", "doc_id", "sx", "sy",
        F.col("c.cellx").alias("cellx"), F.col("c.celly").alias("celly"),
    )
    probe = repartition_for_compute(p).select(
        "p_partkey",
        "doc_id",
        "px",
        "py",
        F.floor(F.col("px") / CELL).cast("long").alias("cellx"),
        F.floor(F.col("py") / CELL).cast("long").alias("celly"),
    )
    dist = F.sqrt(
        (F.col("px") - F.col("sx")) * (F.col("px") - F.col("sx"))
        + (F.col("py") - F.col("sy")) * (F.col("py") - F.col("sy"))
    )
    # argmin via min(struct(dist, key)): map-side combinable, so the
    # candidate pair set never shuffles (a row_number window would
    # shuffle all pairs; measured 5x slower at sf0.1). The
    # dist<threshold filter is applied before the agg — it can only
    # remove non-qualifying minima, and qualifying minima survive it.
    pairs = (
        probe.join(F.broadcast(tags), ["doc_id", "cellx", "celly"])
        .withColumn("dist", dist)
        .where(F.col("dist") < 40)
    )
    return (
        pairs.groupBy("p_partkey")
        .agg(F.min(F.struct(F.col("dist"), F.col("s_suppkey"))).alias("m"))
        .select(
            "p_partkey",
            F.col("m.s_suppkey").alias("nearest_tag"),
            F.round(F.col("m.dist"), 6).alias("dist"),
        )
    )


# ---------------------------------------------------------------------------
# J5 — containment (theta) join: point-in-interval with tolerance
# ---------------------------------------------------------------------------


@register(
    "containment_join",
    oracle="""
WITH box AS (
  SELECT s_suppkey, (s_suppkey * 9)::DOUBLE - 2.0 AS x1, (s_suppkey * 9)::DOUBLE + 6.0 AS x2
  FROM supplier WHERE s_suppkey < 6
)
SELECT l.l_orderkey, l.l_linenumber, b.s_suppkey AS box_id
FROM lineitem l JOIN box b ON l.l_quantity BETWEEN b.x1 AND b.x2
""",
    survey_ref="J5 J6",
)
def containment_join(spark, sf_dir):
    """point_in_box / connect_lines_to_boxes (reference
    app.py:2047-2128): tolerance-expanded interval containment as a
    range-predicate join. The box side is tiny and broadcast, so the
    theta join is a broadcast-nested-loop over a handful of boxes —
    the same plan that holds per-document at scale. For box counts in
    the millions the grid-bucket equi-join (SURVEY §4 O3, implemented
    in operators.spatial) replaces it."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").where(F.col("s_suppkey") < 6)
    box = s.select(
        "s_suppkey",
        ((F.col("s_suppkey") * 9).cast("double") - 2.0).alias("x1"),
        ((F.col("s_suppkey") * 9).cast("double") + 6.0).alias("x2"),
    )
    return (
        li.join(F.broadcast(box), F.col("l_quantity").between(F.col("x1"), F.col("x2")))
        .select("l_orderkey", "l_linenumber", F.col("s_suppkey").alias("box_id"))
    )


# ---------------------------------------------------------------------------
# J7 — pairwise self-join within a group (components on one line -> edges)
# ---------------------------------------------------------------------------


@register(
    "pairwise_self_join",
    oracle="""
SELECT a.l_orderkey, a.l_linenumber AS ln_a, b.l_linenumber AS ln_b,
       round(a.l_extendedprice + b.l_extendedprice, 2) AS pair_price
FROM lineitem a JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber
""",
    survey_ref="J7",
)
def pairwise_self_join(spark, sf_dir):
    """All-pairs-within-group (reference app.py:3189-3199 builds edges
    from all component pairs touched by a line). Equi-join on the
    group key + ``a < b`` dedup predicate — a shuffle-colocated
    sort-merge self-join; group sizes are small (line fan-out), so no
    skew blowup."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.select("l_orderkey", "l_linenumber", "l_extendedprice").alias("a")
    b = li.select("l_orderkey", "l_linenumber", "l_extendedprice").alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_linenumber") < F.col("b.l_linenumber")),
        )
        .select(
            F.col("a.l_orderkey").alias("l_orderkey"),
            F.col("a.l_linenumber").alias("ln_a"),
            F.col("b.l_linenumber").alias("ln_b"),
            F.round(F.col("a.l_extendedprice") + F.col("b.l_extendedprice"), 2).alias("pair_price"),
        )
    )


# ---------------------------------------------------------------------------
# J8 — interval-overlap self-join (bbox intersection graph)
# ---------------------------------------------------------------------------


@register(
    "interval_overlap_join",
    oracle="""
WITH iv AS (
  SELECT p_partkey, p_partkey // 200 AS doc_id, p_brand,
         p_size::DOUBLE AS x1, p_size::DOUBLE + 4.0 AS x2
  FROM part
)
SELECT a.p_partkey AS part_a, b.p_partkey AS part_b
FROM iv a JOIN iv b
  ON a.doc_id = b.doc_id AND a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
 AND NOT (a.x2 < b.x1 OR b.x2 < a.x1)
""",
    survey_ref="J8",
)
def interval_overlap_join(spark, sf_dir):
    """bbox-intersection adjacency (reference intersects
    app.py:2849-2850): NOT(a.x2<b.x1 OR b.x2<a.x1) overlap predicate,
    partitioned by (doc_id, brand) so the theta part only runs within
    co-partitioned groups — and the DOC dimension (p_partkey div 200,
    the drawing a bbox came from) is what makes the shape scale-safe:
    brand alone is a fixed 25-value key, so per-group rows would grow
    linearly with the corpus and intra-group pairs quadratically (the
    same density artifact the r07 doc-dimension rewrite removed from
    the rest of the spatial family); with the doc id, group sizes are
    constant and corpus growth only adds groups."""
    p = load_table(spark, sf_dir, "part")
    iv = p.select(
        "p_partkey",
        F.expr("p_partkey div 200").alias("doc_id"),
        "p_brand",
        F.col("p_size").cast("double").alias("x1"),
        (F.col("p_size").cast("double") + 4.0).alias("x2"),
    )
    a, b = iv.alias("a"), iv.alias("b")
    return (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey"))
            & ~((F.col("a.x2") < F.col("b.x1")) | (F.col("b.x2") < F.col("a.x1"))),
        )
        .select(F.col("a.p_partkey").alias("part_a"), F.col("b.p_partkey").alias("part_b"))
    )


# ---------------------------------------------------------------------------
# J9 — distance-threshold dedupe: drop near-duplicate detections
# ---------------------------------------------------------------------------


@register(
    "distance_dedupe",
    oracle="""
WITH pts AS (
  SELECT p_partkey, p_partkey // 200 AS doc_id, p_type,
         p_size::DOUBLE AS cx, round(p_retailprice - 900.0, 2) AS conf
  FROM part
), dominated AS (
  SELECT DISTINCT a.p_partkey
  FROM pts a JOIN pts b
    ON a.doc_id = b.doc_id AND a.p_type = b.p_type AND a.p_partkey <> b.p_partkey
   AND abs(a.cx - b.cx) < 1.5
   AND (b.conf > a.conf OR (b.conf = a.conf AND b.p_partkey < a.p_partkey))
)
SELECT p.p_partkey, p.doc_id, p.p_type, p.cx, p.conf
FROM pts p WHERE p.p_partkey NOT IN (SELECT p_partkey FROM dominated)
""",
    survey_ref="J9 A6",
)
def distance_dedupe(spark, sf_dir):
    """remove_duplicate_bboxes (reference app.py:2908-2947): same-class
    detections closer than a threshold keep only the best-confidence
    one — PER IMAGE, which is how the reference runs it (the dedupe
    happens inside one processed sheet). The detection side carries a
    per-document id (p_partkey div 200, the drawing the detection came
    from), and domination only applies within (doc, class):
    self-join on (doc, cell) + class/distance predicate -> dominated
    set -> anti-join. The O(n²) Python loop becomes a doc+cell-
    partitioned join whose per-cell candidates are bounded by
    per-image geometry no matter the corpus size (r06 verdict item 1:
    without the doc key, a 10x corpus was 10x density in the fixed
    p_size domain and ~110x pairs); ties broken by key for
    determinism."""
    p = load_table(spark, sf_dir, "part")
    pts = p.select(
        "p_partkey",
        F.expr("p_partkey div 200").alias("doc_id"),
        "p_type",
        F.col("p_size").cast("double").alias("cx"),
        F.round(F.col("p_retailprice") - 900.0, 2).alias("conf"),
    )
    # Grid-bucket the distance predicate (SURVEY §4 O3): cell size >=
    # threshold, probe side explodes to its 3 neighboring cells, join
    # becomes an equi-join on (doc, cell) that Catalyst hash-joins.
    # Same result as the unbounded theta join, but candidate pairs are
    # bounded per (doc, cell) instead of per class.
    cell = F.floor(F.col("cx") / 1.5).cast("long")
    a = pts.withColumn("cell", cell)
    b = pts.withColumn(
        "b_cell", F.explode(F.array(cell - 1, cell, cell + 1))
    ).select(
        F.col("p_partkey").alias("b_key"),
        F.col("doc_id").alias("b_doc"),
        F.col("p_type").alias("b_type"),
        F.col("cx").alias("b_cx"),
        F.col("conf").alias("b_conf"),
        "b_cell",
    )
    dominated = (
        a.join(b, (F.col("doc_id") == F.col("b_doc")) & (F.col("cell") == F.col("b_cell")))
        .where(
            (F.col("p_type") == F.col("b_type"))
            & (F.col("p_partkey") != F.col("b_key"))
            & (F.abs(F.col("cx") - F.col("b_cx")) < 1.5)
            & (
                (F.col("b_conf") > F.col("conf"))
                | ((F.col("b_conf") == F.col("conf")) & (F.col("b_key") < F.col("p_partkey")))
            )
        )
        .select("p_partkey")
        .distinct()
    )
    return pts.join(dominated, "p_partkey", "left_anti").select(
        "p_partkey", "doc_id", "p_type", "cx", "conf"
    )


# ---------------------------------------------------------------------------
# J11/M2 — merge-lookup before update (semicolon-field merge on match)
# ---------------------------------------------------------------------------


@register(
    "merge_lookup_update",
    oracle="""
WITH existing AS (
  SELECT p_partkey, concat('DOC-', CAST(p_partkey % 5 AS VARCHAR)) AS document
  FROM part
), incoming AS (
  SELECT p_partkey, concat('DOC-', CAST(p_partkey % 3 AS VARCHAR)) AS new_document
  FROM part WHERE p_partkey % 2 = 0
)
SELECT e.p_partkey,
       CASE WHEN i.p_partkey IS NULL THEN e.document
            ELSE array_to_string(list_sort(list_distinct(
                   list_concat(string_split(e.document, ';'),
                               string_split(i.new_document, ';')))), ';')
       END AS document
FROM existing e LEFT JOIN incoming i ON e.p_partkey = i.p_partkey
""",
    survey_ref="J11 M2 U2",
)
def merge_lookup_update(spark, sf_dir):
    """Fetch-existing-row -> merge semicolon fields -> write back
    (reference app.py:4582-4631): left join existing⟕incoming +
    array_union merge. This is the read-modify-write MERGE shape as a
    pure dataflow."""
    from ..functions import tags as tagfn

    p = load_table(spark, sf_dir, "part")
    existing = p.select(
        "p_partkey",
        F.concat(F.lit("DOC-"), (F.col("p_partkey") % 5).cast("string")).alias("document"),
    )
    incoming = (
        p.where(F.col("p_partkey") % 2 == 0)
        .select(
            "p_partkey",
            F.concat(F.lit("DOC-"), (F.col("p_partkey") % 3).cast("string")).alias("new_document"),
        )
    )
    joined = existing.alias("e").join(incoming.alias("i"), "p_partkey", "left")
    merged = F.when(F.col("i.new_document").isNull(), F.col("e.document")).otherwise(
        tagfn.merge_semicolon_sorted(F.col("e.document"), F.col("i.new_document"))
    )
    return joined.select("p_partkey", merged.alias("document"))


@register(
    "asof_join_events",
    oracle="""
WITH o AS (
  SELECT o_orderkey, o_custkey % 200 AS user_id, o_orderdate::TIMESTAMP AS ots
  FROM orders
),
cand AS (
  SELECT o.o_orderkey, e.event_id, e.event_type,
         row_number() OVER (PARTITION BY o.o_orderkey
                            ORDER BY e.ts::TIMESTAMP DESC, e.event_id DESC) AS rn
  FROM o JOIN events e
    ON e.user_id = o.user_id AND e.ts::TIMESTAMP <= o.ots
   AND e.ts IS NOT NULL
)
SELECT o.o_orderkey, o.user_id,
       c.event_id AS last_event_id, c.event_type AS last_event_type
FROM o LEFT JOIN cand c ON c.o_orderkey = o.o_orderkey AND c.rn = 1
""",
    survey_ref="J-family extension: as-of (point-in-time) join",
)
def asof_join_events(spark, sf_dir):
    """As-of join — each order picks the user's latest event at or
    before the order date (the point-in-time lookup every time-series
    feature store needs; Spark has no native ASOF). The scalable form
    used here is union-and-carry: tag both sides, sort each user's
    merged timeline once, and carry the last non-null event forward
    with a running window — ONE shuffle on the key, no per-row range
    probe and no interval explosion. The oracle verifies via the
    naive rank-per-order formulation (fixture-scale only, O(orders x
    events-per-user)); ties at equal ts resolve to the highest
    event_id on both sides.

    NULL contract (r14): a NULL-ts event has no position on the
    merged timeline and is excluded at the scan — Spark sorts it
    FIRST in the ASC carry ordering (DuckDB's theta-join simply drops
    it), so without the filter it becomes the carried value for every
    early order of that user. Identity on a null-free corpus."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_custkey") % 200).alias("user_id"),
        F.col("o_orderdate").cast("timestamp").alias("ts"),
    )
    e = (
        load_table(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull())
        .select("user_id", "ts", "event_id", "event_type")
    )
    # kind sorts event rows before order rows at equal ts, so "<=" ties
    # are visible to the order row; event_id asc makes the carried
    # value the max id within a tied timestamp
    orders_tagged = o.select(
        "user_id", "ts", F.lit(1).alias("kind"),
        F.col("o_orderkey").alias("o_orderkey"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("string").alias("event_type"),
    )
    events_tagged = e.select(
        "user_id", "ts", F.lit(0).alias("kind"),
        F.lit(None).cast("long").alias("o_orderkey"),
        "event_id", "event_type",
    )
    merged = events_tagged.unionByName(orders_tagged)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        "user_id", "kind", "o_orderkey",
        F.last("event_id", ignorenulls=True).over(w).alias("last_event_id"),
        F.last("event_type", ignorenulls=True).over(w).alias("last_event_type"),
    )
    return carried.where(F.col("kind") == 1).select(
        "o_orderkey", "user_id", "last_event_id", "last_event_type"
    )

# ---------------------------------------------------------------------------
# J-family extension — blocked fuzzy match (edit-distance entity resolution)
# ---------------------------------------------------------------------------


@register(
    "fuzzy_match_blocked",
    oracle="""
WITH vocab AS (SELECT DISTINCT p_type AS canon FROM part),
scans AS (
  SELECT p_partkey AS scan_id,
         CASE WHEN p_partkey % 7 = 0 THEN p_type
              ELSE substr(p_type, 1, p_partkey % 5)
                   || 'X' || substr(p_type, (p_partkey % 5) + 2)
         END AS scanned
  FROM part
),
cand AS (
  SELECT s.scan_id, s.scanned, v.canon,
         CAST(levenshtein(s.scanned, v.canon) AS BIGINT) AS dist
  FROM scans s JOIN vocab v ON substr(s.scanned, 6) = substr(v.canon, 6)
  WHERE levenshtein(s.scanned, v.canon) <= 2
),
ranked AS (
  SELECT scan_id, scanned, canon, dist,
         row_number() OVER (PARTITION BY scan_id ORDER BY dist, canon) AS rn
  FROM cand
)
SELECT scan_id, scanned, canon AS matched, dist FROM ranked WHERE rn = 1
""",
    survey_ref="§2.13 extension: blocked fuzzy match (generalizes S2 header "
    "matching, app.py:5999-6019)",
)
def fuzzy_match_blocked(spark, sf_dir):
    """Blocked fuzzy match — resolve noisy scanned labels against a
    canonical vocabulary by edit distance, the entity-resolution shape
    behind the reference's Excel-header-to-DB-column fuzzy matcher
    (``map_excel_to_db_columns``, app.py:5999-6019) and every
    OCR'd-tag-to-registry correction a scanning pipeline needs.

    The scalable form is blocking, not all-pairs: candidates meet on a
    cheap equi-join block key, and ``levenshtein`` (JVM codegen) runs
    only inside a block. Corruptions here are deterministic single-char
    substitutions at positions 1-5, so the untouched suffix from
    position 6 is a sound block key (in production: a phonetic key,
    k-gram key, or untouched field). The vocabulary is dim-sized and
    broadcast — the 100 TB scan side never shuffles; the best-match
    argmin is ``min(struct(dist, canon))``, map-side combinable."""
    part = load_table(spark, sf_dir, "part")
    vocab = part.select(F.col("p_type").alias("canon")).distinct()
    pos = F.col("p_partkey") % 5  # corrupt char at 1-based position pos+1
    corrupted = F.concat(
        F.expr("substring(p_type, 1, p_partkey % 5)"),
        F.lit("X"),
        F.expr("substring(p_type, p_partkey % 5 + 2)"),
    )
    scans = part.select(
        F.col("p_partkey").alias("scan_id"),
        F.when(F.col("p_partkey") % 7 == 0, F.col("p_type"))
        .otherwise(corrupted)
        .alias("scanned"),
    )
    cand = (
        scans.join(
            F.broadcast(vocab),
            F.expr("substring(scanned, 6)") == F.expr("substring(canon, 6)"),
        )
        .withColumn("dist", F.levenshtein("scanned", "canon").cast("long"))
        .where(F.col("dist") <= 2)
    )
    best = cand.groupBy("scan_id", "scanned").agg(
        F.min(F.struct("dist", "canon")).alias("best")
    )
    return best.select(
        "scan_id",
        "scanned",
        F.col("best.canon").alias("matched"),
        F.col("best.dist").alias("dist"),
    )


_SALT = 8  # fact-side salt fan-out (dim replicates this many times)


@register(
    "salted_skew_join",
    oracle="""
WITH fact AS (
  SELECT l_orderkey, l_extendedprice,
         CASE WHEN l_orderkey % 10 < 7 THEN 1 ELSE l_orderkey % 100 END AS sk
  FROM lineitem
),
dim AS (
  SELECT sk, concat('seg-', CAST(sk AS VARCHAR)) AS label
  FROM (SELECT DISTINCT p_partkey % 100 AS sk FROM part)
)
SELECT f.sk, d.label,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN abs(f.l_extendedprice) < 9e13
                     THEN CAST(floor(f.l_extendedprice * 100 + 0.5) AS BIGINT) END)
            AS BIGINT) AS price_cents
FROM fact f JOIN dim d ON d.sk = f.sk
GROUP BY f.sk, d.label
""",
    survey_ref="SURVEY §4 skew technique: salted equi-join (join twin of "
    "salted_agg_lineitem)",
)
def salted_skew_join(spark, sf_dir):
    """Salted skew JOIN — the join-side twin of salted_agg_lineitem's
    two-phase aggregation: ~70% of the fact rows share one hot key
    (planted), which would pin a whole sort-merge task to one core at
    100 TB. The fact side appends salt = key-hash-mod-8 and joins on
    (sk, salt); the dim side replicates each row across all 8 salt
    values via one explode — so every salted key matches exactly its
    original dim row and the result is IDENTICAL to the unsalted join
    (which is what the oracle runs), but the hot key's rows now spread
    over 8 tasks instead of 1. AQE's skew-join split handles the same
    problem adaptively when stats reveal it; explicit salting is the
    portable form that also works under joins AQE can't split
    (e.g. bucketed sides). Salt is md5-derived so the layout is
    deterministic; the post-join aggregate uses integer cents so the
    oracle hashes exactly."""
    li = load_table(spark, sf_dir, "lineitem")
    fact = li.select(
        "l_orderkey",
        "l_extendedprice",
        F.when(F.col("l_orderkey") % 10 < 7, F.lit(1))
        .otherwise(F.col("l_orderkey") % 100)
        .alias("sk"),
    ).withColumn(
        "salt",
        (
            F.conv(F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 6), 16, 10)
            .cast("long")
            % _SALT
        ).cast("int"),
    )
    part = load_table(spark, sf_dir, "part")
    dim = (
        part.select((F.col("p_partkey") % 100).alias("sk"))
        .distinct()
        .select("sk", F.concat(F.lit("seg-"), F.col("sk").cast("string")).alias("label"))
    )
    dim_salted = dim.withColumn(
        "salt", F.explode(F.array(*[F.lit(s) for s in range(_SALT)]))
    )
    joined = fact.join(dim_salted, ["sk", "salt"])
    # guarded exact-cents domain (see queries.core._cents): NULL for
    # non-finite / |x| >= 9e13 cells instead of floor->long saturation
    cents = F.when(
        F.abs(F.col("l_extendedprice")) < 9e13,
        F.floor(F.col("l_extendedprice") * 100 + 0.5),
    ).cast("long")
    return joined.groupBy("sk", "label").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(cents).cast("long").alias("price_cents"),
    )
