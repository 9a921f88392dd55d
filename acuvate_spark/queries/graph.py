"""Graph queries — SURVEY §2.4 A4/A5 (connected components,
first-per-pair) and the degree/edge queries that form the Neo4j-parity
surface (SURVEY §7.1 step 4).

The graph is derived deterministically from ``lineitem``: an edge
part <-> supplier for every low-quantity line item (part nodes keep
their key; supplier nodes are offset by 1,000,000 to disambiguate).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.graph import connected_components
from ..tables import load_table
from .registry import register

_SUPP_OFFSET = 1_000_000

_EDGES_SQL = """
edges AS (
  SELECT DISTINCT l_partkey AS src, l_suppkey + 1000000 AS dst
  FROM lineitem WHERE l_quantity < 3
)
"""


def _edges(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_quantity") < 3)
        .select(
            F.col("l_partkey").alias("src"),
            (F.col("l_suppkey") + _SUPP_OFFSET).alias("dst"),
        )
        .distinct()
    )


@register(
    "graph_connected_components",
    oracle=f"""
WITH RECURSIVE {_EDGES_SQL},
ue AS (SELECT src AS a, dst AS b FROM edges UNION SELECT dst, src FROM edges),
nodes AS (SELECT DISTINCT a AS n FROM ue),
reach(n, m) AS (
  SELECT n, n FROM nodes
  UNION
  SELECT ue.b, r.m FROM reach r JOIN ue ON ue.a = r.n
)
SELECT n AS node, min(m) AS component FROM reach GROUP BY n
""",
    survey_ref="A4 O4",
)
def graph_connected_components(spark, sf_dir):
    """Connected components by iterative min-label propagation
    (operators.graph) — the dataflow form of the reference's DFS
    cluster merge (app.py:2861-2905) and union-find (app.py:1464-1489).
    The oracle is a recursive-CTE reachability closure; both converge
    to the same unique fixpoint (component = min reachable id)."""
    return connected_components(_edges(spark, sf_dir)).select("node", "component")


@register(
    "graph_degrees",
    oracle=f"""
WITH {_EDGES_SQL},
ue AS (SELECT src AS a, dst AS b FROM edges UNION SELECT dst, src FROM edges)
SELECT a AS node, count(*) AS degree FROM ue GROUP BY a
""",
    survey_ref="graph parity: degree counts (Neo4j surface)",
)
def graph_degrees(spark, sf_dir):
    e = _edges(spark, sf_dir)
    sym = e.select(F.col("src").alias("node")).unionByName(
        e.select(F.col("dst").alias("node"))
    )
    return sym.groupBy("node").agg(F.count("*").alias("degree"))


@register(
    "first_line_per_pair",
    oracle="""
WITH ranked AS (
  SELECT l_partkey, l_suppkey, l_orderkey, l_linenumber,
         row_number() OVER (PARTITION BY l_partkey, l_suppkey
                            ORDER BY l_orderkey, l_linenumber) AS rn
  FROM lineitem
)
SELECT l_partkey, l_suppkey, l_orderkey, l_linenumber
FROM ranked WHERE rn = 1
""",
    survey_ref="A5",
)
def first_line_per_pair(spark, sf_dir):
    """Keep only the first line per (source,target) pair — the
    reference's grouped_lines edge dedupe (app.py:2137-2152)."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey", "l_suppkey").orderBy("l_orderkey", "l_linenumber")
    return (
        li.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("l_partkey", "l_suppkey", "l_orderkey", "l_linenumber")
    )
