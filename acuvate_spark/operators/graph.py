"""Graph operators: connected components via iterative label
propagation (SURVEY §2.4 A4 / §4 O4 — the reference's DFS/union-find
at app.py:2861-2905 and app.py:1464-1489, re-expressed as dataflow).

Algorithm: every node starts labeled with its own id; each round, each
node takes the min label among itself and its neighbors; stop at
fixpoint. Converges in O(diameter) rounds; each round is one
shuffle-colocated join + groupBy. For web-scale graphs you'd switch to
large-star/small-star (fewer rounds), but the P&ID graphs this engine
targets have tiny diameters (lines connect nearby components), so
plain propagation with an early-exit check is the right trade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    rounds_out: list | None = None,
) -> DataFrame:
    """edges(src,dst) undirected -> (node, component) with component =
    min node id reachable. Deterministic fixpoint. Pass a list as
    ``rounds_out`` to receive the number of propagation rounds
    actually run (appended as its single element) — the scale-test
    hook pinning that iteration counts track graph diameter, not
    graph size."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    # self-loops fold the "own label" term INTO the neighbor-min join:
    # each round becomes ONE join + ONE aggregate (the a == b row both
    # contributes the node's current label to the min and recovers the
    # old label for the changed flag) — previously a second
    # labels-side join per round did that work.
    sym = sym.unionByName(
        sym.select(F.col("a"), F.col("a").alias("b")).distinct()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    # localCheckpoint cuts the lineage each round: without it the plan
    # doubles per iteration (joins reference the previous labels) and
    # Catalyst planning cost explodes long before the data does.
    sym = sym.localCheckpoint(eager=True)
    labels = labels.localCheckpoint(eager=True)
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # node <- min over {own label (self-loop row), neighbor labels};
        # old label rides along via the self-loop row, so the changed
        # flag costs no extra join.
        new_labels = (
            sym.join(labels, sym.b == labels.node)
            .select(F.col("a").alias("node"), F.col("b").alias("nbr"), "component")
            .groupBy("node")
            .agg(
                F.min("component").alias("component"),
                F.min(F.when(F.col("nbr") == F.col("node"), F.col("component"))).alias(
                    "old"
                ),
            )
            .select(
                "node",
                "component",
                (F.col("component") != F.col("old")).cast("int").alias("changed"),
            )
            .localCheckpoint(eager=True)
        )
        n_changed = new_labels.agg(F.sum("changed")).collect()[0][0]
        labels = new_labels.drop("changed")
        if not n_changed:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge within {max_iter} iterations "
            f"({n_changed} labels still changing) — raise max_iter for graphs "
            "with propagation distance beyond it (silent partial labels would "
            "diverge from the reachability semantics)"
        )
    if rounds_out is not None:
        rounds_out.append(rounds)
    return labels
