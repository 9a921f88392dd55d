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
        # neighbor-min pass: node <- min(own label, neighbors' labels).
        # The changed flag is computed inside the same pass, so each
        # round costs one join job (checkpoint) + one cheap agg over
        # the checkpointed result — no extra old-vs-new join.
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .select(F.col("a").alias("node"), F.col("component"))
            .groupBy("node")
            .agg(F.min("component").alias("nmin"))
        )
        new_label = F.least(F.col("component"), F.coalesce(F.col("nmin"), F.col("component")))
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                new_label.alias("component"),
                (new_label != F.col("component")).cast("int").alias("changed"),
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
