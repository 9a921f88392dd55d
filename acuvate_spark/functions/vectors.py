"""Vector expression library for embedding columns (array<float>).

Dot products / norms / cosine similarity as JVM-side higher-order
functions (``zip_with`` + ``aggregate``) — no Python in the hot path,
no explode, arrays never leave Tungsten rows. This is the building
block for brute-force ANN, LSH bucketing and embedding near-dup.

Accumulation is in double (float32 inputs widen exactly), sequential
per-pair — deterministic. Cross-engine comparisons still round to a
few decimals because DuckDB's summation order may differ.
"""

from __future__ import annotations

import json

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_rounded(a: Column, b: Column, digits: int = 4) -> Column:
    return F.round(cosine(a, b), digits)


def dot_sql(a_expr: str, b_expr: str) -> str:
    """DuckDB rendering: element-wise product list, then list_sum."""
    return (
        f"list_sum([{a_expr}[i]::DOUBLE * {b_expr}[i]::DOUBLE "
        f"FOR i IN range(1, len({a_expr}) + 1)])"
    )


def cosine_sql(a_expr: str, b_expr: str) -> str:
    return (
        f"({dot_sql(a_expr, b_expr)} / "
        f"(sqrt({dot_sql(a_expr, a_expr)}) * sqrt({dot_sql(b_expr, b_expr)})))"
    )


def cosine_rounded_sql(a_expr: str, b_expr: str, digits: int = 4) -> str:
    return f"round({cosine_sql(a_expr, b_expr)}, {digits})"


# Sign bits are taken on the dot product ROUNDED to this many decimals
# (the cosine_rounded pattern): each engine folds the sum in its own
# order, and a last-ULP difference on a near-zero dot would flip a
# sign bit and silently diverge the candidate sets between engines.
SIGN_DECIMALS = 6


def hyperplane_bucket(v: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: one bit per plane = sign of the
    (rounded) dot product. Planes are fixed literals so the bucket is a
    pure deterministic expression (same on any engine)."""
    bits = []
    for plane in planes:
        arr = F.array(*[F.lit(float(x)) for x in plane])
        bits.append(
            F.when(F.round(dot(v, arr), SIGN_DECIMALS) >= 0, F.lit("1")).otherwise(
                F.lit("0")
            )
        )
    return F.concat(*bits)


def hyperplane_signature(v: Column, planes: list[list[float]]) -> Column:
    """Sign-bit string over MANY hyperplanes as ONE expression:
    ``transform`` over a literal array-of-planes with the dot product
    in the lambda. Semantically identical to ``hyperplane_bucket`` but
    ~4x faster to analyze+execute at 64 planes (one expression tree
    instead of 64 independent aggregate chains) — use this for banded
    LSH signatures, the per-plane form for small bucket ids.

    The planes literal is shipped as ONE ``from_json`` of a JSON
    string, not nested ``array(array(lit, ...))`` calls: at 64x64 the
    nested form is 4096 element Columns = ~12k py4j round trips
    (~2.1 s of driver time per query CONSTRUCTION, before any job) and
    a 4160-node Catalyst tree re-constant-folded on every action.
    ``JsonToStructs`` of a literal is foldable, so the optimizer
    collapses it to the same array<array<double>> Literal once per
    action at ~zero cost (measured: build 2.06 s -> 0.005 s, action
    0.157 s -> 0.126 s, results bit-identical — doubles round-trip
    exactly through JSON repr). The adaptive configs compound this:
    past 65k vectors ``_emb_lsh_config`` emits bits*bands >= 132
    planes, where the nested form's driver stall grows past 4 s.

    ``from_json`` alone is NULLABLE, and that nullability propagates
    to the signature column where the old non-nullable nested-array
    form made it non-null — which flips Spark's stats/constraint
    propagation into a path where ``localCheckpoint`` of a downstream
    frame that dropped the vector column dies with
    ``NoSuchElementException: key not found: embedding#N``
    (reproduced: read the same parquet via ``toPandas`` first, then
    build the banded pipeline). The ``coalesce`` with a non-nullable
    empty-array literal restores the exact nullability the old form
    had; it stays foldable, so the optimizer still collapses the whole
    thing to one Literal."""
    planes_arr = F.coalesce(
        F.from_json(
            F.lit(json.dumps([[float(x) for x in p] for p in planes])),
            "array<array<double>>",
        ),
        F.array().cast("array<array<double>>"),
    )
    return F.array_join(
        F.transform(
            planes_arr,
            lambda pl: F.when(
                F.round(
                    F.aggregate(
                        F.zip_with(v, pl, lambda x, y: x.cast("double") * y),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ),
                    SIGN_DECIMALS,
                )
                >= 0,
                F.lit("1"),
            ).otherwise(F.lit("0")),
        ),
        "",
    )


def hyperplane_signature_sql(v_expr: str, planes: list[list[float]]) -> str:
    """DuckDB rendering of ``hyperplane_signature``: one comprehension
    over a planes literal (~40x faster than per-plane CASE chains at
    64 planes). The sign is taken on the dot product rounded to
    SIGN_DECIMALS — DuckDB's list_sum fold order is an implementation
    detail, so without the rounding a last-ULP difference on a
    near-zero dot product could flip a bit vs the Spark side."""
    dim = len(planes[0])
    planes_lit = (
        "["
        + ", ".join(
            "[" + ", ".join(f"{float(x)!r}::DOUBLE" for x in p) + "]" for p in planes
        )
        + "]"
    )
    return (
        f"array_to_string([CASE WHEN round(list_sum([{v_expr}[i]::DOUBLE * pl[i] "
        f"FOR i IN range(1, {dim + 1})]), {SIGN_DECIMALS}) >= 0 "
        f"THEN '1' ELSE '0' END "
        f"FOR pl IN {planes_lit}], '')"
    )


def hyperplane_bucket_sql(v_expr: str, planes: list[list[float]]) -> str:
    bits = []
    for plane in planes:
        arr = "[" + ", ".join(f"{float(x)!r}::DOUBLE" for x in plane) + "]"
        d = (
            f"round(list_sum([{v_expr}[i]::DOUBLE * ({arr})[i] "
            f"FOR i IN range(1, len({v_expr}) + 1)]), {SIGN_DECIMALS})"
        )
        bits.append(f"(CASE WHEN {d} >= 0 THEN '1' ELSE '0' END)")
    return " || ".join(bits)
