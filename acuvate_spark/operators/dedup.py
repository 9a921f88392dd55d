"""Deduplication operator library (training-data pipeline).

Scale-first designs:

* **Exact**: md5(normalized text) -> groupBy -> keep canonical. One
  shuffle on the hash; map-side combinable.
* **MinHash + LSH**: shingle -> per-seed min of md5(seed||shingle) ->
  band keys -> equi-join on band -> verify candidates. The O(n²)
  pairwise problem becomes an equi-join whose cost tracks the number
  of *colliding* pairs, not all pairs — this is the 100 TB path.
* **SimHash**: 64-bit signature from per-token xxhash64 bit votes;
  near-dup = identical 16-bit band + hamming <= k on candidates.
  Spark-only (bit votes aren't portable SQL) -> rows-only check.

md5 is used wherever the DuckDB oracle must agree bit-for-bit
(xxhash64 is Spark-specific and only appears in rows-only operators).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


_SLICES_PER_MD5 = 4  # 4 x 8 hex chars (32 bits each) per 128-bit digest


def minhash_slice_sql(shingle_expr: str, i: int) -> str:
    """DuckDB rendering of minhash function i (same slicing scheme as
    minhash_strings — defined here once so Spark and the oracle agree)."""
    seed = i // _SLICES_PER_MD5
    start = (i % _SLICES_PER_MD5) * 8 + 1
    return f"substr(md5('seed{seed}|' || {shingle_expr}), {start}, 8)"


def minhash_strings(shingle: Column, n_hashes: int) -> list[Column]:
    """One min-able hash string per permutation. Each md5 digest yields
    4 independent 32-bit slices, so n hashes cost ceil(n/4) md5 calls
    per shingle instead of n — the md5 is the dominant signature cost
    at corpus scale. Lexicographic min over the fixed-width hex slices
    is a valid minhash, and the strings are byte-identical in DuckDB
    (minhash_slice_sql renders the same slices)."""
    digests = [
        F.md5(F.concat(F.lit(f"seed{s}|"), shingle))
        for s in range((n_hashes + _SLICES_PER_MD5 - 1) // _SLICES_PER_MD5)
    ]
    return [
        F.substring(digests[i // _SLICES_PER_MD5], (i % _SLICES_PER_MD5) * 8 + 1, 8)
        for i in range(n_hashes)
    ]


def minhash_signature(shingles_df: DataFrame, key: str, shingle_col: str, n_hashes: int) -> DataFrame:
    """(key, shingle) rows -> (key, mh0..mh{n-1}) signature rows."""
    aggs = [
        F.min(c).alias(f"mh{i}")
        for i, c in enumerate(minhash_strings(F.col(shingle_col), n_hashes))
    ]
    return shingles_df.groupBy(key).agg(*aggs)


def band_keys(sig_df: DataFrame, key: str, n_hashes: int, band_size: int) -> DataFrame:
    """Signature -> (key, band_idx, band_key) rows for LSH bucketing."""
    n_bands = n_hashes // band_size
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.concat_ws(
                    "|", *[F.col(f"mh{b * band_size + j}") for j in range(band_size)]
                ).alias("band_key"),
            )
            for b in range(n_bands)
        ]
    )
    return (
        sig_df.select(key, F.explode(bands).alias("band"))
        .select(key, F.col("band.band_idx").alias("band_idx"), F.col("band.band_key").alias("band_key"))
    )


def simhash64(tokens_df: DataFrame, key: str, token_col: str) -> DataFrame:
    """(key, token) rows -> (key, simhash long). Bit i of the signature
    is the sign of the vote sum over tokens' xxhash64 bit i. One
    groupBy, 64 codegen'd aggregate expressions — no Python."""
    h = F.xxhash64(F.col(token_col))
    votes = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(64)
    ]
    voted = tokens_df.groupBy(key).agg(*votes)
    sig = None
    for i in range(64):
        bit = F.when(F.col(f"v{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
            F.lit(0).cast("long")
        )
        sig = bit if sig is None else sig.bitwiseOR(bit)
    return voted.select(key, sig.alias("simhash"))


def simhash_near_pairs(sig_df: DataFrame, key: str, max_hamming: int = 3) -> DataFrame:
    """Candidate pairs via 16-bit band equality (pigeonhole: hamming<=3
    over 4 bands guarantees one identical band), verified by
    bit_count(xor) <= max_hamming."""
    banded = sig_df.select(
        key,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.shiftright(F.col("simhash"), 16 * b)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("band_val"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("band"),
    ).select(key, "simhash", "band.band_idx", "band.band_val")
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{key}") < F.col(f"b.{key}")),
        )
        .select(
            F.col(f"a.{key}").alias("key_a"),
            F.col(f"b.{key}").alias("key_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cand.withColumn("hamming", hamming).where(F.col("hamming") <= max_hamming).select(
        "key_a", "key_b", "hamming"
    )
