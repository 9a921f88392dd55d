"""Deduplication operator library (training-data pipeline).

Scale-first designs:

* **Exact**: md5(normalized text) -> groupBy -> keep canonical. One
  shuffle on the hash; map-side combinable.
* **MinHash + LSH**: shingle -> per-seed min of md5(seed||shingle) ->
  band keys -> equi-join on band -> verify candidates. The O(n²)
  pairwise problem becomes an equi-join whose cost tracks the number
  of *colliding* pairs, not all pairs — this is the 100 TB path.
* **SimHash**: 64-bit signature from per-token md5 hex-digit bit
  votes; near-dup = identical 16-bit band + hamming <= k on
  candidates. The signature is a '0'/'1' string so every step (votes,
  bands, hamming) is portable SQL.

md5 is the only hash used anywhere: it is the one hash every engine
computes identically, so all signatures stay oracle-checkable.
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


def minhash_signature(
    shingles_df: DataFrame,
    key: str,
    shingle_col: str,
    n_hashes: int,
    *,
    with_count: bool = False,
) -> DataFrame:
    """(key, shingle) rows -> (key, mh0..mh{n-1}) signature rows.
    ``with_count`` adds an ``n`` column (shingles per key) to the same
    aggregation — the Jaccard verify step needs per-doc set sizes, and
    folding the count into the signature pass saves a second full
    shuffle over the shingle set."""
    aggs = [
        F.min(c).alias(f"mh{i}")
        for i, c in enumerate(minhash_strings(F.col(shingle_col), n_hashes))
    ]
    if with_count:
        aggs.append(F.count("*").alias("n"))
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


_SIMHASH_BITS = 64
_SIMHASH_BANDS = 4
_BAND_BITS = _SIMHASH_BITS // _SIMHASH_BANDS


def _simhash_bit_sources() -> list[tuple[int, int]]:
    """Bit i of the signature votes on hex digit ``pos`` (1-based) of
    digest ``seed`` = md5('s{seed}|' || token). Two digests cover all
    64 bits (32 hex chars each). Defined once so the Spark builder and
    the SQL renderer cannot disagree on the mapping."""
    return [(i // 32, i % 32 + 1) for i in range(_SIMHASH_BITS)]


# Packed-lane vote aggregation: 4 hex digits (one 16-bit conv) per
# group; the 4 nibble high-bits are spread into the low bit of four
# 16-bit lanes of ONE long by a single multiply+mask, so the hot
# aggregate is 16 packed sums + a count instead of 64 independent
# conditional sums (the registry's old CPU outlier — a ~4x smaller
# aggregation buffer and integer ops instead of 64 string compares
# per token). flag bits sit at 0,4,8,12; term 2^(12k) of the spread
# constant lifts flag 4j to bit 4j+12k, and 4j+12k = 16m only for
# j = k = m, so the post-multiply mask isolates exactly one flag per
# lane (no aliasing).
_LANE_GROUPS = _SIMHASH_BITS // 4
_LANE_SPREAD = 1 | (1 << 12) | (1 << 24) | (1 << 36)
_LANE_MASK = 0x0001000100010001
_CHUNK_SHIFT = 14
_CHUNK_TOKENS = 1 << _CHUNK_SHIFT  # lanes hold counts < 2^16 by construction


def simhash_signature(
    tokens_df: DataFrame, key: str, token_col: str, pos_col: str | None = None
) -> DataFrame:
    """(key, token) rows -> (key, sig) where sig is a 64-char '0'/'1'
    string. Bit i is the sign of the vote sum over tokens: hex digit i
    of the token's md5 digests votes +1 if >= '8' (high bit set) else
    -1 — equivalently, bit i is set iff 2*count_high(i) > n_tokens,
    which is what the packed-lane aggregation computes. All JVM-side
    column expressions; md5/hex primitives keep the signature
    bit-identical in any engine (xxhash64 would be ~2x faster per
    token but is Spark-specific).

    Exact for documents of ANY length in BOTH paths: tokens aggregate
    per (key, chunk) first — bounding every 16-bit lane (and keeping
    the packed ANSI long sum <= 2^14 * 2^48 = 2^62) — then the tiny
    per-chunk rows (64 plain sums over ~n_tokens/16384 rows per doc)
    fold to the doc totals. The chunk is ``pos_col >> 14`` when the
    caller has a 0-based token position, else
    ``monotonically_increasing_id() >> 14``: the chunk SPLIT is
    arbitrary for vote sums (any partition of a doc's tokens yields
    the same totals), and ids are unique per row so no chunk group
    exceeds 16,384 tokens. Because the id is nondeterministic, the
    stamped frame is MATERIALIZED (eager localCheckpoint) before it
    becomes a shuffle key: under a partial map-stage retry after a
    shuffle-fetch failure (the SPARK-38388 class), recomputed
    partitions could otherwise assign rows to different chunks while
    other reducers had already fetched old output — double-counting or
    dropping lane votes near the majority threshold (ADVICE r06).
    Callers with a real position column pay nothing. (The pre-r06
    no-pos_col single-pass form silently wrapped its lanes past 65,535
    tokens — ADVICE r05; the internal chunking removes the limit
    instead of guarding it.)"""
    hexcat = F.concat(
        F.md5(F.concat(F.lit("s0|"), F.col(token_col))),
        F.md5(F.concat(F.lit("s1|"), F.col(token_col))),
    )
    packed = []
    for g in range(_LANE_GROUPS):
        v = F.conv(F.substring(hexcat, 4 * g + 1, 4), 16, 10).cast("long")
        flags = F.shiftright(v, 3).bitwiseAND(F.lit(0x1111))
        packed.append(
            (flags * F.lit(_LANE_SPREAD)).bitwiseAND(F.lit(_LANE_MASK)).alias(f"p{g}")
        )
    # integer shift, not float division: a double mantissa cannot hold
    # the top of the 64-bit id space, so `/ 16384` could blur chunk
    # boundaries there; >> 14 is exact floor division for any
    # non-negative long
    pos = F.col(pos_col) if pos_col is not None else F.monotonically_increasing_id()
    chunk = F.shiftright(pos.cast("long"), _CHUNK_SHIFT).alias("__chunk")
    stamped = tokens_df.select(F.col(key), chunk, *packed)
    if pos_col is None:
        # pin the nondeterministic id-derived chunk assignment before
        # it becomes a shuffle key (see docstring: partial-retry class)
        stamped = stamped.localCheckpoint(eager=True)
    partial = stamped.groupBy(key, "__chunk").agg(
        *[F.sum(f"p{g}").alias(f"s{g}") for g in range(_LANE_GROUPS)],
        F.count("*").alias("__n"),
    )
    # conv('abcd') is big-endian: the group's FIRST hex digit lands in
    # the highest lane, so digit 4g+r lives in lane 3-r of s{g}
    unpacks = []
    for i in range(_SIMHASH_BITS):
        g, r = divmod(i, 4)
        lane = 3 - r
        c = F.shiftright(F.col(f"s{g}"), 16 * lane).bitwiseAND(F.lit(0xFFFF))
        unpacks.append(c.alias(f"c{i}"))
    counted = (
        partial.select(key, *unpacks, "__n")
        .groupBy(key)
        .agg(
            *[F.sum(f"c{i}").alias(f"c{i}") for i in range(_SIMHASH_BITS)],
            F.sum("__n").alias("__n"),
        )
    )
    sig = F.concat(
        *[
            F.when(F.col(f"c{i}") * 2 > F.col("__n"), F.lit("1")).otherwise(F.lit("0"))
            for i in range(_SIMHASH_BITS)
        ]
    )
    return counted.select(key, sig.alias("sig"))


def simhash_vote_sql(i: int) -> str:
    """DuckDB rendering of bit i's vote term (mirrors simhash_signature)."""
    seed, pos = _simhash_bit_sources()[i]
    return f"sum(CASE WHEN substr(d{seed}, {pos}, 1) >= '8' THEN 1 ELSE -1 END)"


def simhash_near_pairs(sig_df: DataFrame, key: str, max_hamming: int = 3) -> DataFrame:
    """Candidate pairs via 16-bit band equality (pigeonhole: hamming<=3
    over 4 bands guarantees one identical band), verified by exact
    hamming distance over the bit strings. The band equi-join is the
    whole point: cost tracks band collisions, not n² pairs.

    Two things keep the verify cheap at scale:

    * the signature frame is materialized (localCheckpoint) before the
      self-join, so both join sides read the same 24-byte-per-doc
      table instead of each re-running the scan -> explode -> md5 ->
      vote pipeline upstream of it;
    * each 16-bit band is decoded ONCE per doc into a long, and the
      hamming distance is 4x ``bit_count(a XOR b)`` — Catalyst pushes
      the hamming filter into the join condition, where it runs per
      BAND COLLISION, so it must be a handful of integer ops, not the
      64 per-character string compares the bit-string form costs
      (that expression made the verify stage the registry's CPU
      outlier)."""
    sig_df = sig_df.localCheckpoint(eager=False)
    band_longs = [
        F.conv(F.substring(F.col("sig"), b * _BAND_BITS + 1, _BAND_BITS), 2, 10)
        .cast("long")
        .alias(f"b{b}")
        for b in range(_SIMHASH_BANDS)
    ]
    banded = (
        sig_df.select(key, *band_longs)
        .select(
            key,
            *[f"b{b}" for b in range(_SIMHASH_BANDS)],
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band_idx"),
                            F.col(f"b{b}").alias("band_val"),
                        )
                        for b in range(_SIMHASH_BANDS)
                    ]
                )
            ).alias("band"),
        )
        .select(
            key,
            *[f"b{b}" for b in range(_SIMHASH_BANDS)],
            F.col("band.band_idx").alias("band_idx"),
            F.col("band.band_val").alias("band_val"),
        )
    )
    a = banded.alias("a")
    b = banded.alias("b")
    hamming = sum(
        F.bit_count(F.col(f"a.b{k}").bitwiseXOR(F.col(f"b.b{k}")))
        for k in range(_SIMHASH_BANDS)
    ).cast("long")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{key}") < F.col(f"b.{key}")),
        )
        .select(
            F.col(f"a.{key}").alias("key_a"),
            F.col(f"b.{key}").alias("key_b"),
            hamming.alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_hamming_sql(sa: str, sb: str) -> str:
    """DuckDB rendering of the bit-string hamming distance."""
    terms = " + ".join(
        f"CAST(substr({sa}, {i + 1}, 1) <> substr({sb}, {i + 1}, 1) AS INT)"
        for i in range(_SIMHASH_BITS)
    )
    return f"CAST({terms} AS BIGINT)"
