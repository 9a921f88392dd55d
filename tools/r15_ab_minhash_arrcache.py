#!/usr/bin/env python3
"""Interleaved A/B for a cache-layout variant of dedup_minhash_lsh at
sf0.1:

  A: committed form — the EXPLODED (doc_id, shingle) stream is
     persisted and feeds the signature aggregation and both verify
     sides.
  D: array-cache form — the per-doc shingle ARRAY frame is persisted
     (one row per doc, far fewer cached rows); the exploded stream is
     re-derived from the cached arrays for the signature aggregation
     and the verify joins (explode is narrow and cheap; the md5 work
     is unchanged, still in the signature aggregation).

D verifies its result rows equal A's on the first rep.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "5"))

from pyspark.sql import functions as F

from acuvate_spark.functions import textual
from acuvate_spark.operators import dedup as dedup_ops
from acuvate_spark.queries import REGISTRY
from acuvate_spark.queries.dedup import (
    _BAND_SIZE,
    _N_HASHES,
    _docs_plus_clones,
    _materialize_and_release,
)
from acuvate_spark.session import get_spark
from acuvate_spark.tables import repartition_for_compute


def _tail(sh, sig, released):
    counts = sig.select("doc_id", "n")
    bands = dedup_ops.band_keys(sig.drop("n"), "doc_id", _N_HASHES, _BAND_SIZE)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    ca = counts.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    cb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    cand = (
        cand.join(ca, "doc_a")
        .join(cb, "doc_b")
        .where(F.lit(10) * F.least("na", "nb") >= F.lit(7) * F.greatest("na", "nb"))
        .localCheckpoint(eager=True)
    )
    cand_ids = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sh_cand = sh.join(F.broadcast(cand_ids), "doc_id", "left_semi")
    sa = sh_cand.select(F.col("doc_id").alias("da"), F.col("shingle").alias("sh_a"))
    sb = sh_cand.select(F.col("doc_id").alias("db"), F.col("shingle").alias("sh_b"))
    common = (
        cand.join(sa, F.col("doc_a") == F.col("da"))
        .join(sb, (F.col("doc_b") == F.col("db")) & (F.col("sh_a") == F.col("sh_b")))
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count("*").alias("c"))
    )
    jac = F.col("c").cast("double") / (F.col("na") + F.col("nb") - F.col("c"))
    result = common.where(jac >= 0.7).select(
        "doc_a", "doc_b", F.round(jac, 6).alias("jaccard")
    )
    return _materialize_and_release(result, released)


def variant_a(spark, sf_dir):
    return REGISTRY["dedup_minhash_lsh"].fn(spark, sf_dir)


def variant_d(spark, sf_dir):
    docs = _docs_plus_clones(spark, sf_dir)
    w = textual.words(F.trim(F.col("text")))
    shingles = F.array_distinct(
        F.filter(textual.word_shingles(w, 3), lambda s: s != "")
    )
    arr = (
        repartition_for_compute(docs)
        .select("doc_id", shingles.alias("arr"))
        .persist()
    )
    sh = arr.select("doc_id", F.explode("arr").alias("shingle"))
    sig = dedup_ops.minhash_signature(
        sh, "doc_id", "shingle", _N_HASHES, with_count=True
    ).localCheckpoint(eager=True)
    return _tail(sh, sig, arr)


def main() -> None:
    spark = get_spark("r15-ab-minhash-arrcache")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(1).collect()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    ra = sorted(map(tuple, variant_a(spark, SF_DIR).collect()))
    rd = sorted(map(tuple, variant_d(spark, SF_DIR).collect()))
    print(f"A rows={len(ra)} D rows={len(rd)} equal={ra == rd}", flush=True)
    spark.catalog.clearCache()
    times = {"A": [], "D": []}
    for _ in range(REPS):
        for tag, fn in (("A", variant_a), ("D", variant_d)):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            times[tag].append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
    for tag in ("A", "D"):
        print(f"{tag}: min={min(times[tag]):.3f} runs={times[tag]}", flush=True)
    print(f"loadavg={os.getloadavg()[0]:.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
