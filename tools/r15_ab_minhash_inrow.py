#!/usr/bin/env python3
"""Interleaved 3-way A/B for the minhash signature pass over the
dedup_minhash_lsh pipeline shape at sf0.1:

  A: committed r14 form — explode shingles, groupBy(doc).agg(min(hex
     string) x8 + count)  -> Sort+SortAggregate pipeline
  B: long-lane form — same shape, min(conv(slice) as long) x8
     -> HashAggregate
  C: in-row form — signature computed per doc row from the shingle
     ARRAY (digests column projected once, array_min over slices);
     no shuffle/sort/agg for the signature at all

All three then run the UNCHANGED band/candidate/verify tail, so the
timing difference isolates the signature pass. C also verifies its
result rows equal A's (sorted collect compare) on the first rep.
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
from acuvate_spark.queries.dedup import (
    _BAND_SIZE,
    _N_HASHES,
    _doc_shingles,
    _docs_plus_clones,
    _materialize_and_release,
)
from acuvate_spark.session import get_spark


def _tail(sh, sig):
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
    return _materialize_and_release(result, sh)


def old_sig_strings(shingles_df, key, n_hashes):
    aggs = [
        F.min(c).alias(f"mh{i}")
        for i, c in enumerate(dedup_ops.minhash_strings(F.col("shingle"), n_hashes))
    ]
    aggs.append(F.count("*").alias("n"))
    return shingles_df.groupBy(key).agg(*aggs)


def variant_a(spark, sf_dir):
    docs = _docs_plus_clones(spark, sf_dir)
    sh = _doc_shingles(docs)
    sig = old_sig_strings(sh, "doc_id", _N_HASHES).localCheckpoint(eager=True)
    return _tail(sh, sig)


def variant_b(spark, sf_dir):
    docs = _docs_plus_clones(spark, sf_dir)
    sh = _doc_shingles(docs)
    sig = dedup_ops.minhash_signature(
        sh, "doc_id", "shingle", _N_HASHES, with_count=True
    ).localCheckpoint(eager=True)
    return _tail(sh, sig)


def variant_c(spark, sf_dir):
    from acuvate_spark.tables import repartition_for_compute

    docs = _docs_plus_clones(spark, sf_dir)
    w = textual.words(F.trim(F.col("text")))
    shingles = F.array_distinct(
        F.filter(textual.word_shingles(w, 3), lambda s: s != "")
    )
    arr = (
        repartition_for_compute(docs)
        .select("doc_id", shingles.alias("arr"))
        .where(F.size("arr") > 0)
        .persist()
    )
    sh = arr.select("doc_id", F.explode("arr").alias("shingle"))
    dig = F.transform(
        F.col("arr"),
        lambda s: F.concat(
            F.md5(F.concat(F.lit("seed0|"), s)), F.md5(F.concat(F.lit("seed1|"), s))
        ),
    )
    slices = [
        F.array_min(
            F.transform(F.col("__dig"), lambda d: F.substring(d, i * 8 + 1, 8))
        ).alias(f"mh{i}")
        for i in range(_N_HASHES)
    ]
    sig = (
        arr.select("doc_id", dig.alias("__dig"), F.size("arr").alias("n"))
        .select("doc_id", *slices, "n")
        .localCheckpoint(eager=True)
    )
    out = _tail(sh, sig)
    arr.unpersist()
    return out


def main() -> None:
    spark = get_spark("r15-ab-minhash-inrow")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(1).collect()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    # result-equality check: A vs C rows
    ra = sorted(map(tuple, variant_a(spark, SF_DIR).collect()))
    rc = sorted(map(tuple, variant_c(spark, SF_DIR).collect()))
    print(f"A rows={len(ra)} C rows={len(rc)} equal={ra == rc}", flush=True)
    spark.catalog.clearCache()
    times = {"A": [], "B": [], "C": []}
    for _ in range(REPS):
        for tag, fn in (("A", variant_a), ("B", variant_b), ("C", variant_c)):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            times[tag].append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
    for tag in ("A", "B", "C"):
        print(f"{tag}: min={min(times[tag]):.3f} runs={times[tag]}", flush=True)
    print(f"loadavg={os.getloadavg()[0]:.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
