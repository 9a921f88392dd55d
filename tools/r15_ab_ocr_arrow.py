#!/usr/bin/env python3
"""Interleaved A/B for the OCR word-explosion kernel boundary
(VERDICT r14 item 4): committed mapInPandas (adaptive row-loop/numpy)
vs a mapInArrow form where the only Python work is str.split() — row
replication is Arrow `take`, word lengths are `utf8_length`, nulls are
explicit masks (no pandas frames on either side of the boundary).

Runs both full consumer queries (scanner_tag_etl: token-sparse pages;
ocr_page_words: token-dense pages) by monkeypatching
kernels.ocr_words_stub, and first verifies row equality on both
fixtures at sf0.1.
"""

from __future__ import annotations

import os
import sys
import time
from collections.abc import Iterator

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "5"))

from pyspark.sql import DataFrame

from acuvate_spark.operators import kernels
from acuvate_spark.queries import REGISTRY
from acuvate_spark.session import get_spark

committed_ocr = kernels.ocr_words_stub


def arrow_ocr_words_stub(pages: DataFrame, passthrough: tuple[str, ...] = ()) -> DataFrame:
    cols = ["page_id", "word_idx", "word", "poly_x", "poly_y", *passthrough]
    schema = kernels.OCR_WORDS_SCHEMA + "".join(f", {c} string" for c in passthrough)

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        from itertools import chain

        for rb in it:
            n = rb.num_rows
            if n == 0:
                continue
            content = rb.column(rb.schema.get_field_index("content"))
            toks = [str(t).split() if t is not None else [] for t in content.to_pylist()]
            lens = np.fromiter((len(t) for t in toks), dtype=np.int64, count=n)
            total = int(lens.sum())
            row_idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), lens))
            page_rep = pc.cast(
                rb.column(rb.schema.get_field_index("page_id")).take(row_idx),
                pa.int64(),
            )
            words = pa.array(list(chain.from_iterable(toks)), type=pa.string())
            starts = np.repeat(lens.cumsum() - lens, lens)
            word_idx = np.arange(total, dtype=np.int64) - starts
            no_poly = pc.less(pc.utf8_length(words), 2).to_numpy(zero_copy_only=False)
            page_np = page_rep.to_numpy(zero_copy_only=False)
            arrays = [
                page_rep,
                pa.array(word_idx),
                words,
                pa.array(10.0 * word_idx, mask=no_poly),
                pa.array((page_np % 100).astype(np.float64), mask=no_poly),
            ]
            for c in passthrough:
                arrays.append(
                    pc.cast(rb.column(rb.schema.get_field_index(c)).take(row_idx), pa.string())
                )
            yield pa.RecordBatch.from_arrays(arrays, names=cols)

    return pages.mapInArrow(batches, schema=schema)


def run(name):
    return REGISTRY[name].fn(None if False else spark, SF_DIR)


if __name__ == "__main__":
    spark = get_spark("r15-ab-ocr-arrow")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(1).collect()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    queries = ["scanner_tag_etl", "ocr_page_words"]
    # row-equality check first
    for q in queries:
        kernels.ocr_words_stub = committed_ocr
        ra = sorted(map(tuple, REGISTRY[q].fn(spark, SF_DIR).collect()))
        spark.catalog.clearCache()
        kernels.ocr_words_stub = arrow_ocr_words_stub
        rb_ = sorted(map(tuple, REGISTRY[q].fn(spark, SF_DIR).collect()))
        spark.catalog.clearCache()
        print(f"{q}: committed rows={len(ra)} arrow rows={len(rb_)} equal={ra == rb_}", flush=True)

    for q in queries:
        times = {"pandas": [], "arrow": []}
        for _ in range(REPS):
            for tag, impl in (("pandas", committed_ocr), ("arrow", arrow_ocr_words_stub)):
                kernels.ocr_words_stub = impl
                t0 = time.perf_counter()
                REGISTRY[q].fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                times[tag].append(round(time.perf_counter() - t0, 3))
                spark.catalog.clearCache()
        kernels.ocr_words_stub = committed_ocr
        print(
            f"{q}: pandas min={min(times['pandas']):.3f} runs={times['pandas']}  |  "
            f"arrow min={min(times['arrow']):.3f} runs={times['arrow']}  "
            f"loadavg={os.getloadavg()[0]:.2f}",
            flush=True,
        )
    spark.stop()
