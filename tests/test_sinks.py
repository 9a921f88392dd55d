"""Sink adapter tests (SURVEY §2.1 S7-S13)."""

from __future__ import annotations

import json
import os

from acuvate_spark.operators import sinks
from acuvate_spark.tables import load_table


def test_append_parquet(spark, sf_dir, tmp_path):
    path = str(tmp_path / "sink")
    df = load_table(spark, sf_dir, "supplier")
    sinks.append_parquet(df, path)
    sinks.append_parquet(df, path)  # append, not overwrite
    assert spark.read.parquet(path).count() == df.count() * 2


def test_rest_sink_posts_all_rows_in_batches(spark, sf_dir, tmp_path):
    out = str(tmp_path / "posts.jsonl")

    # executors are separate local processes: collect via shared file
    def poster(batch):
        with open(out, "a") as f:
            f.write(json.dumps({"n": len(batch), "keys": [r["s_suppkey"] for r in batch]}) + "\n")

    df = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    sinks.rest_sink(df, poster, batch_size=3)
    batches = [json.loads(line) for line in open(out)]
    assert all(b["n"] <= 3 for b in batches)
    posted = sorted(k for b in batches for k in b["keys"])
    expected = sorted(r["s_suppkey"] for r in df.collect())
    assert posted == expected


def test_export_excel_falls_back_to_csv(spark, sf_dir, tmp_path):
    df = load_table(spark, sf_dir, "region")
    path = sinks.export_excel(
        df,
        str(tmp_path / "out.xlsx"),
        header_map={"r_regionkey": "Region Key", "r_name": "Region"},
    )
    assert os.path.exists(path)
    header = open(path).readline().strip()
    assert "Region Key" in header and "Region" in header


def test_append_ledger(tmp_path):
    p = str(tmp_path / "ledger.jsonl")
    sinks.append_ledger(["a.pdf", "b.pdf"], p)
    sinks.append_ledger(["c.pdf"], p)
    assert [json.loads(x)["path"] for x in open(p)] == ["a.pdf", "b.pdf", "c.pdf"]
