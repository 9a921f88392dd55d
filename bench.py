#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized with a noop-format write (full computation,
no driver collect) so the timing reflects the distributed plan, not
result transfer.

Regression guard, two tiers (VERDICT r12 item 1):

* headline 36 — min-of-3, guarded against BENCH_BASELINE.json (the
  round-1 numbers BASELINE.md pins as the 2x bound); the "value"/
  "queries" keys stay this tier so the metric is comparable across
  rounds.
* full registry — every OTHER registry query runs min-of-2 in the
  same default pass, guarded against EXTENDED_BASELINE.json (min-of-3
  sf0.1 pins for all 134) with the same 2x-with-floor rule. Before
  r13 the ~98 non-headline queries had pins but NO enforcement in the
  driver's default run — a 5x plan regression in any of them reached
  the driver bench invisible. Reported under "full_value"/
  "full_queries"; skip with SPARK_GRAFT_BENCH_HEADLINE_ONLY=1.

Regressions from both tiers are listed in the JSON line under
"regressions" and on stderr; with SPARK_GRAFT_BENCH_STRICT=1 they
also fail the script (exit 2). The default stays exit 0 so one noisy
query can't void the whole round's bench record.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per major operator family (scan+agg, window,
# pagination, joins incl. theta/self, set ops, ETL pipelines, dedup
# exact/minhash, ANN, graph CC, sessionization, streaming-batch twin).
HEADLINE = [
    "pricing_summary",
    "getdata_page",
    "agg_order_stats",
    "latest_event_per_user",
    "sessionize_events",
    "anti_join_customers",
    "lookup_first_match",
    "nearest_tag_join",
    "pairwise_self_join",
    "distance_dedupe",
    "union_all_sync",
    "scanner_tag_etl",
    "excel_validate_etl",
    "upsert_orders",
    "dedup_exact",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "graph_connected_components",
    "graph_two_hop",
    "tumbling_event_counts",
    "pid_connections",
    "edge_snap_join",
    "tile_grid",
    "multimodal_decode",
    "llm_label_cache",
    "salted_agg_lineitem",
    "imageprocess_pipeline",
    "event_funnel",
    # round-2 additions
    "fuzzy_match_blocked",
    "heavy_hitters",
    "scd2_history",
    "triangle_count",
    "cube_order_year",
    "running_totals",
    "contamination_check",
    "redact_pii",
]


def main() -> None:
    from acuvate_spark.queries import REGISTRY
    from acuvate_spark.session import get_spark

    # --extended: profile EVERY registry query (one pass, stderr table)
    # instead of the guarded headline set — a profiling tool, not the
    # driver's metric (the headline set matches BENCH_BASELINE).
    extended = "--extended" in sys.argv[1:]
    spark = get_spark("acuvate-bench")
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    # JVM/codegen warmup so the first measured query isn't paying JIT cost
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(1).collect()
    # Python-worker warm-up (VERDICT r13 item 3): the session's FIRST
    # Arrow/mapInPandas stage pays Python-worker fork + Arrow init —
    # the judge measured 6.51 s cold vs 0.84 s warm on ocr_page_words —
    # so a kernel query that merely runs first in a min-of-2 tier can
    # masquerade as an 8x regression. One throwaway mapInPandas job
    # (all 32 slots) retires that cost before anything is timed.
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    if extended:
        rows = []
        for name in REGISTRY:
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            rows.append((round(time.perf_counter() - t0, 3), name))
            spark.catalog.clearCache()
        for t, name in sorted(rows, reverse=True):
            print(f"  {t:8.3f}s  {name}", file=sys.stderr)
        timings = {n: t for t, n in rows}
        # full-registry regression guard (VERDICT r04 item 4): the
        # headline 36 are guarded by BENCH_BASELINE; this guards the
        # other ~100, where the single-partition-scan bug hid.
        # Single-pass times carry up to ~2.3x run-to-run drift on a
        # loaded box (measured across three clean r05 runs), and the
        # r13 pins are MIN-OF-3 (lower than a clean single pass), so
        # the single-pass rule is 3x AND +2 s for every query — the
        # scan bug this guard exists for showed 2.7-4.1x with 4+ s
        # deltas against same-protocol pins, farther still against
        # min-of-3 pins. The default (driver) path measures min-of-2
        # and applies the standard 2x-with-floor rule instead.
        regressions = _regressions(
            timings, sf, "EXTENDED_BASELINE.json", ratio=3.0, min_delta=2.0
        )
        for line in regressions:
            print(f"  REGRESSION: {line}", file=sys.stderr)
        # small keys LAST (VERDICT r13 item 1): a tail-truncated capture
        # of this (huge) line must still show the headline numbers
        print(
            json.dumps(
                {
                    "metric": "all_queries_single_pass_wall_clock",
                    "unit": "sec",
                    "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                    "queries": timings,
                    "loadavg": [round(x, 2) for x in os.getloadavg()],
                    "regressions": regressions,
                    "value": round(sum(t for t, _ in rows), 3),
                }
            )
        )
        spark.stop()
        if regressions and os.environ.get("SPARK_GRAFT_BENCH_STRICT") == "1":
            sys.exit(2)
        return
    # three passes per query, report the min: steady-state measurement
    # (first pass may pay scan caching / JIT for that query's operators;
    # min-of-3 because min-of-2 at sub-second scale could not separate
    # machine noise from regression — r02's three false flags)
    timings: dict[str, float] = {}
    for attempt in range(3):
        for name in HEADLINE:
            spec = REGISTRY[name]
            t0 = time.perf_counter()
            df = spec.fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            elapsed = round(time.perf_counter() - t0, 3)
            if name not in timings or elapsed < timings[name]:
                timings[name] = elapsed
            print(f"  [{attempt}] {name}: {elapsed:.3f}s", file=sys.stderr)
            # queries persist multi-use intermediates; drop them so one
            # query's cache never pressures the next measurement
            spark.catalog.clearCache()
    total = round(sum(timings.values()), 3)
    regressions = _regressions(timings, sf)
    # ---- tier 2: the ~98 non-headline registry queries, min-of-2,
    # guarded by the min-of-3 pins in EXTENDED_BASELINE.json with the
    # standard 2x-with-floor rule (VERDICT r12 item 1: these had pins
    # but no enforcement in the driver's default run)
    rest = [n for n in REGISTRY if n not in set(HEADLINE)]
    full: dict[str, float] = {}
    full_ran = bool(rest) and os.environ.get("SPARK_GRAFT_BENCH_HEADLINE_ONLY") != "1"
    if full_ran:
        for attempt in range(2):
            for name in rest:
                t0 = time.perf_counter()
                REGISTRY[name].fn(spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                elapsed = round(time.perf_counter() - t0, 3)
                if name not in full or elapsed < full[name]:
                    full[name] = elapsed
                spark.catalog.clearCache()
            print(
                f"  [full pass {attempt}] {round(sum(full.values()), 1)}s over "
                f"{len(rest)} non-headline queries",
                file=sys.stderr,
            )
        regressions += _regressions(full, sf, "EXTENDED_BASELINE.json")
    for line in regressions:
        print(f"  REGRESSION: {line}", file=sys.stderr)
    # key ORDER is load-bearing (VERDICT r13 item 1): the r13 record of
    # note was lost because the driver's tail-truncation of this (huge)
    # one-line JSON ate the leading keys — exactly value/regressions.
    # The big per-query dicts now come FIRST and every small key LAST,
    # so any tail capture is self-contained; loadavg makes a noisy-box
    # record self-describing (VERDICT r13 item 2). full_value /
    # full_queries are null when the tier 2 pass was skipped (ADVICE
    # r13: a skipped pass used to be indistinguishable from a measured
    # one whose total happened to equal the headline's).
    print(f"  HEADLINE value={total}s regressions={len(regressions)}",
          file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_clock_min_of_3",
                "unit": "sec",
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "queries": timings,
                "full_queries": full if full_ran else None,
                "loadavg": [round(x, 2) for x in os.getloadavg()],
                "full_value": round(total + sum(full.values()), 3) if full_ran else None,
                "regressions": regressions,
                "value": total,
            }
        )
    )
    spark.stop()
    if regressions and os.environ.get("SPARK_GRAFT_BENCH_STRICT") == "1":
        sys.exit(2)


def _regressions(
    timings: dict[str, float],
    sf: str,
    baseline_file: str = "BENCH_BASELINE.json",
    ratio: float | None = None,
    min_delta: float | None = None,
) -> list[str]:
    """Queries past 2x their recorded baseline, with a floor on BOTH
    sides of the guard (VERDICT r02 item 3): machine-load runs show
    sub-second queries drifting 2-3x uniformly with no code change, and
    a plan regression worth acting on costs seconds, not tenths.

    - baseline >= 1 s: the plain 2x rule applies;
    - baseline  < 1 s: flag only a drift that no load spike produces —
      past 4x AND at least 2 s absolute (r02's three false flags were
      1.9-3.2 s on 0.4-1.3 s baselines, all under this bar while a real
      broadcast->BNL or pushdown loss lands seconds over it).
    Only meaningful at the baseline's scale factor."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), baseline_file)
    try:
        with open(path) as f:
            base = json.load(f)
    except OSError:
        return []
    if str(base.get("sf")) != sf:
        return []
    out = []
    for name, t in timings.items():
        b = base["queries"].get(name)
        if b is None:
            continue
        if ratio is not None:
            flagged = t > ratio * b and t - b > (min_delta or 0.0)
            rule = f">{ratio}x and +{min_delta}s"
        elif b >= 1.0:
            flagged, rule = t > 2 * b, ">2x"
        else:
            flagged, rule = t > 4 * b and t - b > 2.0, ">4x and +2s (sub-second rule)"
        if flagged:
            out.append(f"{name}: {t:.3f}s vs baseline {b:.3f}s ({rule})")
    return out


if __name__ == "__main__":
    main()
