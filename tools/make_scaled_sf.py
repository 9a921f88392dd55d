#!/usr/bin/env python3
"""Generate sf0.2 / sf0.5 scale-ups of the driver's sf0.1 testdata for
the scaling-exponent measurement (VERDICT r05 item 4).

The driver ships sf{0.001,0.01,0.1} only; the super-linear-or-not
question needs points ABOVE the bench scale, so this tool k-fold
replicates sf0.1 into /tmp/scaled_sf/sf{0.2,0.5} with per-replica
transforms chosen to preserve each workload's statistical character —
the point is that a 5x row count should cost ~5x, so the generator
must not smuggle in super-linear structure:

* keyed tables: keys offset by replica * (max_key + 1), preserving
  referential integrity (orders<->lineitem, part, customer, supplier);
  dates/prices untouched, so selectivities are unchanged.
* documents: per-replica bijective character maps (rotations of the
  lowercase alphabet) rewrite every token, so each replica's documents
  are UNRELATED to other replicas' — planted near-dup clusters scale
  in COUNT (x k), not in size. Naive cloning would instead multiply
  every cluster's size by k and grow LSH candidate pairs by k^2 — a
  quadratic artifact of the generator, not of the plan under test.
* embeddings: per-replica cyclic rotation of the 64 dims — norms and
  within-replica geometry preserved, cross-replica vectors decorrelated
  (same reasoning as documents: neighbor-list sizes stay constant).
* events: user_id/event_id offset per replica — the user population
  grows, the time span stays fixed (scale-out, not history-growth);
  per-user session/gap statistics are unchanged.
* region/nation: fixed dimensions, copied as-is.

Deterministic (pure SQL over the committed sf0.1 files), so repeated
runs produce identical parquet and measurements are reproducible.

    python tools/make_scaled_sf.py [--out /tmp/scaled_sf] [--sf1]

``--sf1`` additionally builds a k=10 scale-up for the memory-pressure
smoke profile (VERDICT r05 stretch item).
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[sys.argv.index("--out") + 1] if "--out" in sys.argv else "/tmp/scaled_sf"

ALPHA = "abcdefghijklmnopqrstuvwxyz"


_UNITS = [1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25]  # units mod 26


def _charmap(r: int) -> tuple[str, str]:
    """Replica r's bijective token rewrite: the AFFINE permutation
    i -> (a*i + b) mod 26 with a = _UNITS[r % 12], b = (5r + r//12)
    mod 26 — identity for r=0. The pre-r10 rotation-only map (shift
    5r) had PERIOD 26: replicas r and r+26 carried identical text, so
    a k=50 dir planted ~k docs-worth of cross-replica exact-dup pairs
    and a k=100 dir would plant ~k^2/26 per base doc — quadratic
    generator structure exactly where the dedup octaves look for
    engine-side quadratic growth. Affine maps are pairwise distinct
    for r < 108 (same a -> b differs by 9m mod 26 != 0 for m <= 8),
    covering every octave this tool can build."""
    a = _UNITS[r % 12]
    b = (5 * r + r // 12) % 26
    perm = "".join(ALPHA[(a * i + b) % 26] for i in range(26))
    src = ALPHA + ALPHA.upper()
    return src, perm + perm.upper()


def build(sf: str, k: int, src: str = SRC, out_root: str | None = None) -> None:
    con = duckdb.connect()
    out = os.path.join(out_root or OUT, f"sf{sf}")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    t = {n: f"'{src}/{n}.parquet'" for n in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    )}
    maxes = {
        "order": con.execute(f"SELECT max(o_orderkey)+1 FROM {t['orders']}").fetchone()[0],
        "cust": con.execute(f"SELECT max(c_custkey)+1 FROM {t['customer']}").fetchone()[0],
        "part": con.execute(f"SELECT max(p_partkey)+1 FROM {t['part']}").fetchone()[0],
        "supp": con.execute(f"SELECT max(s_suppkey)+1 FROM {t['supplier']}").fetchone()[0],
        "user": con.execute(f"SELECT max(user_id)+1 FROM {t['events']}").fetchone()[0],
        "event": con.execute(f"SELECT max(event_id)+1 FROM {t['events']}").fetchone()[0],
        "doc": con.execute(f"SELECT max(doc_id)+1 FROM {t['documents']}").fetchone()[0],
        "vec": con.execute(f"SELECT max(vec_id)+1 FROM {t['embeddings']}").fetchone()[0],
    }

    def write(name: str, union_sql: str) -> None:
        con.execute(f"COPY ({union_sql}) TO '{out}/{name}.parquet' (FORMAT PARQUET)")

    for name in ("region", "nation"):
        write(name, f"SELECT * FROM {t[name]}")

    def replicas(per_replica_sql) -> str:
        return " UNION ALL ".join(per_replica_sql(r) for r in range(k))

    write("customer", replicas(lambda r: f"""
        SELECT c_custkey + {r * maxes['cust']} AS c_custkey, c_name,
               c_nationkey, c_acctbal, c_mktsegment FROM {t['customer']}"""))
    write("supplier", replicas(lambda r: f"""
        SELECT s_suppkey + {r * maxes['supp']} AS s_suppkey, s.* EXCLUDE (s_suppkey)
        FROM {t['supplier']} s"""))
    write("part", replicas(lambda r: f"""
        SELECT p_partkey + {r * maxes['part']} AS p_partkey, p.* EXCLUDE (p_partkey)
        FROM {t['part']} p"""))
    write("orders", replicas(lambda r: f"""
        SELECT o_orderkey + {r * maxes['order']} AS o_orderkey,
               o_custkey + {r * maxes['cust']} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {t['orders']}"""))
    write("lineitem", replicas(lambda r: f"""
        SELECT l_orderkey + {r * maxes['order']} AS l_orderkey,
               l_partkey + {r * maxes['part']} AS l_partkey,
               l_suppkey + {r * maxes['supp']} AS l_suppkey,
               l.* EXCLUDE (l_orderkey, l_partkey, l_suppkey)
        FROM {t['lineitem']} l"""))
    write("events", replicas(lambda r: f"""
        SELECT event_id + {r * maxes['event']} AS event_id, ts,
               user_id + {r * maxes['user']} AS user_id, event_type, value, props
        FROM {t['events']}"""))

    def doc_sql(r: int) -> str:
        src, dst = _charmap(r)
        return f"""
        SELECT doc_id + {r * maxes['doc']} AS doc_id,
               translate(text, '{src}', '{dst}') AS text,
               lang, source, n_chars
        FROM {t['documents']}"""

    write("documents", replicas(doc_sql))

    def emb_sql(r: int) -> str:
        # rotation alone has period 64 (replicas r and r+64 identical
        # — same artifact class as the charmap fix above); compose a
        # per-replica deterministic sign vector: signs apply per-dim
        # to every vector of the replica, so within-replica norms and
        # dot products are EXACTLY preserved while cross-replica
        # vectors decorrelate. Identity for r=0.
        import random as _random

        signs = (
            [1] * 64
            if r == 0
            else [_random.Random(9000 + r).choice((1, -1)) for _ in range(64)]
        )
        rot = (7 * r) % 64
        rotated = f"list_concat(embedding[{rot + 1}:64], embedding[1:{rot}])"
        flipped = (
            f"list_transform(list_zip({rotated}, {list(signs)}::INT[]), "
            "x -> x[1] * x[2])::FLOAT[]"
        )
        return f"""
        SELECT vec_id + {r * maxes['vec']} AS vec_id,
               {flipped} AS embedding,
               label
        FROM {t['embeddings']}"""

    write("embeddings", replicas(emb_sql))
    print(f"wrote {out} (k={k})")


def plan(argv: list[str]) -> list[tuple[str, int]]:
    """CLI flag -> (sf label, k) build list. ``--sf1`` adds the k=10
    point (the per-round sf1 smoke/parity scale); ``--sf2`` adds k=20
    — the 20x coarse-net point that is round protocol since r09 (it
    caught ann_cosine_topk at 35.8x where the 10x net could not).
    Pinned in tests/test_scaling_tools.py so the harness path can't
    silently drift."""
    out = [("0.2", 2), ("0.5", 5)]
    if "--sf1" in argv:
        out.append(("1", 10))
    if "--sf2" in argv:
        out.append(("2", 20))
    if "--sf5" in argv:
        # k=50 — one octave past the 20x net, for the slowest families
        out.append(("5", 50))
    if "--sf10" in argv:
        # k=100 — the r10 octave for the highest measured 50x ratios
        # (hashed_text_classifier, repeated_ngram_spans, dedup_simhash)
        out.append(("10", 100))
    return out


if __name__ == "__main__":
    for sf, k in plan(sys.argv):
        build(sf, k)
