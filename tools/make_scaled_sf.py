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


def _charmap(r: int) -> tuple[str, str]:
    """Replica r's bijective token rewrite: rotate a-z (and A-Z) by
    5*r — identity for r=0."""
    k = (5 * r) % 26
    src = ALPHA + ALPHA.upper()
    dst = ALPHA[k:] + ALPHA[:k] + (ALPHA[k:] + ALPHA[:k]).upper()
    return src, dst


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
    write("embeddings", replicas(lambda r: f"""
        SELECT vec_id + {r * maxes['vec']} AS vec_id,
               list_concat(embedding[{(7 * r) % 64 + 1}:64],
                           embedding[1:{(7 * r) % 64}])::FLOAT[] AS embedding,
               label
        FROM {t['embeddings']}"""))
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
    return out


if __name__ == "__main__":
    for sf, k in plan(sys.argv):
        build(sf, k)
