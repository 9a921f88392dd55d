"""Per-query version hashes — the driver-rotation staleness signal.

Each registry query's identity is the md5 of its SOURCE SEGMENT (the
``@register(...)`` decorator — which embeds the oracle SQL — plus the
function body), extracted by AST so no import is needed. The manifest
``QUERY_VERSIONS.json`` records, per query::

    {"<name>": {"hash": "<md5>", "since_round": N}}

meaning: THIS version of the query has existed since round N. The
driver contract (``__spark_entry__``) counts a CORRECTNESS row as
verifying a query only if ``row_round >= since_round`` — so rewriting
a query (or its oracle) automatically re-front-loads it into the
~50-query verification window, which the hand-maintained order of
rounds 1-2 failed to do and the round-3 review caught
(dedup_embedding_cosine's LSH rewrite would otherwise have shipped on
its round-1 brute-force green row).

``tests/test_docs.py`` asserts every registry query's current hash
matches the manifest; editing a query without regenerating fails the
suite. Regenerate with::

    python tools/query_versions.py          # bump changed/new entries
"""

from __future__ import annotations

import ast
import hashlib
import json
import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
QUERY_DIR = REPO / "acuvate_spark" / "queries"
MANIFEST = REPO / "QUERY_VERSIONS.json"


def _register_name(dec: ast.expr) -> str | None:
    """The query name from an @register("name", ...) decorator."""
    if (
        isinstance(dec, ast.Call)
        and isinstance(dec.func, ast.Name)
        and dec.func.id == "register"
        and dec.args
        and isinstance(dec.args[0], ast.Constant)
        and isinstance(dec.args[0].value, str)
    ):
        return dec.args[0].value
    return None


def query_hashes(query_dir: Path = QUERY_DIR) -> dict[str, str]:
    """name -> md5 of the decorator+function source segment."""
    out: dict[str, str] = {}
    for py in sorted(query_dir.glob("*.py")):
        src = py.read_text()
        lines = src.splitlines()
        tree = ast.parse(src)
        for node in ast.walk(tree):
            if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                continue
            for dec in node.decorator_list:
                name = _register_name(dec)
                if name is None:
                    continue
                start = min(d.lineno for d in node.decorator_list) - 1
                segment = "\n".join(lines[start : node.end_lineno])
                out[name] = hashlib.md5(segment.encode()).hexdigest()
    return out


def committed_rounds(repo: Path = REPO) -> list[int]:
    rounds = []
    for p in repo.glob("CORRECTNESS_r*.json"):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)", p.stem)
        if m:
            rounds.append(int(m.group(1)))
    return sorted(rounds)


def load_manifest(path: Path = MANIFEST) -> dict[str, dict]:
    try:
        return json.loads(path.read_text())
    except (OSError, json.JSONDecodeError):
        return {}


def regenerate(path: Path = MANIFEST) -> tuple[dict[str, dict], list[str]]:
    """Update the manifest: new/changed queries get since_round =
    next round (max committed CORRECTNESS round + 1); unchanged
    entries keep their recorded since_round; deleted queries drop.
    Returns (manifest, names actually bumped by THIS run)."""
    current = query_hashes()
    old = load_manifest(path)
    next_round = (committed_rounds()[-1] + 1) if committed_rounds() else 1
    out: dict[str, dict] = {}
    bumped: list[str] = []
    for name, h in sorted(current.items()):
        prev = old.get(name)
        if prev and prev.get("hash") == h:
            out[name] = prev
        else:
            out[name] = {"hash": h, "since_round": next_round}
            bumped.append(name)
    path.write_text(json.dumps(out, indent=1) + "\n")
    return out, bumped


if __name__ == "__main__":
    manifest, bumped = regenerate()
    print(f"{len(manifest)} queries in manifest; bumped by this run: {bumped or 'none'}")
