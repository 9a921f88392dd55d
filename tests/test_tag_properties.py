"""Randomized cross-checks: the tag-grammar column expressions vs
independent Python models of the same rules (written from SURVEY §2.8
semantics). One seeded batch of generated tags runs through Spark in a
single job and every row is compared — catches Java-regex vs
python-re divergence the structured synthetic inputs might miss."""

from __future__ import annotations

import random
import re

from pyspark.sql import functions as F

from acuvate_spark.functions import tags


# --- Python models (spec: SURVEY §2.8 F7/P9/F2/F4) -------------------------

def model_classify(tag_no: str, file_type: str) -> str:
    t, ft = tag_no.strip().upper(), file_type.strip().upper()
    if re.search(tags.PAT_INVALID_REV, t) or re.search(tags.PAT_INVALID_LOCAL, t):
        return "Unknown"
    m = re.search(tags.PAT_FUNC_CODE, t)
    by_fc = None
    if m:
        by_fc = "Instrument" if len(m.group(1)) >= 2 else "Equipment"
    if ft.startswith("A7001"):
        return by_fc or "Instrument"
    if ft.startswith("A6"):
        return "Cable"
    if ft.startswith("A7"):
        return "Cable" if re.search(tags.PAT_CABLE, t) else "Instrument"
    if re.search(tags.PAT_LINE, t):
        return "Line"
    if re.search(tags.PAT_CABLE, t):
        return "Cable"
    if re.search(tags.PAT_INSTRUMENT, t):
        return "Instrument"
    if re.search(tags.PAT_EQUIPMENT, t):
        return "Equipment"
    if ft.startswith(("A4", "B5")):
        return by_fc or "Line"
    if ft.startswith("A42"):
        return "Equipment"
    if ft.startswith("A3"):
        return "Line"
    return "Unknown"


def model_valid(tag: str) -> bool:
    t = tag.strip()
    up = t.upper()
    if re.fullmatch(r"\d+(-\d+)*", t):
        return False
    if re.fullmatch(r"[A-Za-z-]+", t) and re.search("[A-Za-z]", t):
        return False
    if up in tags.STOP_TAGS:
        return False
    if not (re.search("[A-Za-z]", t) and re.search("[0-9]", t)):
        return False
    if up.startswith(("E17", "L7")):
        return False
    return True


def model_normalize(tag: str) -> str:
    return re.sub(r"(\d+)([A-Z])($|-)", r"\1-\2\3", tag)


def model_slash(tag: str) -> list[str]:
    if "/" not in tag:
        return [tag]
    base, suffix = tag.split("/", 1)
    m = re.match(r"^(.*?)([A-Z]+)$", base)
    if m:
        return [m.group(1) + m.group(2), m.group(1) + suffix]
    return [base, suffix]


def _gen_tags(n: int = 400) -> list[tuple[str, str]]:
    rng = random.Random(1234)
    assets = ["E17-A", "E17-B", "L7", "K2", "A1-B2", ""]
    funcs = ["PIT", "F", "CBL", "CABLE", "CB", "P", "XI", "A/B", "REV"]
    fts = ["A7001", "A6", "A7", "A40", "A42", "A3", "B5", "XX", "", "a7"]
    out = []
    for _ in range(n):
        kind = rng.randrange(8)
        seq = rng.randrange(1, 99999)
        f = rng.choice(funcs)
        a = rng.choice(assets)
        if kind == 0:
            tag = f"{a}_{f}-{seq}"
        elif kind == 1:
            tag = f"{a}_{f}-{seq}-{rng.choice(['A', 'B1', '12'])}"
        elif kind == 2:
            tag = f'{a}_{rng.randrange(1, 30)}"-{f}-{seq}-{seq % 97}'
        elif kind == 3:
            tag = f"{a}_REV{rng.randrange(10)}"
        elif kind == 4:
            tag = str(seq)
        elif kind == 5:
            tag = rng.choice(["BY-PASS", "BYPASS", "NO", "ABC-DEF"])
        elif kind == 6:
            tag = f"F-{seq}{rng.choice(['A', 'B'])}/{rng.choice(['B', 'C'])}"
        else:
            tag = f"{a}_{f}{seq}"
        out.append((tag, rng.choice(fts)))
    return out


def test_classify_and_valid_match_python_models(spark):
    data = _gen_tags()
    df = spark.createDataFrame(data, "tag string, ft string").select(
        "tag",
        "ft",
        tags.classify_tag_type(F.col("tag"), F.col("ft")).alias("cls"),
        tags.is_valid_plant_tag(F.col("tag")).alias("valid"),
        tags.normalize_hyphen(F.col("tag")).alias("norm"),
        tags.slash_expand(F.col("tag")).alias("expanded"),
    )
    for r in df.collect():
        assert r["cls"] == model_classify(r["tag"], r["ft"]), (r["tag"], r["ft"])
        assert r["valid"] == model_valid(r["tag"]), r["tag"]
        assert r["norm"] == model_normalize(r["tag"]), r["tag"]
        assert list(r["expanded"]) == model_slash(r["tag"]), r["tag"]
