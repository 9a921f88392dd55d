"""Tag-grammar expression library.

Re-expresses the reference's tag classification / validation /
normalization rules (reference: app.py:761-837 TAG_PATTERNS +
classify_tag_type; app.py:858-867 is_valid_plant_tag; app.py:986
hyphen normalization; app.py:933-953 slash expansion; app.py:5771-5781
and app.py:5911-5926 semicolon-set merges) as pure Spark column
expressions — no UDFs, so everything stays inside whole-stage codegen.

Each rule is defined ONCE and rendered twice: to a PySpark ``Column``
(for the engine) and to an ANSI-SQL string (for the DuckDB oracle).
That guarantees the correctness harness exercises byte-identical
semantics on both sides.

All regexes are restricted to the Java-regex ∩ RE2 common subset so
Spark ``rlike`` and DuckDB ``regexp_matches`` agree.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- Grammar constants (reference app.py:761-781, app.py:787-792) ---
PAT_INVALID_REV = r"^[A-Z0-9-]+_REV\d+$"
PAT_INVALID_LOCAL = r"^[A-Z0-9-]+_LOCALINSTRUMENT$"
PAT_LINE = r'^[A-Z0-9-]+_[0-9]+"?\s?[A-Z]*-\d+-\d+$'
PAT_INSTRUMENT = r"^[A-Z0-9-]+_[A-Z]{2,}-\d+(-[A-Z0-9]+)?$"
PAT_EQUIPMENT = r"^[A-Z0-9-]+_[A-Z]-\d+(-[A-Z0-9]+)?$"
PAT_CABLE = r"^[A-Z0-9-]+_(CBL|CABLE|CAB|CB)-?\d+"
PAT_FUNC_CODE = r"_([A-Z/]+)-"

# Drawing-scanner OCR grammars (reference app.py:917-922)
PAT_REGULAR = r"^[A-Z&]{1,3}-\d{1,5}[A-Z]?(-\d+[A-Z]?)?(-[A-Z0-9]+)?(/[A-Z]+)?$"
PAT_PIPE = r'^(\d{1,2}(/\d{1,2})?"-)[A-Z0-9]{2,6}(-[A-Z0-9]{2,6}){2,4}(-[A-Z]{1,2})?$'

STOP_TAGS = ("BY-PASS", "BYPASS", "PASS", "NO")


def _sql_quote_pattern(pattern: str) -> str:
    return "'" + pattern.replace("'", "''") + "'"


# ---------------------------------------------------------------------------
# classify_tag_type — reference app.py:783-837
# ---------------------------------------------------------------------------

def classify_tag_type(tag: Column, file_type: Column) -> Column:
    """Rule cascade: invalid patterns -> file-type specials -> grammar
    patterns -> file-type fallbacks -> Unknown. Pure ``when``/``rlike``
    expression (SURVEY.md §2.8 F7 — no UDF needed)."""
    t = F.upper(F.trim(tag))
    ft = F.upper(F.trim(file_type))
    func_code = F.regexp_extract(t, PAT_FUNC_CODE, 1)
    instr_or_equip = F.when(F.length(func_code) >= 2, F.lit("Instrument")).otherwise(
        F.lit("Equipment")
    )
    by_func_code = F.when(func_code != "", instr_or_equip)
    return (
        F.when(t.rlike(PAT_INVALID_REV) | t.rlike(PAT_INVALID_LOCAL), F.lit("Unknown"))
        .when(ft.startswith("A7001"), F.coalesce(by_func_code, F.lit("Instrument")))
        .when(ft.startswith("A6"), F.lit("Cable"))
        .when(
            ft.startswith("A7"),
            F.when(t.rlike(PAT_CABLE), F.lit("Cable")).otherwise(F.lit("Instrument")),
        )
        .when(t.rlike(PAT_LINE), F.lit("Line"))
        .when(t.rlike(PAT_CABLE), F.lit("Cable"))
        .when(t.rlike(PAT_INSTRUMENT), F.lit("Instrument"))
        .when(t.rlike(PAT_EQUIPMENT), F.lit("Equipment"))
        .when(
            ft.startswith("A4") | ft.startswith("B5"),
            F.coalesce(by_func_code, F.lit("Line")),
        )
        .when(ft.startswith("A42"), F.lit("Equipment"))  # unreachable after A4, kept for parity
        .when(ft.startswith("A3"), F.lit("Line"))
        .otherwise(F.lit("Unknown"))
    )


def classify_tag_type_sql(tag_expr: str, file_type_expr: str) -> str:
    """DuckDB-SQL rendering of the same cascade."""
    t = f"upper(trim({tag_expr}))"
    ft = f"upper(trim({file_type_expr}))"
    fc = f"regexp_extract({t}, {_sql_quote_pattern(PAT_FUNC_CODE)}, 1)"
    by_fc = (
        f"CASE WHEN {fc} <> '' THEN "
        f"(CASE WHEN length({fc}) >= 2 THEN 'Instrument' ELSE 'Equipment' END) END"
    )
    m = lambda p: f"regexp_matches({t}, {_sql_quote_pattern(p)})"  # noqa: E731
    return f"""CASE
  WHEN {m(PAT_INVALID_REV)} OR {m(PAT_INVALID_LOCAL)} THEN 'Unknown'
  WHEN {ft} LIKE 'A7001%' THEN coalesce({by_fc}, 'Instrument')
  WHEN {ft} LIKE 'A6%' THEN 'Cable'
  WHEN {ft} LIKE 'A7%' THEN (CASE WHEN {m(PAT_CABLE)} THEN 'Cable' ELSE 'Instrument' END)
  WHEN {m(PAT_LINE)} THEN 'Line'
  WHEN {m(PAT_CABLE)} THEN 'Cable'
  WHEN {m(PAT_INSTRUMENT)} THEN 'Instrument'
  WHEN {m(PAT_EQUIPMENT)} THEN 'Equipment'
  WHEN {ft} LIKE 'A4%' OR {ft} LIKE 'B5%' THEN coalesce({by_fc}, 'Line')
  WHEN {ft} LIKE 'A42%' THEN 'Equipment'
  WHEN {ft} LIKE 'A3%' THEN 'Line'
  ELSE 'Unknown'
END"""


# ---------------------------------------------------------------------------
# is_valid_plant_tag — reference app.py:858-867
# ---------------------------------------------------------------------------
_PAT_ALL_DIGIT_PARTS = r"^\d+(-\d+)*$"
_PAT_ALPHA_HYPHEN = r"^[A-Za-z-]+$"


def is_valid_plant_tag(tag: Column) -> Column:
    t = F.trim(tag)
    up = F.upper(t)
    has_alpha = t.rlike("[A-Za-z]")
    has_digit = t.rlike("[0-9]")
    return (
        ~t.rlike(_PAT_ALL_DIGIT_PARTS)
        & ~(t.rlike(_PAT_ALPHA_HYPHEN) & has_alpha)
        & ~up.isin(*STOP_TAGS)
        & (has_alpha & has_digit)
        & ~up.startswith("E17")
        & ~up.startswith("L7")
    )


def is_valid_plant_tag_sql(tag_expr: str) -> str:
    t = f"trim({tag_expr})"
    up = f"upper({t})"
    stop = ", ".join(f"'{s}'" for s in STOP_TAGS)
    return (
        f"(NOT regexp_matches({t}, {_sql_quote_pattern(_PAT_ALL_DIGIT_PARTS)})"
        f" AND NOT (regexp_matches({t}, {_sql_quote_pattern(_PAT_ALPHA_HYPHEN)})"
        f"          AND regexp_matches({t}, '[A-Za-z]'))"
        f" AND {up} NOT IN ({stop})"
        f" AND regexp_matches({t}, '[A-Za-z]') AND regexp_matches({t}, '[0-9]')"
        f" AND {up} NOT LIKE 'E17%' AND {up} NOT LIKE 'L7%')"
    )


# ---------------------------------------------------------------------------
# Hyphen normalization — reference app.py:986: re.sub(r'(\d+)([A-Z])($|-)', r'\1-\2\3')
# ---------------------------------------------------------------------------
_PAT_HYPHEN = r"(\d+)([A-Z])($|-)"


def normalize_hyphen(tag: Column) -> Column:
    return F.regexp_replace(tag, _PAT_HYPHEN, r"$1-$2$3")


def normalize_hyphen_sql(tag_expr: str) -> str:
    return (
        f"regexp_replace({tag_expr}, {_sql_quote_pattern(_PAT_HYPHEN)}, "
        f"'\\1-\\2\\3', 'g')"
    )


# ---------------------------------------------------------------------------
# Slash-suffix expansion — reference app.py:933-953: 'F-1158A/B' -> [F-1158A, F-1158B]
# ---------------------------------------------------------------------------
_PAT_BASE_SPLIT = r"^(.*?)([A-Z]+)$"


def slash_expand(tag: Column) -> Column:
    """1 tag -> array of expanded tags (explode downstream; SURVEY §2.8 F4/X4)."""
    parts0 = F.split(tag, "/", 2)
    base = F.element_at(parts0, 1)
    suffix = F.element_at(parts0, 2)
    prefix = F.regexp_extract(base, _PAT_BASE_SPLIT, 1)
    last_letters = F.regexp_extract(base, _PAT_BASE_SPLIT, 2)
    return (
        F.when(~tag.contains("/"), F.array(tag))
        .when(
            last_letters != "",
            F.array(F.concat(prefix, last_letters), F.concat(prefix, suffix)),
        )
        .otherwise(F.array(base, suffix))
    )


def slash_expand_sql(tag_expr: str) -> str:
    t = tag_expr
    base = f"string_split({t}, '/')[1]"
    suffix = f"string_split({t}, '/')[2]"
    prefix = f"regexp_extract({base}, {_sql_quote_pattern(_PAT_BASE_SPLIT)}, 1)"
    last = f"regexp_extract({base}, {_sql_quote_pattern(_PAT_BASE_SPLIT)}, 2)"
    return (
        f"CASE WHEN strpos({t}, '/') = 0 THEN [{t}] "
        f"WHEN {last} <> '' THEN [{prefix} || {last}, {prefix} || {suffix}] "
        f"ELSE [{base}, {suffix}] END"
    )


# ---------------------------------------------------------------------------
# Semicolon-packed multi-value merges — SURVEY §2.7 U2/U3
# ---------------------------------------------------------------------------

def merge_semicolon_sorted(a: Column, b: Column) -> Column:
    """Sorted set-union merge (reference app.py:5771-5781): split both on
    ';', union as sets, sort, re-pack. Nulls/empties contribute nothing."""
    arr = F.array_sort(
        F.array_distinct(
            F.filter(
                F.concat(
                    F.split(F.coalesce(a, F.lit("")), ";"),
                    F.split(F.coalesce(b, F.lit("")), ";"),
                ),
                lambda x: F.trim(x) != "",
            )
        )
    )
    return F.array_join(arr, ";")


def merge_semicolon_sorted_sql(a_expr: str, b_expr: str) -> str:
    return (
        f"array_to_string(list_sort(list_distinct(list_filter("
        f"list_concat(string_split(coalesce({a_expr}, ''), ';'), "
        f"string_split(coalesce({b_expr}, ''), ';')), x -> trim(x) <> ''))), ';')"
    )


def merge_semicolon_append(a: Column, b: Column) -> Column:
    """Order-preserving distinct append (reference app.py:5911-5926):
    existing values keep their order, new values append once."""
    arr_a = F.filter(F.split(F.coalesce(a, F.lit("")), ";"), lambda x: F.trim(x) != "")
    arr_b = F.filter(F.split(F.coalesce(b, F.lit("")), ";"), lambda x: F.trim(x) != "")
    return F.array_join(F.array_union(arr_a, arr_b), ";")


# ---------------------------------------------------------------------------
# Null normalization — reference app.py:6117-6122 / app.py:5933 ('', 'nan', None -> null)
# ---------------------------------------------------------------------------

def null_normalize(c: Column) -> Column:
    t = F.trim(c)
    return F.when(F.lower(t).isin("", "nan", "none", "null"), F.lit(None)).otherwise(t)


def null_normalize_sql(expr: str) -> str:
    return (
        f"CASE WHEN lower(trim({expr})) IN ('', 'nan', 'none', 'null') "
        f"THEN NULL ELSE trim({expr}) END"
    )
