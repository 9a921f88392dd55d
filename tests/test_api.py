"""Full lifecycle test of the TagRegistry API facade: insert -> read
(paginated) -> search -> excel import (two-phase) -> approvals ->
delete -> sync -> export. This is the 'a user of the reference backend
switches to this engine' path (SURVEY §3 endpoints end-to-end)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from acuvate_spark.api import TagRegistry


@pytest.fixture()
def registry(spark, tmp_path):
    return TagRegistry(spark, str(tmp_path / "warehouse"))


def _incoming(spark, rows):
    return spark.createDataFrame(
        rows, "tag_no string, description string, document string, modified_by string"
    )


def test_full_lifecycle(spark, registry):
    # 1. upsert: initial inserts
    registry.upsert_tags(
        "Equipment",
        _incoming(
            spark,
            [
                ("E17-A_F-1001", "pump A", "DOC-1", "amy@example.com"),
                ("E17-A_F-1002", "pump B", "DOC-2", "amy@example.com"),
                ("E17-A_F-1003", "pump C", "DOC-2;DOC-3", "bob@example.com"),
            ],
        ),
    )
    assert registry.table("Equipment").count() == 3

    # 2. upsert again: one update (semicolon doc merge) + one insert
    registry.upsert_tags(
        "Equipment",
        _incoming(spark, [("E17-A_F-1002", "pump B rev2", "DOC-9", "bob@example.com"),
                          ("E17-A_F-1004", "pump D", "DOC-4", "bob@example.com")]),
    )
    t = {r["tag_no"]: r for r in registry.table("Equipment").collect()}
    assert len(t) == 4
    assert t["E17-A_F-1002"]["description"] == "pump B rev2"
    assert t["E17-A_F-1002"]["document"] == "DOC-2;DOC-9"  # merged set, sorted

    # 3. paginated read with search
    page = registry.get_data("Equipment", page=1, page_size=2, search="F-100").collect()
    assert len(page) == 2 and page[0]["totalCount"] == 4

    # 4. cross-register first-match search
    registry.upsert_tags(
        "Instrument", _incoming(spark, [("E17-A_PIT-2001", "meter", "", "amy@example.com")])
    )
    hit = registry.find_tag("E17-A_PIT-2001").collect()
    assert len(hit) == 1 and hit[0]["tag_type"] == "Instrument"

    # 5. two-phase excel import: 1 edit, 1 add, 2 errors
    rows = spark.createDataFrame(
        [
            ("E17-A_F-1001", "pump A rev2", "DOC-5", "carol@example.com"),
            ("E17-A_F-2000", "new pump", None, "carol@example.com"),
            ("nan", "bad row", None, "carol@example.com"),
            ("E17-A_F-3000", None, None, "carol@example.com"),
        ],
        "tagno string, description string, document string, modified_by string",
    )
    report = {(r["tag_no"], r["action"]): r for r in registry.import_rows("Equipment", rows).collect()}
    actions = sorted(a for (_, a) in report)
    assert actions == ["ERROR", "ERROR", "Add", "Edit"] or sorted(actions) == ["Add", "ERROR", "ERROR", "Edit"]
    t = {r["tag_no"]: r for r in registry.table("Equipment").collect()}
    assert t["E17-A_F-1001"]["description"] == "pump A rev2"
    assert "E17-A_F-2000" in t and len(t) == 5

    # 6. approvals: Edit on existing -> edited; Add on existing -> rejected
    history = spark.createDataFrame(
        [
            ("E17-A_F-1004", "pump D approved", "Edit", "PENDING"),
            ("E17-A_F-1001", "dup add", "Add", "PENDING"),
            ("E17-A_F-5000", "brand new", "Add", "PENDING"),
            ("E17-A_F-6000", "ghost edit", "Edit", "PENDING"),
        ],
        "tag_no string, description string, action string, approval_status string",
    )
    disp = {r["tag_no"]: r["disposition"] for r in registry.apply_approvals("Equipment", history).collect()}
    assert disp["E17-A_F-1004"] == "edited"
    assert disp["E17-A_F-1001"] == "rejected_add"
    assert disp["E17-A_F-5000"] == "added"
    assert "E17-A_F-6000" not in disp  # rejected_edit filtered

    # 7. delete by key
    removed = registry.delete_tags("Equipment", ["E17-A_F-1003", "NOPE"])
    assert removed == 1

    # 8. sync window over all registers
    now = datetime.datetime.now(datetime.timezone.utc)
    sync = registry.sync_rows(
        (now - datetime.timedelta(days=1)).replace(tzinfo=None),
        (now + datetime.timedelta(days=1)).replace(tzinfo=None),
    )
    types = {r["tag_type"] for r in sync.collect()}
    assert "Equipment" in types and "Instrument" in types

    # 9. export (CSV fallback in this env)
    out = registry.export_excel("Equipment", str(registry.root) + "/export.xlsx",
                                header_map={"tag_no": "Tag Number"})
    assert "Tag Number" in open(out).readline()


def test_keyset_pagination(spark, registry):
    registry.upsert_tags(
        "Line",
        _incoming(
            spark,
            [(f"E17-A_L-{i:04d}", f"line {i}", "", "amy@example.com") for i in range(25)],
        ),
    )
    page1 = registry.get_data_after("Line", page_size=10).collect()
    assert len(page1) == 10
    last = page1[-1]
    page2 = registry.get_data_after(
        "Line", page_size=10, after=(last["modified_date"], last["tag_no"])
    ).collect()
    assert len(page2) == 10
    assert {r["tag_no"] for r in page1}.isdisjoint({r["tag_no"] for r in page2})
    # keyset pages, concatenated, equal offset paging of the same order
    page3 = registry.get_data_after(
        "Line", page_size=10, after=(page2[-1]["modified_date"], page2[-1]["tag_no"])
    ).collect()
    all_keyset = [r["tag_no"] for r in page1 + page2 + page3]
    assert len(all_keyset) == 25 and len(set(all_keyset)) == 25


def test_registry_uncommitted_version_is_invisible(spark, tmp_path):
    """A register version whose writer was killed mid job-commit (part
    files, no _SUCCESS) must not become current — readers serve the
    previous committed version (r07, same crash-invisibility rule as
    the move/promote/merge sinks)."""
    import os
    import shutil

    from acuvate_spark.api import TagRegistry

    reg = TagRegistry(spark, str(tmp_path / "root"))
    df = spark.createDataFrame(
        [("T-1", "d", "doc", "u", None)],
        "tag_no string, description string, document string, "
        "modified_by string, modified_date timestamp",
    )
    reg._write_version("equip", df)
    assert reg.table("equip").count() == 1

    staged = str(tmp_path / "staged")
    df.limit(0).coalesce(1).write.parquet(staged)
    partial = os.path.join(reg._versions_dir("equip"), f"v{'9' * 25}")
    os.makedirs(partial)
    for f in os.listdir(staged):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(staged, f), partial)

    # the partial (empty) newer version is ignored; v1 still serves
    assert reg.table("equip").count() == 1
