#!/usr/bin/env python3
"""Regenerate the committed S2 fixture
``acuvate_spark/resources/tags_import.xlsx`` — a tiny hand-zipped
SpreadsheetML workbook (no writer library) whose rows feed
``excel_validate_etl``. The workbook deliberately exercises every
decode path of ``sources.read_xlsx``: shared strings (TagType),
inline strings (TagNo/Sequence), numeric cells (RowId), and a missing
cell (row 1's TagNo). Zip timestamps are pinned so the binary is
byte-reproducible.

    python tools/make_xlsx_fixture.py
"""

from __future__ import annotations

import zipfile
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "acuvate_spark" / "resources" / "tags_import.xlsx"

NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
RNS = "http://schemas.openxmlformats.org/package/2006/relationships"

# (row_id, tagno or None, tagtype, sequence) — row_id % 4 drives the
# Add/Edit split in the ETL; rows 1-3 hit the three error branches.
ROWS = [
    (1000001, None, "equipment tag", "7.0"),
    (1000002, "nan", "INSTRUMENT", "8.0"),
    (1000003, "PIT-3101", "junk", "9.0"),
    (1000004, "PIT-3102", "line tag", "10.0"),
    (1000005, "PIT-3103", "cable", "11.0"),
    (1000006, "PIT-3104", "equipment tag", "12.0"),
    (1000007, "PIT-3105", "INSTRUMENT", "13.0"),
    (1000008, "PIT-3106", "line tag", "14.0"),
]

SHARED = ["RowId", "TagNo", "TagType", "Sequence", "equipment tag",
          "INSTRUMENT", "junk", "line tag", "cable"]


def _inline(ref: str, text: str) -> str:
    return f'<c r="{ref}" t="inlineStr"><is><t>{text}</t></is></c>'


def _shared(ref: str, text: str) -> str:
    return f'<c r="{ref}" t="s"><v>{SHARED.index(text)}</v></c>'


def _num(ref: str, n: int) -> str:
    return f'<c r="{ref}"><v>{n}</v></c>'


def sheet_xml() -> str:
    rows = ['<row r="1">' + "".join(_shared(f"{c}1", h) for c, h in
            zip("ABCD", SHARED[:4])) + "</row>"]
    for i, (rid, tagno, tagtype, seq) in enumerate(ROWS, start=2):
        cells = [_num(f"A{i}", rid)]
        if tagno is not None:  # missing cell -> NULL on read
            cells.append(_inline(f"B{i}", tagno))
        cells.append(_shared(f"C{i}", tagtype))
        cells.append(_inline(f"D{i}", seq))
        rows.append(f'<row r="{i}">' + "".join(cells) + "</row>")
    return (f'<?xml version="1.0"?><worksheet xmlns="{NS}"><sheetData>'
            + "".join(rows) + "</sheetData></worksheet>")


def shared_xml() -> str:
    sis = "".join(f"<si><t>{s}</t></si>" for s in SHARED)
    return (f'<?xml version="1.0"?><sst xmlns="{NS}" count="{len(SHARED)}" '
            f'uniqueCount="{len(SHARED)}">{sis}</sst>')


PARTS = {
    "[Content_Types].xml": (
        '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/'
        'package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-'
        'package.relationships+xml"/><Default Extension="xml" ContentType='
        '"application/xml"/><Override PartName="/xl/workbook.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        '<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.'
        'openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/></Types>'
    ),
    "_rels/.rels": (
        f'<?xml version="1.0"?><Relationships xmlns="{RNS}">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    ),
    "xl/workbook.xml": (
        f'<?xml version="1.0"?><workbook xmlns="{NS}" xmlns:r='
        '"http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="Tags" sheetId="1" r:id="rId1"/></sheets></workbook>'
    ),
    "xl/_rels/workbook.xml.rels": (
        f'<?xml version="1.0"?><Relationships xmlns="{RNS}">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
        '<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>'
        "</Relationships>"
    ),
}


def main() -> None:
    OUT.parent.mkdir(parents=True, exist_ok=True)
    parts = dict(PARTS)
    parts["xl/sharedStrings.xml"] = shared_xml()
    parts["xl/worksheets/sheet1.xml"] = sheet_xml()
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as z:
        for name, data in parts.items():
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            z.writestr(info, data)
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
