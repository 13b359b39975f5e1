"""Pure-stdlib minimal .xlsx writer (VERDICT r2 item 7) — the
in-container real path for the K5 spreadsheet sink (reference
orchestrate.py:195-234 writes via pandas.ExcelWriter/openpyxl).

An .xlsx file is a zip of XML parts; this writes the minimal valid
set ([Content_Types].xml, _rels/.rels, xl/workbook.xml + its rels,
one xl/worksheets/sheetN.xml per sheet) with inline strings and
numeric cells — readable by Excel/LibreOffice/openpyxl. No styles,
no shared-string table (inline strings keep the writer single-pass).
"""

from __future__ import annotations

import zipfile
from pathlib import Path
from xml.sax.saxutils import escape, quoteattr

_CT = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
{sheet_overrides}
</Types>"""

_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WB = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets>{sheets}</sheets>
</workbook>"""

_WB_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
{rels}
</Relationships>"""


def _col_letters(idx: int) -> str:
    """0-based column index → A, B, ..., Z, AA, ..."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(65 + rem) + out
    return out


def _cell_xml(ref: str, v) -> str:
    if v is None:
        return ""
    if isinstance(v, bool):  # before int: bool is an int subclass
        return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
    if isinstance(v, (int, float)):
        if isinstance(v, float) and (v != v or v in (float("inf"), float("-inf"))):
            return f'<c r="{ref}" t="inlineStr"><is><t>{v!r}</t></is></c>'
        return f'<c r="{ref}"><v>{v!r}</v></c>'
    text = escape(str(v))
    return f'<c r="{ref}" t="inlineStr"><is><t>{text}</t></is></c>'


def _sheet_xml(columns: list, rows: list[tuple]) -> str:
    parts = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">',
        "<sheetData>",
    ]
    all_rows = [tuple(columns)] + [tuple(r) for r in rows]
    for r_no, row in enumerate(all_rows, start=1):
        cells = "".join(
            _cell_xml(f"{_col_letters(c)}{r_no}", v) for c, v in enumerate(row)
        )
        parts.append(f'<row r="{r_no}">{cells}</row>')
    parts.append("</sheetData></worksheet>")
    return "".join(parts)


def write_xlsx(sheets: dict[str, tuple[list, list[tuple]]], target: str) -> None:
    """sheets: {name: (columns, rows)} → one .xlsx at target.

    Sheet names are truncated to Excel's 31-char limit (same rule as
    the openpyxl path in sinks.reports.write_spreadsheet)."""
    Path(target).parent.mkdir(parents=True, exist_ok=True)
    # truncate to Excel's 31-char limit, then DEDUP: two long names
    # sharing a prefix must not yield duplicate sheet names (an
    # invalid workbook Excel refuses to open)
    names: list[str] = []
    seen: set[str] = set()
    for n in sheets:
        cand = n[:31]
        i = 1
        while cand in seen:
            suffix = f"~{i}"
            cand = n[: 31 - len(suffix)] + suffix
            i += 1
        seen.add(cand)
        names.append(cand)
    overrides = "\n".join(
        f'<Override PartName="/xl/worksheets/sheet{i}.xml" '
        'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        for i in range(1, len(names) + 1)
    )
    wb_sheets = "".join(
        f'<sheet name={quoteattr(n)} sheetId="{i}" r:id="rId{i}"/>'
        for i, n in enumerate(names, start=1)
    )
    wb_rels = "\n".join(
        f'<Relationship Id="rId{i}" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
        f'Target="worksheets/sheet{i}.xml"/>'
        for i in range(1, len(names) + 1)
    )
    with zipfile.ZipFile(target, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CT.format(sheet_overrides=overrides))
        z.writestr("_rels/.rels", _RELS)
        z.writestr("xl/workbook.xml", _WB.format(sheets=wb_sheets))
        z.writestr("xl/_rels/workbook.xml.rels", _WB_RELS.format(rels=wb_rels))
        for i, (_name, (columns, rows)) in enumerate(sheets.items(), start=1):
            z.writestr(f"xl/worksheets/sheet{i}.xml", _sheet_xml(columns, rows))
