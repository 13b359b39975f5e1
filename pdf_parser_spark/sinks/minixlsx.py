"""Pure-stdlib minimal .xlsx writer (VERDICT r2 item 7) — the
in-container real path for the K5 spreadsheet sink (reference
orchestrate.py:195-234 writes via pandas.ExcelWriter/openpyxl).

An .xlsx file is a zip of XML parts; this writes the minimal valid
set ([Content_Types].xml, _rels/.rels, xl/workbook.xml + its rels,
xl/styles.xml, one xl/worksheets/sheetN.xml per sheet) with inline
strings and numeric cells — readable by Excel/LibreOffice/openpyxl.
No shared-string table (inline strings keep the writer single-pass).

Header styling parity (VERDICT r4 #7, reference orchestrate.py
_autofit, 210-234): row 1 is bold (cellXfs style 1) and every column
gets width = min(longest value + 2, max_width=60) — the same rule the
reference applies through openpyxl.
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

# two cell formats: 0 = default, 1 = bold (header row)
_STYLES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<fonts count="2"><font><sz val="11"/><name val="Calibri"/></font>
<font><b/><sz val="11"/><name val="Calibri"/></font></fonts>
<fills count="2"><fill><patternFill patternType="none"/></fill>
<fill><patternFill patternType="gray125"/></fill></fills>
<borders count="1"><border/></borders>
<cellStyleXfs count="1"><xf/></cellStyleXfs>
<cellXfs count="2"><xf xfId="0"/><xf fontId="1" xfId="0" applyFont="1"/></cellXfs>
</styleSheet>"""


def _col_letters(idx: int) -> str:
    """0-based column index → A, B, ..., Z, AA, ..."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(65 + rem) + out
    return out


def _cell_xml(ref: str, v, style: int = 0) -> str:
    s = f' s="{style}"' if style else ""
    if v is None:
        return ""
    if isinstance(v, bool):  # before int: bool is an int subclass
        return f'<c r="{ref}"{s} t="b"><v>{1 if v else 0}</v></c>'
    if isinstance(v, (int, float)):
        if isinstance(v, float) and (v != v or v in (float("inf"), float("-inf"))):
            return f'<c r="{ref}"{s} t="inlineStr"><is><t>{v!r}</t></is></c>'
        return f'<c r="{ref}"{s}><v>{v!r}</v></c>'
    text = escape(str(v))
    return f'<c r="{ref}"{s} t="inlineStr"><is><t>{text}</t></is></c>'


def _sheet_xml(columns: list, rows: list[tuple], max_width: int = 60) -> str:
    all_rows = [tuple(columns)] + [tuple(r) for r in rows]
    # reference _autofit rule: width = min(longest value + 2, max_width)
    n_cols = max((len(r) for r in all_rows), default=0)
    cols = []
    for c in range(n_cols):
        longest = max(
            (len(str(r[c])) if c < len(r) and r[c] is not None else 0 for r in all_rows),
            default=0,
        )
        w = min(longest + 2, max_width)
        cols.append(f'<col min="{c + 1}" max="{c + 1}" width="{w}" customWidth="1"/>')
    parts = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">',
        f"<cols>{''.join(cols)}</cols>" if cols else "",
        "<sheetData>",
    ]
    for r_no, row in enumerate(all_rows, start=1):
        style = 1 if r_no == 1 else 0  # bold header row
        cells = "".join(
            _cell_xml(f"{_col_letters(c)}{r_no}", v, style) for c, v in enumerate(row)
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
    overrides += (
        '\n<Override PartName="/xl/styles.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>'
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
    wb_rels += (
        f'\n<Relationship Id="rId{len(names) + 1}" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" '
        'Target="styles.xml"/>'
    )
    with zipfile.ZipFile(target, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CT.format(sheet_overrides=overrides))
        z.writestr("_rels/.rels", _RELS)
        z.writestr("xl/workbook.xml", _WB.format(sheets=wb_sheets))
        z.writestr("xl/_rels/workbook.xml.rels", _WB_RELS.format(rels=wb_rels))
        z.writestr("xl/styles.xml", _STYLES)
        for i, (_name, (columns, rows)) in enumerate(sheets.items(), start=1):
            z.writestr(f"xl/worksheets/sheet{i}.xml", _sheet_xml(columns, rows))
