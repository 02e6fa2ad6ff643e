"""Minimal XLSX (Office Open XML spreadsheet) reader/writer — pure
stdlib (zipfile + xml.etree), no openpyxl/xlrd in this image.

Reference analog: the Excel branch of the vector loader
(``pythongis/vector/loader.py:133-150``: openpyxl ``iter_rows`` with
first row as field names, optional ``skip``/``last``/``sheet`` and
``xfield``/``yfield`` point geometry) and saver. Scope: SpreadsheetML
as written by Excel/openpyxl/this writer — shared strings, inline
strings, numbers, booleans; no formula evaluation (cached values are
used), no styles/dates (dates surface as their raw serial numbers, like
openpyxl without the style map). Legacy .xls (BIFF) is out of scope —
the reference needs xlrd for that too.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET

import numpy as np
import pandas as pd

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_PKG_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"


def _col_index(ref: str) -> int:
    """'A1' / 'BC12' → 0-based column index."""
    n = 0
    for ch in ref:
        if ch.isdigit():
            break
        n = n * 26 + (ord(ch.upper()) - 64)
    return n - 1


def _cell_value(c, shared: list[str]):
    t = c.get("t", "n")
    v = c.find(_NS + "v")
    if t == "inlineStr":
        is_el = c.find(_NS + "is")
        if is_el is None:
            return None
        return "".join(tel.text or "" for tel in is_el.iter(_NS + "t"))
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "b":
        return v.text.strip() in ("1", "true")
    if t in ("str", "e"):
        return v.text
    # number: int when integral (the reference's CSV parser does the same)
    x = float(v.text)
    return int(x) if x.is_integer() and abs(x) < 2**53 else x


def parse_xlsx(path_or_bytes, sheet: str | None = None) -> list[list]:
    """XLSX → list of rows (lists of python values, ragged rows padded
    with None to the max seen width)."""
    zf = zipfile.ZipFile(path_or_bytes)
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    rid_to_target = {
        r.get("Id"): r.get("Target") for r in rels.iter(_PKG_REL_NS + "Relationship")
    }
    sheets = []
    for s in wb.iter(_NS + "sheet"):
        target = rid_to_target.get(s.get(_REL_NS + "id"), "")
        if target and not target.startswith("xl/"):
            target = "xl/" + target.lstrip("/")
        sheets.append((s.get("name"), target))
    if not sheets:
        raise ValueError("workbook has no sheets")
    if sheet is None:
        target = sheets[0][1]
    else:
        match = [t for n, t in sheets if n == sheet]
        if not match:
            raise KeyError(f"sheet {sheet!r} not found (have {[n for n, _ in sheets]})")
        target = match[0]

    shared: list[str] = []
    if "xl/sharedStrings.xml" in zf.namelist():
        ss = ET.fromstring(zf.read("xl/sharedStrings.xml"))
        for si in ss.iter(_NS + "si"):
            shared.append("".join(t.text or "" for t in si.iter(_NS + "t")))

    ws = ET.fromstring(zf.read(target))
    rows: list[list] = []
    width = 0
    for row in ws.iter(_NS + "row"):
        vals: dict[int, object] = {}
        auto = 0
        for c in row.iter(_NS + "c"):
            ref = c.get("r")
            ci = _col_index(ref) if ref else auto
            auto = ci + 1
            vals[ci] = _cell_value(c, shared)
        w = max(vals) + 1 if vals else 0
        width = max(width, w)
        rows.append([vals.get(i) for i in range(w)])
    return [r + [None] * (width - len(r)) for r in rows]


def read_xlsx(
    spark,
    path: str,
    sheet: str | None = None,
    skip: int = 0,
    last: int | None = None,
    xfield: str | None = None,
    yfield: str | None = None,
):
    """.xlsx → Spark DataFrame; first (post-``skip``) row is the header
    (reference loader semantics). ``xfield``/``yfield`` add a WKB point
    ``geom`` column like the reference's xy geokey."""
    rows = parse_xlsx(path, sheet=sheet)[skip:]
    if last is not None:
        rows = rows[: last + 2]  # header + rows 0..last (reference: i <= last)
    if not rows:
        raise ValueError("empty sheet")
    return _rows_to_df(spark, rows, xfield, yfield)


def _rows_to_df(spark, rows: list[list], xfield: str | None, yfield: str | None):
    """Shared header-row + geokey + dtype-normalization tail for the
    spreadsheet readers (.xlsx here, .xls in :mod:`sources.xls`)."""
    from pythongis_spark.geometry import wkb as W

    fields = [str(f) if f is not None else f"col{i}" for i, f in enumerate(rows[0])]
    pdf = pd.DataFrame(rows[1:], columns=fields)
    if xfield and yfield:
        def mk(row):
            try:
                x, y = float(row[xfield]), float(row[yfield])
            except (TypeError, ValueError):
                return None
            return W.wkb_point(x, y)

        pdf["geom"] = pdf.apply(mk, axis=1)
    # object columns holding only numbers → proper dtypes for Spark
    for c in pdf.columns:
        if pdf[c].dtype == object:
            try:
                pdf[c] = pd.to_numeric(pdf[c])
            except (ValueError, TypeError):
                pass
    return spark.createDataFrame(pdf)


_CT = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WB = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="{name}" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""

_WB_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""


def _esc(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def write_xlsx(df_or_pdf, path: str, sheet: str = "Sheet1") -> None:
    """Table → single-sheet .xlsx with inline strings (no shared-string
    table — simplest conformant form). Geometry columns are skipped.
    Driver-side collect, dimension-table scale (reference saver
    analog)."""
    pdf = df_or_pdf.toPandas() if hasattr(df_or_pdf, "toPandas") else df_or_pdf
    cols = [c for c in pdf.columns if pdf[c].dtype != object or not any(
        isinstance(v, (bytes, bytearray)) for v in pdf[c].dropna().head(5)
    )]
    body = ["<sheetData>"]

    def cell(v):
        if v is None or (isinstance(v, float) and np.isnan(v)):
            return "<c/>"
        if isinstance(v, bool) or isinstance(v, np.bool_):
            return f'<c t="b"><v>{int(v)}</v></c>'
        if isinstance(v, (int, float, np.integer, np.floating)):
            return f"<c><v>{v!r}</v></c>"
        return f'<c t="inlineStr"><is><t>{_esc(str(v))}</t></is></c>'

    body.append("<row>" + "".join(cell(str(c)) for c in cols) + "</row>")
    for _, row in pdf[cols].iterrows():
        body.append("<row>" + "".join(cell(row[c]) for c in cols) + "</row>")
    body.append("</sheetData>")
    ws = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        + "".join(body)
        + "</worksheet>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CT)
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", _WB.format(name=_esc(sheet)))
        zf.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        zf.writestr("xl/worksheets/sheet1.xml", ws)
