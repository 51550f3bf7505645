#!/usr/bin/env python3
"""Generate fixtures/20240131_IWM_holdings.xlsx from the committed CSV twin.

The CSV (fixtures/20240131_IWM_holdings.csv) remains the DuckDB-oracle view
of the same table; the .xlsx is what graft.sources.XlsxSource actually
ingests (the reference reads the vendor workbook directly —
data_apis/my_ishares.py:16). The workbook deliberately has NO row_idx
column: file order is a property of the sheet, and the Spark reader
synthesizes row_idx from the sheet row number so keep-first dedup stays
deterministic.

Stdlib-only (zipfile + xml escaping) so the fixture is reproducible in any
environment, and so the committed artifact's provenance is this script, not
a binary of unknown origin. Deterministic: fixed zip timestamps, fixed part
order, shared-strings table in first-occurrence order.
"""
import csv
import sys
import zipfile
from xml.sax.saxutils import escape

CSV = "fixtures/20240131_IWM_holdings.csv"
XLSX = "fixtures/20240131_IWM_holdings.xlsx"

# Vendor columns, in sheet order (row_idx is NOT a workbook column).
STRING_COLS = {"Ticker", "Name", "Sector", "Asset Class"}
HEADERS = ["Ticker", "Name", "Sector", "Asset Class",
           "Market Value", "Weight (%)", "Shares", "Price"]

CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
</Types>"""

ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="Holdings" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""

WORKBOOK_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>
</Relationships>"""


def col_ref(i):  # 0 -> A, 1 -> B, ...
    s = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        s = chr(ord("A") + r) + s
    return s


def main():
    with open(CSV, newline="") as f:
        rows = list(csv.DictReader(f))

    shared, shared_idx = [], {}

    def sidx(v):
        if v not in shared_idx:
            shared_idx[v] = len(shared)
            shared.append(v)
        return shared_idx[v]

    sheet_rows = []
    # header row: all shared strings
    cells = "".join(
        f'<c r="{col_ref(ci)}1" t="s"><v>{sidx(h)}</v></c>'
        for ci, h in enumerate(HEADERS))
    sheet_rows.append(f'<row r="1">{cells}</row>')
    for ri, row in enumerate(rows, start=2):
        cells = []
        for ci, h in enumerate(HEADERS):
            v = row[h]
            ref = f"{col_ref(ci)}{ri}"
            if v == "":
                continue  # empty cell omitted — the reader must tolerate gaps
            if h in STRING_COLS:
                cells.append(f'<c r="{ref}" t="s"><v>{sidx(v)}</v></c>')
            else:
                cells.append(f'<c r="{ref}"><v>{v}</v></c>')
        sheet_rows.append(f'<row r="{ri}">{"".join(cells)}</row>')

    sheet = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
             '<worksheet xmlns="http://schemas.openxmlformats.org/'
             'spreadsheetml/2006/main"><sheetData>'
             + "".join(sheet_rows) + "</sheetData></worksheet>")
    sst = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
           f'<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="{len(shared)}" uniqueCount="{len(shared)}">'
           + "".join(f"<si><t>{escape(s)}</t></si>" for s in shared)
           + "</sst>")

    with zipfile.ZipFile(XLSX, "w", zipfile.ZIP_DEFLATED) as z:
        for name, data in [
                ("[Content_Types].xml", CONTENT_TYPES),
                ("_rels/.rels", ROOT_RELS),
                ("xl/workbook.xml", WORKBOOK),
                ("xl/_rels/workbook.xml.rels", WORKBOOK_RELS),
                ("xl/worksheets/sheet1.xml", sheet),
                ("xl/sharedStrings.xml", sst)]:
            zi = zipfile.ZipInfo(name, date_time=(2024, 1, 31, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            z.writestr(zi, data)
    print(f"wrote {XLSX}: {len(rows)} data rows, {len(shared)} shared strings")
    return 0


if __name__ == "__main__":
    sys.exit(main())
