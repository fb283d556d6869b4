"""xlsx dimension-table ingest — stdlib-only (zipfile + ElementTree).

The reference ships its POI master as a spreadsheet
(geo-analytics/子区域划分/shanghai.xlsx, 25 786 rows of
point/type/name) and reads it with a spreadsheet library on the
driver. Same shape here: an .xlsx file is a ZIP of SpreadsheetML XML,
and a dimension-sized workbook is a DRIVER-SIDE parse →
``createDataFrame`` — the standard small-dim ingest path (broadcast
budget class), not an executor format. openpyxl is not available in
this environment, and is not needed: the subset of SpreadsheetML a
data table uses (shared strings, inline strings, numbers) is ~60 lines
of stdlib parsing. At 100 TB nothing changes — spreadsheets are
dimension tables by construction; fact data arrives as
parquet/CSV/TSV (sources/tables.py).

Coverage: shared-string cells (t="s"), inline strings (t="inlineStr"
and t="str"), numeric/default cells, gap cells within a row (resolved
by column letters, so sparse rows keep alignment). Not covered (not
used by data tables): formulas' cached styles, dates-as-serials
(surface as their numeric string), merged-cell fills.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
import zipfile

from pyspark.sql import DataFrame, SparkSession

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_COL_RE = re.compile(r"([A-Z]+)\d+$")


def _col_index(ref: str) -> int:
    """'A1' → 0, 'B7' → 1, 'AA3' → 26."""
    m = _COL_RE.match(ref)
    if not m:
        raise ValueError(f"unparseable cell ref {ref!r}")
    acc = 0
    for ch in m.group(1):
        acc = acc * 26 + (ord(ch) - ord("A") + 1)
    return acc - 1


# Driver-side ingest bound: this parser materializes the whole sheet
# in driver memory, which is correct ONLY for dimension tables (the
# reference's biggest workbook is 25 785 rows ≈ 3 MB of XML). 256 MiB
# of uncompressed worksheet XML ≈ low-single-digit millions of rows —
# far past any sane dim, and still far under the driver heap.
MAX_SHEET_XML_BYTES = 256 << 20


def read_xlsx_rows(
    path: str, sheet: str = "sheet1", max_bytes: int = MAX_SHEET_XML_BYTES
) -> tuple[list[str], list[list[str | None]]]:
    """Parse one worksheet into (header, data rows) of strings.

    Header = first row; every data row is padded/aligned to the header
    width by cell reference, missing cells → None.

    Guard: refuses worksheets whose *uncompressed* XML exceeds
    ``max_bytes`` (checked from the ZIP directory before any parse) —
    a workbook that big is fact data mislabeled as a dim; export it to
    CSV/parquet and use the distributed readers in sources/tables.py.
    """
    with zipfile.ZipFile(path) as z:
        member = f"xl/worksheets/{sheet}.xml"
        info = z.getinfo(member)
        if info.file_size > max_bytes:
            raise ValueError(
                f"{path}:{member} is {info.file_size >> 20} MiB uncompressed "
                f"(> {max_bytes >> 20} MiB): too big for the driver-side xlsx "
                "dim ingest — export to CSV/parquet and read it distributed "
                "(sources.read_poi_csv / spark.read.parquet)"
            )
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.iter(f"{_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
        sheet_root = ET.fromstring(z.read(f"xl/worksheets/{sheet}.xml"))
        rows: list[list[str | None]] = []
        width = 0
        for row in sheet_root.iter(f"{_NS}row"):
            cells: dict[int, str | None] = {}
            for c in row.iter(f"{_NS}c"):
                idx = _col_index(c.get("r", ""))
                ctype = c.get("t", "n")
                if ctype == "inlineStr":
                    is_el = c.find(f"{_NS}is")
                    val = (
                        "".join(t.text or "" for t in is_el.iter(f"{_NS}t"))
                        if is_el is not None
                        else None
                    )
                else:
                    v = c.find(f"{_NS}v")
                    val = None if v is None else (v.text or "")
                    if ctype == "s" and val is not None:
                        val = shared[int(val)]
                cells[idx] = val
            width = max(width, max(cells, default=-1) + 1)
            rows.append([cells.get(i) for i in range(max(cells, default=-1) + 1)])
    if not rows:
        return [], []
    header = [h if h is not None else f"_c{i}" for i, h in enumerate(rows[0])]
    data = [r + [None] * (len(header) - len(r)) for r in rows[1:]]
    return header, [r[: len(header)] for r in data]


def read_poi_xlsx(spark: SparkSession, path: str) -> DataFrame:
    """POI master spreadsheet → DataFrame with the header row as
    column names, all columns string-typed (downstream casts are the
    caller's schema contract, as with the CSV POI reader). Mirrors
    the reference's spreadsheet read of 子区域划分/shanghai.xlsx."""
    header, rows = read_xlsx_rows(path)
    schema = ", ".join(f"`{h}` string" for h in header) or "_c0 string"
    return spark.createDataFrame(rows, schema)
