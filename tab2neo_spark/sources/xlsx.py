"""Pure-Python .xlsx reader/writer — no openpyxl in the container, and
the format is public (ECMA-376: a zip of SpreadsheetML XML parts), so the
S1 loader's last format reads live instead of hiding behind an
import-gate (VERDICT r4, Next round #5; reference parity target
``data_loaders/file_data_loader.py:83-88`` +
``tests/test_file_data_loader/test_load_xlsx.py`` — pandas/openpyxl
semantics: first row = header, sheet selectable by name or index,
whole-number columns come back integral).

Scope (same spirit as sources/rdata.py): the parts real workbooks carry —
shared strings (plain and rich-text runs), inline strings, numbers,
booleans, formula string results, sparse rows/cells. Out of scope: date
STYLING (a date cell is stored as a serial number + style; without the
styles part it surfaces as that number — documented limitation), and the
legacy binary .xls (BIFF) container.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

import pandas as pd

_NS_MAIN = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_NS_REL = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_NS_PKG_REL = "http://schemas.openxmlformats.org/package/2006/relationships"


def _col_index(ref: str) -> int:
    """'A'->0, 'Z'->25, 'AA'->26 (cell ref like 'BC23' accepted)."""
    n = 0
    for ch in ref:
        if not ch.isalpha():
            break
        n = n * 26 + (ord(ch.upper()) - ord("A") + 1)
    return n - 1


def _col_letter(i: int) -> str:
    s = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        s = chr(ord("A") + r) + s
    return s


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ET.fromstring(data)
    out = []
    for si in root.findall(f"{{{_NS_MAIN}}}si"):
        # plain <t> or rich-text <r><t> runs — concatenate all text
        out.append("".join(t.text or "" for t in si.iter(f"{{{_NS_MAIN}}}t")))
    return out


def _sheet_targets(zf: zipfile.ZipFile) -> list[tuple[str, str]]:
    """[(sheet name, zip member path)] in workbook order."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    target_by_id = {
        r.get("Id"): r.get("Target")
        for r in rels.findall(f"{{{_NS_PKG_REL}}}Relationship")
    }
    out = []
    for sh in wb.iter(f"{{{_NS_MAIN}}}sheet"):
        target = target_by_id[sh.get(f"{{{_NS_REL}}}id")]
        member = target.lstrip("/")
        if not member.startswith("xl/"):
            member = "xl/" + member
        out.append((sh.get("name"), member))
    return out


def _cell_value(c, strings: list[str]):
    t = c.get("t", "n")
    v = c.find(f"{{{_NS_MAIN}}}v")
    if t == "inlineStr":
        is_el = c.find(f"{{{_NS_MAIN}}}is")
        return "".join(
            el.text or "" for el in is_el.iter(f"{{{_NS_MAIN}}}t")
        ) if is_el is not None else None
    if v is None or v.text is None:
        return None
    if t == "s":
        return strings[int(v.text)]
    if t == "str":
        return v.text
    if t == "b":
        return v.text in ("1", "true")
    if t == "e":  # error cell (#DIV/0! etc.)
        return None
    return float(v.text)


def read_xlsx(path: str, sheet_name: str | int = 0) -> pd.DataFrame:
    """First row = header, remaining rows = data (pd.read_excel default
    semantics); ``sheet_name`` by name or 0-based index. Whole-number
    columns with no gaps come back int64, mixed/fractional stay float —
    matching what pandas+openpyxl yields for the same workbook."""
    with zipfile.ZipFile(path) as zf:
        sheets = _sheet_targets(zf)
        if isinstance(sheet_name, int):
            name, member = sheets[sheet_name]
        else:
            match = [s for s in sheets if s[0] == sheet_name]
            if not match:
                raise ValueError(
                    f"no sheet {sheet_name!r}; workbook has "
                    f"{[s[0] for s in sheets]}"
                )
            name, member = match[0]
        strings = _shared_strings(zf)
        root = ET.fromstring(zf.read(member))

    rows: list[dict[int, object]] = []
    prev_r: int | None = None
    for row in root.iter(f"{{{_NS_MAIN}}}row"):
        # honor the row's 1-based ``r`` index (r5 ADVICE): writers may
        # OMIT blank-row elements, and ignoring the indices shifted all
        # later rows up relative to pandas/openpyxl. Interior gaps become
        # empty dicts (-> all-NaN data rows); rows BEFORE the first
        # element stay skipped (used-range semantics — the first present
        # row is the header, as pandas does).
        r_attr = row.get("r")
        r_idx = (
            int(r_attr)
            if r_attr and r_attr.isdigit()
            else (prev_r + 1 if prev_r is not None else 1)
        )
        if prev_r is not None:
            rows.extend({} for _ in range(max(0, r_idx - prev_r - 1)))
        prev_r = r_idx
        cells: dict[int, object] = {}
        auto = 0
        for c in row.iter(f"{{{_NS_MAIN}}}c"):
            ref = c.get("r")
            idx = _col_index(ref) if ref else auto
            auto = idx + 1
            cells[idx] = _cell_value(c, strings)
        rows.append(cells)
    if not rows:
        return pd.DataFrame()

    header = rows[0]
    # width = widest ROW, not just the header (data cells beyond the
    # header's extent must not be dropped)
    ncols = max((max(r) + 1 for r in rows if r), default=0)
    cols = [
        str(header.get(i)) if header.get(i) is not None else f"Unnamed: {i}"
        for i in range(ncols)
    ]
    # duplicate header names dedup pandas-style ('id', 'id.1', ...) — a
    # name-keyed dict would silently overwrite one column with another
    seen: dict[str, int] = {}
    for i, c in enumerate(cols):
        if c in seen:
            seen[c] += 1
            cols[i] = f"{c}.{seen[c]}"
        else:
            seen[c] = 0
    data = {
        cols[i]: [r.get(i) for r in rows[1:]] for i in range(ncols)
    }
    df = pd.DataFrame(data, columns=cols)
    for c in df.columns:
        col = df[c]
        if col.dtype == object:
            non_null = col.dropna()
            if len(non_null) and all(isinstance(x, float) for x in non_null):
                df[c] = col.astype(float)
                col = df[c]
        if (
            col.dtype == float
            and col.notna().all()
            and (col % 1 == 0).all()
            # int64-range guard: a whole-number float >= 2^63 would wrap
            # on astype; the margin absorbs float rounding at the boundary
            and (col.abs() < float(2**63) * (1 - 2**-52)).all()
        ):
            df[c] = col.astype("int64")
    return df


# -- writer (for live tests and as a general sink) ----------------------------

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
{sheet_overrides}
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""


def write_xlsx(path: str, sheets: dict[str, pd.DataFrame]) -> None:
    """Minimal conformant workbook: shared-strings table for strings
    (exercising the reader's ``t="s"`` path), plain numerics, booleans;
    NaN/None cells are omitted (how Excel stores blanks)."""
    strings: list[str] = []
    sindex: dict[str, int] = {}

    def sid(s: str) -> int:
        if s not in sindex:
            sindex[s] = len(strings)
            strings.append(s)
        return sindex[s]

    def cell_xml(ref: str, v) -> str:
        # numpy scalars (what iterrows yields from HOMOGENEOUS-dtype
        # frames: np.int64/np.float64/np.bool_) are not instances of the
        # Python scalar types — unbox first or every all-int column would
        # silently round-trip as text
        if hasattr(v, "item") and not isinstance(v, (str, bytes)):
            try:
                v = v.item()
            except (ValueError, AttributeError):
                pass
        if v is None or (isinstance(v, float) and v != v):
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v!r}</v></c>'
        return f'<c r="{ref}" t="s"><v>{sid(str(v))}</v></c>'

    sheet_parts: list[str] = []
    for df in sheets.values():
        rows_xml = []
        header = "".join(
            cell_xml(f"{_col_letter(j)}1", str(c)) for j, c in enumerate(df.columns)
        )
        rows_xml.append(f'<row r="1">{header}</row>')
        for i, (_, row) in enumerate(df.iterrows(), start=2):
            cells = "".join(
                cell_xml(f"{_col_letter(j)}{i}", row[c])
                for j, c in enumerate(df.columns)
            )
            rows_xml.append(f'<row r="{i}">{cells}</row>')
        sheet_parts.append(
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<worksheet xmlns="{_NS_MAIN}"><sheetData>'
            + "".join(rows_xml)
            + "</sheetData></worksheet>"
        )

    names = list(sheets)
    wb_sheets = "".join(
        f'<sheet name="{escape(n, {chr(34): "&quot;"})}" sheetId="{i + 1}" '
        f'r:id="rId{i + 1}"/>'
        for i, n in enumerate(names)
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_NS_MAIN}" xmlns:r="{_NS_REL}">'
        f"<sheets>{wb_sheets}</sheets></workbook>"
    )
    ws_type = f"{_NS_REL}/worksheet"
    sst_type = f"{_NS_REL}/sharedStrings"
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_NS_PKG_REL}">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" Type="{ws_type}" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(names))
        )
        + f'<Relationship Id="rId{len(names) + 1}" Type="{sst_type}" '
        'Target="sharedStrings.xml"/>'
        "</Relationships>"
    )
    sst = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<sst xmlns="{_NS_MAIN}" count="{len(strings)}" '
        f'uniqueCount="{len(strings)}">'
        + "".join(f"<si><t>{escape(s)}</t></si>" for s in strings)
        + "</sst>"
    )
    overrides = "".join(
        f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
        'worksheet+xml"/>'
        for i in range(len(names))
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(
            "[Content_Types].xml",
            _CONTENT_TYPES.format(sheet_overrides=overrides),
        )
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/sharedStrings.xml", sst)
        for i, part in enumerate(sheet_parts):
            zf.writestr(f"xl/worksheets/sheet{i + 1}.xml", part)
