"""Pure-Python .xlsx (VERDICT r4 Next-round #5): write -> read
round-trip, sheet selection by name/index, shared + inline strings, and
the live S1 loader path — reference parity
tests/test_file_data_loader/test_load_xlsx.py (per-tab loads with
TEST.<TAB> domains)."""

from __future__ import annotations

import zipfile

import pandas as pd
import pytest

from tab2neo_spark.sources.xlsx import read_xlsx, write_xlsx


def _two_sheet_book(path: str) -> dict[str, pd.DataFrame]:
    first = pd.DataFrame(
        {
            "STUDYID": ["s1", "s2", "s3"],
            "AGE": [34, 51, 28],
            "BMI": [22.5, 31.0, 27.25],
            "ACTIVE": [True, False, True],
        }
    )
    second = pd.DataFrame({"SITE": ["a", "b"], "N": [10, 20]})
    write_xlsx(path, {"First": first, "Second": second})
    return {"First": first, "Second": second}


def test_xlsx_round_trip_and_sheet_selection(tmp_path):
    path = str(tmp_path / "test.xlsx")
    sheets = _two_sheet_book(path)
    got = read_xlsx(path)  # default: first sheet
    pd.testing.assert_frame_equal(got, sheets["First"])
    assert got["AGE"].dtype == "int64"  # whole-number col integral
    assert got["BMI"].dtype == "float64"
    assert got["ACTIVE"].tolist() == [True, False, True]
    pd.testing.assert_frame_equal(read_xlsx(path, "Second"), sheets["Second"])
    pd.testing.assert_frame_equal(read_xlsx(path, 1), sheets["Second"])
    with pytest.raises(ValueError, match="no sheet"):
        read_xlsx(path, "Missing")


def test_xlsx_inline_strings_sparse_cells_rich_runs(tmp_path):
    """What third-party writers emit: inlineStr cells, sparse rows
    (missing cells), rich-text shared strings (<r><t> runs), formula
    string results (t=\"str\")."""
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    sheet = f"""<?xml version="1.0"?>
<worksheet xmlns="{ns}"><sheetData>
<row r="1"><c r="A1" t="inlineStr"><is><t>name</t></is></c>
  <c r="B1" t="inlineStr"><is><t>v</t></is></c>
  <c r="C1" t="inlineStr"><is><t>w</t></is></c></row>
<row r="2"><c r="A2" t="s"><v>0</v></c><c r="C2"><v>7</v></c></row>
<row r="3"><c r="A3" t="str"><v>calc</v></c><c r="B3"><v>1.5</v></c></row>
</sheetData></worksheet>"""
    sst = (
        f'<sst xmlns="{ns}"><si><r><t>ri</t></r><r><t>ch</t></r></si></sst>'
    )
    wb = (
        f'<workbook xmlns="{ns}" xmlns:r='
        '"http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    rels = (
        '<Relationships xmlns='
        '"http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/>'
        "</Relationships>"
    )
    path = str(tmp_path / "ext.xlsx")
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        zf.writestr("xl/sharedStrings.xml", sst)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    df = read_xlsx(path)
    assert list(df.columns) == ["name", "v", "w"]
    assert df["name"].tolist() == ["rich", "calc"]  # shared rich-text runs
    assert pd.isna(df["v"][0]) and df["v"][1] == 1.5  # sparse cell -> NaN
    assert pd.isna(df["w"][1]) and df["w"][0] == 7


def test_xlsx_live_loader_path(spark, tmp_path):
    """S1 end-to-end without openpyxl: read_file dispatches .xlsx to the
    pure reader; per-tab load_file gets the reference's TEST.<TAB>
    domain; metadataonly rides the same dispatch."""
    from tab2neo_spark.sources.loaders import load_file, read_file

    path = str(tmp_path / "test.xlsx")
    _two_sheet_book(path)
    sdf = read_file(spark, str(tmp_path), "test.xlsx")
    assert sdf.count() == 3
    assert set(sdf.columns) == {"STUDYID", "AGE", "BMI", "ACTIVE"}
    assert sdf.filter(sdf.STUDYID == "s2").collect()[0]["AGE"] == 51

    tab = load_file(spark, str(tmp_path), "test.xlsx", sheet_name="Second")
    assert tab.count() == 2
    row = tab.collect()[0]
    assert row["_domain_"] == "TEST.SECOND" and row["_filename_"] == "test.xlsx"

    assert read_file(
        spark, str(tmp_path), "test.xlsx", metadataonly=True
    ).count() == 0
