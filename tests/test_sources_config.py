"""Driver-side config/header sources (S3/S14/S15 analogs) — no Spark needed."""

from __future__ import annotations

from battetl_spark.sources.config import load_config, load_env, read_report_header

import pytest

pytestmark = pytest.mark.etl


def test_load_config_json_then_yaml(tmp_path):
    j = tmp_path / "c.json"
    j.write_text('{"a": 1}')
    assert load_config(str(j)) == {"a": 1}
    y = tmp_path / "c.yaml"
    y.write_text("a: 1\nb:\n  c: 2\n")
    assert load_config(str(y)) == {"a": 1, "b": {"c": 2}}


def test_load_env(tmp_path, monkeypatch):
    e = tmp_path / ".env"
    e.write_text("# comment\nDB_USER=alice\nDB_PASS='s3cret'\n")
    monkeypatch.delenv("DB_USER", raising=False)
    out = load_env(str(e))
    assert out == {"DB_USER": "alice", "DB_PASS": "s3cret"}
    assert load_env(str(tmp_path / "missing")) == {}


def test_read_report_header(tmp_path):
    f = tmp_path / "info.csv"
    f.write_text(
        "TEST REPORT\n"
        "Test Name:,TST-1,Channel:,7\n"
        "Schedule:,sched.sdx\n"
    )
    meta = read_report_header(str(f))
    assert meta["Test Name"] == "TST-1"
    assert meta["Channel"] == "7"
    assert meta["Schedule"] == "sched.sdx"
    data = tmp_path / "data.csv"
    data.write_text("a,b,c\n1,2,3\n")
    assert read_report_header(str(data)) is None


def _write_minimal_xlsx(path):
    """Hand-built SpreadsheetML zip (shared + inline + numeric cells)."""
    import zipfile

    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    shared = (
        f'<?xml version="1.0"?><sst {ns} count="3" uniqueCount="3">'
        "<si><t>cycle</t></si><si><t>voltage</t></si><si><t>note one</t></si></sst>"
    )
    sheet = (
        f'<?xml version="1.0"?><worksheet {ns}><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c>'
        '<c r="C1" t="inlineStr"><is><t>note</t></is></c></row>'
        '<row r="2"><c r="A2"><v>1</v></c><c r="B2"><v>3.7</v></c>'
        '<c r="C2" t="s"><v>2</v></c></row>'
        '<row r="3"><c r="A3"><v>2</v></c><c r="B3"><v>3.8</v></c></row>'
        "</sheetData></worksheet>"
    )
    content_types = (
        '<?xml version="1.0"?><Types '
        'xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="xml" ContentType="application/xml"/></Types>'
    )
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("xl/sharedStrings.xml", shared)
        z.writestr("xl/worksheets/sheet1.xml", sheet)


def test_read_xlsx_unstructured(spark, tmp_path):
    """S4: a real XLSX path — stdlib SpreadsheetML reader, no codec dep
    (reference Extractor.py:168-186)."""
    from battetl_spark.sources.config import read_unstructured, read_xlsx_grid

    p = tmp_path / "lab.xlsx"
    _write_minimal_xlsx(str(p))
    grid = read_xlsx_grid(str(p))
    assert grid[0] == ["cycle", "voltage", "note"]
    assert grid[1] == ["1", "3.7", "note one"]
    df = read_unstructured(spark, str(p))
    rows = df.orderBy("cycle").collect()
    assert df.columns == ["cycle", "voltage", "note"]
    assert len(rows) == 2
    assert rows[0].voltage == "3.7" and rows[0].note == "note one"
    assert rows[1].note == ""  # ragged row padded


def test_aux_file_dispatch(tmp_path):
    """S8/S10: per-extension aux scans — .mwf raw, .to/.fm INI, .bth latin-1
    INI, .can XML (reference Extractor.py:297-315, 482-585)."""
    from battetl_spark.sources.schedule import (
        aux_from_files,
        schedule_bundle_from_files,
    )

    (tmp_path / "wave.mwf").write_text("RAW WAVEFORM\n1,2,3\n", encoding="latin-1")
    (tmp_path / "obj.to").write_text("[Object]\nname=cell-1\n")
    (tmp_path / "form.fm").write_text("[Formula]\nexpr=v*2\n")
    (tmp_path / "map.bth").write_bytes("[Mapping]\nlabel=\xe9tiquette\n".encode("latin-1"))
    (tmp_path / "bms.can").write_text("<can><signal><name>soc</name></signal></can>")
    (tmp_path / "sched.ini").write_text(
        "[Step1]\nm_szSteptype=Charge\n[Step2]\nm_szSteptype=Rest\n"
    )
    paths = [str(p) for p in sorted(tmp_path.iterdir())]
    aux = aux_from_files(paths)
    assert aux["wave.mwf"].startswith("RAW WAVEFORM")
    assert aux["obj.to"]["Object"]["name"] == "cell-1"
    assert aux["form.fm"]["Formula"]["expr"] == "v*2"
    assert aux["map.bth"]["Mapping"]["label"] == "\xe9tiquette"
    assert aux["bms.can"]["can"]["signal"]["name"] == "soc"
    sched, steps, aux2 = schedule_bundle_from_files(paths)
    assert steps["chg"] == [1] and steps["rst"] == [2]
    assert set(aux2) == {"wave.mwf", "obj.to", "form.fm", "map.bth", "bms.can"}


def test_binary_datasheet_dim_column(spark, tmp_path):
    """Dim table with an opaque binary column (reference Loader.py:908-917
    loads a PDF into cell_meta): bytes survive the lakehouse round-trip and
    a copy-on-write overwrite."""
    import pyspark.sql.types as T
    from pyspark.sql import functions as F

    from battetl_spark.lake import LakeTable
    from battetl_spark.sources.config import attach_datasheet

    pdf_path = tmp_path / "cell.pdf"
    payload = b"%PDF-1.4\x00\x01binary\xffbytes"
    pdf_path.write_bytes(payload)
    meta = attach_datasheet({"cell_type": "XYZ-21700", "datasheet": str(pdf_path)})
    assert meta["datasheet"] == payload

    schema = T.StructType([
        T.StructField("cell_type", T.StringType(), False),
        T.StructField("datasheet", T.BinaryType(), True),
    ])
    t = LakeTable.create(spark, str(tmp_path / "dim"), schema,
                         num_buckets=4, bucket_key="cell_type",
                         key_cols=["cell_type"])
    t.append(spark.createDataFrame([(meta["cell_type"], meta["datasheet"])], schema))
    got = t.scan().collect()[0]
    assert bytes(got.datasheet) == payload
    # missing file fails loudly, nothing stored
    import pytest as _pt
    with _pt.raises(FileNotFoundError):
        attach_datasheet({"cell_type": "A", "datasheet": str(tmp_path / "nope.pdf")})


def test_read_xls_biff8_roundtrip(spark, tmp_path):
    """From-scratch OLE2+BIFF8 .xls reader (round-5; reference
    Extractor.py:127-187 pd.read_excel path) — every cell-record family
    round-trips exactly through the test writer, including an SST split
    across a CONTINUE record that switches character width mid-string."""
    from battetl_spark.sources.xls import read_xls_grid
    from tests import xls_writer as W

    long_s = "latin-part-" + "é" * 4 + "αβγδ"  # tail goes wide (utf-16)
    strings = ["Cycle", "Current (A)", long_s]
    sst = W.sst_records(strings, split=(2, 11))  # split inside string 2

    sheet1 = W.sheet_stream(
        W.labelsst(0, 0, 0)            # "Cycle"
        + W.labelsst(0, 1, 1)          # "Current (A)"
        + W.labelsst(0, 2, 2)          # the split string
        + W.number(1, 0, 1.0)
        + W.number(1, 1, -0.51)
        + W.rk_int(1, 2, 42)
        + W.rk_int(2, 0, 12345, div100=True)   # 123.45
        + W.rk_float(2, 1, 1.5)
        + W.mulrk(3, 0, [7, 8, 9])
        + W.boolerr(4, 0, True)
        + W.formula_num(4, 1, 2.75)
        + W.label(4, 2, "inline")
    )
    sheet2 = W.sheet_stream(W.number(0, 0, 99.0))
    wb = W.workbook_stream([sheet1, sheet2], sst=sst)
    path = str(tmp_path / "t.xls")
    W.write_ole_xls(path, wb)

    grid = read_xls_grid(path, sheet=1)
    assert grid[0] == ["Cycle", "Current (A)", long_s]
    assert grid[1] == ["1", "-0.51", "42"]
    assert grid[2] == ["123.45", "1.5"]
    assert grid[3] == ["7", "8", "9"]
    assert grid[4] == ["TRUE", "2.75", "inline"]
    assert read_xls_grid(path, sheet=2) == [["99"]]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        read_xls_grid(path, sheet=3)


def test_read_unstructured_xls_dispatch(spark, tmp_path):
    """read_unstructured routes .xls through the BIFF8 reader with the same
    header/skiprows semantics as the xlsx path."""
    from battetl_spark.sources.config import read_unstructured
    from tests import xls_writer as W

    sheet = W.sheet_stream(
        W.label(0, 0, "junk preamble")
        + W.label(1, 0, "a") + W.label(1, 1, "b")
        + W.number(2, 0, 1.0) + W.number(2, 1, 2.0)
        + W.number(3, 0, 3.0) + W.number(3, 1, 4.0)
    )
    path = str(tmp_path / "u.xls")
    W.write_ole_xls(path, W.workbook_stream([sheet]))
    df = read_unstructured(spark, path, {"skiprows": 1, "header": 0})
    assert df.columns == ["a", "b"]
    rows = sorted((r["a"], r["b"]) for r in df.collect())
    assert rows == [("1", "2"), ("3", "4")]
