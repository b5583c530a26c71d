"""Golden transform tests (FIXTURES.md F7; reference analog:
tests/test_Transformer.py:23-125 with expected rows tests/conftest.py:183-386).
"""

from __future__ import annotations

from datetime import datetime

import pytest

from battetl_spark.sources import read_cycler_csv, sniff_layout
from battetl_spark.transform import (
    detect_source,
    normalize_cycler_data,
    user_transform_hook,
)

VENDOR_M = (
    "Today''s Date: 08/16/2026\n"
    "Filename: BG_079\n"
    "Cyc#,Step,TestTime(s),StepTime(s),Capacity(Ah),Watt-hr,Current(A),"
    "Voltage(V),DPt Time,Temp 1,Mystery\n"
    '0,1,"1d 15:07:52.77",0:00:10.5,"1,234.5",0.5,0.1,3.7,\t08/16/2026 10:00:00,25.1,abc\n'
    "0,2,140873.0,11.0,2.0,0.6,0.2,3.8,\t08/16/2026 10:00:01,25.2,\n"
)

VENDOR_A = (
    "﻿Data Point,Date Time,Test Time (s),Step Time (s),Cycle Index,"
    "Step Index,Current (A),Voltage (V),Power (W),Charge Capacity (Ah),"
    "Discharge Capacity (Ah),Charge Energy (Wh),Discharge Energy (Wh),"
    "Aux_Temperature_1 (C),Aux_Temperature_2 (C)\n"
    "1,08/16/2026 10:00:00.000,100.5,10.5,3,2,0.5,3.65,1.825,1.5,0.0,5.5,0.0,24.5,24.7\n"
)


@pytest.fixture(scope="module")
def vendor_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("vendor")
    m = d / "m_data.txt"
    m.write_text(VENDOR_M)
    a = d / "a_data.csv"
    a.write_text(VENDOR_A)
    return str(m), str(a)


def test_sniff_layout(vendor_files):
    m, a = vendor_files
    n, sep, header, pre = sniff_layout(m)
    assert n == 2 and sep == "," and header.startswith("Cyc#")
    n, sep, header, _ = sniff_layout(a)
    assert n == 0 and sep == "," and header.lstrip("﻿").startswith("Data Point")


def test_detect_source():
    assert detect_source(["Cyc#", "Step", "TestTime(s)", "StepTime(s)",
                          "Capacity(Ah)", "Watt-hr", "Current(A)", "Voltage(V)",
                          "DPt Time"]) == "vendor_m"
    assert detect_source(["foo", "bar"]) == "unstructured"


def test_vendor_m_golden(spark, vendor_files):
    m, _ = vendor_files
    raw = read_cycler_csv(spark, [m])
    assert raw.count() == 2
    out = normalize_cycler_data(raw).orderBy("step")
    row = out.collect()[0].asDict()
    assert row["cycle"] == 0 and row["step"] == 1
    assert row["test_time_s"] == pytest.approx(140872.77)  # 1d 15:07:52.77
    assert row["step_time_s"] == pytest.approx(10.5)
    assert row["capacity_mah"] == pytest.approx(1_234_500.0)  # comma stripped ×1e3
    assert row["energy_mwh"] == pytest.approx(500.0)
    assert row["current_ma"] == pytest.approx(100.0)
    assert row["voltage_mv"] == pytest.approx(3700.0)
    # leading-tab datetime, America/Los_Angeles (PDT) → UTC
    assert row["recorded_datetime"] == datetime(2026, 8, 16, 17, 0, 0)
    assert row["unixtime_s"] == int(datetime(2026, 8, 16, 17, 0, 0).timestamp())
    assert row["thermocouple_temps_c"] == [25.1]
    assert '"Mystery":"abc"' in row["other_details"]
    # second row: numeric test_time passes straight through
    row2 = out.collect()[1].asDict()
    assert row2["test_time_s"] == pytest.approx(140873.0)
    assert "Mystery" not in (row2["other_details"] or "")  # null stripped


def test_vendor_a_golden(spark, vendor_files):
    _, a = vendor_files
    out = normalize_cycler_data(read_cycler_csv(spark, [a]))
    row = out.collect()[0].asDict()
    assert row["cycle"] == 3 and row["step"] == 2
    assert row["test_time_s"] == pytest.approx(100.5)
    assert row["current_ma"] == pytest.approx(500.0)
    assert row["voltage_mv"] == pytest.approx(3650.0)
    assert row["charge_capacity_mah"] == pytest.approx(1500.0)
    assert row["discharge_energy_mwh"] == pytest.approx(0.0)
    assert row["thermocouple_temps_c"] == [24.5, 24.7]
    assert row["recorded_datetime"] == datetime(2026, 8, 16, 17, 0, 0)


def test_multi_file_union(spark, vendor_files):
    """Mixed vendor layouts in one read (E1: unionByName allowMissingColumns)."""
    m, a = vendor_files
    raw = read_cycler_csv(spark, [m, a])
    assert raw.count() == 3
    assert "Cyc#" in raw.columns and "Cycle Index" in raw.columns


def test_file_meta_unstructured(spark):
    df = spark.createDataFrame(
        [("1", "3.70", "0.5", "77")], ["t", "volts", "amps", "junk"]
    )
    out = normalize_cycler_data(
        df,
        file_meta={
            "test_time_s": {"column_name": "t"},
            "voltage_mv": {"column_name": "volts", "scaling_factor": 1000},
            "current_ma": {"column_name": "amps", "scaling_factor": 1000},
        },
    )
    row = out.collect()[0].asDict()
    assert row["voltage_mv"] == pytest.approx(3700.0)
    assert row["current_ma"] == pytest.approx(500.0)
    assert '"junk":"77"' in row["other_details"]
    with pytest.raises(ValueError, match="required"):
        normalize_cycler_data(df, file_meta={"test_time_s": {"column_name": "t"}})
    with pytest.raises(ValueError, match="file_meta"):
        normalize_cycler_data(df.drop("t"))


def test_user_transform_hook(spark):
    df = spark.range(5).selectExpr("id", "id * 2 as v")

    def double_v(pdf):
        pdf["v"] = pdf["v"] * 10
        return pdf

    out = user_transform_hook(df, double_v)
    assert [r.v for r in out.orderBy("id").collect()] == [0, 20, 40, 60, 80]
