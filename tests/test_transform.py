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

pytestmark = pytest.mark.etl

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
    "Internal Resistance (Ohm),dV/dt (V/s),"
    "Aux_Temperature_1 (C),Aux_Temperature_2 (C)\n"
    "1,08/16/2026 10:00:00.000,100.5,10.5,3,2,0.5,3.65,1.825,1.5,0.0,5.5,0.0,"
    "0.012,0.001,24.5,24.7\n"
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


# representative headers per layout (mirrors reference test_Extractor.py:37-54
# per-layout coverage; ONLY-set columns drive detection, utils.py:137-195)
LAYOUT_HEADERS = {
    "vendor_m": ["Cyc#", "Step", "TestTime(s)", "StepTime(s)", "Capacity(Ah)",
                 "Watt-hr", "Current(A)", "Voltage(V)", "DPt Time", "Temp 1"],
    "vendor_m_t2": ["Rec", "Cycle P", "Cycle C", "Step", "Test Time",
                    "Capacity", "Energy", "Current", "Voltage", "MD", "ES",
                    "DPT Time"],
    "vendor_m_c1": ["Cyc#", "Step", "TestTime(s)", "StepTime(s)",
                    "Capacity(Ah)", "Watt-hr", "ES", "DPt Time", "Volt 1",
                    "ManufacturerAccess (0x00)", "AtRate (0x02)",
                    "Temperature (0x06)", "Voltage (0x08)",
                    "BatteryStatus (0x0A)", "Current (0x0C)",
                    "RemainingCapacity (0x10)", "FullChargeCapacity (0x12)",
                    "AverageCurrent (0x14)", "RelativeStateOfCharge (0x2C)",
                    "ChargingVoltage (0x30)", "ChargingCurrent (0x32)",
                    "DesignCapacity (0x3C)"],
    "vendor_m_stats": ["Cycle", "Date", "AH-IN", "AH-OUT", "WH-IN", "WH-OUT",
                       "T1_Start", "T1_End", "T1_Min", "T1_Max"],
    "vendor_a": ["Data Point", "Date Time", "Test Time (s)", "Step Time (s)",
                 "Cycle Index", "Step Index", "Current (A)", "Voltage (V)",
                 "Internal Resistance (Ohm)", "dV/dt (V/s)", "dQ/dV (Ah/V)",
                 "Charge Capacity (Ah)", "Discharge Capacity (Ah)"],
    "vendor_a_stats": ["Cycle Index", "Date_Time", "Test Time (s)",
                       "Charge Time (s)", "Discharge Time (s)",
                       "Coulombic Efficiency (%)", "V_Max_On_Cycle (V)",
                       "Charge Capacity (Ah)", "Discharge Capacity (Ah)"],
}


def test_detect_source():
    from battetl_spark.transform.normalize import detect_make_type

    for profile, header in LAYOUT_HEADERS.items():
        if profile == "vendor_m_c1":
            # priority semantics (reference utils.py:174-193): the customer1
            # export still carries >=half the CLASSIC only-set, so classic
            # wins first — identical rename/scale profile either way
            assert detect_source(header) == "vendor_m"
            continue
        assert detect_source(header) == profile, profile
    # a register-dominated customer1 variant (too few classic columns) falls
    # through to the customer1 fingerprint, not to unstructured
    c1_minimal = ["Cyc#", "ES", "DPt Time", "Volt 1"] + [
        c for c in LAYOUT_HEADERS["vendor_m_c1"] if "(0x" in c
    ]
    assert detect_source(c1_minimal) == "vendor_m_c1"
    assert detect_source(["foo", "bar"]) == "unstructured"
    # customer1 stats header (superset semantics: classic wins by priority,
    # same rename/scale profile — reference priority order utils.py:174-193)
    assert detect_source(["Cycle", "AH-IN", "AH-OUT", "T1_Start", "T1_End",
                          "T1_Min", "T1_Max", "Date"]) == "vendor_m_stats"
    # (make, data_type) tuple contract
    assert detect_make_type(LAYOUT_HEADERS["vendor_m_t2"]) == ("vendor_m", "test_data")
    assert detect_make_type(LAYOUT_HEADERS["vendor_a_stats"]) == ("vendor_a", "cycle_stats")
    assert detect_make_type(["foo"]) == (None, None)


def test_layout_goldens_normalize(spark):
    """One-row golden per non-classic layout: rename + ×1e3 scaling land on
    canonical names; extras (SMBus registers etc.) fall into other_details."""
    # type2
    df = spark.createDataFrame(
        [("1", "2", "1", "3", "100.0", "1.5", "0.6", "0.5", "3.7", "D", "0",
          "08/16/2026 10:00:00")],
        LAYOUT_HEADERS["vendor_m_t2"],
    )
    row = normalize_cycler_data(df).collect()[0].asDict()
    assert row["data_point"] == 1 and row["cycle"] == 2 and row["half_cycle"] == 1
    assert row["capacity_mah"] == pytest.approx(1500.0)
    assert row["energy_mwh"] == pytest.approx(600.0)
    assert row["current_ma"] == pytest.approx(500.0)
    assert row["voltage_mv"] == pytest.approx(3700.0)
    assert '"MD":"D"' in row["other_details"]
    # customer1 test data: classic canonical cols + registers → JSON
    hdr = LAYOUT_HEADERS["vendor_m_c1"]
    df = spark.createDataFrame(
        [tuple(["0", "1", "10.0", "5.0", "2.0", "0.5", "0", "08/16/2026 10:00:00",
                "3.7"] + ["7"] * (len(hdr) - 9))], hdr)
    row = normalize_cycler_data(df).collect()[0].asDict()
    assert row["capacity_mah"] == pytest.approx(2000.0)
    assert '"ManufacturerAccess (0x00)":"7"' in row["other_details"]
    # maccor stats
    df = spark.createDataFrame(
        [("5", "08/16/2026 10:00:00", "1.2", "1.1", "4.4", "4.0",
          "25.0", "26.0", "24.5", "27.0")],
        LAYOUT_HEADERS["vendor_m_stats"],
    )
    row = normalize_cycler_data(df).collect()[0].asDict()
    assert row["cycle"] == 5
    assert row["charge_capacity_mah"] == pytest.approx(1200.0)
    assert row["discharge_energy_mwh"] == pytest.approx(4000.0)
    assert row["charge_thermocouple_start_c"] == pytest.approx(25.0)
    # arbin stats
    df = spark.createDataFrame(
        [("3", "08/16/2026 10:00:00", "100.0", "3600.0", "3500.0", "99.5",
          "4.2", "1.5", "1.49")],
        LAYOUT_HEADERS["vendor_a_stats"],
    )
    row = normalize_cycler_data(df).collect()[0].asDict()
    assert row["cycle"] == 3
    assert row["reported_charge_time_s"] == pytest.approx(3600.0)
    assert row["reported_coulombic_efficiency"] == pytest.approx(99.5)
    assert row["reported_charge_capacity_mah"] == pytest.approx(1500.0)


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
