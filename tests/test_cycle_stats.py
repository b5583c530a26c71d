"""Window-algebra cycle stats vs hand-computed truth (reference analog:
tolerance tests tests/test_Transformer.py:207-458, reset repair 331-384,
CC/CV truth tables 302-325)."""

from __future__ import annotations

import pytest

from battetl_spark.analytics import calc_cycle_stats, conversation_stats
from battetl_spark import fixtures as FX

pytestmark = pytest.mark.etl

COLS = [
    "cycle", "step", "test_time_s", "voltage_mv",
    "charge_capacity_mah", "discharge_capacity_mah",
    "charge_energy_mwh", "discharge_energy_mwh", "thermocouple_temps_c",
]

#            cyc step    t     mV    chgCap dsgCap chgE  dsgE   temps
ROWS = [
    (1, 1,  0.0, 3000.0,   0.0, None,    0.0, None, [25.0]),
    (1, 1, 10.0, 3400.0, 100.0, None, 1000.0, None, [26.0]),
    (1, 1, 20.0, 3600.0, 200.0, None, 2000.0, None, [27.0]),
    # step 2 starts below step 1's last capacity → cycler reset → repair
    (1, 2, 30.0, 3700.0,   0.0, None,    0.0, None, [28.0]),
    (1, 2, 40.0, 3800.0,  50.0, None,  500.0, None, [29.0]),
    (1, 3, 50.0, 3300.0, None,   0.0, None,    0.0, [30.0]),
    (1, 3, 60.0, 3000.0, None, 120.0, None, 1200.0, [31.0]),
]


@pytest.fixture(scope="module")
def stats(spark):
    df = spark.createDataFrame(ROWS, COLS)
    out = calc_cycle_stats(
        df, chg_steps=[1, 2], dsg_steps=[3],
        cv_voltage_threshold_mv=3650.0, thermocouple=1,
    )
    return out.collect()[0].asDict()


def test_reset_repaired_charge_capacity(stats):
    # 200 (step1) + 50 (step2, offset 200 applied) = 250
    assert stats["calculated_charge_capacity_mah"] == pytest.approx(250.0)
    assert stats["calculated_charge_energy_mwh"] == pytest.approx(2500.0)


def test_charge_discharge_time(stats):
    assert stats["calculated_charge_time_s"] == pytest.approx(30.0)
    assert stats["calculated_discharge_time_s"] == pytest.approx(10.0)


def test_cc_cv_split(stats):
    assert stats["calculated_cc_charge_time_s"] == pytest.approx(20.0)
    assert stats["calculated_cv_charge_time_s"] == pytest.approx(10.0)
    assert stats["calculated_cc_capacity_mah"] == pytest.approx(200.0)
    assert stats["calculated_cv_capacity_mah"] == pytest.approx(50.0)


def test_fractional_charge_times(stats):
    assert stats["calculated_fifty_percent_charge_time_s"] == pytest.approx(20.0)
    assert stats["calculated_eighty_percent_charge_time_s"] == pytest.approx(20.0)


def test_discharge_and_efficiency(stats):
    assert stats["calculated_discharge_capacity_mah"] == pytest.approx(120.0)
    assert stats["calculated_discharge_energy_mwh"] == pytest.approx(1200.0)
    assert stats["calculated_coulombic_efficiency"] == pytest.approx(120.0 / 250.0)


def test_max_temps(stats):
    assert stats["calculated_max_charge_temp_c"] == pytest.approx(29.0)
    assert stats["calculated_max_discharge_temp_c"] == pytest.approx(31.0)


def test_conversation_stats_exact(spark):
    pdf = FX.make_transcripts(seed=9, n_convs=5, max_turns=6)
    got = conversation_stats(FX.transcripts_df(spark, pdf)).toPandas()
    grp = pdf.groupby("conv_id")
    for _, row in got.iterrows():
        g = grp.get_group(row.conv_id)
        assert row.n_turns == len(g)
        assert row.max_turn_idx == g.turn_idx.max()
        assert row.n_user == (g.role == "user").sum()
        assert row.last_text == g.sort_values("turn_idx").text.iloc[-1]
        assert row.n_tool_calls == g.tool.notna().sum()
