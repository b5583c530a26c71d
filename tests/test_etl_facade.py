"""End-to-end BattEtl facade + schedule sources (reference analog:
tests/test_BattETL.py:48-132 full pipeline)."""

from __future__ import annotations

import pytest

from battetl_spark.etl import BattEtl, validate_config
from battetl_spark.lake import LakeTable
from battetl_spark.sources.schedule import (
    ScheduleError,
    classify_steps,
    procedure_from_xml,
    schedule_from_files,
    schedule_from_ini,
)
from tests.test_transform import VENDOR_A

pytestmark = pytest.mark.etl

PROC_XML = """<?xml version="1.0"?>
<MaccorTestProcedure>
  <Step><StepNum>1</StepNum><StepType>Charge CC-CV</StepType></Step>
  <Step><StepNum>2</StepNum><StepType>Rest</StepType></Step>
  <Step><StepNum>3</StepNum><StepType>Discharge</StepType></Step>
</MaccorTestProcedure>
"""

SCHED_INI = """[Step1]
m_szStepType = CC-CV
[Step2]
m_szStepType = Rest
[Step3]
m_szStepType = Discharge
"""


@pytest.fixture()
def files(tmp_path):
    a = tmp_path / "a.csv"
    a.write_text(VENDOR_A)
    xml = tmp_path / "proc.000"
    xml.write_text(PROC_XML)
    ini = tmp_path / "sched.sdx"
    ini.write_text(SCHED_INI)
    return tmp_path, str(a), str(xml), str(ini)


def test_schedule_xml_and_ini(files):
    _, _, xml, ini = files
    proc = procedure_from_xml(xml)
    assert "MaccorTestProcedure" in proc
    _, steps = schedule_from_files([xml])
    assert steps == {"chg": [1], "dsg": [3], "rst": [2]}
    sched = schedule_from_ini(ini)
    assert sched["Step1"]["m_szsteptype"] == "CC-CV"
    _, steps2 = schedule_from_files([ini])
    assert steps2 == {"chg": [1], "dsg": [3], "rst": [2]}
    with pytest.raises(ScheduleError):
        schedule_from_files([xml, ini])


def test_classify_steps_priority():
    # 'discharge' contains 'charge' — dsg must win (reference dispatch order)
    assert classify_steps({1: "Discharge"})["dsg"] == [1]
    assert classify_steps({1: "Discharge"})["chg"] == []


def test_etl_end_to_end(spark, files):
    tmp, a, xml, _ = files
    etl = BattEtl(
        spark,
        {
            "data_file_path": [a],
            "schedule_file_path": [xml],
            "table_path": str(tmp / "table"),
            "cv_voltage_threshold_mv": 3600.0,
            "thermocouple": 1,
        },
    )
    etl.extract().transform().load()
    t = LakeTable.load(spark, str(tmp / "table"))
    out = t.scan().collect()
    assert len(out) == 1
    assert out[0]["voltage_mv"] == pytest.approx(3650.0)
    assert etl.cycle_stats is not None


def test_validate_config():
    with pytest.raises(ValueError, match="required"):
        validate_config({})
    with pytest.raises(ValueError, match="list"):
        validate_config({"data_file_path": "x.csv"})
