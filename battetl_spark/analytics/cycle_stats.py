"""Per-cycle statistics as pure window/aggregate algebra (SURVEY.md §2.5).

The reference computes these by looping Python-side over
``test_data['cycle'].unique()`` (Transformer.py:413-485) with row-wise
``shift``/``apply`` helpers (Transformer.py:614-724). Here each A-operator is
one Catalyst construct — a single pass, two shuffles total (one per
grouping key change), no driver loop:

- A1  per-cycle grouping              → groupBy('cycle')
- A2  charge cap/energy/time totals   → max_by over step aggregates
- A3  cumulative capacity with cycler-reset repair
      → lag + gated running sum over a per-(cycle,step) frame
- A4  elapsed time continuing across steps → running sum of step durations
- A5  CC/CV split                     → lag deltas + when() + conditional sums
- A6  50%/80% charge-time             → min(when(cum >= frac·total, elapsed))
- A7  max charge/discharge temperature → max(when(step∈set, tc))
- A8  coulombic efficiency            → column expr on the aggregate
- A9  discharge totals                → mirrors A2

Reset-repair recurrence (reference Transformer.py:679-693): when a charge
step's first reported capacity is below the previous step's last, the cycler
reset its accumulator; the repaired cumulative adds the previous step's
cumulative last. offset_k = offset_{k-1} + (reset_k ? last_raw_{k-1} : 0)
— a running sum of lag(last_raw) gated by the reset flag, i.e. a plain
window sum (no recursion materializes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _step_frame(rows: DataFrame, cap_col: str, step_list: list[int]) -> DataFrame:
    """Per-(cycle, step) aggregates over rows of the given step class, with
    reset-repaired cumulative capacity and cross-step elapsed time."""
    agg = (
        rows.filter(F.col("step").isin(step_list))
        .groupBy("cycle", "step")
        .agg(
            F.min("test_time_s").alias("t0"),
            F.max("test_time_s").alias("t1"),
            F.min_by(F.col(cap_col), "test_time_s").alias("first_cap"),
            F.max_by(F.col(cap_col), "test_time_s").alias("last_cap"),
        )
    )
    w = (
        Window.partitionBy("cycle")
        .orderBy("t0")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lag_last = F.lag("last_cap").over(Window.partitionBy("cycle").orderBy("t0"))
    reset = F.col("first_cap") < lag_last
    return (
        agg.withColumn(
            "cap_offset",
            F.sum(F.when(reset, lag_last).otherwise(F.lit(0.0))).over(w),
        )
        .withColumn("cum_last", F.col("last_cap") + F.col("cap_offset"))
        .withColumn("duration", F.col("t1") - F.col("t0"))
        .withColumn(
            "elapsed_before",
            F.coalesce(
                F.sum("duration").over(w) - F.col("duration"), F.lit(0.0)
            ),
        )
    )


def calc_cycle_stats(
    test_data: DataFrame,
    chg_steps: list[int],
    dsg_steps: list[int],
    cv_voltage_threshold_mv: float | None = None,
    thermocouple: int | None = None,
) -> DataFrame:
    """Canonical test_data → one row per cycle of calculated_* stats
    (reference output columns constants.py:45-71 'calculated_*' family)."""
    d = test_data
    # P14 harmonization: capacity/energy attributed by step class
    # (reference Transformer.py:356-411)
    has = set(d.columns)
    cap = "capacity_mah" if "capacity_mah" in has else None
    chg_cap = "charge_capacity_mah" if "charge_capacity_mah" in has else cap
    dsg_cap = "discharge_capacity_mah" if "discharge_capacity_mah" in has else cap
    chg_en = "charge_energy_mwh" if "charge_energy_mwh" in has else (
        "energy_mwh" if "energy_mwh" in has else None
    )
    dsg_en = "discharge_energy_mwh" if "discharge_energy_mwh" in has else (
        "energy_mwh" if "energy_mwh" in has else None
    )

    chg_steps_f = _step_frame(d, chg_cap, chg_steps)
    dsg_steps_f = _step_frame(d, dsg_cap, dsg_steps)

    def totals(step_f: DataFrame, prefix: str) -> DataFrame:
        return step_f.groupBy("cycle").agg(
            F.max_by("cum_last", "t0").alias(f"calculated_{prefix}_capacity_mah"),
            F.sum("duration").alias(f"calculated_{prefix}_time_s"),
        )

    chg_tot = totals(chg_steps_f, "charge")
    dsg_tot = totals(dsg_steps_f, "discharge")

    # energy totals via the same step-frame trick
    out = chg_tot.join(dsg_tot, "cycle", "full")
    if chg_en:
        en = _step_frame(d, chg_en, chg_steps).groupBy("cycle").agg(
            F.max_by("cum_last", "t0").alias("calculated_charge_energy_mwh")
        )
        out = out.join(en, "cycle", "full")
    if dsg_en:
        en = _step_frame(d, dsg_en, dsg_steps).groupBy("cycle").agg(
            F.max_by("cum_last", "t0").alias("calculated_discharge_energy_mwh")
        )
        out = out.join(en, "cycle", "full")

    # A5: CC/CV split — row deltas via lag over (cycle, step) time order
    if cv_voltage_threshold_mv is not None:
        wrow = Window.partitionBy("cycle", "step").orderBy("test_time_s")
        deltas = (
            d.filter(F.col("step").isin(chg_steps))
            .withColumn("dt", F.col("test_time_s") - F.lag("test_time_s").over(wrow))
            .withColumn(
                "dcap", F.col(chg_cap) - F.lag(chg_cap).over(wrow)
            )
            .withColumn(
                "is_cc", F.col("voltage_mv") < F.lit(cv_voltage_threshold_mv)
            )
        )
        cccv = deltas.groupBy("cycle").agg(
            F.sum(F.when(F.col("is_cc"), F.col("dt"))).alias("calculated_cc_charge_time_s"),
            F.sum(F.when(~F.col("is_cc"), F.col("dt"))).alias("calculated_cv_charge_time_s"),
            F.sum(F.when(F.col("is_cc"), F.col("dcap"))).alias("calculated_cc_capacity_mah"),
            F.sum(F.when(~F.col("is_cc"), F.col("dcap"))).alias("calculated_cv_capacity_mah"),
        )
        out = out.join(cccv, "cycle", "full")

    # A6: 50% / 80% charge-time — row-level repaired cumulative + elapsed
    rows = (
        d.filter(F.col("step").isin(chg_steps))
        .join(
            chg_steps_f.select("cycle", "step", "cap_offset", "t0", "elapsed_before"),
            ["cycle", "step"],
        )
        .withColumn("row_cum", F.col(chg_cap) + F.col("cap_offset"))
        .withColumn(
            "row_elapsed",
            F.col("elapsed_before") + (F.col("test_time_s") - F.col("t0")),
        )
    )
    total = chg_tot.select(
        "cycle", F.col("calculated_charge_capacity_mah").alias("__total")
    )
    frac = (
        rows.join(total, "cycle")
        .groupBy("cycle")
        .agg(
            F.min(
                F.when(F.col("row_cum") >= 0.5 * F.col("__total"), F.col("row_elapsed"))
            ).alias("calculated_fifty_percent_charge_time_s"),
            F.min(
                F.when(F.col("row_cum") >= 0.8 * F.col("__total"), F.col("row_elapsed"))
            ).alias("calculated_eighty_percent_charge_time_s"),
        )
    )
    out = out.join(frac, "cycle", "full")

    # A7: max temperature over chg/dsg rows for the configured thermocouple
    if thermocouple is not None and "thermocouple_temps_c" in has:
        tc = F.element_at("thermocouple_temps_c", thermocouple)
        temps = d.groupBy("cycle").agg(
            F.max(F.when(F.col("step").isin(chg_steps), tc)).alias(
                "calculated_max_charge_temp_c"
            ),
            F.max(F.when(F.col("step").isin(dsg_steps), tc)).alias(
                "calculated_max_discharge_temp_c"
            ),
        )
        out = out.join(temps, "cycle", "full")

    # A8: coulombic efficiency (NaN/NULL-safe like Transformer.py:463-473)
    out = out.withColumn(
        "calculated_coulombic_efficiency",
        F.when(
            F.col("calculated_charge_capacity_mah") > 0,
            F.col("calculated_discharge_capacity_mah")
            / F.col("calculated_charge_capacity_mah"),
        ),
    )
    # O2 stable cycle ordering is applied by presentation-layer callers
    # (etl facade / tests); the operator itself stays sort-free so the
    # incremental-maintenance path never pays a global shuffle-sort
    return out
