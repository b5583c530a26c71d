"""Property-based merge-replay equivalence (hypothesis).

The seeded fixture replays cover realistic skew/dup/shuffle mixes; this
suite lets hypothesis hunt adversarial op SEQUENCES — delete-resurrect
chains, keys that only ever see deletes, empty middle batches, batch
splits landing on every boundary — and shrink any failure to a minimal
counterexample. Invariant: for ANY op sequence with unique LSNs and ANY
split into ordered microbatches, the engine's final table state equals
the single-threaded pandas oracle replay.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from battetl_spark import fixtures as FX
from battetl_spark.cdc import merge_apply
from battetl_spark.lake import LakeTable
from battetl_spark.schemas import KEY_COLS, TRANSCRIPT_TABLE_SCHEMA

pytestmark = pytest.mark.merge

ALL = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "_last_lsn"]

ops = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),   # conv
        st.integers(min_value=0, max_value=2),   # turn
        st.sampled_from(["i", "u", "d"]),
        st.integers(min_value=0, max_value=9),   # payload token
    ),
    min_size=1,
    max_size=40,
)
cuts = st.lists(st.integers(min_value=0, max_value=39), max_size=3)


def to_events(seq) -> pd.DataFrame:
    rows = []
    for lsn, (c, t, op, tok) in enumerate(seq, start=1):
        rows.append({
            "lsn": lsn, "op": op, "conv_id": f"conv-{c}", "turn_idx": t,
            "role": "user", "text": f"tok-{tok}", "tool": None,
            "ts": pd.Timestamp("2026-01-01") + pd.Timedelta(minutes=lsn),
            "source_partition": lsn % 2,
        })
    return pd.DataFrame(rows)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seq=ops, cut_points=cuts)
def test_any_sequence_any_split_equals_oracle(spark, tmp_path_factory, seq, cut_points):
    ev = to_events(seq)
    n = len(ev)
    cuts_sorted = sorted({min(c, n) for c in cut_points} | {0, n})
    t = LakeTable.create(
        spark, str(tmp_path_factory.mktemp("prop") / "t"),
        TRANSCRIPT_TABLE_SCHEMA, num_buckets=2,
        key_cols=KEY_COLS, sort_cols=KEY_COLS,
    )
    for i in range(len(cuts_sorted) - 1):
        batch = ev.iloc[cuts_sorted[i]:cuts_sorted[i + 1]]
        merge_apply(t, FX.change_events_df(spark, batch), epoch_id=i)
    got = t.scan().orderBy(*KEY_COLS).toPandas()[ALL].reset_index(drop=True)
    exp = FX.pandas_oracle_replay(None, ev)
    exp = (exp[ALL] if len(exp) else pd.DataFrame(columns=ALL)).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
