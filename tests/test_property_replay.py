"""Property-based replay equivalence: arbitrary op sequences, duplicates,
reorderings, and batch splits must match the sequential pandas oracle.
(Goes beyond the reference's fixed golden files — hypothesis-driven.)"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from battetl_spark import fixtures as FX
from battetl_spark.cdc import merge_apply
from battetl_spark.lake import LakeTable
from battetl_spark.schemas import KEY_COLS, TRANSCRIPT_TABLE_SCHEMA
from tests.conftest import assert_pdf_equal

pytestmark = pytest.mark.merge

ALL = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "_last_lsn"]


def events_frame(ops: list[tuple[int, int, str]], order: list[int]) -> pd.DataFrame:
    """(key, version-salt, op) list + arrival permutation → event frame."""
    n = len(ops)
    rows = []
    for lsn0, (key, salt, op) in enumerate(ops, start=1):
        rows.append(
            {
                "lsn": np.int64(lsn0),
                "op": op,
                "conv_id": f"conv-{key % 3:06d}",
                "turn_idx": np.int32(key % 4),
                "role": "user",
                "text": f"k{key}s{salt}l{lsn0}",
                "tool": None,
                "ts": pd.Timestamp("2026-01-01") + pd.Timedelta(seconds=lsn0),
                "source_partition": np.int32(lsn0 % 3),
            }
        )
    pdf = pd.DataFrame(rows)
    perm = np.array(order[:n] + list(range(len(order), n)))[:n]
    return pdf.iloc[np.argsort(np.argsort(perm), kind="stable")].reset_index(drop=True)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    ops=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=11),  # key space: 12 keys
            st.integers(min_value=0, max_value=5),
            st.sampled_from(["i", "u", "d", "i", "u"]),
        ),
        min_size=1,
        max_size=24,
    ),
    order=st.permutations(list(range(24))),
    n_batches=st.integers(min_value=1, max_value=3),
)
def test_random_replay_matches_oracle(spark, tmp_path_factory, ops, order, n_batches):
    events = events_frame(ops, list(order))
    expected = FX.pandas_oracle_replay(None, events)
    d = tmp_path_factory.mktemp("prop")
    t = LakeTable.create(
        spark, str(d / "t"), TRANSCRIPT_TABLE_SCHEMA, num_buckets=2,
        key_cols=KEY_COLS, sort_cols=KEY_COLS,
    )
    for i, chunk in enumerate(np.array_split(events, n_batches)):
        if len(chunk):
            merge_apply(
                t, FX.change_events_df(spark, chunk.reset_index(drop=True)),
                epoch_id=i,
            )
    got = t.scan().orderBy(*KEY_COLS).toPandas()[ALL].reset_index(drop=True)
    if len(expected) == 0:
        assert len(got) == 0
    else:
        assert_pdf_equal(got, expected, KEY_COLS)
