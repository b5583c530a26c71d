from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from battetl_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[8]", shuffle_partitions=8, app_name="battetl_spark-tests")
    yield s
    s.stop()


def assert_pdf_equal(actual, expected, sort_cols=None):
    """Byte-for-byte frame equality after stable key ordering."""
    import pandas as pd

    if sort_cols:
        actual = actual.sort_values(sort_cols, kind="stable").reset_index(drop=True)
        expected = expected.sort_values(sort_cols, kind="stable").reset_index(drop=True)
    pd.testing.assert_frame_equal(actual, expected, check_dtype=False)
