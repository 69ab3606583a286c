"""CI guard for the oracle-backed catalog tail.

The driver's per-round correctness gate verifies the FIRST 50 names of
``queries()``; oracle-backed entries past that window were previously
only checked by running ``tests/oracle_check.py`` by hand, so a
regression there would pass ``pytest tests/``. This parametrizes the
same driver-replica comparison (oracle_check.compare_one) over every
oracle-backed entry beyond the window, at the driver's sf0.01.
"""

from __future__ import annotations

import pytest

DRIVER_WINDOW = 50
SF_DIR = "/root/testdata/sf0.01"


def _tail_names() -> list[str]:
    import __spark_entry__ as entry_mod

    names = list(entry_mod.queries())
    oracles = entry_mod.oracle_sql()
    return [n for n in names[DRIVER_WINDOW:] if n in oracles]


@pytest.fixture(scope="module")
def oracle_con():
    from oracle_check import connect_oracle

    con = connect_oracle(SF_DIR)
    yield con
    con.close()


def test_driver_window_boundary():
    """Pin the window's edge so __spark_entry__'s comment can't drift:
    the 50-name driver gate ends at q20_join_left, with the remaining
    §2.4 joins (q21/q22/q23) first in the pytest-gated tail."""
    import __spark_entry__ as entry_mod

    names = list(entry_mod.queries())
    assert names[DRIVER_WINDOW - 1] == "q20_join_left"
    assert names[DRIVER_WINDOW : DRIVER_WINDOW + 3] == [
        "q21_join_multihop",
        "q22_match_inner",
        "q23_join_suffix",
    ]


@pytest.mark.parametrize("name", _tail_names())
def test_oracle_tail(spark, oracle_con, name):
    import __spark_entry__ as entry_mod
    from oracle_check import compare_one

    status, n_rows, msgs = compare_one(
        spark, oracle_con, entry_mod.queries()[name], entry_mod.oracle_sql()[name], SF_DIR
    )
    assert status == "pass", f"{name}: {'; '.join(msgs)}"
    assert n_rows >= 0
