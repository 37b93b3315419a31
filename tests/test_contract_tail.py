"""The driver's correctness gate checks only the FIRST 50 registry entries
(observed in CORRECTNESS_r02), so the documented tail (slots 51+) would
otherwise lose hard verification the round it's relegated. This test runs
the tail through the same local gate replica every CI pass — any oracle
divergence in a relegated entry fails the suite, not silently the gate."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.usefixtures("spark")
def test_relegated_tail_entries_stay_oracle_green(spark):
    import __spark_entry__ as entrymod
    from tools import check_contract

    tail = list(entrymod.queries())[50:]
    assert tail, "no relegated entries — retire this test"
    failures = check_contract.main(only=tail)
    assert failures == 0, f"relegated entries diverged: see output ({tail})"
