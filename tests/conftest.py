import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from industry_big_data_time_sequence_process_spark.session import get_session  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_T2 = "/root/testdata/sf0.01"
SF_BENCH = "/root/testdata/sf0.1"


@pytest.fixture(scope="session")
def spark():
    """One shared session for the whole run (cold JVM start is ~15-50 s)."""
    s = get_session(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    yield s


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "smoke: fast edit-loop subset (one op per family + the flagship; "
        "`pytest -m smoke` targets < 60 s) — the full suite remains the "
        "gate")
