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
    config.addinivalue_line(
        "markers",
        "audit100: 100x-corpus ANN recall pin (builds a 200k-vector index; "
        "several minutes) — run explicitly via `pytest -m audit100`; "
        "excluded from the default run by conftest's collection hook")


def pytest_collection_modifyitems(config, items):
    """Deselect audit100 tests unless explicitly requested with -m — they
    build a 200k-vector composed index (minutes), which would blow the
    <600 s shard budget of the commit gate. The same measurement is
    recorded per round in SCALE.md."""
    if "audit100" in (config.getoption("-m") or ""):
        return
    skip = pytest.mark.skip(reason="audit100: run with -m audit100")
    for it in items:
        if "audit100" in it.keywords:
            it.add_marker(skip)
