"""Plan-shape regression tests for the engine's Catalyst countermeasures.

These pin optimizer-dependent behavior that would regress silently (the
query still returns correct rows, just 10x slower on unsplittable
scans), so they assert on the physical plan, not results.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from dask_geopandas_spark.core import no_pushdown


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _line_of(plan: str, needle: str):
    for i, line in enumerate(plan.splitlines()):
        if needle in line:
            return i
    return None


@pytest.fixture(scope="module")
def udf_frame(spark):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(DoubleType())
    def doubled(x: pd.Series) -> pd.Series:
        return x * 2.0

    df = spark.range(0, 1000).withColumn("v", F.col("id").cast("double"))
    # the engine's rebalance shape: repartition directly over the scan
    return df.repartition(8), doubled


def test_plain_udf_filter_sinks_below_exchange(spark, udf_frame):
    """Documents WHY no_pushdown exists: a deterministic filter on a UDF
    output is pushed through the round-robin exchange, dragging the
    ArrowEvalPython stage onto the scan side."""
    df, doubled = udf_frame
    out = df.withColumn("d", doubled("v")).filter(F.col("d") > 0).groupBy().count()
    plan = _plan(out)
    arrow, exch = _line_of(plan, "ArrowEvalPython"), _line_of(plan, "RoundRobinPartitioning")
    assert arrow is not None and exch is not None
    assert arrow > exch  # printed below the exchange = runs before it


def test_no_pushdown_keeps_udf_above_exchange(spark, udf_frame):
    """With the barrier, the Python stage runs after the rebalance (full
    parallelism even on an unsplittable single-row-group scan)."""
    df, doubled = udf_frame
    out = (
        df.withColumn("d", doubled("v"))
        .filter(no_pushdown(F.col("d") > 0))
        .groupBy().count()
    )
    plan = _plan(out)
    arrow, exch = _line_of(plan, "ArrowEvalPython"), _line_of(plan, "RoundRobinPartitioning")
    assert arrow is not None and exch is not None
    assert arrow < exch  # printed above the exchange = runs after it


def test_no_pushdown_preserves_filter_semantics(spark, udf_frame):
    df, doubled = udf_frame
    base = df.withColumn("d", doubled("v"))
    want = base.filter(F.col("d") > 1000.0).count()
    got = base.filter(no_pushdown(F.col("d") > 1000.0)).count()
    assert got == want and want > 0
