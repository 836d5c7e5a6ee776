"""Streaming deduplication for training-data ingest pipelines.

The batch dedup operators (operators/dedup.py) assume a bounded input;
an ingest pipeline sees an unbounded stream.  Structured Streaming's
stateful dropDuplicates is the native answer: the fingerprint state
lives in the state store (RocksDB at cluster scale), partitioned by the
dedup key, so throughput scales with executors and no task ever holds
the whole key set.

No direct reference analog (the reference is batch-only,
dask_geopandas/tests exercise no streaming); BASELINE.json north-star
scope (training-data pipeline operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(stream: DataFrame, text_col: str = "text",
                          watermark: str | None = None,
                          ts_col: str | None = None) -> DataFrame:
    """Keep the first-seen document per normalized-text fingerprint.

    Without a watermark the fingerprint state grows with the distinct
    count (fine for bounded replays / availableNow backfills).  For a
    true unbounded stream pass ``ts_col`` + ``watermark``: state then
    expires via ``dropDuplicatesWithinWatermark`` — late re-arrivals
    inside the watermark still dedup, state stays bounded by the
    watermark window (the standard streaming tradeoff).

    WHICH row survives depends on arrival order (nondeterministic
    under parallel replay); the surviving fingerprint SET is exact —
    deterministic checks should compare fingerprints, not doc ids."""
    from ..operators.textstats import fingerprint
    from .geo import _watermarkable_ts

    out = stream.withColumn("_fp", fingerprint(F.col(text_col)))
    if ts_col is not None and watermark is not None:
        out = (_watermarkable_ts(out, ts_col)
               .withWatermark(ts_col, watermark)
               .dropDuplicatesWithinWatermark(["_fp"]))
    else:
        out = out.dropDuplicates(["_fp"])
    return out.drop("_fp")
