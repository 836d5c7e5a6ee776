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


def streaming_neardup_dedup(stream: DataFrame, text_col: str = "text",
                            bits: int = 32,
                            watermark: str | None = None,
                            ts_col: str | None = None) -> DataFrame:
    """Streaming NEAR-duplicate suppression at simhash-bucket
    granularity: keep the first-seen document per simhash value.

    Near-identical documents collapse onto equal simhashes with high
    probability (the batch suite pins hamming-closeness for near-dups),
    so bucket-exact dropDuplicates gives a streaming near-dup filter
    with the same native state-store mechanics as the exact variant —
    state is one entry per distinct simhash, expiring via the watermark
    when given.  Precision/recall trade with ``bits`` (fewer bits →
    more aggressive collapsing).  The simhash expression is pure native
    SQL, so this is dropDuplicates-grade cheap on the stream."""
    from ..operators.dedup import simhash
    from .geo import _watermarkable_ts

    out = stream.withColumn("_sh", simhash(F.col(text_col), bits=bits))
    if ts_col is not None and watermark is not None:
        out = (_watermarkable_ts(out, ts_col)
               .withWatermark(ts_col, watermark)
               .dropDuplicatesWithinWatermark(["_sh"]))
    else:
        out = out.dropDuplicates(["_sh"])
    return out.drop("_sh")
