"""Structured Streaming variants of the engine's operators.

The reference is batch-only (SURVEY §2.9); this is the beyond-reference
extension.  All geometry pandas UDFs are stateless, so they apply to
streaming DataFrames unchanged; this module packages the common stream
shapes:

- `attach_geometry`: points_from_xy / bbox on a stream (stateless).
- `windowed_event_counts`: watermarked tumbling-window aggregation over
  an event stream (late data dropped past the watermark).
- `windowed_spatial_counts`: per-window, per-geohash-cell counts — the
  streaming rollup of the spatial_shuffle bucketing.

These run with any streaming source (rate, kafka, file); tests drive them
with the file source over the driver's events table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import core as FX


def _watermarkable_ts(df: DataFrame, ts_col: str) -> DataFrame:
    """Watermarks require TIMESTAMP (LTZ); parquet event times often read
    as TIMESTAMP_NTZ.  Cast NTZ wall-clock to LTZ (session timezone) so the
    same code path serves batch and streaming inputs.

    The cast interprets wall-clock values in the SESSION timezone, so
    window/session boundaries only match a wall-clock (date_trunc-style)
    oracle under UTC — any zone with DST gaps/overlaps or a fractional
    offset silently shifts them.  A non-UTC session therefore fails
    loudly here instead."""
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        tz = df.sparkSession.conf.get("spark.sql.session.timeZone", "")
        if tz not in ("UTC", "Etc/UTC", "GMT", "Z", "+00:00"):
            raise ValueError(
                f"casting TIMESTAMP_NTZ {ts_col!r} for watermarking requires "
                f"spark.sql.session.timeZone=UTC, got {tz!r}: wall-clock "
                "windows would shift across DST transitions")
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def attach_geometry(stream_df: DataFrame, x: str, y: str,
                    geometry: str = "geometry") -> DataFrame:
    out = stream_df.withColumn(geometry, FX.st_point(F.col(x), F.col(y)))
    return out.withColumn(f"{geometry}_bbox", FX.st_bounds(F.col(geometry)))


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours",
                          ts_col: str = "ts",
                          slide: str | None = None) -> DataFrame:
    """Tumbling-window (or, with ``slide``, SLIDING-window) count+sum
    per event_type with a watermark for late data.  Works identically
    on batch DataFrames (window() is the same expression) — the
    driver's batch oracle uses date_trunc (tumbling) or a
    bucket-minus-k-slides expansion (sliding)."""
    df = _watermarkable_ts(events, ts_col)
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    w = (F.window(ts_col, window, slide) if slide
         else F.window(ts_col, window))
    return (
        df.groupBy(w.alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n_events", "sum_value")
    )


def sessionized_counts(events: DataFrame, gap: str = "30 minutes",
                       watermark: str = "2 hours",
                       ts_col: str = "ts", key_col: str = "event_type") -> DataFrame:
    """Session windows per key: events closer than ``gap`` merge into one
    session (native ``session_window`` — works identically on batch and
    streaming inputs; the batch oracle is lag + gap-flag + running sum)."""
    df = _watermarkable_ts(events, ts_col)
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("session_start"), key_col, "n_events")
    )


def stateful_running_totals(events: DataFrame, key_col: str = "event_type",
                            val_col: str = "value",
                            ts_col: str = "ts",
                            watermark: str = "2 hours") -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-key running (count, sum) maintained across micro-batches.  The
    reference has no streaming surface at all (SURVEY §2.9); this is the
    beyond-reference stateful path.  On a batch DataFrame it falls back
    to the equivalent groupBy aggregation (same output contract)."""
    import pandas as pd

    if not events.isStreaming:
        return (
            events.groupBy(key_col)
            .agg(F.count("*").alias("running_n"),
                 F.round(F.sum(val_col), 6).alias("running_sum"))
            .withColumnRenamed(key_col, "key")
        )

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (DoubleType, LongType, StringType,
                                   StructField, StructType)

    out_schema = StructType([
        StructField("key", StringType()),
        StructField("running_n", LongType()),
        StructField("running_sum", DoubleType()),
    ])
    state_schema = StructType([
        StructField("n", LongType()),
        StructField("s", DoubleType()),
    ])

    def update(key, pdfs, state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf[val_col].sum())
        state.update((n, s))
        yield pd.DataFrame({"key": [key[0]], "running_n": [n],
                            "running_sum": [round(s, 6)]})

    return (
        _watermarkable_ts(events, ts_col).withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col))
        .applyInPandasWithState(
            update, out_schema, state_schema, "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def windowed_spatial_counts(events_with_geom: DataFrame, precision: int = 4,
                            window: str = "1 hour", watermark: str = "2 hours",
                            ts_col: str = "ts",
                            geometry: str = "geometry") -> DataFrame:
    df = _watermarkable_ts(events_with_geom, ts_col)
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    cell = FX.geohash(True, precision)(F.col(geometry))
    return (
        df.withColumn("cell", cell)
        .groupBy(F.window(ts_col, window).alias("w"), F.col("cell"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "cell", "n_events")
    )


def geofence_join(points_df: DataFrame, fences, x: str, y: str,
                  how: str = "inner") -> DataFrame:
    """Stream-static spatial join: match each (streaming) point row to
    the static fence geometries containing it.

    The fence layer is a bounded static frame, so Spark broadcasts it
    into every micro-batch (stream-static joins are natively supported
    by Structured Streaming); the join condition is native bbox
    containment on the fence's bbox struct, refined by the exact
    containment UDF only when the fences aren't envelope-exact
    rectangles.  Stateless → identical semantics on batch inputs (the
    oracle path).  ``how='left'`` keeps unfenced points with NULLs.
    """
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    fg = fences.with_bbox()
    b = fg.bbox_column
    fdf = fg.df
    # disambiguate any colliding column names fence-side
    for c in set(fdf.columns) & set(points_df.columns):
        fdf = fdf.withColumnRenamed(c, f"{c}_fence")
        if c == b:
            b = f"{c}_fence"
    cond = ((F.col(x) >= F.col(f"{b}.minx"))
            & (F.col(x) <= F.col(f"{b}.maxx"))
            & (F.col(y) >= F.col(f"{b}.miny"))
            & (F.col(y) <= F.col(f"{b}.maxy")))
    refine = None
    if not getattr(fg, "envelope_exact", False):
        geom = fg.geometry_column
        gcol = geom if geom in fdf.columns else f"{geom}_fence"
        refine = FX.st_intersects(F.col(gcol),
                                  FX.st_point(F.col(x), F.col(y)))
    if how == "inner":
        out = points_df.join(F.broadcast(fdf), on=cond, how="inner")
        return out.filter(refine) if refine is not None else out
    # left: a Python-UDF refinement cannot sit in a LEFT OUTER ON
    # clause — match inner first, then rejoin on a content hash of the
    # point row (the sjoin left-path pattern; hashes stay aligned
    # across plan re-evaluations, unlike mono-ids)
    pid = "_gf_row"
    pts = points_df.withColumn(
        pid, F.xxhash64(*[F.col(c) for c in points_df.columns]))
    matched = pts.join(F.broadcast(fdf), on=cond, how="inner")
    if refine is not None:
        matched = matched.filter(refine)
    fence_cols = [c for c in matched.columns if c not in pts.columns]
    return (pts.join(matched.select(pid, *fence_cols), on=pid, how="left")
            .drop(pid))


def windowed_geofence_counts(events: DataFrame, fences, x: str, y: str,
                             fence_key: str, window: str = "1 hour",
                             watermark: str = "2 hours",
                             ts_col: str = "ts") -> DataFrame:
    """Events-per-fence-per-window: the streaming geofence rollup
    (geofence_join + watermarked tumbling window)."""
    df = _watermarkable_ts(events, ts_col)
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    joined = geofence_join(df, fences, x, y)
    key = fence_key if fence_key in joined.columns else f"{fence_key}_fence"
    return (
        joined.groupBy(F.window(ts_col, window).alias("w"), F.col(key))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"),
                F.col(key).alias(fence_key), "n_events")
    )
