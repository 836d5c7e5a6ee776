"""Distributed as-of join — the canonical custom operator Spark lacks
(beyond-reference: SURVEY §2.3 notes the reference implements no as-of
or interval joins; time-series engines ship it natively).

``asof_join(left, right, on, by)`` attaches to every left row the
single right row with the greatest ``on`` ≤ the left's ``on``
(direction='backward', tie-inclusive — the pandas ``merge_asof`` and
DuckDB ``ASOF JOIN`` convention), per ``by`` group.

Spark-first plan (the textbook distributed as-of, no UDF anywhere):
tag and union both inputs, ONE hash shuffle on the group key, sort
within partitions by (time, side), and propagate the most recent right
payload with ``last(..., ignorenulls=True)`` over a running window.
Cost is a single Exchange + window sort regardless of how many right
rows precede each left row — never a range cross-join.  Skewed groups
are split by AQE like any window; ``by=None`` funnels through one
window partition and is documented for small frames only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str = "ts",
              by: str | None = None, direction: str = "backward",
              tolerance: float | None = None, how: str = "left",
              right_prefix: str = "asof_") -> DataFrame:
    """As-of join of two plain DataFrames sharing the ``on`` (time)
    column and optionally a ``by`` key column.

    direction='backward': match the latest right row with
    ``r.on <= l.on``; 'forward': the earliest with ``r.on >= l.on``;
    'nearest': whichever of the two is closer (backward on ties).
    ``tolerance`` (seconds for timestamp columns, plain units for
    numerics) discards matches farther than the bound.  ``how``:
    'left' keeps unmatched left rows with NULLs, 'inner' drops them.
    Right payload columns come back prefixed with ``right_prefix``.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            "direction must be 'backward', 'forward', or 'nearest'")
    if how not in ("left", "inner"):
        raise ValueError("how must be 'left' or 'inner'")
    if tolerance is not None and tolerance < 0:
        raise ValueError("tolerance must be >= 0")

    payload_cols = [c for c in right.columns if c != by]
    clash = [f"{right_prefix}{c}" for c in payload_cols
             if f"{right_prefix}{c}" in left.columns]
    clash += [c for c in ("_asof_side", "_asof_payload", "_asof_match")
              if c in left.columns]
    if clash:
        raise ValueError(
            f"asof_join output columns collide with left columns {clash}; "
            "pass a different right_prefix")
    key_cols = ([by] if by else []) + [on]
    rp = (right.select(*key_cols,
                       F.struct(*[F.col(c) for c in payload_cols])
                       .alias("_asof_payload"))
          .withColumn("_asof_side", F.lit(0)))
    lp = left.withColumn("_asof_side", F.lit(1))
    combined = lp.unionByName(rp, allowMissingColumns=True)

    # backward: ascending time, right rows (side 0) before left at equal
    # time so an exactly-simultaneous right row matches (tie-inclusive).
    # forward is the mirror image: descending time, same side order.
    # nearest evaluates BOTH windows over the one partitioning (a single
    # shuffle, two in-partition sorts) and picks the smaller gap,
    # backward on ties.
    part = Window.partitionBy(by) if by else Window.partitionBy()
    w_back = part.orderBy(F.col(on), F.col("_asof_side")) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_fwd = part.orderBy(F.col(on).desc(), F.col("_asof_side")) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    if direction == "backward":
        matched = combined.withColumn(
            "_asof_match", F.last("_asof_payload", ignorenulls=True).over(w_back))
    elif direction == "forward":
        matched = combined.withColumn(
            "_asof_match", F.last("_asof_payload", ignorenulls=True).over(w_fwd))
    else:
        back = F.last("_asof_payload", ignorenulls=True).over(w_back)
        fwd = F.last("_asof_payload", ignorenulls=True).over(w_fwd)
        lt = F.col(on).cast("double")
        gap_b = lt - back[on].cast("double")
        gap_f = fwd[on].cast("double") - lt
        matched = combined.withColumn(
            "_asof_match",
            F.when(back.isNull(), fwd)
            .when(fwd.isNull(), back)
            .when(gap_b <= gap_f, back)
            .otherwise(fwd))

    out = matched.filter(F.col("_asof_side") == 1) \
        .drop("_asof_side", "_asof_payload")
    if tolerance is not None:
        lt = F.col(on).cast("double")
        rt = F.col(f"_asof_match.{on}").cast("double")
        if direction == "backward":
            gap = lt - rt
        elif direction == "forward":
            gap = rt - lt
        else:
            gap = F.abs(lt - rt)
        out = out.withColumn(
            "_asof_match",
            F.when(gap <= F.lit(float(tolerance)), F.col("_asof_match")))
    for c in payload_cols:
        out = out.withColumn(f"{right_prefix}{c}", F.col(f"_asof_match.{c}"))
    out = out.drop("_asof_match")
    if how == "inner":
        out = out.filter(F.col(f"{right_prefix}{on}").isNotNull())
    return out
