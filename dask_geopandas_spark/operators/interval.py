"""Distributed interval (range) join — the second classic operator
Spark lacks natively (beyond-reference; SURVEY §2.3: the reference
implements no interval joins).  Naive Spark spells this as a
cross-join + filter (quadratic); this operator is the 1-D analogue of
the PBSM grid sjoin: bucketize the value axis, equi-join on
(group, bucket), refine exactly, and dedup multi-bucket pairs with the
reference-bucket trick — a plain shuffled hash join that scales
horizontally.

``interval_join``: pairs where the left interval [ls, le] overlaps the
right interval [rs, re] (closed ends; a point is a zero-length
interval — pass the same column twice).  Optional equality key ``by``
composes with the bucket key, so per-key joins co-partition in the
same single shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket_range(start: Column, end: Column, width: float):
    lo = F.floor(start / F.lit(width)).cast("long")
    hi = F.floor(end / F.lit(width)).cast("long")
    return lo, hi


def interval_join(left: DataFrame, right: DataFrame,
                  left_bounds: tuple = ("start", "end"),
                  right_bounds: tuple = ("start", "end"),
                  by: str | None = None,
                  bucket_width: float | None = None,
                  how: str = "inner",
                  lsuffix: str = "_left", rsuffix: str = "_right") -> DataFrame:
    """Join on interval overlap: ``max(ls, rs) <= min(le, re)``
    (plus ``by`` equality when given).  ``how='left'`` keeps
    non-overlapping left rows with NULL right columns (one extra native
    join on a content hash of the left row, as in sjoin).

    ``bucket_width`` controls the bucketize granularity (defaults to a
    driver-side estimate: the mean left interval length, floor-bounded;
    pass it explicitly in production — e.g. the session window length —
    to keep the plan fully scan-free).  Each row explodes into the
    buckets its interval covers (native sequence+explode); candidate
    pairs meet in an equi-join on (by, bucket); a pair sharing several
    buckets is kept only in the bucket of ``max(ls, rs)`` — a native
    filter, no distinct shuffle.
    """
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    if how == "left":
        # match inner on a content-hashed left, then one native left
        # join restores unmatched rows (the sjoin left-path pattern);
        # output column naming matches the inner form
        lrow = "_iv_left_row"
        lh = left.withColumn(
            lrow, F.xxhash64(*[F.col(c) for c in left.columns]))
        matched = interval_join(lh, right, left_bounds, right_bounds,
                                by=by, bucket_width=bucket_width,
                                how="inner", lsuffix=lsuffix,
                                rsuffix=rsuffix)
        common2 = set(lh.columns) & set(right.columns)
        left_out = {f"{c}{lsuffix}" if c in common2 else c
                    for c in lh.columns}
        rcols = [c for c in matched.columns if c not in left_out]
        for c in common2:
            lh = lh.withColumnRenamed(c, f"{c}{lsuffix}")
        # Duplicate rows: n identical left rows share the content hash,
        # so `matched` holds n copies of each single-left-row match
        # multiset (which itself may contain duplicate identical right
        # rows).  A plain distinct() would collapse those right
        # duplicates and break the inner-plus-nulls equivalence, so
        # recover the exact per-left multiset instead: count each
        # (left-hash, right-tuple) pair, divide by n, and re-expand.
        nl = lh.groupBy(lrow).agg(F.count("*").alias("_iv_nl"))
        matches = (matched.groupBy(lrow, *rcols)
                   .agg(F.count("*").alias("_iv_cnt"))
                   .join(nl, on=lrow)
                   .select(lrow, *rcols,
                           F.explode(F.sequence(
                               F.lit(1),
                               (F.col("_iv_cnt") / F.col("_iv_nl"))
                               .cast("long"))).alias("_iv_i"))
                   .drop("_iv_i"))
        return (lh.join(matches, on=lrow, how="left").drop(lrow))
    ls, le = left_bounds
    rs, re = right_bounds
    common = set(left.columns) & set(right.columns)
    for c in common:
        left = left.withColumnRenamed(c, f"{c}{lsuffix}")
        right = right.withColumnRenamed(c, f"{c}{rsuffix}")

    def j(name: str, suffix: str) -> str:
        return f"{name}{suffix}" if name in common else name

    lsj, lej = j(ls, lsuffix), j(le, lsuffix)
    rsj, rej = j(rs, rsuffix), j(re, rsuffix)
    byl, byr = (j(by, lsuffix), j(by, rsuffix)) if by else (None, None)

    if bucket_width is None:
        row = left.select(
            F.avg(F.col(lej) - F.col(lsj)).alias("m")).first()
        bucket_width = max(float(row["m"] or 1.0), 1e-9)
    w = float(bucket_width)

    # malformed intervals (end < start) match nothing — and must not
    # reach sequence(), which would generate DESCENDING bucket ranges
    left = left.filter(F.col(lej) >= F.col(lsj))
    right = right.filter(F.col(rej) >= F.col(rsj))
    llo, lhi = _bucket_range(F.col(lsj), F.col(lej), w)
    rlo, rhi = _bucket_range(F.col(rsj), F.col(rej), w)
    lb = left.withColumn("_iv_bucket", F.explode(F.sequence(llo, lhi)))
    rb = right.withColumn("_iv_bucket", F.explode(F.sequence(rlo, rhi)))

    on = [lb["_iv_bucket"] == rb["_iv_bucket"]]
    if by:
        on.append(lb[byl] == rb[byr])
    joined = lb.join(rb, on=on[0] if len(on) == 1 else on[0] & on[1],
                     how="inner").drop(rb["_iv_bucket"])

    overlap_start = F.greatest(F.col(lsj), F.col(rsj))
    exact = overlap_start <= F.least(F.col(lej), F.col(rej))
    ref = F.floor(overlap_start / F.lit(w)).cast("long") == F.col("_iv_bucket")
    out = joined.filter(exact & ref).drop("_iv_bucket")
    if by:
        out = out.drop(rb[byr])
    return out
