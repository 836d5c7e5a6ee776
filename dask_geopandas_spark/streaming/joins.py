"""Stream-stream joins (beyond-reference; SURVEY §2.9 streaming suite).

Structured Streaming's stream-stream inner join needs watermarks on
both inputs plus a time-range join condition so the state store can
evict rows that can no longer match; `event_sequence_join` packages
the classic funnel/conversion shape — "a THEN b within T, per key" —
so the same call serves batch frames (plain inequality join) and
streams (stateful, watermark-bounded).

State bound at scale: each side retains only rows younger than
watermark + the range width, keyed by the join key — the textbook
bounded-state stream join, never an unbounded buffer.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .geo import _watermarkable_ts


@contextmanager
def state_partitions(spark, n: int | None):
    """Scope ``spark.sql.shuffle.partitions`` for starting a STATEFUL
    streaming query.

    Structured Streaming fixes its state-store instance count from the
    shuffle-partition setting when a query FIRST starts (the count is
    persisted in the checkpoint), and every micro-batch then pays
    per-instance overhead (store open/commit/snapshot) on all of them.
    Size it to the stream — keyspace × throughput — not to the
    session's batch default: a small stream under a 200-partition
    batch default spends most of its wall-clock on empty state stores,
    while an under-partitioned huge stream hotspots.  The session
    value is restored on exit so batch queries are unaffected; pass
    ``None`` to change nothing."""
    if n is None:
        yield
        return
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    spark.conf.set(key, str(int(n)))
    try:
        yield
    finally:
        spark.conf.set(key, old)


def _has_watermark(df: DataFrame) -> bool:
    """True when the frame's plan already contains an event-time
    watermark (it is downstream of a watermarked stateful operator)."""
    try:
        return "EventTimeWatermark" in \
            df._jdf.queryExecution().analyzed().toString()
    except Exception:
        return False


def event_sequence_join(first: DataFrame, then: DataFrame,
                        key: str = "user_id", within: str = "30 minutes",
                        watermark: str = "2 hours", ts_col: str = "ts",
                        first_cols: tuple = ("event_id",),
                        then_cols: tuple = ("event_id", "value"),
                        how: str = "inner") -> DataFrame:
    """Pairs of (first-event, then-event) sharing ``key`` with the
    'then' timestamp inside ``[first_ts, first_ts + within]`` (closed
    bounds).  ``first``/``then`` may be two filtered views of one
    source; each keeps ``ts_col``, ``key``, and its listed payload
    columns.  Output columns: key, first_<c>…, then_<c>…, first_ts,
    then_ts.

    ``how='inner'`` is the conversion funnel; ``how='left'``
    (left outer) additionally keeps first-events with NO match —
    ``then_*`` columns NULL — which is the ABANDONMENT analysis
    ("clicked but never purchased within T").  Structured Streaming
    supports the outer form with the same bounded state: an unmatched
    row emits exactly when the watermark passes ``first_ts + within``
    and it provably cannot match anymore (so outer results trail the
    watermark — under availableNow they are complete).

    Batch inputs run the identical inequality join (the oracle form);
    streaming inputs get per-side watermarks so the join is
    stateful-but-bounded.  The time-range condition is REQUIRED for
    streaming state eviction — an equality-only stream-stream join
    would buffer forever."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    a = _watermarkable_ts(first, ts_col).select(
        F.col(key).alias("_k"), F.col(ts_col).alias("first_ts"),
        *[F.col(c).alias(f"first_{c}") for c in first_cols])
    b = _watermarkable_ts(then, ts_col).select(
        F.col(key).alias("_k2"), F.col(ts_col).alias("then_ts"),
        *[F.col(c).alias(f"then_{c}") for c in then_cols])
    # a side that is ITSELF the output of a watermarked stateful
    # operator (a chained multi-step funnel) already carries a
    # propagated watermark — redefining one is disallowed when Spark
    # runs multiple stateful operators in a query, and unnecessary
    # (watermark propagation hands the downstream join the upstream's
    # delayed watermark)
    if a.isStreaming and not _has_watermark(a):
        a = a.withWatermark("first_ts", watermark)
    if b.isStreaming and not _has_watermark(b):
        b = b.withWatermark("then_ts", watermark)
    cond = ((F.col("_k") == F.col("_k2"))
            & (F.col("then_ts") >= F.col("first_ts"))
            & (F.col("then_ts")
               <= F.col("first_ts") + F.expr(f"INTERVAL {within}")))
    joined = a.join(b, on=cond,
                    how="left_outer" if how == "left" else "inner")
    return joined.select(F.col("_k").alias(key),
                         *[f"first_{c}" for c in first_cols],
                         *[f"then_{c}" for c in then_cols],
                         "first_ts", "then_ts")


def funnel_join(events: DataFrame, steps: list, type_col: str = "event_type",
                key: str = "user_id", within: str = "30 minutes",
                watermark: str = "2 hours", ts_col: str = "ts",
                id_col: str = "event_id",
                last_how: str = "inner") -> DataFrame:
    """N-step funnel over ONE events source: rows where the same
    ``key`` performed ``steps[0]`` THEN ``steps[1]`` … THEN
    ``steps[-1]``, each hop within ``within`` of the previous step
    (closed bounds).  Output columns: key, step1_id … stepN_id,
    step1_ts … stepN_ts.

    Streaming inputs chain N−1 stateful stream-stream joins — Spark's
    multiple-stateful-operators path: only the source sides carry
    explicit watermarks, every later hop consumes the PROPAGATED
    (delayed) watermark of the join before it, so per-hop state stays
    bounded exactly like the 2-step ``event_sequence_join`` and the
    chain is append-complete under availableNow (inner joins emit on
    match, not on watermark passage).  Batch inputs run the identical
    chained inequality joins — the oracle form.

    ``last_how='left'`` makes the FINAL hop a left outer join — rows
    that completed steps 1…N−1 but never step N keep NULL
    ``stepN_id``/``stepN_ts``: the generalized abandonment analysis
    ("carted but never purchased").  Streaming emits an unmatched
    row only once the watermark proves no match can arrive, and a
    chained hop consumes a PROPAGATED watermark that is further
    delayed by each upstream hop's ``within`` allowance — so an
    abandonment rollup is stream==batch only below a cutoff of
    roughly max event time − watermark − (N−1)·within (margin
    advised); matched rows need no cutoff."""
    if len(steps) < 2:
        raise ValueError("funnel_join needs at least two steps")
    if last_how not in ("inner", "left"):
        raise ValueError(
            f"last_how must be 'inner' or 'left', got {last_how!r}")
    frames = [events.filter(F.col(type_col) == F.lit(s)) for s in steps]
    cur = frames[0].select(F.col(key), F.col(ts_col),
                           F.col(id_col).alias("step1_id"))
    for n, frame in enumerate(frames[1:], start=2):
        carry = [c for c in cur.columns if c not in (key, ts_col)]
        j = event_sequence_join(cur, frame, key=key, within=within,
                                watermark=watermark, ts_col=ts_col,
                                first_cols=tuple(carry),
                                then_cols=(id_col,),
                                how=last_how if n == len(steps)
                                else "inner")
        sel = ([F.col(key)]
               + [F.col(f"first_{c}").alias(c) for c in carry]
               # the archived step timestamp must DROP its event-time
               # tag (rebuilt through a µs round-trip — value-exact,
               # metadata-free): a stream may carry at most ONE
               # event-time column, and the live one for the next hop
               # is then_ts
               + [F.timestamp_micros(F.unix_micros(F.col("first_ts")))
                  .alias(f"step{n - 1}_ts"),
                  F.col(f"then_{id_col}").alias(f"step{n}_id"),
                  F.col("then_ts").alias(ts_col)])
        cur = j.select(*sel)
    return cur.withColumnRenamed(ts_col, f"step{len(steps)}_ts")
