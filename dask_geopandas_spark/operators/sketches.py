"""Mergeable cardinality sketches — HyperLogLog (Flajolet et al.
2007) over the module's portable 60-bit md5 hash, so the SAME sketch
bytes come out of Spark and the DuckDB oracle and daily register
frames union by plain ``max``.

Spark ships `approx_count_distinct` (a JVM-internal HLL++); this
module exists for what that can't do in a pipeline: (a) PERSIST the
registers as ordinary rows and merge new days in (the cross-crawl
"how many unique URLs ever" counter without re-scanning history),
(b) reproduce bit-for-bat in any engine that has md5 — the oracle
gate, and (c) expose the registers to SQL (per-cell audits, striping
into indexes).

Design for 100 TB: building registers is ONE map-side-combined
aggregation on (group, register-index) — at p=12 a group's sketch is
at most 4096 rows no matter how many billions of items fed it; the
estimate pass is a second tiny aggregation.  Standard error is
~1.04/sqrt(2^p) (1.6% at p=12).

Estimator arithmetic is engine-portable by construction: the harmonic
sum Σ 2^-rho is accumulated as INTEGER units of 2^-(wbits+1) —
powers of two are exact and integer addition is order-independent,
so Spark's partition-order-dependent double summation can never
flip a low bit vs the oracle.  The only transcendental is the
small-range ``ln`` correction (both engines within 1 ulp; the final
round-to-long absorbs it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from ..barrier import plan_barrier

from .dedup import portable_hash, seeded_bucket

HASH_BITS = 60  # portable_hash: first 15 md5 hex chars


def _alpha(m: int) -> float:
    """Bias-correction constant (Flajolet et al., m >= 128)."""
    if m < 128:
        raise ValueError("precision too small: need p >= 7")
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(df: DataFrame, col: str, p: int = 12,
                  by: list[str] | None = None) -> DataFrame:
    """HLL register frame: (``by``..., ``hll_idx``, ``hll_rho``) —
    at most ``2^p`` rows per group regardless of input size.  Top
    ``p`` hash bits pick the register, ``rho`` is the 1-based
    position of the leftmost 1 in the remaining ``60-p`` bits
    (``60-p+1`` when they are all zero).  NULL values are skipped
    (a NULL is not a distinct member).

    Register frames are the MERGEABLE form: persist them, union any
    number of days/sources, and :func:`hll_merge` (a max per
    register) yields the sketch of the union."""
    p = int(p)
    if not 7 <= p <= 16:
        raise ValueError("p must be in [7, 16]")
    wbits = HASH_BITS - p
    keys = list(by or [])
    h = portable_hash(F.col(col).cast("string"))
    w = F.shiftright(h, wbits)  # top p bits -> register index
    rest = h.bitwiseAND(F.lit((1 << wbits) - 1))
    rho = (F.when(rest == 0, F.lit(wbits + 1))
           .otherwise(F.lit(wbits + 1) - F.length(F.bin(rest))))
    return (df.filter(F.col(col).isNotNull())
            .select(*keys, w.alias("hll_idx"), rho.alias("hll_rho"))
            .groupBy(*keys, "hll_idx")
            .agg(F.max("hll_rho").alias("hll_rho")))


def hll_merge(*register_frames: DataFrame,
              by: list[str] | None = None) -> DataFrame:
    """Union sketches: max rho per (group, register).  HLL's merge is
    lossless — the merged sketch is IDENTICAL to the sketch of the
    concatenated inputs, which is what makes register frames a
    persistable running counter."""
    keys = list(by or [])
    out = register_frames[0]
    for f in register_frames[1:]:
        out = out.unionAll(f)
    return (out.groupBy(*keys, "hll_idx")
            .agg(F.max("hll_rho").alias("hll_rho")))


def hll_estimate(registers: DataFrame, p: int = 12,
                 by: list[str] | None = None,
                 count_col: str = "approx_distinct") -> DataFrame:
    """Finish a register frame into per-group estimates: the classic
    HLL estimator ``alpha_m · m² / Z`` with the small-range
    ``m·ln(m/V)`` correction (no large-range correction needed at 60
    hash bits).  The harmonic sum accumulates as exact integers (see
    module docstring); the estimate rounds to a BIGINT."""
    p = int(p)
    m = 1 << p
    wbits = HASH_BITS - p
    scale = wbits + 1
    keys = list(by or [])
    unit = (F.pow(F.lit(2.0), F.lit(scale) - F.col("hll_rho"))
            .cast("long"))
    # coalesce: a keyless groupBy over an EMPTY register frame yields
    # one row with a NULL sum; 0 reduces it to the all-zero-register
    # case, whose small-range branch (v = m > 0) estimates 0
    agg = (registers.groupBy(*keys)
           .agg(F.coalesce(F.sum(unit), F.lit(0)).alias("_zs"),
                F.count("*").alias("_np")))
    v = F.lit(m) - F.col("_np")
    z = ((F.col("_zs") + v * F.lit(1 << scale)).cast("double")
         / F.lit(float(1 << scale)))
    e_raw = F.lit(_alpha(m) * m * m) / z
    e = (F.when((e_raw <= F.lit(2.5 * m)) & (v > 0),
                F.lit(float(m)) * F.log(F.lit(float(m))
                                        / v.cast("double")))
         .otherwise(e_raw))
    return agg.select(*keys,
                      F.round(e, 0).cast("long").alias(count_col))


def hll_count(df: DataFrame, col: str, p: int = 12,
              by: list[str] | None = None,
              count_col: str = "approx_distinct") -> DataFrame:
    """Approximate COUNT(DISTINCT col) [GROUP BY ``by``] in two
    map-side-combined aggregations, ±1.04/sqrt(2^p) standard error.
    Groups whose every value is NULL do not appear (matching
    COUNT(DISTINCT) over an empty set being absent from a GROUP BY
    of the non-null rows)."""
    return hll_estimate(hll_registers(df, col, p, by), p, by,
                        count_col)


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005): mergeable frequency
# estimates with a one-sided error guarantee — the "how often does this
# URL/token/ngram occur" counter whose size is depth·width no matter how
# many billions of occurrences fed it.
# ---------------------------------------------------------------------------

def _cms_bucket(col: Column, row: int, width: int) -> Column:
    """Row ``row``'s bucket for a value — `dedup.seeded_bucket` with
    the row index as the seed."""
    return seeded_bucket(col, row, width).cast("int")


def cms_sketch(df: DataFrame, col: str, width: int = 1024,
               depth: int = 4, weight_col: str | None = None,
               by: list[str] | None = None) -> DataFrame:
    """Build a Count-Min sketch: (``by``..., ``cms_row``,
    ``cms_bucket``, ``cms_count``) — at most ``depth·width`` rows per
    group.  Estimates overcount by at most ``e·N/width`` with
    probability ``1 - e^-depth`` (N = total weight); never
    undercount.  ``weight_col`` counts each row with a weight
    (token counts, byte sizes); default 1 per row.  NULL values are
    skipped.

    Distributed shape: one explode (depth rows per input) + one
    map-side-combined aggregation on (group, row, bucket) — the
    sketch is a fixed-size frame, broadcastable into lookups, and
    :func:`cms_merge` (sum per cell) composes daily sketches
    losslessly."""
    keys = list(by or [])
    wgt = (F.col(weight_col).cast("long") if weight_col
           else F.lit(1).cast("long"))
    rows = F.array(*[
        F.struct(F.lit(r).alias("cms_row"),
                 _cms_bucket(F.col(col), r, width).alias("cms_bucket"))
        for r in range(int(depth))])
    return (df.filter(F.col(col).isNotNull())
            .select(*keys, wgt.alias("_w"), F.explode(rows).alias("_c"))
            .groupBy(*keys, F.col("_c.cms_row").alias("cms_row"),
                     F.col("_c.cms_bucket").alias("cms_bucket"))
            .agg(F.sum("_w").alias("cms_count")))


def cms_merge(*sketches: DataFrame,
              by: list[str] | None = None) -> DataFrame:
    """Sum per cell — CMS merge is lossless: the merged sketch equals
    the sketch of the concatenated inputs."""
    keys = list(by or [])
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionAll(s)
    return (out.groupBy(*keys, "cms_row", "cms_bucket")
            .agg(F.sum("cms_count").alias("cms_count")))


def cms_lookup(df: DataFrame, col: str, sketch: DataFrame,
               width: int = 1024, depth: int = 4,
               est_col: str = "est_count",
               by: list[str] | None = None) -> DataFrame:
    """Point-query a sketch: adds ``est_col`` = min over the depth
    rows (0 when any cell is empty — a value the sketch never saw).
    The sketch side BROADCASTS (it is depth·width rows per group by
    construction); the probe frame takes one explode + one
    re-aggregation on its own key, never a corpus-sized shuffle.
    (``width``/``depth`` must match the build — a mismatch probes a
    different sketch, same contract as `bloom_contains`.)

    ``by`` must match the build's grouping: a grouped sketch probed
    without its keys would min across every group's cells — neither
    a per-group nor a global answer."""
    keys = list(by or [])
    probes = (df.select(*keys, F.col(col).alias("_k"))
              .dropna(subset=["_k"]).distinct())
    ex = probes.select(*keys, "_k", F.explode(F.array(*[
        F.struct(F.lit(r).alias("cms_row"),
                 _cms_bucket(F.col("_k"), r, width)
                 .alias("cms_bucket"))
        for r in range(int(depth))])).alias("_c")) \
        .select(*keys, "_k", "_c.cms_row", "_c.cms_bucket")
    est = (ex.join(F.broadcast(sketch),
                   [*keys, "cms_row", "cms_bucket"], "left")
           .groupBy(*keys, "_k")
           .agg(F.min(F.coalesce(F.col("cms_count"), F.lit(0)))
                .alias(est_col)))
    cond = df[col] == est["_k"]
    for kcol in keys:
        cond = cond & (df[kcol] == est[kcol])
    # NULL keys never enter the probe frame; coalesce their join-back
    # miss to 0 per the docstring's "0 for a value the sketch never
    # saw" (NULLs are skipped at build time, so the sketch never saw
    # them) — the bloom_contains NULL-probes-False convention
    return (df.join(est, cond, "left")
            .drop(est["_k"], *[est[kcol] for kcol in keys])
            .withColumn(est_col, F.coalesce(F.col(est_col),
                                            F.lit(0).cast("long"))))


# ---------------------------------------------------------------------------
# KMV (k-minimum values) theta sketch (Bar-Yossef et al. 2002; the
# Datasketches theta family): distinct counting like HLL, but with SET
# OPERATIONS — two corpora's overlap estimated from two k-row sketches,
# no join of the corpora.
# ---------------------------------------------------------------------------

KMV_SPACE = float(1 << HASH_BITS)  # hash universe size (2^60)


def kmv_sketch(df: DataFrame, col: str, k: int = 256,
               by: list[str] | None = None) -> DataFrame:
    """The ``k`` smallest DISTINCT hash values per group, as
    (``by``..., ``kmv_h``) rows — ≤ k rows per group regardless of
    input size.  Deterministic (portable md5, no RNG), mergeable
    (:func:`kmv_merge`), and the sample is UNIFORM over the distinct
    values — which is what makes intersection estimates
    (:func:`kmv_overlap`) work where HLL cannot."""
    if int(k) < 2:
        raise ValueError("k must be >= 2")
    keys = list(by or [])
    hashes = (df.filter(F.col(col).isNotNull())
              .select(*keys, portable_hash(F.col(col).cast("string"))
                      .alias("kmv_h"))
              .distinct())
    return _k_smallest(hashes, k, keys)


def kmv_merge(*sketches: DataFrame, k: int,
              by: list[str] | None = None) -> DataFrame:
    """Union sketches: distinct hashes, keep the k smallest — the
    merged sketch equals the sketch of the concatenated inputs
    (lossless in the same sense as HLL's max-merge).

    ``k`` is REQUIRED and must equal the k the inputs were built
    with: merging k=128 sketches while keeping 256 values produces a
    sketch whose (k-1)/theta estimator is biased (the parameter is
    the sketch's identity — same contract as the Bloom/CMS sidecars).
    """
    keys = list(by or [])
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionAll(s)
    return _k_smallest(out.distinct(), k, keys)


def _k_smallest(hashes: DataFrame, k: int, keys: list) -> DataFrame:
    """k smallest kmv_h per group in TWO stages: a per-input-partition
    pre-prune bounds the final window's input at n_partitions·k rows —
    a single global-window pass with no partition keys would funnel
    EVERY distinct hash through one task (the pq_topk/sq_topk
    skew-free-rank pattern)."""
    w_local = (Window.partitionBy(*keys, "_pid")
               .orderBy(F.asc("kmv_h")))
    pruned = (hashes.withColumn("_pid", F.spark_partition_id())
              .withColumn("_rn", F.row_number().over(w_local))
              .filter(F.col("_rn") <= int(k)).drop("_pid", "_rn"))
    w = Window.partitionBy(*keys).orderBy(F.asc("kmv_h"))
    return (pruned.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= int(k)).drop("_rn"))


def kmv_estimate(sketch: DataFrame, k: int = 256,
                 by: list[str] | None = None,
                 count_col: str = "approx_distinct") -> DataFrame:
    """Per-group distinct estimates: EXACT when the group holds fewer
    than k distinct values (the sketch kept them all), else the
    unbiased ``(k-1)/theta_k`` with ``theta_k = h_k / 2^60``
    (standard error ~1/sqrt(k-2)).  Rounds to BIGINT."""
    keys = list(by or [])
    agg = (sketch.groupBy(*keys)
           .agg(F.count("*").alias("_n"),
                F.max("kmv_h").alias("_hk")))
    est = (F.when(F.col("_n") < int(k), F.col("_n").cast("double"))
           .otherwise(F.lit(float(int(k) - 1)) * F.lit(KMV_SPACE)
                      / F.col("_hk").cast("double")))
    return agg.select(*keys,
                      F.round(est, 0).cast("long").alias(count_col))


def kmv_overlap(a: DataFrame, b: DataFrame, k: int = 256,
                by: list[str] | None = None) -> DataFrame:
    """Set-operation estimates between two sketches (per group when
    ``by``): returns (``by``..., ``union_est``, ``jaccard``,
    ``intersection_est``) — the theta-sketch recipe: merge to the
    union's k smallest, count how many of those appear in BOTH
    inputs (an unbiased Jaccard estimate, round 6), scale by the
    union estimate (round to BIGINT).  The corpora never join — two
    k-row frames do."""
    keys = list(by or [])
    u = kmv_merge(a, b, k=k, by=by)
    ue = kmv_estimate(u, k=k, by=by, count_col="union_est")
    inter = (u.join(a, [*keys, "kmv_h"], "left_semi")
             .join(b, [*keys, "kmv_h"], "left_semi"))
    both = (u.groupBy(*keys).agg(F.count("*").alias("_nu"))
            .join(inter.groupBy(*keys).agg(F.count("*").alias("_nb")),
                  keys, "left") if keys else
            u.agg(F.count("*").alias("_nu")).crossJoin(
                inter.agg(F.count("*").alias("_nb"))))
    jac = (F.coalesce(F.col("_nb"), F.lit(0)).cast("double")
           / F.col("_nu"))
    out = (ue.join(both, keys) if keys else ue.crossJoin(both))
    return out.select(
        *keys, "union_est", F.round(jac, 6).alias("jaccard"),
        F.round(jac * F.col("union_est"), 0).cast("long")
        .alias("intersection_est"))


def cms_estimate_col(col: Column, sketch: DataFrame, width: int,
                     depth: int, df: DataFrame) -> DataFrame:
    """Attach the sketch's min-over-rows estimate to EVERY row of
    ``df`` as ``_cms_est`` — ``depth`` broadcast LEFT joins (the
    `bloom_contains` shape): a pure map-side annotation, no shuffle
    of ``df``."""
    out = df
    est = None
    for r in range(int(depth)):
        part = F.broadcast(
            sketch.filter(F.col("cms_row") == r)
            .select(F.col("cms_bucket").alias(f"_b{r}"),
                    F.col("cms_count").alias(f"_c{r}")))
        out = out.join(part,
                       _cms_bucket(col, r, width) == F.col(f"_b{r}"),
                       "left")
        c = F.coalesce(F.col(f"_c{r}"), F.lit(0))
        est = c if est is None else F.least(est, c)
    return (out.withColumn("_cms_est", est)
            .drop(*[f"_b{r}" for r in range(int(depth))],
                  *[f"_c{r}" for r in range(int(depth))]))


def cms_total(sketch: DataFrame) -> Column:
    """Aggregate expression for the sketch's total weight: every
    non-NULL input row adds its weight to exactly one counter per
    depth row, so the sum over any single depth row equals the total
    — use row 0.  Reading the total off an already-built sketch
    (depth·width rows) replaces a dedicated corpus COUNT pass when a
    threshold derives from the total (e.g. ``heavy_hitters`` at
    ``total // k``)."""
    return F.sum(F.when(F.col("cms_row") == 0, F.col("cms_count"))
                 .otherwise(F.lit(0).cast("long")))


def heavy_hitters(df: DataFrame, col: str, min_count: int,
                  width: int = 2048, depth: int = 4,
                  weight_col: str | None = None,
                  count_col: str = "n_count",
                  sketch: DataFrame | None = None) -> DataFrame:
    """EXACT heavy hitters (values with total weight >= min_count)
    found without ever shuffling the full key cardinality — the
    batch form of the classic CMS recipe:

    1. one pass builds the sketch (fixed depth×width frame);
    2. a map-side broadcast annotation keeps only rows whose
       estimate clears the threshold — CMS NEVER undercounts, so no
       true heavy hitter is dropped here, and at a selective
       threshold the survivors are a sliver of the corpus;
    3. an exact aggregation over the survivors discards the sketch's
       false candidates.

    Returns (col, count_col) with EXACT counts — approximate
    machinery, exact answer.  At 100 TB this is the "tokens/URLs
    occurring over N times" query without a 10-billion-key shuffle:
    only candidate-valued rows reach the exchange.

    ``sketch``: a prebuilt ``cms_sketch(df, col, width, depth,
    weight_col)`` frame — pass it when the caller already built (and
    materialized) the sketch, e.g. to derive the threshold from
    :func:`cms_total` without a separate corpus pass.  It must match
    ``width``/``depth``/``weight_col`` or the estimates probe a
    different sketch."""
    if sketch is None:
        # materialize: cms_estimate_col slices the sketch once per
        # depth row, and an unmaterialized plan would rebuild the
        # corpus-wide aggregation depth times
        sketch = cms_sketch(df, col, width, depth,
                            weight_col).localCheckpoint()
    wgt = (F.col(weight_col).cast("long") if weight_col
           else F.lit(1).cast("long"))
    cand = (cms_estimate_col(F.col(col), sketch, width, depth,
                             df.filter(F.col(col).isNotNull()))
            .filter(F.col("_cms_est") >= int(min_count)))
    return (cand.groupBy(col)
            .agg(F.sum(wgt).alias(count_col))
            .filter(F.col(count_col) >= int(min_count)))


# ---------------------------------------------------------------------------
# q-digest quantile sketch (Shrivastava et al. 2004): rank-error-bounded
# per-group quantiles over a bounded integer universe [0, 2^bits) —
# the mergeable percentile the data-card pass needs at 100 TB, where
# exact percentile() would buffer a group's values in one task.
#
# Why q-digest and not KLL/GK: the digest is a PURE FUNCTION of the
# value histogram — no randomness to derandomize, no arrival order —
# so the whole construction (bottom-up level-synchronous compression
# over the binary tree of value ranges) replays bit-exactly in any
# SQL engine, the same property that makes the HLL/CMS/KMV sketches
# oracle-checkable.  Rank error after compression is <= bits/k of the
# group's count (size <= ~3k nodes); merge = per-node count sum +
# recompress.  All arithmetic is integer.
#
# Node ids are heap numbers over the universe tree: root 1, the leaf
# for value v is 2^bits + v, parent(i) = i >> 1; a node at level l
# (= bit_length(id) - 1) covers 2^(bits-l) consecutive values.
# ---------------------------------------------------------------------------


def _qd_level(idc: Column) -> Column:
    """Tree level of a heap node id: bit_length - 1, computed as the
    binary-string length — exact integer arithmetic, and bin() emits
    no leading zeros in Spark or DuckDB (verified both), so the same
    expression replays in the oracle."""
    return (F.length(F.bin(idc)) - 1).cast("int")


def _qd_attach_n(nodes: DataFrame, keys: list) -> DataFrame:
    """Attach the group total ``_n`` (sum of counts — conserved by
    compression, so computable from any node frame).  Grouped: one
    window over the histogram-sized frame (NULL group keys partition
    natively).  Global: a 1-row broadcast cross join."""
    if keys:
        return nodes.withColumn(
            "_n", F.sum("qd_count").over(Window.partitionBy(*keys)))
    tot = nodes.agg(F.sum("qd_count").alias("_n"))
    return nodes.crossJoin(F.broadcast(tot))


#: universe cap for the one-pass grouped compressor: 2^20 leaf slots
#: bound a group's node frame to ~1M (id, count) rows = ~16 MB in one
#: task, comfortably vectorizable; wider universes keep the
#: distributed level loop (a 2^40 universe can carry more distinct
#: leaves than one task should hold)
_QD_NP_MAX_BITS = 20


def _qd_compress_arrays(ids, counts, k: int, bits: int):
    """The exact bottom-up merge rule over one group's (id, count)
    arrays, vectorized: per level, children sharing a parent merge
    into it when their sum plus the parent's own count is
    <= floor(n / k).  Bit-identical to the distributed level loop
    (pure integer arithmetic, same rule) — pinned by the qdigest
    property pytests against the brute-force reference."""
    import numpy as np

    ids = np.asarray(ids, dtype=np.int64)
    counts = np.asarray(counts, dtype=np.int64)
    if len(ids) == 0:
        return ids, counts
    # canonicalize duplicate ids (never produced by the callers, all
    # of which pre-aggregate; sum keeps the math identical if one
    # ever slips through)
    order = np.argsort(ids, kind="stable")
    ids, counts = ids[order], counts[order]
    uq, starts = np.unique(ids, return_index=True)
    if len(uq) != len(ids):
        counts = np.add.reduceat(counts, starts)
        ids = uq
    t = int(counts.sum()) // int(k)
    for lvl in range(int(bits), 0, -1):
        lo = np.int64(1) << lvl
        m = (ids >= lo) & (ids < 2 * lo)
        if not m.any():
            continue
        ch_ids, ch_cnt = ids[m], counts[m]
        ot_ids, ot_cnt = ids[~m], counts[~m]
        p = ch_ids >> 1
        po = np.argsort(p, kind="stable")
        ps, cs, cids = p[po], ch_cnt[po], ch_ids[po]
        uqp, st = np.unique(ps, return_index=True)
        s = np.add.reduceat(cs, st)
        # the parent's own count, when that node already exists
        pm = (ot_ids >= (lo >> 1)) & (ot_ids < lo)
        par_ids, par_cnt = ot_ids[pm], ot_cnt[pm]
        if len(par_ids):
            so = np.argsort(par_ids)
            spar, sparc = par_ids[so], par_cnt[so]
            pos = np.searchsorted(spar, uqp)
            safe = np.minimum(pos, len(spar) - 1)
            has = spar[safe] == uqp
            cp = np.where(has, sparc[safe], 0)
        else:
            cp = np.zeros(len(uqp), dtype=np.int64)
        tot = s + cp
        merge = tot <= t
        if not merge.any():
            continue
        # children of merged parents disappear; merged parents'
        # existing rows are replaced by (parent, tot)
        child_merged = merge[np.searchsorted(uqp, ps)]
        keep_ot = ~(pm & np.isin(ot_ids, uqp[merge]))
        ids = np.concatenate([ot_ids[keep_ot], uqp[merge],
                              cids[~child_merged]])
        counts = np.concatenate([ot_cnt[keep_ot], tot[merge],
                                 cs[~child_merged]])
    return ids, counts


def _qd_compress_np(nodes: DataFrame, k: int, bits: int,
                    keys: list) -> DataFrame:
    """One-pass grouped compression: ONE shuffle on the group keys,
    then `_qd_compress_arrays` per group inside applyInPandas.  The
    r16 level loop chained ``bits`` histogram-sized aggregations (a
    groupBy + three-branch union + plan barrier per level — 20-40
    dependent stages of a tiny frame whose cost is pure scheduling
    latency, ~2 s per digest read at any data size).  The group frame
    is bounded by min(distinct values, 2^bits) rows, so the Python
    boundary carries histogram-sized data only (guide §1.2 step 1 /
    §4.2); `_QD_NP_MAX_BITS` caps the universe this path accepts."""
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [nodes.schema[kk] for kk in keys]
        + [StructField("qd_id", LongType()),
           StructField("qd_count", LongType())])
    kk_names = list(keys)
    ki, bi = int(k), int(bits)

    def _fn(pdf: "pd.DataFrame") -> "pd.DataFrame":
        rids, rcnt = _qd_compress_arrays(
            pdf["qd_id"].to_numpy(), pdf["qd_count"].to_numpy(),
            ki, bi)
        out = pd.DataFrame({"qd_id": rids, "qd_count": rcnt})
        for kk in kk_names:
            out.insert(len(out.columns) - 2, kk,
                       pdf[kk].iloc[0] if len(pdf) else None)
        return out[kk_names + ["qd_id", "qd_count"]]

    grouped = nodes.groupBy(*kk_names) if kk_names else nodes.groupBy()
    # plan barrier on the result, like the level loop's trailing one:
    # multi-action consumers must not re-run the per-group compression
    return grouped.applyInPandas(_fn, schema=out_schema) \
        .transform(plan_barrier)


def _qd_compress(nodes: DataFrame, k: int, bits: int, keys: list,
                 fresh: bool) -> DataFrame:
    """Bottom-up level-synchronous q-digest compression: for each
    level L from the leaves up, children sharing a parent merge into
    it when their combined count (plus the parent's own, when one
    exists) is <= floor(n / k).

    Universes up to 2^`_QD_NP_MAX_BITS` take the ONE-PASS grouped
    path (`_qd_compress_np` — one shuffle + a vectorized per-group
    merge; the r17 optimization).  Wider universes keep the
    distributed level loop below: ``fresh=True`` skips the parent
    lookup — a frame that is all leaves (a new histogram, or summed
    stored leaf frames) can never meet a pre-existing parent, which
    keeps the build path join-free.  Each pass is a histogram-sized
    aggregation and references the running frame several times, so
    the frame MUST ``localCheckpoint`` every pass: un-materialized,
    each reference duplicates the subtree and the plan grows ~9x per
    level (reproduced as an analyzer OutOfMemoryError at 8 levels —
    the pagerank superstep lesson, sharpened).  ``eager=False`` (r16
    optimization round) keeps the same plan truncation but defers
    materialization into the consuming job — the ``bits`` dedicated
    per-level jobs collapse into the caller's one action."""
    if int(bits) <= _QD_NP_MAX_BITS:
        return _qd_compress_np(nodes, k, bits, keys)
    cur = _qd_attach_n(nodes, keys)
    t = F.expr(f"_n div {int(k)}")
    cols = [*keys, "qd_id", "qd_count", "_n"]
    for lvl in range(int(bits), 0, -1):
        lo = 1 << lvl
        is_child = (F.col("qd_id") >= lo) & (F.col("qd_id") < 2 * lo)
        ch = (cur.filter(is_child)
              .select(*keys, "_n",
                      F.shiftright(F.col("qd_id"), 1).alias("_p"),
                      F.struct("qd_id", "qd_count").alias("_c")))
        g = (ch.groupBy(*keys, "_p")
             .agg(F.min("_n").alias("_n"),
                  F.sum("_c.qd_count").alias("_s"),
                  F.collect_list("_c").alias("_ch")))
        if fresh:
            rest = cur.filter(~is_child).select(*cols)
            merged = (g.filter(F.col("_s") <= t)
                      .select(*keys, F.col("_p").alias("qd_id"),
                              F.col("_s").alias("qd_count"), "_n"))
            kept = (g.filter(F.col("_s") > t)
                    .select(*keys, "_n", F.explode("_ch").alias("_c"))
                    .select(*keys, F.col("_c.qd_id").alias("qd_id"),
                            F.col("_c.qd_count").alias("qd_count"),
                            "_n"))
            cur = rest.unionByName(merged).unionByName(kept)
        else:
            is_par = ((F.col("qd_id") >= lo >> 1)
                      & (F.col("qd_id") < lo))
            rest = cur.filter(~is_child & ~is_par).select(*cols)
            par = cur.filter(is_par).select(
                *keys, F.col("qd_id").alias("_p"),
                F.col("qd_count").alias("_cp"),
                F.col("_n").alias("_pn"))
            j = g.join(par, [*keys, "_p"], "full_outer")
            nn = F.coalesce(F.col("_n"), F.col("_pn"))
            tot = (F.coalesce(F.col("_s"), F.lit(0))
                   + F.coalesce(F.col("_cp"), F.lit(0)))
            tj = F.expr(f"coalesce(_n, _pn) div {int(k)}")
            merged = (j.filter(tot <= tj)
                      .select(*keys, F.col("_p").alias("qd_id"),
                              tot.alias("qd_count"), nn.alias("_n")))
            keptc = (j.filter((tot > tj) & F.col("_s").isNotNull())
                     .select(*keys, nn.alias("_n"),
                             F.explode("_ch").alias("_c"))
                     .select(*keys, F.col("_c.qd_id").alias("qd_id"),
                             F.col("_c.qd_count").alias("qd_count"),
                             "_n"))
            keptp = (j.filter((tot > tj)
                              & (F.coalesce(F.col("_cp"), F.lit(0))
                                 > 0))
                     .select(*keys, F.col("_p").alias("qd_id"),
                             F.col("_cp").alias("qd_count"),
                             nn.alias("_n")))
            cur = (rest.unionByName(merged).unionByName(keptc)
                   .unionByName(keptp))
        cur = cur.transform(plan_barrier)
    return cur.select(*keys, "qd_id",
                      F.col("qd_count").cast("long").alias("qd_count")
                      ).transform(plan_barrier)


def qd_sketch(df: DataFrame, col: str, k: int = 512, bits: int = 20,
              weight_col: str | None = None,
              by: list[str] | None = None) -> DataFrame:
    """Build a q-digest over an integer column: rows (``by``...,
    ``qd_id``, ``qd_count``), at most ~3k nodes per group.  Values
    must lie in [0, 2^bits) — out-of-universe values raise (scale the
    column first; clamping would silently corrupt tails).  NULLs are
    skipped; ``weight_col`` counts each row with an integer weight.

    Distributed shape: ONE corpus pass (the map-side-combined value
    histogram — the only corpus-sized work), then ``bits``
    histogram-sized compression passes.  When floor(n/k) = 0 the
    digest IS the exact histogram and quantiles are exact."""
    if int(k) < 1:
        raise ValueError("k must be >= 1")
    keys = list(by or [])
    hist = _qd_leaves(df, col, bits, weight_col, keys)
    return _qd_compress(hist, k, bits, keys, fresh=True)


def _qd_leaves(df: DataFrame, col: str, bits: int,
               weight_col: str | None, keys: list) -> DataFrame:
    """The exact leaf histogram as q-digest leaf nodes — one
    map-side-combined aggregation, the only corpus-sized work of a
    digest build and the LOSSLESS persistable form the streaming
    ingester appends (sum-mergeable; compress at read)."""
    if int(bits) < 1 or int(bits) > 40:
        raise ValueError("bits must be in [1, 40]")
    v = F.col(col).cast("long")
    lim = 1 << int(bits)
    wgt = (F.col(weight_col).cast("long") if weight_col
           else F.lit(1).cast("long"))
    # the assert rides INSIDE the id expression so column pruning
    # cannot drop it: on valid input it contributes coalesce(NULL, 0)
    guard = F.coalesce(
        F.assert_true((v >= 0) & (v < F.lit(lim)),
                      f"qd_sketch: {col} outside [0, 2^{bits})")
        .cast("long"), F.lit(0))
    return (df.filter(v.isNotNull())
            .select(*keys, (v + F.lit(lim) + guard).alias("qd_id"),
                    wgt.alias("_w"))
            .groupBy(*keys, "qd_id")
            .agg(F.sum("_w").alias("qd_count")))


def qd_merge(*sketches: DataFrame, k: int, bits: int,
             by: list[str] | None = None) -> DataFrame:
    """Merge digests: per-node count sum, then recompress.  ``k`` and
    ``bits`` are REQUIRED and must equal the build parameters (the
    `kmv_merge` lesson — they are the sketch's identity).  Counts are
    conserved, so totals and therefore thresholds are those of the
    combined data; rank error stays <= bits/k of the combined count.
    NULL ``by`` group keys are unsupported here (the recompression
    parent join is NULL-strict; the build path has no such limit)."""
    keys = list(by or [])
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionAll(s)
    summed = (out.groupBy(*keys, "qd_id")
              .agg(F.sum("qd_count").alias("qd_count")))
    return _qd_compress(summed, k, bits, keys, fresh=False)


def qd_quantiles(sketch: DataFrame, qs: list[float], bits: int,
                 by: list[str] | None = None, q_col: str = "q",
                 value_col: str = "quantile") -> DataFrame:
    """Query a digest for quantiles: one row per (group, q) with the
    classic q-digest rank selection — nodes sorted by (upper bound
    asc, deeper first), cumulative counts, the answer is the smallest
    upper bound whose cumulative count reaches ceil(q*n) (floored at
    rank 1).  On an uncompressed digest this is the exact quantile.
    The rank arithmetic (IEEE double q*n then ceil) is identical in
    Spark and DuckDB, so results replicate bit-for-bit."""
    keys = list(by or [])
    lvl = _qd_level(F.col("qd_id"))
    span = F.pow(F.lit(2.0), F.lit(int(bits)) - lvl).cast("long")
    ub = ((F.col("qd_id")
           - F.pow(F.lit(2.0), lvl.cast("double")).cast("long")
           + 1) * span - 1)
    base = sketch.select(*keys, ub.alias("_ub"), lvl.alias("_lvl"),
                         "qd_count")
    w = (Window.partitionBy(*keys)
         .orderBy(F.col("_ub").asc(), F.col("_lvl").desc())
         .rowsBetween(Window.unboundedPreceding, 0))
    wn = Window.partitionBy(*keys)
    c = base.select(*keys, "_ub",
                    F.sum("qd_count").over(w).alias("_cum"),
                    F.sum("qd_count").over(wn).alias("_nn"))
    spark = sketch.sparkSession
    qf = spark.createDataFrame([(float(q),) for q in qs],
                               f"{q_col} double")
    return (c.crossJoin(F.broadcast(qf))
            .withColumn("_rank",
                        F.greatest(F.lit(1).cast("long"),
                                   F.ceil(F.col(q_col)
                                          * F.col("_nn"))))
            .filter(F.col("_cum") >= F.col("_rank"))
            .groupBy(*keys, q_col)
            .agg(F.min("_ub").cast("long").alias(value_col)))
