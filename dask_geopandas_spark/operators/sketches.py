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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import portable_hash

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
    agg = (registers.groupBy(*keys)
           .agg(F.sum(unit).alias("_zs"),
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
