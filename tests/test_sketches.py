"""HyperLogLog sketches (operators/sketches.py): bit-exact register
replica, estimator accuracy vs the published error bound, lossless
merge."""

from __future__ import annotations

import hashlib
import math

import pytest


def _h60(v):
    return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)


def _brute_registers(values, p):
    wbits = 60 - p
    regs = {}
    for v in values:
        if v is None:
            continue
        h = _h60(v)
        idx = h >> wbits
        rest = h & ((1 << wbits) - 1)
        rho = wbits + 1 if rest == 0 else wbits + 1 - rest.bit_length()
        regs[idx] = max(regs.get(idx, 0), rho)
    return regs


def _brute_estimate(regs, p):
    m = 1 << p
    scale = 60 - p + 1
    zs = sum(1 << (scale - r) for r in regs.values())
    v = m - len(regs)
    z = float(zs + v * (1 << scale)) / float(1 << scale)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / z
    if e <= 2.5 * m and v > 0:
        e = m * math.log(m / float(v))
    return e


class TestHll:
    def test_registers_match_brute_force(self, spark):
        from dask_geopandas_spark.operators.sketches import hll_registers

        vals = [f"url-{i % 700}" for i in range(2000)] + [None]
        df = spark.createDataFrame([(v,) for v in vals], "url string")
        got = {r["hll_idx"]: r["hll_rho"] for r in
               hll_registers(df, "url", p=10).collect()}
        assert got == _brute_registers(vals, 10)

    def test_estimate_within_error_bound(self, spark):
        from dask_geopandas_spark.operators.sketches import hll_count

        for n in (50, 1000, 20000):
            df = spark.range(n).selectExpr(
                "concat('item-', id) AS item")
            got = hll_count(df, "item", p=12).head()["approx_distinct"]
            # 5 sigma of the published 1.04/sqrt(m) standard error
            tol = 5 * 1.04 / math.sqrt(4096)
            assert abs(got - n) <= max(2, tol * n), (n, got)

    def test_estimate_matches_brute_replica_exactly(self, spark):
        from dask_geopandas_spark.operators.sketches import hll_count

        vals = [f"k{i % 333}" for i in range(999)]
        df = spark.createDataFrame([(v,) for v in vals], "k string")
        got = hll_count(df, "k", p=9).head()["approx_distinct"]
        want = round(_brute_estimate(_brute_registers(vals, 9), 9))
        assert got == want

    def test_grouped_and_all_null_group_absent(self, spark):
        from dask_geopandas_spark.operators.sketches import hll_count

        rows = [("a", f"x{i % 40}") for i in range(200)] \
            + [("b", f"y{i}") for i in range(10)] + [("c", None)]
        df = spark.createDataFrame(rows, "g string, v string")
        got = {r["g"]: r["approx_distinct"] for r in
               hll_count(df, "v", p=12, by=["g"]).collect()}
        assert set(got) == {"a", "b"}          # all-NULL group absent
        assert abs(got["a"] - 40) <= 5 and abs(got["b"] - 10) <= 2

    def test_merge_is_lossless(self, spark):
        from dask_geopandas_spark.operators.sketches import (
            hll_estimate, hll_merge, hll_registers)

        day1 = spark.range(600).selectExpr("concat('u', id) AS u")
        day2 = spark.range(400, 1100).selectExpr("concat('u', id) AS u")
        both = day1.unionAll(day2)
        merged = hll_merge(hll_registers(day1, "u", p=11),
                           hll_registers(day2, "u", p=11))
        direct = hll_registers(both, "u", p=11)
        assert sorted(map(tuple, merged.collect())) == \
            sorted(map(tuple, direct.collect()))
        est = hll_estimate(merged, p=11).head()["approx_distinct"]
        assert abs(est - 1100) <= 1100 * 5 * 1.04 / math.sqrt(2048)

    def test_precision_bounds(self, spark):
        from dask_geopandas_spark.operators.sketches import hll_count

        df = spark.range(5).selectExpr("cast(id as string) AS s")
        with pytest.raises(ValueError):
            hll_count(df, "s", p=6)
        with pytest.raises(ValueError):
            hll_count(df, "s", p=17)
