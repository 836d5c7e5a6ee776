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

    def test_global_empty_input_estimates_zero(self, spark):
        """by=None over an empty / all-NULL input: the keyless
        groupBy's single row must estimate 0, not NULL (r12 advisor
        finding — the NULL harmonic sum used to propagate)."""
        from dask_geopandas_spark.operators.sketches import hll_count

        for rows in ([], [(None,)]):
            df = spark.createDataFrame(rows, "v string")
            got = hll_count(df, "v", p=12).collect()
            assert [r["approx_distinct"] for r in got] == [0]

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


def _cms_bucket_py(v, r, width):
    return _h60(f"{r}:{v}") % width


def _brute_cms(pairs, width, depth):
    """pairs: (value, weight) -> {(row, bucket): count}"""
    cells = {}
    for v, w in pairs:
        if v is None:
            continue
        for r in range(depth):
            key = (r, _cms_bucket_py(v, r, width))
            cells[key] = cells.get(key, 0) + w
    return cells


class TestCms:
    def test_sketch_matches_brute_force(self, spark):
        from dask_geopandas_spark.operators.sketches import cms_sketch

        vals = [f"t{i % 37}" for i in range(500)] + [None]
        df = spark.createDataFrame([(v,) for v in vals], "t string")
        got = {(r["cms_row"], r["cms_bucket"]): r["cms_count"]
               for r in cms_sketch(df, "t", width=64, depth=3).collect()}
        assert got == _brute_cms([(v, 1) for v in vals], 64, 3)

    def test_never_undercounts_and_exact_when_wide(self, spark):
        from dask_geopandas_spark.operators.sketches import (cms_lookup,
                                                             cms_sketch)
        from collections import Counter

        vals = [f"w{i % 25}" for i in range(400)]
        true = Counter(vals)
        df = spark.createDataFrame([(v,) for v in vals], "w string")
        # narrow sketch: one-sided error
        narrow = cms_sketch(df, "w", width=16, depth=4)
        got = {r["w"]: r["est_count"] for r in
               cms_lookup(df.distinct(), "w", narrow, width=16,
                          depth=4).collect()}
        assert all(got[v] >= c for v, c in true.items())
        # wide sketch: 25 keys in 4096 buckets x 4 rows -> exact
        wide = cms_sketch(df, "w", width=4096, depth=4)
        got = {r["w"]: r["est_count"] for r in
               cms_lookup(df.distinct(), "w", wide, width=4096,
                          depth=4).collect()}
        assert got == dict(true)

    def test_unseen_value_estimates_zero_on_wide(self, spark):
        from dask_geopandas_spark.operators.sketches import (cms_lookup,
                                                             cms_sketch)

        df = spark.createDataFrame([("a",), ("b",)], "v string")
        sk = cms_sketch(df, "v", width=4096, depth=4)
        probe = spark.createDataFrame([("zebra",)], "v string")
        got = cms_lookup(probe, "v", sk, width=4096,
                         depth=4).head()["est_count"]
        assert got == 0

    def test_null_key_estimates_zero(self, spark):
        """NULL keys are skipped at build time, so a NULL probe row
        gets est 0 — not NULL from the join-back miss (r12 advisor
        finding; the bloom_contains NULL-probes-False convention)."""
        from dask_geopandas_spark.operators.sketches import (cms_lookup,
                                                             cms_sketch)

        df = spark.createDataFrame([("a",), ("a",), ("b",)], "v string")
        sk = cms_sketch(df, "v", width=1024, depth=4)
        probe = spark.createDataFrame([(1, "a"), (2, None)],
                                      "doc_id long, v string")
        got = {r["doc_id"]: r["est_count"] for r in
               cms_lookup(probe, "v", sk, width=1024,
                          depth=4).collect()}
        assert got == {1: 2, 2: 0}

    def test_weighted_and_merge_lossless(self, spark):
        from dask_geopandas_spark.operators.sketches import (cms_merge,
                                                             cms_sketch)

        d1 = spark.createDataFrame([("x", 3), ("y", 2)],
                                   "v string, n long")
        d2 = spark.createDataFrame([("x", 5), ("z", 1)],
                                   "v string, n long")
        merged = cms_merge(cms_sketch(d1, "v", 128, 3, "n"),
                           cms_sketch(d2, "v", 128, 3, "n"))
        direct = cms_sketch(d1.unionAll(d2), "v", 128, 3, "n")
        assert sorted(map(tuple, merged.collect())) == \
            sorted(map(tuple, direct.collect()))


class TestStreamingHll:
    """Incremental HLL counter (streaming/indexing.py): batch-boundary
    invisibility, marker replay skip, idempotence under unguarded
    re-append, algebraic compaction."""

    def _day(self, spark, lo, hi):
        return spark.range(lo, hi).selectExpr(
            "concat('u', id % 800) AS u",
            "concat('s', id % 3) AS g")

    def test_batches_equal_direct_and_replay_skips(self, spark,
                                                   tmp_path):
        from dask_geopandas_spark.operators.sketches import hll_count
        from dask_geopandas_spark.streaming.indexing import (
            hll_count_stored, ingest_hll_batch)

        base = str(tmp_path / "hll")
        d1, d2 = self._day(spark, 0, 600), self._day(spark, 400, 1000)
        assert ingest_hll_batch(d1, base, "u", p=11, by=["g"],
                                batch_id=0)
        assert ingest_hll_batch(d2, base, "u", p=11, by=["g"],
                                batch_id=1)
        got = {r["g"]: r["approx_distinct"] for r in
               hll_count_stored(spark, base, p=11, by=["g"]).collect()}
        want = {r["g"]: r["approx_distinct"] for r in
                hll_count(d1.unionAll(d2), "u", p=11,
                          by=["g"]).collect()}
        assert got == want
        # replay with the same batch_id is skipped
        assert not ingest_hll_batch(d1, base, "u", p=11, by=["g"],
                                    batch_id=0)
        assert {r["g"]: r["approx_distinct"] for r in
                hll_count_stored(spark, base, p=11,
                                 by=["g"]).collect()} == want

    def test_unguarded_reappend_is_absorbed(self, spark, tmp_path):
        """The algebra claim: a torn/replayed append WITHOUT a marker
        changes nothing — max-merge absorbs duplicate registers."""
        from dask_geopandas_spark.streaming.indexing import (
            hll_count_stored, ingest_hll_batch)

        base = str(tmp_path / "hll2")
        d = self._day(spark, 0, 500)
        ingest_hll_batch(d, base, "u", p=10)
        before = hll_count_stored(spark, base, p=10).head()
        ingest_hll_batch(d, base, "u", p=10)      # no batch_id: re-runs
        after = hll_count_stored(spark, base, p=10).head()
        assert before["approx_distinct"] == after["approx_distinct"]

    def test_compaction_shrinks_and_preserves(self, spark, tmp_path):
        from dask_geopandas_spark.streaming.indexing import (
            compact_hll_stored, hll_count_stored, ingest_hll_batch)

        base = str(tmp_path / "hll3")
        for i in range(4):
            ingest_hll_batch(self._day(spark, i * 200, (i + 1) * 300),
                             base, "u", p=10, batch_id=i)
        before_rows = spark.read.parquet(base + "/registers").count()
        want = hll_count_stored(spark, base, p=10).head()
        compact_hll_stored(spark, base)
        after_rows = spark.read.parquet(base + "/registers").count()
        assert after_rows < before_rows
        got = hll_count_stored(spark, base, p=10).head()
        assert got["approx_distinct"] == want["approx_distinct"]

    def test_streaming_availablenow(self, spark, tmp_path):
        from dask_geopandas_spark.operators.sketches import hll_count
        from dask_geopandas_spark.streaming.indexing import (
            hll_count_stored, streaming_ingest_hll)
        import os
        import time as _t

        base = str(tmp_path / "hll4")
        d1, d2 = self._day(spark, 0, 400), self._day(spark, 300, 900)
        d1.coalesce(1).write.parquet(base + "/src/f0")
        d2.coalesce(1).write.parquet(base + "/src/f1")
        now = 1_700_000_000
        for i, dname in enumerate(("f0", "f1")):
            for fn in os.listdir(f"{base}/src/{dname}"):
                os.utime(f"{base}/src/{dname}/{fn}",
                         (now + i, now + i))
        stream = (spark.readStream.schema("u string, g string")
                  .option("maxFilesPerTrigger", "1")
                  .parquet(base + "/src/f*"))
        q = (streaming_ingest_hll(stream, base + "/sk", "u", p=11,
                                  by=["g"], compact_every=2)
             .option("checkpointLocation", base + "/ckpt")
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = {r["g"]: r["approx_distinct"] for r in
               hll_count_stored(spark, base + "/sk", p=11,
                                by=["g"]).collect()}
        want = {r["g"]: r["approx_distinct"] for r in
                hll_count(d1.unionAll(d2), "u", p=11,
                          by=["g"]).collect()}
        assert got == want


class TestStreamingKmv:
    """Incremental KMV store (streaming/indexing.py, r14 — the last
    sketch without one): batch-boundary invisibility, k-identity
    sidecar pin, idempotence under unguarded re-append, algebraic
    compaction, availableNow end-to-end."""

    def _day(self, spark, lo, hi):
        return spark.range(lo, hi).selectExpr(
            "concat('u', id % 700) AS u",
            "concat('s', id % 3) AS g")

    def test_batches_equal_direct_and_replay_skips(self, spark,
                                                   tmp_path):
        from dask_geopandas_spark.operators.sketches import (
            kmv_estimate, kmv_sketch)
        from dask_geopandas_spark.streaming.indexing import (
            ingest_kmv_batch, kmv_estimate_stored)

        base = str(tmp_path / "kmv")
        d1, d2 = self._day(spark, 0, 500), self._day(spark, 350, 900)
        assert ingest_kmv_batch(d1, base, "u", k=64, by=["g"],
                                batch_id=0)
        assert ingest_kmv_batch(d2, base, "u", k=64, by=["g"],
                                batch_id=1)
        got = {r["g"]: r["approx_distinct"] for r in
               kmv_estimate_stored(spark, base, by=["g"]).collect()}
        want = {r["g"]: r["approx_distinct"] for r in
                kmv_estimate(kmv_sketch(d1.unionAll(d2), "u", 64,
                                        by=["g"]),
                             64, by=["g"]).collect()}
        assert got == want
        assert not ingest_kmv_batch(d1, base, "u", k=64, by=["g"],
                                    batch_id=0)  # replay skipped
        assert {r["g"]: r["approx_distinct"] for r in
                kmv_estimate_stored(spark, base,
                                    by=["g"]).collect()} == want

    def test_k_is_identity(self, spark, tmp_path):
        from dask_geopandas_spark.streaming.indexing import (
            ingest_kmv_batch, kmv_estimate_stored)

        base = str(tmp_path / "kmv2")
        d = self._day(spark, 0, 300)
        ingest_kmv_batch(d, base, "u", k=64)
        with pytest.raises(ValueError, match="identity"):
            ingest_kmv_batch(d, base, "u", k=128)
        # reader takes k from the sidecar, no k argument to drift
        assert kmv_estimate_stored(spark, base).head() is not None

    def test_unguarded_reappend_is_absorbed(self, spark, tmp_path):
        from dask_geopandas_spark.streaming.indexing import (
            ingest_kmv_batch, kmv_estimate_stored)

        base = str(tmp_path / "kmv3")
        d = self._day(spark, 0, 400)
        ingest_kmv_batch(d, base, "u", k=64)
        before = kmv_estimate_stored(spark, base).head()
        ingest_kmv_batch(d, base, "u", k=64)  # no batch_id: re-runs
        after = kmv_estimate_stored(spark, base).head()
        assert before["approx_distinct"] == after["approx_distinct"]

    def test_sidecar_written_atomically(self, spark, tmp_path):
        """r15 (r14 ADVICE): the _kmv.json identity sidecar lands via
        temp-name + rename, so a crash mid-write can never leave a
        torn sidecar that turns every later read into a JSON parse
        error — after ingest the final name parses and no .tmp
        residue remains."""
        import glob
        import json

        from dask_geopandas_spark.streaming.indexing import \
            ingest_kmv_batch

        base = str(tmp_path / "kmv_atomic")
        ingest_kmv_batch(self._day(spark, 0, 100), base, "u", k=64)
        with open(base + "/_kmv.json") as f:
            assert json.load(f) == {"k": 64}
        assert glob.glob(base + "/*.tmp") == []

    def test_write_atomic_helper(self, tmp_path):
        """write_atomic: whole-file visibility (content exact, temp
        name cleaned up) and overwrite-in-place semantics."""
        import os

        from dask_geopandas_spark.sources.fs import write_atomic

        p = str(tmp_path / "side.json")
        write_atomic(p, b'{"a": 1}')
        assert open(p, "rb").read() == b'{"a": 1}'
        write_atomic(p, b'{"a": 2}')
        assert open(p, "rb").read() == b'{"a": 2}'
        assert not os.path.exists(p + ".tmp")

    def test_compaction_shrinks_and_preserves(self, spark, tmp_path):
        from dask_geopandas_spark.streaming.indexing import (
            compact_kmv_stored, ingest_kmv_batch, kmv_estimate_stored)

        base = str(tmp_path / "kmv4")
        for i in range(4):
            ingest_kmv_batch(self._day(spark, i * 150, (i + 1) * 250),
                             base, "u", k=64, batch_id=i)
        before_rows = spark.read.parquet(base + "/hashes").count()
        want = kmv_estimate_stored(spark, base).head()
        compact_kmv_stored(spark, base)
        after_rows = spark.read.parquet(base + "/hashes").count()
        assert after_rows < before_rows
        got = kmv_estimate_stored(spark, base).head()
        assert got["approx_distinct"] == want["approx_distinct"]

    def test_stored_sketch_feeds_overlap(self, spark, tmp_path):
        from dask_geopandas_spark.operators.sketches import (
            kmv_overlap, kmv_sketch)
        from dask_geopandas_spark.streaming.indexing import (
            ingest_kmv_batch, kmv_sketch_stored)

        base = str(tmp_path / "kmv5")
        d1 = self._day(spark, 0, 500)
        ingest_kmv_batch(d1, base, "u", k=64, batch_id=0)
        other = kmv_sketch(self._day(spark, 250, 700), "u", 64)
        via_store = kmv_overlap(kmv_sketch_stored(spark, base),
                                other, k=64).head()
        direct = kmv_overlap(kmv_sketch(d1, "u", 64), other,
                             k=64).head()
        assert tuple(via_store) == tuple(direct)

    def test_streaming_availablenow(self, spark, tmp_path):
        import os

        from dask_geopandas_spark.operators.sketches import (
            kmv_estimate, kmv_sketch)
        from dask_geopandas_spark.streaming.indexing import (
            kmv_estimate_stored, streaming_ingest_kmv)

        base = str(tmp_path / "kmv6")
        d1, d2 = self._day(spark, 0, 400), self._day(spark, 300, 800)
        d1.coalesce(1).write.parquet(base + "/src/f0")
        d2.coalesce(1).write.parquet(base + "/src/f1")
        now = 1_700_000_000
        for i, dname in enumerate(("f0", "f1")):
            for fn in os.listdir(f"{base}/src/{dname}"):
                os.utime(f"{base}/src/{dname}/{fn}",
                         (now + i, now + i))
        stream = (spark.readStream.schema("u string, g string")
                  .option("maxFilesPerTrigger", "1")
                  .parquet(base + "/src/f*"))
        q = (streaming_ingest_kmv(stream, base + "/sk", "u", k=64,
                                  by=["g"], compact_every=2)
             .option("checkpointLocation", base + "/ckpt")
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = {r["g"]: r["approx_distinct"] for r in
               kmv_estimate_stored(spark, base + "/sk",
                                   by=["g"]).collect()}
        want = {r["g"]: r["approx_distinct"] for r in
                kmv_estimate(kmv_sketch(d1.unionAll(d2), "u", 64,
                                        by=["g"]),
                             64, by=["g"]).collect()}
        assert got == want


class TestKmv:
    """KMV theta sketch: exact below k, unbiased (k-1)/theta above,
    lossless merge, set-operation estimates."""

    def test_sketch_matches_brute_and_exact_below_k(self, spark):
        from dask_geopandas_spark.operators.sketches import (
            kmv_estimate, kmv_sketch)

        vals = [f"v{i % 100}" for i in range(500)]
        df = spark.createDataFrame([(v,) for v in vals], "v string")
        sk = kmv_sketch(df, "v", k=64)
        want = sorted({_h60(f"v{i}") for i in range(100)})[:64]
        assert sorted(r["kmv_h"] for r in sk.collect()) == want
        # below k -> exact
        small = spark.createDataFrame([(f"x{i}",) for i in range(30)],
                                      "v string")
        est = kmv_estimate(kmv_sketch(small, "v", k=64),
                           k=64).head()["approx_distinct"]
        assert est == 30

    def test_estimate_accuracy_and_merge(self, spark):
        from dask_geopandas_spark.operators.sketches import (
            kmv_estimate, kmv_merge, kmv_sketch)
        import math

        n = 20000
        df = spark.range(n).selectExpr("concat('u', id) AS v")
        k = 256
        est = kmv_estimate(kmv_sketch(df, "v", k=k),
                           k=k).head()["approx_distinct"]
        assert abs(est - n) <= 5 * n / math.sqrt(k - 2)
        # merge == direct
        d1 = spark.range(0, 12000).selectExpr("concat('u', id) AS v")
        d2 = spark.range(8000, 20000).selectExpr("concat('u', id) AS v")
        merged = kmv_merge(kmv_sketch(d1, "v", k=k),
                           kmv_sketch(d2, "v", k=k), k=k)
        direct = kmv_sketch(df, "v", k=k)
        assert sorted(r["kmv_h"] for r in merged.collect()) == \
            sorted(r["kmv_h"] for r in direct.collect())

    def test_overlap_estimates(self, spark):
        from dask_geopandas_spark.operators.sketches import (
            kmv_overlap, kmv_sketch)

        # |A|=6000, |B|=6000, |A∩B|=2000, |A∪B|=10000, J=0.2
        a = spark.range(0, 6000).selectExpr("concat('u', id) AS v")
        b = spark.range(4000, 10000).selectExpr("concat('u', id) AS v")
        k = 512
        row = kmv_overlap(kmv_sketch(a, "v", k=k),
                          kmv_sketch(b, "v", k=k), k=k).head()
        assert abs(row["union_est"] - 10000) <= 1500
        assert abs(row["jaccard"] - 0.2) <= 0.07
        assert abs(row["intersection_est"] - 2000) <= 700

    def test_merge_requires_k(self, spark):
        """k is the sketch's identity: kmv_merge with no k must fail
        loudly instead of silently keeping a different count than the
        build k and biasing (k-1)/theta (r12 advisor finding)."""
        from dask_geopandas_spark.operators.sketches import (kmv_merge,
                                                             kmv_sketch)

        s = kmv_sketch(spark.range(50).selectExpr(
            "concat('u', id) AS v"), "v", k=16)
        with pytest.raises(TypeError):
            kmv_merge(s, s)  # noqa: missing required keyword k

    def test_grouped(self, spark):
        from dask_geopandas_spark.operators.sketches import (
            kmv_estimate, kmv_sketch)

        rows = [("g1", f"a{i}") for i in range(40)] \
            + [("g2", f"b{i}") for i in range(7)]
        df = spark.createDataFrame(rows, "g string, v string")
        got = {r["g"]: r["approx_distinct"] for r in
               kmv_estimate(kmv_sketch(df, "v", k=64, by=["g"]),
                            k=64, by=["g"]).collect()}
        assert got == {"g1": 40, "g2": 7}


class TestHeavyHitters:
    def test_equals_exact_and_prunes(self, spark):
        from dask_geopandas_spark.operators.sketches import heavy_hitters
        from collections import Counter

        # Zipf-ish: value i appears ~600/i times
        vals = [f"t{i}" for i in range(1, 60) for _ in range(600 // i)]
        true = Counter(vals)
        df = spark.createDataFrame([(v,) for v in vals] + [(None,)],
                                   "t string")
        for thresh in (50, 150, 400):
            got = {r["t"]: r["n_count"] for r in
                   heavy_hitters(df, "t", thresh, width=256,
                                 depth=4).collect()}
            want = {v: c for v, c in true.items() if c >= thresh}
            assert got == want, thresh

    def test_weighted(self, spark):
        from dask_geopandas_spark.operators.sketches import heavy_hitters

        df = spark.createDataFrame(
            [("a", 90), ("a", 20), ("b", 30), ("c", 99)],
            "v string, w long")
        got = {r["v"]: r["n_count"] for r in
               heavy_hitters(df, "v", 100, width=64, depth=3,
                             weight_col="w").collect()}
        assert got == {"a": 110}

    def test_narrow_sketch_still_exact(self, spark):
        """Collision-heavy sketch admits extra candidates; the exact
        pass must discard every one of them."""
        from dask_geopandas_spark.operators.sketches import heavy_hitters

        vals = [f"x{i % 200}" for i in range(2000)]  # each exactly 10
        df = spark.createDataFrame([(v,) for v in vals], "v string")
        assert heavy_hitters(df, "v", 11, width=8, depth=2) \
            .count() == 0
        got = {r["v"]: r["n_count"] for r in
               heavy_hitters(df, "v", 10, width=8, depth=2).collect()}
        assert len(got) == 200 and set(got.values()) == {10}

    def test_prebuilt_sketch_and_cms_total(self, spark):
        """cms_total reads the exact row count off the sketch (row-0
        counters sum to N for a null-free column), and heavy_hitters
        with a prebuilt sketch returns exactly what the self-built
        path returns — the r16 fuse that drops the dedicated corpus
        COUNT pass from threshold derivation."""
        from dask_geopandas_spark.operators.sketches import (
            cms_sketch, cms_total, heavy_hitters)

        vals = [f"t{i}" for i in range(1, 40) for _ in range(400 // i)]
        df = spark.createDataFrame([(v,) for v in vals], "t string")
        sk = cms_sketch(df, "t", 128, 4).localCheckpoint(eager=False)
        total = int(sk.agg(cms_total(sk).alias("_t")).head()["_t"])
        assert total == len(vals) == df.count()
        a = sorted((r["t"], r["n_count"]) for r in
                   heavy_hitters(df, "t", total // 20, width=128,
                                 depth=4, sketch=sk).collect())
        b = sorted((r["t"], r["n_count"]) for r in
                   heavy_hitters(df, "t", total // 20, width=128,
                                 depth=4).collect())
        assert a == b and a


class TestStreamingCms:
    """Incremental CMS (streaming/indexing.py): exactly-once appends
    (sum-merge double-counts — the machinery matters here), stored
    lookup equality, torn-append refusal."""

    def test_batches_equal_direct_and_replay_skips(self, spark,
                                                   tmp_path):
        from dask_geopandas_spark.operators.sketches import (cms_lookup,
                                                             cms_sketch)
        from dask_geopandas_spark.streaming.indexing import (
            cms_lookup_stored, ingest_cms_batch)

        base = str(tmp_path / "cms")
        d1 = spark.createDataFrame([(f"t{i % 20}",)
                                    for i in range(300)], "t string")
        d2 = spark.createDataFrame([(f"t{i % 30}",)
                                    for i in range(300)], "t string")
        assert ingest_cms_batch(d1, base, "t", 128, 3, batch_id=0)
        assert ingest_cms_batch(d2, base, "t", 128, 3, batch_id=1)
        probe = d1.unionAll(d2).distinct()
        got = {r["t"]: r["est_count"] for r in
               cms_lookup_stored(probe, "t", base).collect()}
        direct = cms_sketch(d1.unionAll(d2), "t", 128, 3)
        want = {r["t"]: r["est_count"] for r in
                cms_lookup(probe, "t", direct, 128, 3).collect()}
        assert got == want
        # replay: skipped, counts unchanged (sum would double!)
        assert not ingest_cms_batch(d1, base, "t", 128, 3, batch_id=0)
        assert {r["t"]: r["est_count"] for r in
                cms_lookup_stored(probe, "t", base).collect()} == want

    def test_param_mismatch_and_torn_append_refused(self, spark,
                                                    tmp_path):
        import os

        from dask_geopandas_spark.streaming.indexing import (
            cms_stored, ingest_cms_batch)

        base = str(tmp_path / "cms2")
        df = spark.createDataFrame([("a",)], "t string")
        ingest_cms_batch(df, base, "t", 128, 3, batch_id=0)
        with pytest.raises(ValueError, match="identity"):
            ingest_cms_batch(df, base, "t", 256, 3, batch_id=1)
        # simulate a torn append: flag present, no commit marker
        open(base + "/_append_in_progress", "w").close()
        with pytest.raises(RuntimeError, match="inconsistent"):
            cms_stored(spark, base)
        # a replayed COMMITTED batch heals the flag
        assert not ingest_cms_batch(df, base, "t", 128, 3, batch_id=0)
        assert not os.path.exists(base + "/_append_in_progress")
        cms_stored(spark, base)  # reads again

    def test_streaming_availablenow(self, spark, tmp_path):
        import os

        from dask_geopandas_spark.operators.sketches import (cms_lookup,
                                                             cms_sketch)
        from dask_geopandas_spark.streaming.indexing import (
            cms_lookup_stored, streaming_ingest_cms)

        base = str(tmp_path / "cms3")
        d1 = spark.createDataFrame([(f"x{i % 9}",)
                                    for i in range(200)], "t string")
        d2 = spark.createDataFrame([(f"x{i % 13}",)
                                    for i in range(200)], "t string")
        d1.coalesce(1).write.parquet(base + "/src/f0")
        d2.coalesce(1).write.parquet(base + "/src/f1")
        now = 1_700_000_000
        for i, dn in enumerate(("f0", "f1")):
            for fn in os.listdir(f"{base}/src/{dn}"):
                os.utime(f"{base}/src/{dn}/{fn}", (now + i, now + i))
        stream = (spark.readStream.schema("t string")
                  .option("maxFilesPerTrigger", "1")
                  .parquet(base + "/src/f*"))
        q = (streaming_ingest_cms(stream, base + "/sk", "t",
                                  width=64, depth=3)
             .option("checkpointLocation", base + "/ckpt")
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        probe = d1.unionAll(d2).distinct()
        got = {r["t"]: r["est_count"] for r in
               cms_lookup_stored(probe, "t", base + "/sk").collect()}
        want = {r["t"]: r["est_count"] for r in
                cms_lookup(probe, "t",
                           cms_sketch(d1.unionAll(d2), "t", 64, 3),
                           64, 3).collect()}
        assert got == want


class TestReviewRegressions:
    """Pins for the r12 review findings."""

    def test_grouped_cms_lookup(self, spark):
        """A grouped sketch probed WITH its keys yields per-group
        estimates (the ungrouped probe would min across groups)."""
        from dask_geopandas_spark.operators.sketches import (cms_lookup,
                                                             cms_sketch)

        rows = [("A", "x")] * 10 + [("B", "x")] * 5 + [("B", "y")] * 3
        df = spark.createDataFrame(rows, "g string, v string")
        sk = cms_sketch(df, "v", width=512, depth=3, by=["g"])
        got = {(r["g"], r["v"]): r["est_count"] for r in
               cms_lookup(df.distinct(), "v", sk, 512, 3,
                          by=["g"]).collect()}
        assert got == {("A", "x"): 10, ("B", "x"): 5, ("B", "y"): 3}

    def test_grouped_cms_lookup_stored(self, spark, tmp_path):
        from dask_geopandas_spark.streaming.indexing import (
            cms_lookup_stored, ingest_cms_batch)

        base = str(tmp_path / "gcms")
        rows = [("A", "x")] * 8 + [("B", "x")] * 2
        df = spark.createDataFrame(rows, "g string, v string")
        ingest_cms_batch(df, base, "v", 256, 3, by=["g"], batch_id=0)
        got = {(r["g"], r["v"]): r["est_count"] for r in
               cms_lookup_stored(df.distinct(), "v", base,
                                 by=["g"]).collect()}
        assert got == {("A", "x"): 8, ("B", "x"): 2}

    def test_kmv_two_stage_equals_single(self, spark):
        """The per-partition pre-prune must not change the k smallest
        (multi-partition input exercises the prune)."""
        from dask_geopandas_spark.operators.sketches import kmv_sketch

        df = spark.range(5000).repartition(16).selectExpr(
            "concat('u', id) AS v")
        got = sorted(r["kmv_h"] for r in
                     kmv_sketch(df, "v", k=100).collect())
        want = sorted(_h60(f"u{i}") for i in range(5000))[:100]
        assert got == want


def _brute_qd(values, k, bits, weights=None):
    """Level-synchronous q-digest replica (the module's documented
    spec): merge sibling groups (plus any pre-existing parent) into
    the parent while the combined count <= n // k."""
    nodes = {}
    for i, v in enumerate(values):
        if v is None:
            continue
        leaf = (1 << bits) + v
        nodes[leaf] = nodes.get(leaf, 0) + (
            weights[i] if weights else 1)
    return _brute_qd_compress(nodes, k, bits)


def _brute_qd_compress(nodes, k, bits):
    nodes = dict(nodes)
    n = sum(nodes.values())
    t = n // k
    for lvl in range(bits, 0, -1):
        lo = 1 << lvl
        bypar = {}
        for i in [i for i in nodes if lo <= i < 2 * lo]:
            bypar.setdefault(i >> 1, []).append(i)
        for p, ch in bypar.items():
            s = sum(nodes[i] for i in ch) + nodes.get(p, 0)
            if s <= t:
                for i in ch:
                    del nodes[i]
                nodes[p] = s
    return nodes


def _brute_qd_quantile(nodes, q, bits):
    items = []
    for i, c in nodes.items():
        lvl = i.bit_length() - 1
        span = 1 << (bits - lvl)
        ub = (i - (1 << lvl) + 1) * span - 1
        items.append((ub, -lvl, c))
    items.sort()
    n = sum(c for _, _, c in items)
    rank = max(1, math.ceil(q * n))
    cum = 0
    for ub, _, c in items:
        cum += c
        if cum >= rank:
            return ub
    raise AssertionError("unreachable")


class TestQDigest:
    """q-digest quantile sketch: node-exact brute replica, rank-error
    bound at three scales, merge-recompress, exactness when
    uncompressed, universe guard."""

    def test_nodes_match_brute_force(self, spark):
        from dask_geopandas_spark.operators.sketches import qd_sketch

        vals = ([3] * 40 + [5] * 25 + [6] * 10 + [9] * 5
                + list(range(16)) + [None])
        df = spark.createDataFrame([(v,) for v in vals], "v long")
        for k, bits in ((4, 4), (8, 5), (2, 4)):
            got = {r["qd_id"]: r["qd_count"] for r in
                   qd_sketch(df, "v", k=k, bits=bits).collect()}
            assert got == _brute_qd(vals, k, bits), (k, bits)

    def test_exact_when_uncompressed(self, spark):
        """n < k makes the threshold 0: the digest IS the histogram
        and every quantile is the exact order statistic."""
        from dask_geopandas_spark.operators.sketches import (
            qd_quantiles, qd_sketch)

        vals = [7, 1, 3, 3, 9, 200, 42, 42, 42, 0]
        df = spark.createDataFrame([(v,) for v in vals], "v long")
        sk = qd_sketch(df, "v", k=1000, bits=9)
        assert {r["qd_id"]: r["qd_count"] for r in sk.collect()} == {
            (1 << 9) + v: vals.count(v) for v in set(vals)}
        got = {r["q"]: r["quantile"] for r in
               qd_quantiles(sk, [0.0, 0.5, 1.0], bits=9).collect()}
        sv = sorted(vals)
        assert got == {0.0: sv[0], 0.5: sv[4], 1.0: sv[-1]}

    def test_rank_error_bound_three_scales(self, spark):
        """|true_rank(est) - q*n| <= (bits/k)*n + 1 (the paper's
        log(universe)/k bound) at n = 100 / 5k / 50k."""
        from dask_geopandas_spark.operators.sketches import (
            qd_quantiles, qd_sketch)

        k, bits = 2048, 16
        for n in (100, 5000, 50000):
            # zipf-ish: value = i % (i // 37 + 1), deterministic
            vals = [(i * i + 7 * i) % min(60000, max(10, i + 1))
                    for i in range(n)]
            df = spark.createDataFrame([(v,) for v in vals], "v long")
            sk = qd_sketch(df, "v", k=k, bits=bits)
            got = {r["q"]: r["quantile"] for r in
                   qd_quantiles(sk, [0.1, 0.5, 0.9, 0.99],
                                bits=bits).collect()}
            sv = sorted(vals)
            eps = bits / k * n + 1
            for q, est in got.items():
                # with ties the guarantee is on RANKS: the returned
                # value's rank interval [#{v<est}+1, #{v<=est}] must
                # intersect [q*n - eps, q*n + eps]
                lo = sum(1 for v in sv if v < est) + 1
                hi = sum(1 for v in sv if v <= est)
                assert lo <= q * n + eps and hi >= q * n - eps, \
                    (n, q, est, lo, hi)
            # and the engine equals the brute replica exactly
            brute = _brute_qd(vals, k, bits)
            for q in (0.1, 0.5, 0.9, 0.99):
                assert got[q] == _brute_qd_quantile(brute, q, bits), q

    def test_merge_recompress_matches_brute(self, spark):
        from dask_geopandas_spark.operators.sketches import (
            qd_merge, qd_quantiles, qd_sketch)

        k, bits = 16, 8
        v1 = [i % 40 for i in range(300)]
        v2 = [(i * 3) % 200 for i in range(500)]
        d1 = spark.createDataFrame([(v,) for v in v1], "v long")
        d2 = spark.createDataFrame([(v,) for v in v2], "v long")
        merged = qd_merge(qd_sketch(d1, "v", k=k, bits=bits),
                          qd_sketch(d2, "v", k=k, bits=bits),
                          k=k, bits=bits)
        b = _brute_qd_compress(
            _merge_counts(_brute_qd(v1, k, bits),
                          _brute_qd(v2, k, bits)), k, bits)
        assert {r["qd_id"]: r["qd_count"]
                for r in merged.collect()} == b
        # rank error of the merged digest stays bounded
        n = len(v1) + len(v2)
        sv = sorted(v1 + v2)
        got = {r["q"]: r["quantile"] for r in
               qd_quantiles(merged, [0.5, 0.9], bits=bits).collect()}
        eps = 2 * (bits / k) * n + 1
        for q, est in got.items():
            lo = sum(1 for v in sv if v < est) + 1
            hi = sum(1 for v in sv if v <= est)
            assert lo <= q * n + eps and hi >= q * n - eps, (q, est)

    def test_grouped_weights_and_nulls(self, spark):
        from dask_geopandas_spark.operators.sketches import (
            qd_quantiles, qd_sketch)

        rows = ([("a", i % 30, 2) for i in range(200)]
                + [("b", 5, 1), ("b", 100, 3)]
                + [("a", None, 9)])
        df = spark.createDataFrame(rows, "g string, v long, w long")
        sk = qd_sketch(df, "v", k=8, bits=7, weight_col="w",
                       by=["g"])
        ga = {r["qd_id"]: r["qd_count"] for r in
              sk.filter("g = 'a'").collect()}
        va = [v for _, v, _ in rows[:200]]
        assert ga == _brute_qd(va, 8, 7, weights=[2] * 200)
        got = {(r["g"], r["q"]): r["quantile"] for r in
               qd_quantiles(sk, [1.0], bits=7, by=["g"]).collect()}
        assert got[("b", 1.0)] == 100

    def test_out_of_universe_raises(self, spark):
        from dask_geopandas_spark.operators.sketches import qd_sketch

        df = spark.createDataFrame([(300,)], "v long")
        with pytest.raises(Exception, match="outside"):
            qd_sketch(df, "v", k=4, bits=8).collect()
        with pytest.raises(Exception, match="outside"):
            qd_sketch(spark.createDataFrame([(-1,)], "v long"),
                      "v", k=4, bits=8).collect()


def _merge_counts(a, b):
    out = dict(a)
    for i, c in b.items():
        out[i] = out.get(i, 0) + c
    return out


class TestStreamingQd:
    """Incremental q-digest leaf store (streaming/indexing.py):
    batch-boundary invisibility (read-time sum + one compress ==
    single-shot sketch), exactly-once appends (leaf merge is SUM),
    sidecar-pinned universe, torn-append refusal."""

    def _batch(self, spark, vals):
        return spark.createDataFrame([(v,) for v in vals], "v long")

    def test_batches_equal_direct_and_replay_skips(self, spark,
                                                   tmp_path):
        from dask_geopandas_spark.operators.sketches import (
            qd_quantiles, qd_sketch)
        from dask_geopandas_spark.streaming.indexing import (
            ingest_qd_batch, qd_quantiles_stored)

        base = str(tmp_path / "qd")
        v1 = [i % 50 for i in range(400)]
        v2 = [(i * 7) % 120 for i in range(300)]
        d1, d2 = self._batch(spark, v1), self._batch(spark, v2)
        assert ingest_qd_batch(d1, base, "v", bits=7, batch_id=0)
        assert ingest_qd_batch(d2, base, "v", bits=7, batch_id=1)
        qs = [0.5, 0.9, 0.99]
        got = {r["q"]: r["quantile"] for r in
               qd_quantiles_stored(spark, base, qs, k=16).collect()}
        direct = qd_sketch(d1.unionAll(d2), "v", k=16, bits=7)
        want = {r["q"]: r["quantile"] for r in
                qd_quantiles(direct, qs, bits=7).collect()}
        assert got == want
        # replay: skipped (sum-merge would double-count)
        assert not ingest_qd_batch(d1, base, "v", bits=7, batch_id=0)
        assert {r["q"]: r["quantile"] for r in
                qd_quantiles_stored(spark, base, qs,
                                    k=16).collect()} == want

    def test_universe_mismatch_and_torn_append_refused(self, spark,
                                                       tmp_path):
        import os

        from dask_geopandas_spark.streaming.indexing import (
            ingest_qd_batch, qd_stored)

        base = str(tmp_path / "qd2")
        df = self._batch(spark, [3, 5])
        ingest_qd_batch(df, base, "v", bits=7, batch_id=0)
        with pytest.raises(ValueError, match="identity"):
            ingest_qd_batch(df, base, "v", bits=8, batch_id=1)
        open(base + "/_append_in_progress", "w").close()
        with pytest.raises(RuntimeError, match="inconsistent"):
            qd_stored(spark, base, k=8)
        # a replayed COMMITTED batch heals the flag
        assert not ingest_qd_batch(df, base, "v", bits=7, batch_id=0)
        assert not os.path.exists(base + "/_append_in_progress")
        qd_stored(spark, base, k=8)

    def test_streaming_availablenow(self, spark, tmp_path):
        import os

        from dask_geopandas_spark.operators.sketches import (
            qd_quantiles, qd_sketch)
        from dask_geopandas_spark.streaming.indexing import (
            qd_quantiles_stored, streaming_ingest_qd)

        base = str(tmp_path / "qd3")
        v1 = [i % 30 for i in range(200)]
        v2 = [(i * 3) % 90 for i in range(200)]
        d1, d2 = self._batch(spark, v1), self._batch(spark, v2)
        d1.coalesce(1).write.parquet(base + "/src/f0")
        d2.coalesce(1).write.parquet(base + "/src/f1")
        now = 1_700_000_000
        for i, dn in enumerate(("f0", "f1")):
            for fn in os.listdir(f"{base}/src/{dn}"):
                os.utime(f"{base}/src/{dn}/{fn}", (now + i, now + i))
        stream = (spark.readStream.schema("v long")
                  .option("maxFilesPerTrigger", "1")
                  .parquet(base + "/src/f*"))
        q = (streaming_ingest_qd(stream, base + "/sk", "v", bits=7)
             .option("checkpointLocation", base + "/ckpt")
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = {r["q"]: r["quantile"] for r in
               qd_quantiles_stored(spark, base + "/sk", [0.5, 0.95],
                                   k=16).collect()}
        want = {r["q"]: r["quantile"] for r in
                qd_quantiles(qd_sketch(d1.unionAll(d2), "v", k=16,
                                       bits=7),
                             [0.5, 0.95], bits=7).collect()}
        assert got == want


def test_qdigest_property_random_multisets(spark):
    """Property sweep (r13): for randomized value multisets the
    engine's grouped q-digest node set AND every quantile equal the
    level-synchronous brute replica exactly.  Each hypothesis example
    bundles many groups into ONE grouped sketch call so the sweep
    costs a handful of Spark jobs, not one per example."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dask_geopandas_spark.operators.sketches import (qd_quantiles,
                                                         qd_sketch)

    @given(st.lists(st.lists(st.integers(0, 63), min_size=1,
                             max_size=120),
                    min_size=4, max_size=16),
           st.sampled_from([(2, 6), (4, 6), (16, 6)]))
    @settings(max_examples=4, deadline=None)
    def check(groups, kb):
        k, bits = kb
        rows = [(f"g{gi}", v) for gi, vals in enumerate(groups)
                for v in vals]
        df = spark.createDataFrame(rows, "g string, v long")
        got = {}
        for r in qd_sketch(df, "v", k=k, bits=bits,
                           by=["g"]).collect():
            got.setdefault(r["g"], {})[r["qd_id"]] = r["qd_count"]
        qs = {}
        for r in qd_quantiles(qd_sketch(df, "v", k=k, bits=bits,
                                        by=["g"]),
                              [0.25, 0.5, 0.9], bits=bits,
                              by=["g"]).collect():
            qs[(r["g"], r["q"])] = r["quantile"]
        for gi, vals in enumerate(groups):
            brute = _brute_qd(vals, k, bits)
            assert got[f"g{gi}"] == brute, (gi, k, bits)
            for q in (0.25, 0.5, 0.9):
                assert qs[(f"g{gi}", q)] == \
                    _brute_qd_quantile(brute, q, bits), (gi, q)

    check()


def test_qd_compress_np_matches_level_loop_and_brute(spark):
    """r17 pin: the one-pass vectorized compressor (bits <=
    _QD_NP_MAX_BITS) and the distributed level loop (wider universes)
    implement the SAME merge rule — both equal the brute reference on
    random multisets, including the fresh and non-fresh (merge)
    entries and grouped frames."""
    import random

    from dask_geopandas_spark.operators import sketches as SK

    rng = random.Random(11)
    for trial in range(4):
        bits = rng.choice([4, 6, 8])
        k = rng.choice([1, 3, 8])
        vals = [rng.randrange(0, 1 << bits) for _ in range(200)]
        leaves = {}
        for v in vals:
            leaves[v + (1 << bits)] = leaves.get(v + (1 << bits), 0) + 1
        nodes = spark.createDataFrame(
            [(i, c) for i, c in leaves.items()],
            "qd_id long, qd_count long")
        want = _brute_qd_compress(dict(leaves), k, bits)
        got_np = {r["qd_id"]: r["qd_count"]
                  for r in SK._qd_compress_np(nodes, k, bits, []).collect()}
        assert got_np == want, (trial, bits, k)
        # the level loop (what the >_QD_NP_MAX_BITS path runs),
        # forced by lowering the gate temporarily
        old = SK._QD_NP_MAX_BITS
        SK._QD_NP_MAX_BITS = 0
        try:
            got_loop = {r["qd_id"]: r["qd_count"]
                        for r in SK._qd_compress(
                            nodes, k, bits, [], fresh=True).collect()}
        finally:
            SK._QD_NP_MAX_BITS = old
        assert got_loop == want, (trial, bits, k)

    # grouped: two groups with different totals compress independently
    rows = ([("a", i, c) for i, c in leaves.items()]
            + [("b", (1 << bits) + 1, 50)])
    g = spark.createDataFrame(rows, "g string, qd_id long, qd_count long")
    got = SK._qd_compress_np(g, 3, bits, ["g"]).collect()
    wa = _brute_qd_compress(dict(leaves), 3, bits)
    wb = _brute_qd_compress({(1 << bits) + 1: 50}, 3, bits)
    assert {r["qd_id"]: r["qd_count"] for r in got if r["g"] == "a"} == wa
    assert {r["qd_id"]: r["qd_count"] for r in got if r["g"] == "b"} == wb
