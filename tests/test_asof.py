"""As-of join tests (operators/asof.py — beyond-reference), pinned
against brute-force pandas merge_asof-style computation."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dask_geopandas_spark.operators.asof import asof_join


def _brute(lpdf, rpdf, direction="backward", tolerance=None, by="k"):
    out = []
    for _, lr in lpdf.iterrows():
        cand = rpdf[rpdf[by] == lr[by]] if by else rpdf
        if direction == "backward":
            cand = cand[cand["ts"] <= lr["ts"]]
            cand = cand.sort_values("ts").tail(1)
        else:
            cand = cand[cand["ts"] >= lr["ts"]]
            cand = cand.sort_values("ts").head(1)
        m = None
        if len(cand):
            m = cand.iloc[0]
            if tolerance is not None and abs(m["ts"] - lr["ts"]) > tolerance:
                m = None
        out.append((lr["lid"], None if m is None else int(m["rid"])))
    return dict(out)


@pytest.fixture()
def frames(spark):
    rng = np.random.RandomState(5)
    lpdf = pd.DataFrame({"lid": np.arange(200),
                         "k": rng.randint(0, 8, 200),
                         "ts": rng.uniform(0, 1000, 200)})
    rpdf = pd.DataFrame({"rid": np.arange(120),
                         "k": rng.randint(0, 8, 120),
                         "ts": rng.uniform(0, 1000, 120)})
    return (lpdf, rpdf,
            spark.createDataFrame(lpdf), spark.createDataFrame(rpdf))


class TestAsofJoin:
    def test_backward_matches_brute_force(self, frames):
        lpdf, rpdf, ldf, rdf = frames
        out = asof_join(ldf, rdf, on="ts", by="k")
        got = {r["lid"]: r["asof_rid"] for r in out.collect()}
        assert got == _brute(lpdf, rpdf)

    def test_forward_matches_brute_force(self, frames):
        lpdf, rpdf, ldf, rdf = frames
        out = asof_join(ldf, rdf, on="ts", by="k", direction="forward")
        got = {r["lid"]: r["asof_rid"] for r in out.collect()}
        assert got == _brute(lpdf, rpdf, direction="forward")

    def test_tolerance(self, frames):
        lpdf, rpdf, ldf, rdf = frames
        out = asof_join(ldf, rdf, on="ts", by="k", tolerance=25.0)
        got = {r["lid"]: r["asof_rid"] for r in out.collect()}
        assert got == _brute(lpdf, rpdf, tolerance=25.0)

    def test_tie_inclusive(self, spark):
        ldf = spark.createDataFrame([(0, 1, 10.0)], "lid long, k long, ts double")
        rdf = spark.createDataFrame([(7, 1, 10.0)], "rid long, k long, ts double")
        out = asof_join(ldf, rdf, on="ts", by="k").collect()
        assert out[0]["asof_rid"] == 7

    def test_inner_drops_unmatched(self, spark):
        ldf = spark.createDataFrame([(0, 1, 5.0), (1, 1, 50.0)],
                                    "lid long, k long, ts double")
        rdf = spark.createDataFrame([(7, 1, 10.0)], "rid long, k long, ts double")
        left = asof_join(ldf, rdf, on="ts", by="k", how="left").collect()
        assert {r["lid"]: r["asof_rid"] for r in left} == {0: None, 1: 7}
        inner = asof_join(ldf, rdf, on="ts", by="k", how="inner").collect()
        assert [r["lid"] for r in inner] == [1]

    def test_single_shuffle_plan(self, frames):
        """One Exchange (the group-key shuffle) — never a range
        cross-join or a per-row scan of right history."""
        _, _, ldf, rdf = frames
        plan = asof_join(ldf, rdf, on="ts", by="k") \
            ._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") <= 2  # union sides
        assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan

    def test_validation(self, frames):
        _, _, ldf, rdf = frames
        with pytest.raises(ValueError):
            asof_join(ldf, rdf, direction="sideways")
        with pytest.raises(ValueError):
            asof_join(ldf, rdf, tolerance=-1)


def _brute_nearest(lpdf, rpdf, tolerance=None, by="k"):
    out = {}
    for _, lr in lpdf.iterrows():
        cand = rpdf[rpdf[by] == lr[by]]
        m = None
        if len(cand):
            gaps = (cand["ts"] - lr["ts"]).abs()
            best = gaps.min()
            tied = cand[gaps == best]
            back = tied[tied["ts"] <= lr["ts"]]
            m = (back if len(back) else tied).sort_values("ts").iloc[-1 if len(back) else 0]
            if tolerance is not None and abs(m["ts"] - lr["ts"]) > tolerance:
                m = None
        out[lr["lid"]] = None if m is None else int(m["rid"])
    return out


class TestAsofNearest:
    def test_nearest_matches_brute_force(self, frames):
        lpdf, rpdf, ldf, rdf = frames
        out = asof_join(ldf, rdf, on="ts", by="k", direction="nearest")
        got = {r["lid"]: r["asof_rid"] for r in out.collect()}
        assert got == _brute_nearest(lpdf, rpdf)

    def test_nearest_with_tolerance(self, frames):
        lpdf, rpdf, ldf, rdf = frames
        out = asof_join(ldf, rdf, on="ts", by="k", direction="nearest",
                        tolerance=10.0)
        got = {r["lid"]: r["asof_rid"] for r in out.collect()}
        assert got == _brute_nearest(lpdf, rpdf, tolerance=10.0)

    def test_tie_prefers_backward(self, spark):
        ldf = spark.createDataFrame([(0, 1, 10.0)], "lid long, k long, ts double")
        rdf = spark.createDataFrame([(7, 1, 8.0), (8, 1, 12.0)],
                                    "rid long, k long, ts double")
        out = asof_join(ldf, rdf, on="ts", by="k", direction="nearest")
        assert out.collect()[0]["asof_rid"] == 7
