"""Interval (range) join tests (operators/interval.py —
beyond-reference), pinned against brute-force numpy overlap."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dask_geopandas_spark.operators.interval import interval_join


def _brute(lpdf, rpdf, by=None):
    out = set()
    for _, l in lpdf.iterrows():
        for _, r in rpdf.iterrows():
            if by and l[by] != r[by]:
                continue
            if max(l["s"], r["s"]) <= min(l["e"], r["e"]):
                out.add((int(l["lid"]), int(r["rid"])))
    return out


@pytest.fixture()
def frames(spark):
    rng = np.random.RandomState(9)
    ls = rng.uniform(0, 1000, 150)
    rs = rng.uniform(0, 1000, 120)
    lpdf = pd.DataFrame({"lid": np.arange(150), "k": rng.randint(0, 5, 150),
                         "s": ls, "e": ls + rng.uniform(0, 50, 150)})
    rpdf = pd.DataFrame({"rid": np.arange(120), "k": rng.randint(0, 5, 120),
                         "s": rs, "e": rs + rng.uniform(0, 30, 120)})
    return lpdf, rpdf, spark.createDataFrame(lpdf), spark.createDataFrame(rpdf)


class TestIntervalJoin:
    def test_matches_brute_force(self, frames):
        lpdf, rpdf, ldf, rdf = frames
        out = interval_join(ldf, rdf, ("s", "e"), ("s", "e"))
        got = {(r["lid"], r["rid"]) for r in out.select("lid", "rid").collect()}
        assert got == _brute(lpdf, rpdf)

    def test_with_by_key(self, frames):
        lpdf, rpdf, ldf, rdf = frames
        out = interval_join(ldf, rdf, ("s", "e"), ("s", "e"), by="k")
        got = {(r["lid"], r["rid"]) for r in out.select("lid", "rid").collect()}
        assert got == _brute(lpdf, rpdf, by="k")

    def test_no_duplicate_pairs_across_buckets(self, frames):
        """A pair overlapping many buckets appears exactly once
        (reference-bucket dedup) regardless of bucket width."""
        lpdf, rpdf, ldf, rdf = frames
        for w in (5.0, 37.0, 500.0):
            out = interval_join(ldf, rdf, ("s", "e"), ("s", "e"),
                                bucket_width=w)
            rows = [(r["lid"], r["rid"]) for r in
                    out.select("lid", "rid").collect()]
            assert len(rows) == len(set(rows))
            assert set(rows) == _brute(lpdf, rpdf)

    def test_point_in_interval(self, spark):
        """Points are zero-length intervals: closed-end semantics keep
        boundary hits."""
        ldf = spark.createDataFrame(
            [(0, 10.0, 20.0)], "lid long, s double, e double")
        rdf = spark.createDataFrame(
            [(1, 10.0), (2, 20.0), (3, 15.0), (4, 20.0000001)],
            "rid long, p double")
        out = interval_join(ldf, rdf, ("s", "e"), ("p", "p"))
        assert sorted(r["rid"] for r in out.select("rid").collect()) == [1, 2, 3]

    def test_no_cartesian_in_plan(self, frames):
        _, _, ldf, rdf = frames
        plan = interval_join(ldf, rdf, ("s", "e"), ("s", "e"), by="k",
                             bucket_width=50.0) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoop" not in plan


class TestIntervalLeftJoin:
    def test_left_keeps_unmatched(self, spark):
        ldf = spark.createDataFrame(
            [(0, 0.0, 5.0), (1, 100.0, 110.0)], "lid long, s double, e double")
        rdf = spark.createDataFrame(
            [(7, 3.0, 8.0)], "rid long, s double, e double")
        out = interval_join(ldf, rdf, ("s", "e"), ("s", "e"), how="left")
        got = {r["lid"]: r["rid"] for r in out.select("lid", "rid").collect()}
        assert got == {0: 7, 1: None}

    def test_left_matches_equal_inner_plus_nulls(self, frames):
        lpdf, rpdf, ldf, rdf = frames
        inner = {(r["lid"], r["rid"]) for r in
                 interval_join(ldf, rdf, ("s", "e"), ("s", "e"), by="k")
                 .select("lid", "rid").collect()}
        left = [(r["lid"], r["rid"]) for r in
                interval_join(ldf, rdf, ("s", "e"), ("s", "e"), by="k",
                              how="left").select("lid", "rid").collect()]
        matched = {p for p in left if p[1] is not None}
        assert matched == inner
        unmatched_l = {p[0] for p in left if p[1] is None}
        assert unmatched_l == set(lpdf["lid"]) - {a for a, _ in inner}

    def test_left_duplicate_rows_keep_multiplicity(self, spark):
        """Two identical right rows that both overlap a left interval
        yield two rows under how='left', exactly as under how='inner'
        (inner-plus-nulls equivalence for duplicate rows); duplicate
        identical left rows likewise each keep their full match list."""
        ldf = spark.createDataFrame(
            [(0, 0.0, 5.0), (0, 0.0, 5.0), (1, 100.0, 110.0)],
            "lid long, s double, e double")
        rdf = spark.createDataFrame(
            [(7, 3.0, 8.0), (7, 3.0, 8.0), (8, 4.0, 4.5)],
            "rid long, s double, e double")
        inner = sorted(
            (r["lid"], r["rid"]) for r in
            interval_join(ldf, rdf, ("s", "e"), ("s", "e"))
            .select("lid", "rid").collect())
        assert inner == [(0, 7)] * 4 + [(0, 8)] * 2
        left = sorted(
            ((r["lid"], r["rid"]) for r in
             interval_join(ldf, rdf, ("s", "e"), ("s", "e"), how="left")
             .select("lid", "rid").collect()),
            key=lambda p: (p[0], p[1] is None, p[1] or 0))
        assert left == [(0, 7)] * 4 + [(0, 8)] * 2 + [(1, None)]
