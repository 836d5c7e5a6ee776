"""Deterministic sampling / packing operator tests
(operators/sampling.py)."""

import re

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dask_geopandas_spark.operators.sampling import (hash_sample,
                                                     pack_documents,
                                                     split_train_holdout,
                                                     stratified_hash_sample)


@pytest.fixture()
def docs(spark):
    pdf = pd.DataFrame({
        "doc_id": np.arange(2000, dtype="int64"),
        "lang": ["en", "de", "fr", "xx"] * 500,
        "n_tokens": (np.arange(2000) * 37 % 900 + 100).astype("int64"),
    })
    return spark.createDataFrame(pdf)


class TestHashSample:
    def test_determinism_and_rate(self, docs):
        a = sorted(r["doc_id"] for r in hash_sample(docs, 0.25).collect())
        b = sorted(r["doc_id"] for r in hash_sample(docs, 0.25).collect())
        assert a == b                      # re-run identical
        assert 0.18 < len(a) / 2000 < 0.32  # ~25%

    def test_nesting(self, docs):
        """A smaller sample is a subset of a larger one (threshold
        semantics -> monotone nesting, the property practitioners rely
        on when upsampling later)."""
        small = {r["doc_id"] for r in hash_sample(docs, 0.1).collect()}
        big = {r["doc_id"] for r in hash_sample(docs, 0.3).collect()}
        assert small <= big

    def test_no_shuffle(self, docs):
        plan = hash_sample(docs, 0.5)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan

    def test_validation(self, docs):
        with pytest.raises(ValueError):
            hash_sample(docs, 1.5)


class TestStratified:
    def test_per_stratum_rates(self, docs):
        out = stratified_hash_sample(
            docs, {"en": 1.0, "de": 0.2}, strata_col="lang").collect()
        by = {}
        for r in out:
            by.setdefault(r["lang"], 0)
            by[r["lang"]] += 1
        assert by["en"] == 500               # full keep
        assert 60 < by.get("de", 0) < 160    # ~20% of 500
        assert "fr" not in by and "xx" not in by  # default 0

    def test_agrees_with_hash_sample_per_stratum(self, docs):
        strat = {r["doc_id"] for r in stratified_hash_sample(
            docs, {"en": 0.3}, strata_col="lang").collect()}
        plain = {r["doc_id"] for r in
                 hash_sample(docs.filter(F.col("lang") == "en"), 0.3).collect()}
        assert strat == plain


class TestSplit:
    def test_disjoint_exhaustive(self, docs):
        out = split_train_holdout(docs, holdout_fraction=0.1).collect()
        assert len(out) == 2000
        hold = {r["doc_id"] for r in out if r["split"] == "holdout"}
        train = {r["doc_id"] for r in out if r["split"] == "train"}
        assert hold.isdisjoint(train) and len(hold) + len(train) == 2000
        assert 120 < len(hold) < 280
        # stable across runs
        again = {r["doc_id"] for r in
                 split_train_holdout(docs, 0.1).collect()
                 if r["split"] == "holdout"}
        assert hold == again


class TestPacking:
    def test_bins_respect_budget_boundaries(self, spark):
        pdf = pd.DataFrame({"doc_id": [0, 1, 2, 3, 4],
                            "n_tokens": [600, 600, 600, 600, 600]})
        out = {r["doc_id"]: r["pack_bin"] for r in
               pack_documents(spark.createDataFrame(pdf), budget=1000)
               .collect()}
        # exclusive prefix sums: 0,600,1200,1800,2400 -> bins 0,0,1,1,2
        assert out == {0: 0, 1: 0, 2: 1, 3: 1, 4: 2}

    def test_grouped_packing_independent(self, spark):
        pdf = pd.DataFrame({"doc_id": [0, 1, 2, 3],
                            "lang": ["en", "en", "de", "de"],
                            "n_tokens": [900, 900, 900, 900]})
        out = {(r["lang"], r["doc_id"]): r["pack_bin"] for r in
               pack_documents(spark.createDataFrame(pdf), budget=1000,
                              by="lang").collect()}
        assert out == {("en", 0): 0, ("en", 1): 0,
                       ("de", 2): 0, ("de", 3): 0}

    def test_bin_token_totals_bounded(self, docs):
        """Every bin's token total stays under budget + max_doc_tokens
        (the straddling doc allowance of boundary packing)."""
        budget = 4096
        out = pack_documents(docs, budget=budget, by="lang")
        totals = (out.groupBy("lang", "pack_bin")
                  .agg(F.sum("n_tokens").alias("t")).collect())
        assert all(r["t"] < budget + 999 for r in totals)
        # bins are contiguous from 0 per group
        bins = {}
        for r in totals:
            bins.setdefault(r["lang"], set()).add(r["pack_bin"])
        for s in bins.values():
            assert s == set(range(len(s)))

    def test_validation(self, docs):
        with pytest.raises(ValueError):
            pack_documents(docs, budget=0)


class TestCapPerGroup:
    def test_matches_window_brute_force(self, spark):
        """Quota semantics: at most cap rows per group, smallest
        order_col preferred; under-cap groups pass through untouched
        (the anti-join bypass must be invisible in the result)."""
        import numpy as np

        from dask_geopandas_spark.operators.sampling import cap_per_group

        rng = np.random.RandomState(9)
        rows = [(int(i), ["big", "mid", "s1", "s2"][min(int(g), 3)])
                for i, g in enumerate(rng.choice(
                    [0] * 10 + [1] * 4 + [2, 3], size=120))]
        df = spark.createDataFrame(rows, "doc_id long, grp string")
        cap = 20
        got = sorted((r["grp"], r["doc_id"]) for r in
                     cap_per_group(df, group_col="grp", cap=cap).collect())
        want = []
        per = {}
        for i, g in sorted(rows):
            per.setdefault(g, [])
            if len(per[g]) < cap:
                per[g].append(i)
                want.append((g, i))
        assert got == sorted(want)
        # both paths ran: at least one group over cap, one under
        sizes = {}
        for _, g in rows:
            sizes[g] = sizes.get(g, 0) + 1
        assert max(sizes.values()) > cap and min(sizes.values()) <= cap

    def test_validates_cap(self, spark):
        from dask_geopandas_spark.operators.sampling import cap_per_group

        df = spark.createDataFrame([(1, "a")], "doc_id long, grp string")
        with pytest.raises(ValueError, match="cap"):
            cap_per_group(df, group_col="grp", cap=0)

    def test_zipf_extreme_hot_group_bounded(self, spark):
        """One group = 50% of all rows (the Zipf head).  The
        partition-local pre-trim must (a) keep results identical to
        the brute-force quota and (b) bound the GLOBAL sort window's
        input to <= cap * num_input_partitions rows per group — the
        hot group never sorts its full row set in one task."""
        from dask_geopandas_spark.operators.sampling import cap_per_group

        n = 4000
        rows = [(int(i), "hot" if i % 2 == 0 else f"cold{i % 40}")
                for i in range(n)]
        df = (spark.createDataFrame(rows, "doc_id long, grp string")
              .repartition(8))
        cap = 25
        out = cap_per_group(df, group_col="grp", cap=cap,
                            order_col="doc_id")
        got = sorted((r["grp"], r["doc_id"]) for r in out.collect())
        want, per = [], {}
        for i, g in sorted(rows):
            per.setdefault(g, 0)
            if per[g] < cap:
                per[g] += 1
                want.append((g, i))
        assert got == sorted(want)
        # Plan shape: two window exchanges on the hot path — the
        # pre-trim keyed on (_pid, grp) ahead of the global (grp)
        # window — so the hot group's full row set never hash-routes
        # to a single task.
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "_pid" in plan, plan
        assert plan.count("Window") >= 2, plan

    def test_null_group_is_capped(self, spark):
        """ADVICE r5: NULL group keys must be capped like any other
        group (null-safe quota joins), matching the window oracle."""
        from dask_geopandas_spark.operators.sampling import cap_per_group

        rows = [(int(i), None if i < 30 else "ok") for i in range(35)]
        df = spark.createDataFrame(rows, "doc_id long, grp string")
        out = cap_per_group(df, group_col="grp", cap=5,
                            order_col="doc_id").collect()
        nulls = sorted(r["doc_id"] for r in out if r["grp"] is None)
        oks = sorted(r["doc_id"] for r in out if r["grp"] == "ok")
        assert nulls == list(range(5))          # capped, smallest kept
        assert oks == list(range(30, 35))       # under cap: untouched


def test_cap_per_group_quota_joins_broadcast(spark, tmp_path):
    """The quota joins must plan as BROADCAST joins when the corpus
    scan has size statistics (parquet): the over-cap list is tiny, so
    the bypass path never shuffles the corpus.  (Statistics-free
    sources plan sort-merge initially and rely on AQE's runtime
    conversion — the docstring contract.)"""
    from dask_geopandas_spark.operators.sampling import cap_per_group

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, "big" if i % 3 else f"s{i % 7}") for i in range(300)],
        "doc_id long, grp string").write.parquet(src)
    out = cap_per_group(spark.read.parquet(src), group_col="grp", cap=20)
    assert out.count() == 20 + 100  # capped 'big' + all small groups
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert plan.count("SortMergeJoin") == 0, plan


class TestChunkDocuments:
    def test_chunking_shapes_and_coverage(self, spark):
        """r6: fixed-window chunking with overlap — starts step by the
        stride, the no-new-tokens final window is dropped, every token
        appears in >=1 chunk, reassembly of stride-heads == original
        (whitespace-normalized), metadata columns ride through."""
        from dask_geopandas_spark.operators.sampling import (
            chunk_documents)

        words = [f"w{i}" for i in range(10)]
        rows = [(1, " ".join(words), "web"),
                (2, "a b c", "books"),
                (3, "solo", "web")]
        df = spark.createDataFrame(rows, "doc_id long, text string, "
                                         "source string")
        out = chunk_documents(df, max_tokens=8, overlap=4)
        got = {(r["doc_id"], r["chunk_id"]):
               (r["chunk_start"], r["n_chunk_tokens"], r["text"],
                r["source"])
               for r in out.collect()}
        # doc 1: n=10, stride=4 -> starts 1, 5 (9 > 10-4 dropped)
        assert got[(1, 0)] == (1, 8, " ".join(words[0:8]), "web")
        assert got[(1, 1)] == (5, 6, " ".join(words[4:10]), "web")
        # doc 2: n=3 -> one whole-doc chunk
        assert got[(2, 0)] == (1, 3, "a b c", "books")
        assert got[(3, 0)] == (1, 1, "solo", "web")
        assert len(got) == 4

    def test_no_overlap_partitions_exactly(self, spark):
        from dask_geopandas_spark.operators.sampling import (
            chunk_documents)

        words = [f"t{i}" for i in range(11)]
        df = spark.createDataFrame([(1, " ".join(words))],
                                   "doc_id long, text string")
        out = sorted((r["chunk_id"], r["text"]) for r in
                     chunk_documents(df, max_tokens=4).collect())
        assert out == [(0, " ".join(words[0:4])),
                       (1, " ".join(words[4:8])),
                       (2, " ".join(words[8:11]))]

    def test_random_brute_force(self, spark):
        """Randomized agreement with a direct Python reference across
        several (max_tokens, overlap) shapes."""
        import numpy as np

        from dask_geopandas_spark.operators.sampling import (
            chunk_documents)

        rng = np.random.RandomState(17)
        rows = [(d, " ".join(f"x{rng.randint(100)}"
                             for _ in range(rng.randint(1, 40))))
                for d in range(30)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        for mt, ov in ((8, 0), (8, 4), (5, 4), (1, 0), (64, 16)):
            stride = mt - ov
            want = set()
            for d, t in rows:
                tk = t.split()
                n = len(tk)
                starts = [s for s in range(1, max(n, 1) + 1, stride)
                          if s == 1 or s <= n - ov]
                for ci, s in enumerate(starts):
                    chunk = tk[s - 1:s - 1 + mt]
                    want.add((d, ci, s, len(chunk), " ".join(chunk)))
            got = {(r["doc_id"], r["chunk_id"], r["chunk_start"],
                    r["n_chunk_tokens"], r["text"]) for r in
                   chunk_documents(df, max_tokens=mt,
                                   overlap=ov).collect()}
            assert got == want, (mt, ov)

    def test_validates_params(self, spark):
        from dask_geopandas_spark.operators.sampling import (
            chunk_documents)

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError, match="max_tokens"):
            chunk_documents(df, max_tokens=0)
        with pytest.raises(ValueError, match="overlap"):
            chunk_documents(df, max_tokens=4, overlap=4)
        with pytest.raises(ValueError, match="overlap"):
            chunk_documents(df, max_tokens=4, overlap=-1)


class TestOversample:
    def test_multiplicities_and_determinism(self, spark):
        """r6: rate 2.5 -> every row twice + the deterministic half
        hash-slice a third time; rate 0.5 -> the same slice once;
        rate 0 -> gone; unlisted groups keep default; two runs agree
        row-for-row."""
        from dask_geopandas_spark.operators.sampling import (
            _MOD, _bucket, oversample)

        rows = [(i, ["wiki", "web", "junk", "books"][i % 4])
                for i in range(400)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        rates = {"wiki": 2.5, "web": 0.5, "junk": 0.0}
        out = oversample(df, rates, default=1.0)
        got = sorted((r["doc_id"], r["source"], r["copy_id"])
                     for r in out.collect())
        buckets = {r["doc_id"]: r["b"] for r in
                   df.select("doc_id",
                             _bucket(F.col("doc_id")).alias("b"))
                   .collect()}
        want = []
        for i, src in rows:
            rate = rates.get(src, 1.0)
            n = int(rate) + (1 if buckets[i] < round(
                (rate - int(rate)) * _MOD) else 0)
            want += [(i, src, c) for c in range(n)]
        assert got == sorted(want)
        wiki = [g for g in got if g[1] == "wiki"]
        assert {c for _, _, c in wiki} == {0, 1, 2}   # some tripled
        assert all(g[1] != "junk" for g in got)
        assert got == sorted((r["doc_id"], r["source"], r["copy_id"])
                             for r in oversample(df, rates,
                                                 default=1.0).collect())
        # expected multiplicity ~ rate: wiki rows ~ 100*2.5
        assert abs(len(wiki) - 250) < 40

    def test_validates_rates(self, spark):
        from dask_geopandas_spark.operators.sampling import oversample

        df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
        with pytest.raises(ValueError, match="rate"):
            oversample(df, {"a": -0.1}).collect()
        with pytest.raises(ValueError, match="default"):
            oversample(df, {}, default=-1.0).collect()


def test_chunk_documents_property_sweep(spark):
    """Hypothesis-style invariant sweep over random unicode-ish texts
    and every (max_tokens, overlap) shape up to 6: (a) concatenating
    each chunk's FRESH tokens (the part past the previous chunk's
    overlap) reproduces the whitespace-normalized token stream
    exactly, (b) chunk_start is strictly increasing by the stride,
    (c) every chunk except a lone whole-doc one has > overlap tokens
    — i.e. brings new content."""
    import numpy as np

    from dask_geopandas_spark.operators.sampling import chunk_documents

    rng = np.random.RandomState(47)
    pieces = ["wörd", "a", "x9", "—", "...", "N°5", "longish-token",
              "émoji", "ß", "تجربة"]
    rows = []
    for d in range(25):
        n = rng.randint(0, 25)
        txt = ("  " if d % 3 == 0 else "").join(
            [""] + [pieces[rng.randint(len(pieces))] + (" " * rng.randint(1, 3))
                    for _ in range(n)])
        rows.append((d, txt))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for mt in (1, 2, 3, 5, 6):
        for ov in range(0, mt):
            stride = mt - ov
            out = {}
            for r in chunk_documents(df, max_tokens=mt,
                                     overlap=ov).collect():
                out.setdefault(r["doc_id"], []).append(
                    (r["chunk_id"], r["chunk_start"], r["text"],
                     r["n_chunk_tokens"]))
            for d, txt in rows:
                toks = txt.strip().split()
                if not txt.strip():
                    toks = [""]  # split('') sentinel, same both sides
                chunks = sorted(out[d])
                rebuilt = []
                for ci, (cid, cs, ctext, nct) in enumerate(chunks):
                    assert cid == ci
                    assert cs == 1 + ci * stride
                    ct = ctext.split(" ") if ctext != "" or nct == 1 else []
                    ct = ct if ctext != "" else ([""] if nct == 1 else [])
                    assert len(ct) == nct
                    rebuilt += ct[(ov if ci else 0):]
                    if len(chunks) > 1:
                        assert nct > ov  # every later chunk adds content
                assert rebuilt == toks, (d, mt, ov)


def test_oversample_large_rate_table_joins(spark):
    """r6: past _RATE_JOIN_THRESHOLD the rates broadcast-join instead
    of compiling a CASE per key — identical multiplicities (pinned
    against the CASE path on the shared keys), and the plan carries a
    broadcast join instead of an O(keys) CASE chain."""
    from dask_geopandas_spark.operators import sampling as SA

    rows = [(i, f"dom{i % 100}") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    small = {f"dom{i}": 0.5 + (i % 3) for i in range(5)}
    big = dict(small)
    big.update({f"dom{i}": 1.0 for i in range(5, 100)})
    assert len(big) > SA._RATE_JOIN_THRESHOLD
    got_case = sorted((r["doc_id"], r["copy_id"]) for r in
                      SA.oversample(df, small).collect())
    got_join = sorted((r["doc_id"], r["copy_id"]) for r in
                      SA.oversample(df, big).collect())
    assert got_case == got_join  # doms 5..99 rate 1.0 == default 1.0
    out = SA.oversample(df, big)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # only the explode's empty-sequence guard remains — not O(keys)
    assert plan.count("CASE WHEN") <= 2, plan.count("CASE WHEN")


class TestTrainingShards:
    def test_shards_deterministic_uniform_ordered(self, spark, tmp_path):
        """r6: shard placement is seeded-deterministic and roughly
        uniform; the shuffle key decorrelates from ingest order;
        per-file parquet row order matches the shuffle key; two writes
        agree byte-for-value."""
        from dask_geopandas_spark.operators.sampling import (
            shard_assignment, write_training_shards)

        df = spark.range(0, 2000).withColumnRenamed("id", "doc_id") \
            .withColumn("text", F.concat(F.lit("t"), F.col("doc_id")))
        p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
        write_training_shards(df, p1, n_shards=8, seed="s")
        write_training_shards(df, p2, n_shards=8, seed="s")
        a = spark.read.parquet(p1)
        b = spark.read.parquet(p2)
        rows = sorted(map(tuple, a.collect()))
        assert rows == sorted(map(tuple, b.collect()))
        assert len(rows) == 2000
        # uniform-ish occupancy
        counts = {r["shard"]: r["n"] for r in
                  a.groupBy("shard").agg(F.count("*").alias("n"))
                  .collect()}
        assert set(counts) == set(range(8))
        assert max(counts.values()) < 2 * min(counts.values())
        # placement matches the formula
        want = {r["doc_id"]: r["s"] for r in df.select(
            "doc_id", shard_assignment(F.col("doc_id"), 8, "s")
            .alias("s")).collect()}
        got = {r["doc_id"]: r["shard"] for r in a.collect()}
        assert got == want
        # a different seed is a different permutation
        write_training_shards(df, str(tmp_path / "s3"), n_shards=8,
                              seed="other")
        c = spark.read.parquet(str(tmp_path / "s3"))
        assert {r["doc_id"]: r["shard"] for r in c.collect()} != got
        # per-file row order == shuffle_key order (loaders may trust it)
        import glob

        import pyarrow.parquet as pq
        f = sorted(glob.glob(p1 + "/shard=0/*.parquet"))[0]
        keys = pq.read_table(f, columns=["shuffle_key"]) \
            .column("shuffle_key").to_pylist()
        assert keys == sorted(keys) and len(keys) > 50
        with pytest.raises(ValueError, match="n_shards"):
            shard_assignment(F.col("doc_id"), 0)


def test_training_shards_prune_on_read(spark, tmp_path):
    """r6: a loader reading one shard carries the shard id as a
    partition filter — the other shards' files never enter the plan."""
    from dask_geopandas_spark.operators.sampling import (
        write_training_shards)

    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    p = str(tmp_path / "sh")
    write_training_shards(df, p, n_shards=8, seed="x")
    one = spark.read.parquet(p).filter(F.col("shard") == 3)
    plan = one._sc._jvm.PythonSQLUtils.explainString(
        one._jdf.queryExecution(), "formatted")
    assert "PartitionFilters" in plan and "shard" in plan
    import re
    m = re.search(r"PartitionFilters: \[[^\]]*shard[^\]]*\]", plan)
    assert m, plan
    assert one.count() > 0


def test_oversample_expected_multiplicity_sweep(spark):
    """Property sweep: across fractional rates the realized corpus
    multiplicity tracks the rate within hash-uniformity tolerance, and
    copy ids are always dense 0..n-1 per row."""
    from dask_geopandas_spark.operators.sampling import oversample

    df = spark.createDataFrame([(i, "s") for i in range(2000)],
                               "doc_id long, source string")
    for rate in (0.25, 0.8, 1.5, 3.25):
        out = oversample(df, {"s": rate}).collect()
        assert abs(len(out) - 2000 * rate) < 150, rate
        per = {}
        for r in out:
            per.setdefault(r["doc_id"], []).append(r["copy_id"])
        for cids in per.values():
            assert sorted(cids) == list(range(len(cids)))


class TestShardCopyFold:
    def test_copies_land_apart(self, spark, tmp_path):
        """r7 (verdict r6 #3): after oversample, the copy_id folds into
        the shard key automatically, so replicas of one document get
        DIFFERENT shards/sort positions instead of adjacent duplicates
        in the training stream."""
        from dask_geopandas_spark.operators.sampling import (
            oversample, write_training_shards)

        df = spark.createDataFrame([(i, "s", f"t{i}") for i in range(400)],
                                   "doc_id long, source string, text string")
        up = oversample(df, {"s": 3.0})  # every doc exactly 3 copies
        p = str(tmp_path / "cf")
        write_training_shards(up, p, n_shards=16, seed="s")
        back = spark.read.parquet(p)
        assert back.count() == 1200
        per = back.groupBy("doc_id").agg(
            F.countDistinct("shard").alias("ns"),
            F.countDistinct("shuffle_key").alias("nk")).collect()
        # every doc's 3 copies have 3 distinct shuffle keys (never the
        # same sort position), and almost all spread over >1 shard
        assert all(r["nk"] == 3 for r in per)
        spread = sum(1 for r in per if r["ns"] > 1)
        assert spread > 350, spread  # 16 shards: P(all 3 same) ~ 1/256

    def test_key_cols_list_and_optout(self, spark, tmp_path):
        from dask_geopandas_spark.operators.sampling import (
            shard_key, write_training_shards)

        df = spark.createDataFrame(
            [(1, 0, "a"), (1, 1, "a"), (2, 0, "b")],
            "doc_id long, copy_id long, text string")
        # explicit list == auto-fold (copy_id already in the list)
        k1 = df.select(shard_key(df, ["doc_id", "copy_id"]).alias("k"))
        k2 = df.select(shard_key(df, "doc_id").alias("k"))
        assert [r["k"] for r in k1.collect()] == \
               [r["k"] for r in k2.collect()]
        # opt-out: copies collapse to one key again
        k3 = df.select(shard_key(df, "doc_id", copy_col=None).alias("k"))
        assert len({r["k"] for r in k3.collect()}) == 2
        # single col without copy_col present: plain passthrough value
        d2 = df.drop("copy_id")
        k4 = d2.select(shard_key(d2, "doc_id").alias("k")).collect()
        assert {r["k"] for r in k4} == {"1", "2"}
        import pytest as _pt
        with _pt.raises(ValueError, match="not in DataFrame"):
            shard_key(df, ["doc_id", "nope"])
        with _pt.raises(ValueError, match="at least one"):
            shard_key(df, [])


class TestWeightedSample:
    """weighted_sample (r7-late): deterministic Efraimidis-Spirakis
    A-ES weighted sampling without replacement."""

    def _brute(self, pdf, k, seed="", by=None):
        import hashlib
        import math

        def es(row):
            b = int(hashlib.md5(
                (seed + str(row.doc_id)).encode()).hexdigest()[:15], 16) \
                % 1_000_000
            u = (b + 0.5) / 1_000_000.0
            return round(math.log(u) / float(row.n_tokens), 9)

        pdf = pdf.assign(_es=[es(r) for r in pdf.itertuples()])
        if by is None:
            top = pdf.sort_values(["_es", "doc_id"],
                                  ascending=[False, True]).head(k)
            return sorted(top.doc_id.tolist())
        out = []
        for _, g in pdf.groupby(by):
            out += g.sort_values(["_es", "doc_id"],
                                 ascending=[False, True]) \
                    .head(k).doc_id.tolist()
        return sorted(out)

    def test_matches_brute_force_global_and_grouped(self, docs):
        from dask_geopandas_spark.operators.sampling import \
            weighted_sample

        pdf = docs.toPandas()
        got = sorted(r["doc_id"] for r in
                     weighted_sample(docs, 50, "n_tokens").collect())
        assert got == self._brute(pdf, 50)
        got_g = sorted(r["doc_id"] for r in
                       weighted_sample(docs, 25, "n_tokens",
                                       by="lang").collect())
        assert got_g == self._brute(pdf, 25, by="lang")
        # deterministic across runs; seed changes the draw
        again = sorted(r["doc_id"] for r in
                       weighted_sample(docs, 50, "n_tokens").collect())
        assert again == got
        seeded = sorted(r["doc_id"] for r in
                        weighted_sample(docs, 50, "n_tokens",
                                        seed="s1").collect())
        assert seeded != got

    def test_weight_bias_and_exclusions(self, spark):
        from dask_geopandas_spark.operators.sampling import \
            weighted_sample

        # two strata: weight 1000 vs 1 — the heavy stratum must
        # dominate a 100-of-2000 draw overwhelmingly
        df = spark.createDataFrame(
            [(i, 1000.0 if i < 1000 else 1.0) for i in range(2000)],
            "doc_id long, w double")
        got = [r["doc_id"] for r in
               weighted_sample(df, 100, "w").collect()]
        assert sum(1 for d in got if d < 1000) > 90
        # NULL / non-positive weights are excluded outright
        df2 = spark.createDataFrame(
            [(1, 5.0), (2, None), (3, 0.0), (4, -1.0)],
            "doc_id long, w double")
        assert [r["doc_id"] for r in
                weighted_sample(df2, 10, "w").collect()] == [1]
        import pytest as _pt
        with _pt.raises(ValueError, match="k must be"):
            weighted_sample(df2, 0, "w")

    def test_global_plan_is_take_ordered(self, docs):
        from dask_geopandas_spark.operators.sampling import \
            weighted_sample

        out = weighted_sample(docs, 10, "n_tokens")
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted")
        assert "TakeOrderedAndProject" in plan, plan
        assert "_es_key" not in out.columns


class TestSplitByCluster:
    """split_by_cluster (r7-late): leakage-safe splitting — whole
    near-dup clusters land on one side."""

    def test_clusters_never_straddle_and_brute_force(self, spark):
        import hashlib

        from dask_geopandas_spark.operators.sampling import \
            split_by_cluster

        df = spark.createDataFrame(
            [(i,) for i in range(400)], "doc_id long")
        # chains 0-1-2-3, 10-11-12-13, ... every 10th block of 4
        edges = spark.createDataFrame(
            [(b * 10 + j, b * 10 + j + 1)
             for b in range(40) for j in range(3)],
            "src long, dst long")
        out = split_by_cluster(df, edges, holdout_fraction=0.3)
        rows = {r["doc_id"]: r["split"] for r in out.collect()}
        assert len(rows) == 400 and set(rows.values()) == \
               {"train", "holdout"}
        # brute force: rep = chain min for chain members, own id else
        def bucket(v):
            return int(hashlib.md5(str(v).encode()).hexdigest()[:15],
                       16) % 1_000_000

        for d, s in rows.items():
            rep = (d // 10) * 10 if d % 10 <= 3 else d
            assert s == ("holdout" if bucket(rep) < 300000
                         else "train"), d
        # every chain is wholly on one side
        for b in range(40):
            assert len({rows[b * 10 + j] for j in range(4)}) == 1
        # singletons agree with split_train_holdout exactly
        from dask_geopandas_spark.operators.sampling import \
            split_train_holdout
        plain = {r["doc_id"]: r["split"] for r in
                 split_train_holdout(df, 0.3).collect()}
        for d in rows:
            if d % 10 > 3:
                assert rows[d] == plain[d]

    def test_nonconvergence_raises(self, spark):
        from dask_geopandas_spark.operators.sampling import \
            split_by_cluster

        df = spark.createDataFrame([(i,) for i in range(40)],
                                   "doc_id long")
        # one long chain: diameter 39 >> max_iter=1
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(39)], "src long, dst long")
        import pytest as _pt
        with _pt.raises(RuntimeError):
            split_by_cluster(df, edges, 0.5, max_iter=1)
        with _pt.raises(ValueError, match="holdout_fraction"):
            split_by_cluster(df, edges, 1.5)


def test_weighted_sample_reserved_names_raise(spark):
    """r8 (advisor): _es_key/_es_rn caller columns were silently
    overwritten then dropped — now they raise like oversample's
    guard."""
    import pytest

    from dask_geopandas_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame([(1, 1.0, 9.9)],
                               "doc_id long, w double, _es_key double")
    with pytest.raises(ValueError, match="_es_key"):
        weighted_sample(df, 1, "w")


def test_split_by_cluster_reserved_names_raise(spark):
    import pytest

    from dask_geopandas_spark.operators.sampling import split_by_cluster

    df = spark.createDataFrame([(1, 2)],
                               "doc_id long, __dgs_split_rep long")
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="__dgs_split_rep"):
        split_by_cluster(df, edges)


class TestTemperatureMix:
    """mT5-style temperature flattening realized as deterministic
    oversample rates: r_s = p_s**(alpha-1) / sum p_t**alpha."""

    @staticmethod
    def _brute(rows, alpha, round_rates=6):
        import hashlib

        counts = {}
        for _, s in rows:
            counts[s] = counts.get(s, 0) + 1
        n = sum(counts.values())
        ps = [(s, c / n) for s, c in
              sorted(counts.items(), key=lambda kv: str(kv[0]))]
        z = 0.0
        for _, p in ps:
            z += p ** alpha
        rates = {s: round((p ** alpha / z) / p, round_rates)
                 for s, p in ps}
        out = {}
        for i, s in rows:
            r = rates[s]
            b = int(hashlib.md5(str(i).encode()).hexdigest()[:15],
                    16) % 1_000_000
            out[i] = int(r) + (1 if b < round((r - int(r)) * 1_000_000)
                               else 0)
        return out

    def test_matches_formula_multiplicities(self, spark):
        from dask_geopandas_spark.operators.sampling import \
            temperature_mix

        rows = [(i, "big" if i < 180 else ("mid" if i < 230 else "sm"))
                for i in range(240)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        for alpha in (0.0, 0.3, 0.5, 1.0, 2.0):
            got = {r["doc_id"]: r["n"] for r in
                   temperature_mix(df, alpha=alpha).groupBy("doc_id")
                   .agg((F.max("copy_id") + 1).alias("n")).collect()}
            want = self._brute(rows, alpha)
            want = {i: m for i, m in want.items() if m > 0}
            assert got == want, alpha

    def test_alpha_one_is_identity(self, spark):
        from dask_geopandas_spark.operators.sampling import \
            temperature_mix

        rows = [(i, f"s{i % 7}") for i in range(140)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        out = temperature_mix(df, alpha=1.0)
        assert out.count() == 140
        assert out.agg(F.max("copy_id")).head()[0] == 0

    def test_alpha_zero_equalizes(self, spark):
        from dask_geopandas_spark.operators.sampling import \
            temperature_mix

        rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        got = {r["source"]: r["count"] for r in
               temperature_mix(df, alpha=0.0).groupBy("source")
               .count().collect()}
        # expected 500/500; md5-slice variance is a few percent
        assert abs(got["big"] - got["small"]) < 80
        assert abs(got["big"] + got["small"] - 1000) < 80

    def test_null_group_passes_through_at_rate_one(self, spark):
        """NULL groups stay outside the model (an equality CASE can
        never match NULL — the silent-drop hazard) and their counts
        must not distort the named groups' shares."""
        from dask_geopandas_spark.operators.sampling import \
            temperature_mix

        base = [(i, "a" if i < 60 else "b") for i in range(90)]
        with_null = base + [(100 + i, None) for i in range(30)]
        df0 = spark.createDataFrame(base, "doc_id long, source string")
        df1 = spark.createDataFrame(with_null,
                                    "doc_id long, source string")
        m0 = {r["doc_id"]: r["n"] for r in
              temperature_mix(df0, alpha=0.5).groupBy("doc_id")
              .agg((F.max("copy_id") + 1).alias("n")).collect()}
        out1 = temperature_mix(df1, alpha=0.5)
        m1 = {r["doc_id"]: r["n"] for r in
              out1.groupBy("doc_id")
              .agg((F.max("copy_id") + 1).alias("n")).collect()}
        # every NULL-group row exactly once
        assert all(m1[100 + i] == 1 for i in range(30))
        # named groups' multiplicities unchanged by the NULL rows
        assert {k: v for k, v in m1.items() if k < 100} == m0

    def test_validation(self, spark):
        import pytest as _pytest

        from dask_geopandas_spark.operators.sampling import \
            temperature_mix

        df = spark.createDataFrame([(1, "a")],
                                   "doc_id long, source string")
        with _pytest.raises(ValueError, match="alpha"):
            temperature_mix(df, alpha=-0.1)


class TestPackChunks:
    """pack_chunks (r16): concat-then-chunk spans vs a brute token-
    stream replica; exact-full-bin invariant; per-group packing;
    zero-token drop; boundary-straddling docs."""

    @staticmethod
    def _brute(rows, budget, by=None):
        """rows: (doc_id, n_tokens[, group]) -> {(doc, bin):
        (tok_start, tok_end, bin_offset)} by simulating the stream."""
        out = {}
        groups = {}
        for r in rows:
            g = r[2] if by else None
            groups.setdefault(g, []).append(r)
        for g, rs in groups.items():
            off = 0
            for r in sorted(rs, key=lambda x: x[0]):
                n = r[1]
                if n <= 0:
                    continue
                for tok in range(n):
                    gpos = off + tok
                    key = (r[0], gpos // budget)
                    s, e, bo = out.get(
                        key, (tok, tok, gpos % budget))
                    out[key] = (min(s, tok), max(e, tok + 1),
                                min(bo, gpos % budget))
                off += n
        return out

    DOCS = [(1, 3), (2, 5), (3, 1), (4, 0), (5, 9), (6, 2)]

    def test_matches_brute(self, spark):
        from dask_geopandas_spark.operators.sampling import \
            pack_chunks

        df = spark.createDataFrame(self.DOCS,
                                   "doc_id long, n_tokens long")
        for budget in (4, 7, 100):
            got = {(r["doc_id"], r["pack_bin"]):
                   (r["tok_start"], r["tok_end"], r["bin_offset"])
                   for r in pack_chunks(df, budget).collect()}
            assert got == self._brute(self.DOCS, budget), budget

    def test_bins_exactly_full(self, spark):
        from dask_geopandas_spark.operators.sampling import \
            pack_chunks

        df = spark.createDataFrame(self.DOCS,
                                   "doc_id long, n_tokens long")
        budget = 6
        rows = pack_chunks(df, budget).collect()
        per_bin = {}
        for r in rows:
            per_bin[r["pack_bin"]] = per_bin.get(r["pack_bin"], 0) \
                + (r["tok_end"] - r["tok_start"])
        total = sum(n for _, n in self.DOCS if n > 0)
        last = max(per_bin)
        for b, filled in per_bin.items():
            assert filled == (budget if b < last
                              else total - budget * last), b
        # per-doc spans reassemble the document exactly
        per_doc = {}
        for r in rows:
            per_doc.setdefault(r["doc_id"], []).append(
                (r["tok_start"], r["tok_end"]))
        for d, n in self.DOCS:
            if n <= 0:
                assert d not in per_doc
                continue
            spans = sorted(per_doc[d])
            assert spans[0][0] == 0 and spans[-1][1] == n
            assert all(a[1] == b[0]
                       for a, b in zip(spans, spans[1:]))

    def test_grouped(self, spark):
        from dask_geopandas_spark.operators.sampling import \
            pack_chunks

        rows = [(1, 3, "a"), (2, 5, "a"), (3, 4, "b"), (4, 2, "b")]
        df = spark.createDataFrame(
            rows, "doc_id long, n_tokens long, src string")
        got = {(r["doc_id"], r["pack_bin"]):
               (r["tok_start"], r["tok_end"], r["bin_offset"])
               for r in pack_chunks(df, 4, by="src").collect()}
        assert got == self._brute(rows, 4, by="src")

    def test_validation(self, spark):
        from dask_geopandas_spark.operators.sampling import \
            pack_chunks

        df = spark.createDataFrame([(1, 1)],
                                   "doc_id long, n_tokens long")
        with pytest.raises(ValueError, match="budget"):
            pack_chunks(df, 0)

    def test_zero_python_single_window_plan(self, spark):
        """pack_chunks is one running-sum window + explode: no
        Python stages, exactly one Window node, exactly one
        Exchange (the window's partitionBy hash)."""
        from dask_geopandas_spark.operators.sampling import \
            pack_chunks

        df = spark.createDataFrame(
            [(1, 3, "a")], "doc_id long, n_tokens long, src string")
        out = pack_chunks(df, 4, by="src")
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted")
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert plan.count("Window") >= 1
        # exactly ONE Exchange node — the window's hash partition
        # (formatted explain lists each node twice: tree + detail)
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1


class TestPackBestFit:
    """pack_best_fit (r16 post-close): best-fit-decreasing packing
    vs a naive-spec brute replica; budget respected; fewer bins than
    in-order boundary packing on adversarial input; per-group
    independence; long-doc overflow bins; determinism."""

    @staticmethod
    def _brute(rows, budget, by=None):
        """Naive O(n·bins) statement of the spec: docs by (tokens
        DESC, order ASC); smallest sufficient remaining, ties lowest
        bin id; no fit -> new bin."""
        out = {}
        groups = {}
        for r in rows:
            g = r[2] if by else None
            groups.setdefault(g, []).append(r)
        for g, rs in groups.items():
            bins = []
            for oid, n, *_ in sorted(rs, key=lambda x: (-x[1], x[0])):
                if n >= budget:
                    bins.append(budget - n)
                    out[oid] = len(bins) - 1
                    continue
                fits = [(rem, i) for i, rem in enumerate(bins)
                        if rem >= n]
                if fits:
                    _, i = min(fits)
                else:
                    bins.append(budget)
                    i = len(bins) - 1
                bins[i] -= n
                out[oid] = i
        return out

    DOCS = [(1, 6), (2, 5), (3, 4), (4, 4), (5, 3), (6, 2), (7, 2),
            (8, 1), (9, 1), (10, 12), (11, 10), (12, 7), (13, 3)]

    def test_matches_brute(self, spark):
        from dask_geopandas_spark.operators.sampling import \
            pack_best_fit

        df = spark.createDataFrame(self.DOCS,
                                   "doc_id long, n_tokens long")
        for budget in (10, 7, 16):
            got = {r["doc_id"]: r["pack_bin"] for r in
                   pack_best_fit(df, budget).collect()}
            assert got == self._brute(self.DOCS, budget), budget
            # budget respected for every non-overflow bin
            fill = {}
            for d, n in self.DOCS:
                fill[got[d]] = fill.get(got[d], 0) + n
            for bn, tot in fill.items():
                members = [n for d, n in self.DOCS if got[d] == bn]
                assert tot <= budget or (len(members) == 1
                                         and members[0] >= budget)

    def test_beats_inorder_packing(self, spark):
        """BFD's raison d'etre: adversarial in-order input wastes
        bins under boundary packing, BFD repacks tight."""
        from dask_geopandas_spark.operators.sampling import (
            pack_best_fit, pack_documents)

        rows = [(i, 6 if i % 2 == 0 else 4) for i in range(20)]
        df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
        bfd = pack_best_fit(df, 10)
        inorder = pack_documents(df, 10)
        n_bfd = bfd.select("pack_bin").distinct().count()
        n_ord = inorder.select("pack_bin").distinct().count()
        assert n_bfd == 10          # perfect 6+4 pairing
        assert n_bfd <= n_ord
        # per-bin totals exactly full
        tot = {r["pack_bin"]: 0 for r in bfd.collect()}
        for r in bfd.collect():
            tot[r["pack_bin"]] += r["n_tokens"]
        assert all(v == 10 for v in tot.values())

    def test_grouped_and_deterministic(self, spark):
        from dask_geopandas_spark.operators.sampling import \
            pack_best_fit

        rows = [(i, (i * 7) % 9 + 1, "a" if i % 3 else "b")
                for i in range(40)]
        df = (spark.createDataFrame(
            rows, "doc_id long, n_tokens long, src string")
            .repartition(8))
        got = {r["doc_id"]: r["pack_bin"] for r in
               pack_best_fit(df, 11, by="src").collect()}
        assert got == self._brute(rows, 11, by="src")
        again = {r["doc_id"]: r["pack_bin"] for r in
                 pack_best_fit(df, 11, by="src").collect()}
        assert got == again

    def test_overflow_doc_own_bin(self, spark):
        from dask_geopandas_spark.operators.sampling import \
            pack_best_fit

        rows = [(1, 25), (2, 3), (3, 3)]
        df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
        got = {r["doc_id"]: r["pack_bin"] for r in
               pack_best_fit(df, 10).collect()}
        assert got == self._brute(rows, 10)
        assert got[1] not in (got[2], got[3])
        assert got[2] == got[3]

    def test_validation(self, spark):
        from dask_geopandas_spark.operators.sampling import \
            pack_best_fit

        df = spark.createDataFrame([(1, 1)],
                                   "doc_id long, n_tokens long")
        with pytest.raises(ValueError, match="budget"):
            pack_best_fit(df, 0)
