"""IVF ANN recall vs brute force, and streaming/batch agreement for the
windowed event rollup (beyond-reference ops, SURVEY §2.9 note)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dask_geopandas_spark.operators import similarity as SIM


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def test_ivf_recall_vs_brute_force(spark, embeddings):
    queries = embeddings.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.brute_force_topk(embeddings, queries, k=5).collect()
    }
    cents = SIM.train_centroids(embeddings, n_cells=8, iters=2)
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.ivf_topk(embeddings, queries, cents, k=5, nprobe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    # nprobe=4 of 8 cells must recover well over half of the true top-5
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_ivf_scores_match_brute_force_when_found(spark, embeddings):
    """Scores for neighbors the IVF path does return must equal the exact
    cosine (the approximation drops candidates, never rescores them)."""
    queries = embeddings.filter(F.col("vec_id") < 5)
    cents = SIM.train_centroids(embeddings, n_cells=8, iters=1)
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cos"]
        for r in SIM.brute_force_topk(embeddings, queries, k=50).collect()
    }
    for r in SIM.ivf_topk(embeddings, queries, cents, k=5, nprobe=4).collect():
        key = (r["query_id"], r["neighbor_id"])
        if key in exact:
            assert r["cos"] == pytest.approx(exact[key], abs=1e-9)


def test_stream_batch_agreement(spark, sf_dir):
    """The watermarked streaming rollup must produce exactly the batch
    windowed aggregation (beyond-reference Structured Streaming path)."""
    from dask_geopandas_spark.streaming.geo import windowed_event_counts

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    static = spark.read.parquet(f"{sf_dir}/events.parquet")
    fix = lambda df: df.withColumn(
        "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
    ) if dict(df.dtypes).get("ts") == "bigint" else df

    batch = windowed_event_counts(fix(static), window="1 hour")

    stream = (spark.readStream.schema(static.schema)
              .option("pathGlobFilter", "events.parquet").parquet(sf_dir))
    agg = windowed_event_counts(fix(stream), window="1 hour")
    q = (agg.writeStream.format("memory").queryName("t_stream_sink")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.table("t_stream_sink")

    key = lambda r: (r["window_start"], r["event_type"])
    b = {key(r): (r["n_events"], r["sum_value"]) for r in batch.collect()}
    s = {key(r): (r["n_events"], r["sum_value"]) for r in got.collect()}
    assert b == s and len(b) > 0


def test_stateful_running_totals_stream(spark, sf_dir):
    """applyInPandasWithState keeps per-key (count, sum) across
    micro-batches; final state equals the batch aggregation."""
    from pyspark.sql import functions as F

    from dask_geopandas_spark.streaming.geo import stateful_running_totals

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    static = spark.read.parquet(f"{sf_dir}/events.parquet")
    fix = lambda df: df.withColumn(
        "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
    ) if dict(df.dtypes).get("ts") == "bigint" else df

    expected = {
        r["key"]: (r["running_n"], r["running_sum"])
        for r in stateful_running_totals(fix(static)).collect()
    }

    stream = (spark.readStream.schema(static.schema)
              .option("pathGlobFilter", "events.parquet")
              .option("maxFilesPerTrigger", "1").parquet(sf_dir))
    out = stateful_running_totals(fix(stream))
    q = (out.writeStream.format("memory").queryName("t_state_sink")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    # last emitted row per key == final running totals
    import collections
    got = {}
    for r in spark.table("t_state_sink").collect():
        got[r["key"]] = (r["running_n"], r["running_sum"])
    assert got == expected and len(got) == 5


def test_stored_ivf_index_prunes_partitions(spark, embeddings, tmp_path):
    """write_ivf_index + ivf_topk_stored: results match the in-memory
    ivf_topk on the same centroids/nprobe, and the corpus scan carries
    a static ivf_cell partition filter (pruned file listing)."""
    path = str(tmp_path / "ivf")
    cents = SIM.train_centroids(embeddings, n_cells=8, iters=2)
    SIM.write_ivf_index(embeddings, path, cents)

    queries = embeddings.filter(F.col("vec_id") < 10)
    stored = SIM.ivf_topk_stored(spark, path, queries, cents, k=5, nprobe=3)
    mem = SIM.ivf_topk(embeddings, queries, cents, k=5, nprobe=3)
    key = lambda df: sorted((r["query_id"], r["neighbor_id"], r["rank"])
                            for r in df.collect())
    assert key(stored) == key(mem) and len(key(stored)) > 0

    plan = stored._jdf.queryExecution().executedPlan().toString()
    scan = "\n".join(ln for ln in plan.splitlines() if "FileScan" in ln
                     or "PartitionFilters" in ln)
    assert "ivf_cell" in scan and "PartitionFilters: []" not in scan


def test_streaming_exact_dedup_matches_batch(spark, sf_dir, tmp_path):
    """The streaming dedup survivor fingerprint SET equals the batch
    DISTINCT set (keeper ids may differ; the set may not)."""
    from pyspark.sql import functions as F

    from dask_geopandas_spark.operators.textstats import fingerprint
    from dask_geopandas_spark.streaming.dedup import streaming_exact_dedup

    static = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stream = (spark.readStream.schema(static.schema)
              .option("pathGlobFilter", "documents.parquet")
              .parquet(sf_dir))
    q = (streaming_exact_dedup(stream, "text")
         .writeStream.format("memory").queryName("dedup_test_sink")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["fp"] for r in spark.table("dedup_test_sink")
           .select(fingerprint(F.col("text")).alias("fp")).collect()}
    want = {r["fp"] for r in
            static.select(fingerprint(F.col("text")).alias("fp"))
            .distinct().collect()}
    assert got == want


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Watermarked variant: duplicates arriving inside the watermark
    window dedup; state is bounded by the window (plumbing check — the
    semantics knob is dropDuplicatesWithinWatermark)."""
    import pandas as pd

    from dask_geopandas_spark.streaming.dedup import streaming_exact_dedup

    src = tmp_path / "docs_in"
    src.mkdir()
    pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["same doc", "same  doc", "other doc"],  # 1,2 normalize equal
        "ts": pd.to_datetime(["2024-01-01 00:00:00",
                              "2024-01-01 00:10:00",
                              "2024-01-01 00:20:00"]).astype("datetime64[us]"),
    }).to_parquet(src / "p.parquet")
    static = spark.read.parquet(str(src))
    stream = spark.readStream.schema(static.schema).parquet(str(src))
    out = streaming_exact_dedup(stream, "text", watermark="1 hour",
                                ts_col="ts")
    q = (out.writeStream.format("memory").queryName("dedup_wm_sink")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.table("dedup_wm_sink").collect()
    assert len(rows) == 2  # the normalized dup collapsed
    assert {r["text"] for r in rows} == {"same doc", "other doc"} or \
        {r["text"] for r in rows} == {"same  doc", "other doc"}


class TestProductQuantization:
    @pytest.fixture()
    def vecs(self, spark):
        rng = np.random.RandomState(13)
        # 6 well-separated cluster centers in 16-d
        centers = rng.uniform(-5, 5, (6, 16))
        rows = []
        for i in range(360):
            c = i % 6
            rows.append((i, [float(v) for v in
                             centers[c] + rng.normal(0, 0.5, 16)], c))
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int")

    def test_encode_matches_numpy_argmin(self, spark, vecs):
        from dask_geopandas_spark.operators.similarity import (pq_encode,
                                                               train_pq)

        books = train_pq(vecs, m=4, k=8, sample=360)
        got = {r["vec_id"]: list(r["pq_code"]) for r in
               pq_encode(vecs, books).select("vec_id", "pq_code").collect()}
        rows = vecs.orderBy("vec_id").collect()
        for r in rows:
            v = np.asarray(r["embedding"], dtype=np.float64)
            want = []
            for s, book in enumerate(books):
                sub = v[s * 4:(s + 1) * 4]
                C = np.asarray(book)
                want.append(int(((C - sub[None, :]) ** 2).sum(axis=1).argmin()))
            assert got[r["vec_id"]] == want

    def test_train_deterministic(self, vecs):
        from dask_geopandas_spark.operators.similarity import train_pq

        assert train_pq(vecs, m=4, k=8) == train_pq(vecs, m=4, k=8)

    def test_1nn_recall_at_10(self, spark, vecs):
        """The standard PQ metric (Jégou et al. §5, recall@R): the TRUE
        L2 nearest neighbor must appear in the ADC top-10 for most
        queries.  (PQ approximates squared Euclidean distance; exact-set
        overlap would be the wrong bar — quantized ties reorder
        freely.)"""
        from dask_geopandas_spark.operators.similarity import (pq_encode,
                                                               pq_topk,
                                                               train_pq)

        books = train_pq(vecs, m=8, k=16, sample=360)
        codes = pq_encode(vecs, books)
        queries = vecs.filter(F.col("vec_id") < 24)
        approx = pq_topk(codes, queries, books, k=10)
        got = {}
        for r in approx.collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        rows = vecs.orderBy("vec_id").collect()
        X = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
        hits = 0
        for qid in range(24):
            d = ((X - X[qid][None, :]) ** 2).sum(axis=1)
            d[qid] = np.inf
            hits += int(int(d.argmin()) in got.get(qid, set()))
        assert hits / 24 >= 0.75, hits / 24

    def test_encode_plan_is_native(self, vecs):
        from dask_geopandas_spark.operators.similarity import (pq_encode,
                                                               train_pq)

        books = train_pq(vecs, m=4, k=8)
        plan = pq_encode(vecs, books)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan

    def test_dim_validation(self, vecs):
        from dask_geopandas_spark.operators.similarity import train_pq

        with pytest.raises(ValueError, match="divisible"):
            train_pq(vecs, m=5, k=8)


def test_geofence_stream_batch_agreement(spark, sf_dir):
    """Stream-static geofence join + windowed rollup must equal the
    batch computation exactly (broadcast static fences into each
    micro-batch)."""
    import dask_geopandas_spark as dgs
    from dask_geopandas_spark.streaming.geo import windowed_geofence_counts

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    static = spark.read.parquet(f"{sf_dir}/events.parquet")

    def prep(df):
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
        return (df.withColumn("ex", (F.col("event_id") % 340 - 170) + F.lit(0.5))
                .withColumn("ey", (F.col("user_id") % 160 - 80) + F.lit(0.25)))

    import pandas as pd
    fences_pdf = pd.DataFrame({
        "fid": [0, 1, 2],
        "fx0": [-170.0, -50.0, 100.0], "fy0": [-80.0, -20.0, 40.0],
        "fx1": [-100.0, 50.0, 170.0], "fy1": [-30.0, 30.0, 79.0]})
    fences = dgs.boxes_from_bounds(spark.createDataFrame(fences_pdf),
                                   "fx0", "fy0", "fx1", "fy1",
                                   crs="EPSG:4326")

    batch = windowed_geofence_counts(prep(static), fences, "ex", "ey", "fid")

    stream = (spark.readStream.schema(static.schema)
              .option("pathGlobFilter", "events.parquet").parquet(sf_dir))
    agg = windowed_geofence_counts(prep(stream), fences, "ex", "ey", "fid")
    q = (agg.writeStream.format("memory").queryName("t_geofence_sink")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.table("t_geofence_sink")

    key = lambda r: (r["window_start"], r["fid"])
    b = {key(r): r["n_events"] for r in batch.collect()}
    s = {key(r): r["n_events"] for r in got.collect()}
    assert b == s and len(b) > 0


def test_geofence_left_join_and_refinement(spark):
    """Non-rectangular fences refine with the exact containment UDF;
    how='left' keeps unfenced points."""
    import pandas as pd

    import dask_geopandas_spark as dgs
    from dask_geopandas_spark.geometry import wkt as T
    from dask_geopandas_spark.streaming.geo import geofence_join

    pts = spark.createDataFrame(pd.DataFrame(
        {"pid": [0, 1, 2], "px": [1.0, 3.5, 50.0], "py": [1.0, 0.6, 50.0]}))
    # triangle fence: (0,0)-(4,0)-(0,4); (1,1) inside, (3.5,0.6) inside
    # its bbox but OUTSIDE the triangle
    tri = spark.createDataFrame(pd.DataFrame({
        "fid": [7],
        "geometry": [T.wkt_to_wkb("POLYGON ((0 0, 4 0, 0 4, 0 0))")]}))
    fences = dgs.GeoDataFrame(tri, "geometry", crs="EPSG:4326")
    inner = geofence_join(pts, fences, "px", "py")
    assert [r["pid"] for r in inner.select("pid").collect()] == [0]
    left = geofence_join(pts, fences, "px", "py", how="left")
    got = {r["pid"]: r["fid"] for r in left.select("pid", "fid").collect()}
    assert got == {0: 7, 1: None, 2: None}


def test_ivf_pq_index_prunes_and_scores(spark, embeddings, tmp_path):
    """write_ivf_pq_index stores (id, code) hive-partitioned by cell;
    ivf_pq_topk scans only the probed cells (static partition filter),
    scores from codes alone, and agrees with in-memory PQ scoring
    restricted to the same probed cells."""
    from dask_geopandas_spark.operators.similarity import (assign_ivf_cells,
                                                           ivf_pq_topk,
                                                           pq_encode,
                                                           train_centroids,
                                                           train_pq,
                                                           write_ivf_pq_index)

    path = str(tmp_path / "ivfpq")
    cents = train_centroids(embeddings, n_cells=8, iters=2)
    books = train_pq(embeddings, m=8, k=16, sample=512)
    write_ivf_pq_index(embeddings, path, cents, books)

    queries = embeddings.filter(F.col("vec_id") < 8)
    out = ivf_pq_topk(spark, path, queries, cents, books, k=5, nprobe=3)
    rows = out.collect()
    assert len({r["query_id"] for r in rows}) == 8
    assert all(1 <= r["rank"] <= 5 for r in rows)

    # the stored scan carries a static ivf_cell partition filter
    plan = out._jdf.queryExecution().executedPlan().toString()
    scan = "\n".join(ln for ln in plan.splitlines()
                     if "FileScan" in ln or "PartitionFilters" in ln)
    assert "ivf_cell" in scan and "PartitionFilters: []" not in scan
    # ... and reads codes, never the embedding vectors
    assert "embedding" not in scan

    # agreement with in-memory scoring over the same probed candidate set
    import numpy as np
    C = np.asarray(cents)
    coded = pq_encode(assign_ivf_cells(embeddings, cents), books)
    stored = spark.read.parquet(path)
    for r in queries.collect()[:3]:
        v = np.asarray(r["embedding"], dtype=np.float64)
        probe = set(np.argsort(((C - v[None])**2).sum(1), kind="stable")[:3].tolist())
        cand = {x["vec_id"] for x in
                stored.filter(F.col("ivf_cell").isin([int(p) for p in probe]))
                .select("vec_id").collect()}
        mem = {x["vec_id"] for x in
               coded.filter(F.col("ivf_cell").isin([int(p) for p in probe]))
               .select("vec_id").collect()}
        assert cand == mem


def test_sliding_windows_stream_batch_agreement(spark, sf_dir):
    """Sliding-window (1h / 15min) streaming rollup equals the batch
    computation exactly."""
    from dask_geopandas_spark.streaming.geo import windowed_event_counts

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    static = spark.read.parquet(f"{sf_dir}/events.parquet")
    fix = lambda df: df.withColumn(
        "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
    ) if dict(df.dtypes).get("ts") == "bigint" else df

    batch = windowed_event_counts(fix(static), window="1 hour",
                                  slide="15 minutes")
    stream = (spark.readStream.schema(static.schema)
              .option("pathGlobFilter", "events.parquet").parquet(sf_dir))
    agg = windowed_event_counts(fix(stream), window="1 hour",
                                slide="15 minutes")
    q = (agg.writeStream.format("memory").queryName("t_slide_sink")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.table("t_slide_sink")
    key = lambda r: (r["window_start"], r["event_type"])
    b = {key(r): (r["n_events"], r["sum_value"]) for r in batch.collect()}
    s = {key(r): (r["n_events"], r["sum_value"]) for r in got.collect()}
    assert b == s and len(b) > 0


def test_streaming_neardup_dedup(spark, tmp_path):
    """Simhash-bucket streaming near-dup: exact and near duplicates
    collapse; distinct content survives; stream survivors' simhash SET
    equals the batch distinct set."""
    import pandas as pd

    from dask_geopandas_spark.operators.dedup import simhash
    from dask_geopandas_spark.streaming.dedup import streaming_neardup_dedup

    src = tmp_path / "nd_in"
    src.mkdir()
    pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["the quick brown fox jumps over the lazy dog",
                 "the quick brown fox jumps over the lazy dog",   # exact
                 "the quick brown fox jumps over a lazy dog",     # near
                 "completely different content about spark engines"],
    }).to_parquet(src / "p.parquet")
    static = spark.read.parquet(str(src))
    stream = spark.readStream.schema(static.schema).parquet(str(src))
    q = (streaming_neardup_dedup(stream, "text", bits=16)
         .writeStream.format("memory").queryName("nd_sink")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["sh"] for r in spark.table("nd_sink")
           .select(simhash(F.col("text"), bits=16).alias("sh")).collect()}
    want = {r["sh"] for r in
            static.select(simhash(F.col("text"), bits=16).alias("sh"))
            .distinct().collect()}
    assert got == want
    # near-dups 1/2/3 collapse to <=2 buckets; doc 4 separate
    assert 2 <= len(got) <= 3


def test_knn_graph_recall_within_cells(spark, embeddings):
    """knn_graph edges match exact same-cell kNN computed in numpy, and
    every source emits at most k ranked edges."""
    import numpy as np

    cents = SIM.train_centroids(embeddings, n_cells=8, iters=2)
    out = SIM.knn_graph(embeddings, cents, k=3)
    rows = out.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["src_id"], []).append((r["rank"], r["dst_id"]))
    assert all(len(v) <= 3 for v in by_src.values())

    # exact same-cell kNN in numpy for a few sources
    data = embeddings.collect()
    X = np.asarray([r["embedding"] for r in data], dtype=np.float64)
    ids = np.asarray([r["vec_id"] for r in data])
    C = np.asarray(cents)
    cell = ((X[:, None, :] - C[None]) ** 2).sum(2).argmin(1)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    for src in list(by_src)[:5]:
        i = int(np.where(ids == src)[0][0])
        mask = (cell == cell[i]) & (ids != src)
        cand = np.where(mask)[0]
        sims = Xn[cand] @ Xn[i]
        order = cand[np.lexsort((ids[cand], -np.round(sims, 9)))][:3]
        want = [int(ids[j]) for j in order]
        got = [d for _, d in sorted(by_src[src])]
        assert got == want, (src, got, want)


# ----------------------------------------------------------------------
# knn_graph hot-cell guards (PQ-code pruning + cell_cap salt split)
# ----------------------------------------------------------------------
def _hot_cell_frame(spark):
    """60 vectors, HALF concentrated in one IVF cell (a near-duplicate
    cluster — the adversarial case for a per-cell self-join)."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(7)
    rows = []
    for i in range(60):
        if i < 30:
            base = np.zeros(8)
        elif i < 45:
            base = np.full(8, 5.0)
        else:
            base = np.full(8, 9.0)
        rows.append(base + rng.uniform(-0.5, 0.5, 8))
    pdf = pd.DataFrame({
        "vec_id": np.arange(60, dtype=np.int64),
        "embedding": [list(map(float, v)) for v in rows],
    })
    cents = [[0.0] * 8, [5.0] * 8, [9.0] * 8]
    return spark.createDataFrame(pdf), cents


def _formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_knn_graph_pq_path_agrees_with_exact(spark):
    """With shortlist >= the largest cell, the PQ-pruned path reranks
    every same-cell candidate with exact cosine, so its edges equal the
    default (full-vector) path exactly."""
    df, cents = _hot_cell_frame(spark)
    books = SIM.train_pq(df, m=2, k=4, sample=60)
    exact = {(r["src_id"], r["rank"]): r["dst_id"]
             for r in SIM.knn_graph(df, cents, k=3).collect()}
    pq = {(r["src_id"], r["rank"]): r["dst_id"]
          for r in SIM.knn_graph(df, cents, k=3, codebooks=books,
                                 shortlist=40).collect()}
    assert pq == exact


def test_knn_graph_cell_cap_preserves_pairs(spark):
    """The salt split bounds per-key join input without changing which
    pairs meet: capped and uncapped runs are identical, on both the
    full-vector and the PQ-pruned path."""
    df, cents = _hot_cell_frame(spark)
    books = SIM.train_pq(df, m=2, k=4, sample=60)
    for kw in (dict(), dict(codebooks=books, shortlist=40)):
        base = sorted((r["src_id"], r["rank"], r["dst_id"]) for r in
                      SIM.knn_graph(df, cents, k=3, **kw).collect())
        capped = sorted((r["src_id"], r["rank"], r["dst_id"]) for r in
                        SIM.knn_graph(df, cents, k=3, cell_cap=5,
                                      **kw).collect())
        assert capped == base and len(base) > 0


def test_salted_cell_join_caches_input_once(spark):
    """r5 (ADVICE r4): the cell_cap counts job must not recompute the
    assign/encode pipeline — _salted_cell_join persists its input so
    the counts job materializes it once and both join branches read
    the cache; the cache is tracked and releasable."""
    df, cents = _hot_cell_frame(spark)
    SIM.release_cached_salt_inputs()  # clean slate
    books = SIM.train_pq(df, m=2, k=4, sample=60)
    out = SIM.knn_graph(df, cents, k=3, codebooks=books, cell_cap=5)
    assert SIM._CACHED_SALT_INPUTS
    cached = SIM._CACHED_SALT_INPUTS[-1]
    assert cached.storageLevel.useMemory or cached.storageLevel.useDisk
    assert out.count() > 0
    assert SIM.release_cached_salt_inputs() >= 1
    assert not SIM._CACHED_SALT_INPUTS
    assert not (cached.storageLevel.useMemory or cached.storageLevel.useDisk)


def test_knn_graph_pq_cell_join_shuffles_codes_not_vectors(spark):
    """The quadratic stage of the PQ path must move m-byte codes, not
    d-dimensional vectors: every Exchange keyed on the IVF cell carries
    pq codes and no embedding column (vectors re-enter only through the
    uniform id-keyed rejoin of the surviving shortlist)."""
    df, cents = _hot_cell_frame(spark)
    books = SIM.train_pq(df, m=2, k=4, sample=60)
    # r5: the persisted cell-join input has exact (tiny) stats, so the
    # toy-scale planner would broadcast it; disable auto-broadcast to
    # pin the corpus-scale plan shape (a corpus-sized side can never
    # broadcast — the shuffle is what exists at 100 TB)
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = SIM.knn_graph(df, cents, k=3, codebooks=books, cell_cap=5)
        plan = _formatted_plan(out)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
        SIM.release_cached_salt_inputs()
    cell_exchanges = [
        blk for blk in plan.split("\n\n")
        if blk.lstrip().startswith("(") and "Exchange" in blk.splitlines()[0]
        and "hashpartitioning(ivf_cell" in blk
    ]
    assert cell_exchanges, plan  # the cell join does shuffle
    for blk in cell_exchanges:
        assert "embedding" not in blk, blk


def test_event_sequence_join_stream_equals_batch(spark, tmp_path):
    """Stream-stream funnel join: the watermarked streaming run under
    availableNow must produce exactly the batch inequality join, with
    closed [t, t+T] bounds."""
    import pandas as pd

    from dask_geopandas_spark.streaming.joins import event_sequence_join

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = tmp_path / "ev"
    src.mkdir()
    rows = []
    # user 1: click at 0min; purchases at 10min (in), 30min (boundary,
    # in), 31min (out).  user 2: purchase before click (out).
    base = pd.Timestamp("2024-01-01 00:00:00")
    rows += [(1, base, 1, "click", 0.0)]
    rows += [(2, base + pd.Timedelta(minutes=10), 1, "purchase", 5.0)]
    rows += [(3, base + pd.Timedelta(minutes=30), 1, "purchase", 7.0)]
    rows += [(4, base + pd.Timedelta(minutes=31), 1, "purchase", 9.0)]
    rows += [(5, base + pd.Timedelta(minutes=10), 2, "purchase", 1.0)]
    rows += [(6, base + pd.Timedelta(minutes=20), 2, "click", 0.0)]
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                      "event_type", "value"])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")  # Spark rejects NANOS
    pdf.to_parquet(src / "p.parquet")
    static = spark.read.parquet(str(src))

    def split(df):
        return (df.filter(F.col("event_type") == "click"),
                df.filter(F.col("event_type") == "purchase"))

    batch = {(r["first_event_id"], r["then_event_id"]) for r in
             event_sequence_join(*split(static)).collect()}
    assert batch == {(1, 2), (1, 3)}

    stream = spark.readStream.schema(static.schema).parquet(str(src))
    out = event_sequence_join(*split(stream))
    q = (out.writeStream.format("memory").queryName("funnel_sink")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["first_event_id"], r["then_event_id"]) for r in
           spark.table("funnel_sink").collect()}
    assert got == batch


def test_event_sequence_left_join_stream_equals_batch(spark, tmp_path):
    """r5 (VERDICT r4 #6): how='left' keeps first-events with NO match
    (abandonment, then_* NULL).  Streaming emits an unmatched row only
    once the watermark proves no match can arrive, so below the
    watermark-complete cutoff (max ts − watermark − within) the stream
    result must equal the batch left join exactly — and a trailing
    unmatched click above the cutoff is the documented gap."""
    import pandas as pd

    from dask_geopandas_spark.streaming.joins import event_sequence_join

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = tmp_path / "evl"
    src.mkdir()
    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = [
        (1, base, 1, "click", 0.0),                              # converts
        (2, base + pd.Timedelta(minutes=10), 1, "purchase", 5.0),
        (3, base + pd.Timedelta(minutes=5), 2, "click", 0.0),    # abandoned
        (4, base + pd.Timedelta(minutes=40), 2, "purchase", 1.0),  # too late
        (5, base + pd.Timedelta(hours=6), 3, "purchase", 1.0),   # watermark
        (6, base + pd.Timedelta(hours=6), 4, "click", 0.0),      # trailing
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                      "event_type", "value"])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(src / "p.parquet")
    static = spark.read.parquet(str(src))

    def split(df):
        return (df.filter(F.col("event_type") == "click"),
                df.filter(F.col("event_type") == "purchase"))

    batch = {(r["first_event_id"], r["then_event_id"]) for r in
             event_sequence_join(*split(static), how="left").collect()}
    assert batch == {(1, 2), (3, None), (6, None)}

    stream = spark.readStream.schema(static.schema).parquet(str(src))
    out = event_sequence_join(*split(stream), how="left")
    q = (out.writeStream.format("memory").queryName("funnel_left_sink")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["first_event_id"], r["then_event_id"]) for r in
           spark.table("funnel_left_sink").collect()}
    cutoff = pdf["ts"].max() - pd.Timedelta(minutes=151)
    below = {(f, t) for f, t in batch
             if pdf.set_index("event_id")["ts"][f] <= cutoff}
    assert below <= got <= batch
    assert (3, None) in got  # the abandonment row did emit

    with pytest.raises(ValueError, match="how"):
        event_sequence_join(*split(static), how="left_anti")


def test_semantic_dedup_matches_union_find(spark):
    """r5: semantic_dedup == brute-force (numpy cells + threshold
    pairs + union-find keep-min + untouched pass-through), with and
    without the hot-cell salt split."""
    import numpy as np

    df, cents = _hot_cell_frame(spark)
    pdf = df.toPandas()
    M = np.array([np.asarray(v, float) for v in pdf["embedding"]])
    C = np.asarray(cents, float)
    cells = np.argmin(((M[:, None, :] - C[None, :, :]) ** 2).sum(-1), axis=1)
    norm = M / np.linalg.norm(M, axis=1, keepdims=True)
    cos = norm @ norm.T
    thr = 0.999
    parent = list(range(len(M)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    touched = set()
    for i in range(len(M)):
        for j in range(i + 1, len(M)):
            if cells[i] == cells[j] and round(cos[i, j], 9) >= thr:
                parent[find(i)] = find(j)
                touched |= {i, j}
    comp = {}
    for i in touched:
        comp.setdefault(find(i), []).append(i)
    drop = {i for vs in comp.values() for i in vs if i != min(vs)}
    want = sorted(int(pdf["vec_id"][i]) for i in range(len(M))
                  if i not in drop)
    assert drop  # the hot cell of near-identical vectors collapses
    for cap in (None, 5):
        got = sorted(r["vec_id"] for r in
                     SIM.semantic_dedup(df, cents, threshold=thr,
                                        cell_cap=cap).collect())
        assert got == want, cap
    SIM.release_cached_salt_inputs()


def _unit_norm_frame(spark):
    """45 unit-normalized vectors in three tight direction clusters;
    TWO directions share an IVF cell (A at e1 and B at (e1+e2)/√2 both
    land in cell 0), so the cell self-join sees true near-dup pairs
    AND far same-cell pairs — what an SDC prefilter must separate."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(11)
    dirs = [np.eye(8)[0],
            (np.eye(8)[0] + np.eye(8)[1]) / np.sqrt(2.0),
            np.eye(8)[5]]
    rows = []
    for i in range(45):
        v = dirs[i // 15] + rng.uniform(-0.02, 0.02, 8)
        rows.append(v / np.linalg.norm(v))
    pdf = pd.DataFrame({
        "vec_id": np.arange(45, dtype=np.int64),
        "embedding": [list(map(float, v)) for v in rows],
    })
    cents = [list(map(float, dirs[0])), list(map(float, dirs[2]))]
    return spark.createDataFrame(pdf), cents


def test_semantic_dedup_pq_prefilter_superset(spark):
    """r6 (verdict #3): the SDC prefilter at the default margin keeps
    a SUPERSET of the exact-threshold pairs on the fixture corpus
    (recall intact) while pruning far same-cell pairs (the shuffle
    saving is real), and the end-to-end PQ path equals the exact
    vector path."""
    import numpy as np

    df, cents = _unit_norm_frame(spark)
    books = SIM.train_pq(df, m=2, k=4, sample=45)
    thr, margin = 0.99, 0.15

    pdf = df.toPandas()
    M = np.array([np.asarray(v, float) for v in pdf["embedding"]])
    C = np.asarray(cents, float)
    cells = np.argmin(((M[:, None, :] - C[None, :, :]) ** 2).sum(-1),
                      axis=1)
    cos = (M / np.linalg.norm(M, axis=1, keepdims=True)) @ \
        (M / np.linalg.norm(M, axis=1, keepdims=True)).T
    # numpy replica of pq_encode + sdc_luts
    B = [np.asarray(book, float) for book in books]
    sub = M.reshape(len(M), len(B), -1)
    codes = np.stack([
        np.argmin(((sub[:, s, None, :] - B[s][None, :, :]) ** 2).sum(-1),
                  axis=1) for s in range(len(B))], axis=1)
    luts = [((B[s][:, None, :] - B[s][None, :, :]) ** 2).sum(-1)
            for s in range(len(B))]
    same_cell = [(i, j) for i in range(len(M)) for j in range(i + 1, len(M))
                 if cells[i] == cells[j]]
    true_pairs = {(i, j) for i, j in same_cell
                  if round(cos[i, j], 9) >= thr}
    bound = 2.0 * (1.0 - thr + margin)
    cand_pairs = {(i, j) for i, j in same_cell
                  if sum(luts[s][codes[i, s], codes[j, s]]
                         for s in range(len(B))) <= bound}
    assert true_pairs, "fixture must contain near-dup pairs"
    assert true_pairs <= cand_pairs          # recall at this margin
    assert len(cand_pairs) < len(same_cell)  # and real pruning
    exact = sorted(r["vec_id"] for r in
                   SIM.semantic_dedup(df, cents, threshold=thr).collect())
    pq = sorted(r["vec_id"] for r in
                SIM.semantic_dedup(df, cents, threshold=thr,
                                   codebooks=books,
                                   sdc_margin=margin).collect())
    assert pq == exact
    assert len(exact) < 45  # something deduplicated


def test_semantic_dedup_pq_cell_join_shuffles_codes_not_vectors(spark):
    """r6 (verdict #3): with codebooks, semantic_dedup's cell-keyed
    Exchanges carry pq codes and no embedding column — the vectors
    re-enter only through the uniform id-keyed rejoin of the SDC
    survivors."""
    df, cents = _unit_norm_frame(spark)
    books = SIM.train_pq(df, m=2, k=4, sample=45)
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = SIM.semantic_dedup_edges(df, cents, threshold=0.99,
                                       codebooks=books, cell_cap=5)
        plan = _formatted_plan(out)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
        SIM.release_cached_salt_inputs()
    cell_exchanges = [
        blk for blk in plan.split("\n\n")
        if blk.lstrip().startswith("(") and "Exchange" in blk.splitlines()[0]
        and "hashpartitioning(ivf_cell" in blk
    ]
    assert cell_exchanges, plan
    for blk in cell_exchanges:
        assert "embedding" not in blk, blk


def test_semantic_dedup_releases_own_salt_caches(spark):
    """r6 (ADVICE r5): semantic_dedup's eager CC stage consumes the
    salt-join cache inside the call, so the operator itself releases
    the entries it created — callers neither leak nor double-free,
    and caller-held caches survive."""
    df, cents = _hot_cell_frame(spark)
    SIM.release_cached_salt_inputs()
    sentinel = df.select("vec_id")
    from pyspark import StorageLevel
    sentinel.persist(StorageLevel.MEMORY_AND_DISK)
    SIM._CACHED_SALT_INPUTS.append(sentinel)   # a caller-held cache
    try:
        out = SIM.semantic_dedup(df, cents, threshold=0.999, cell_cap=5)
        assert out.count() > 0
        # ours released, the caller's entry untouched
        assert SIM._CACHED_SALT_INPUTS == [sentinel]
        assert (sentinel.storageLevel.useMemory
                or sentinel.storageLevel.useDisk)
    finally:
        SIM.release_cached_salt_inputs()


def test_state_partitions_scope(spark):
    """r5: the state-sizing scope sets shuffle partitions only inside
    the with-block, restores on exit (and on error), and None is a
    no-op — batch queries must never inherit a streaming-sized value."""
    from dask_geopandas_spark.streaming.joins import state_partitions

    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    with state_partitions(spark, 3):
        assert spark.conf.get(key) == "3"
    assert spark.conf.get(key) == old
    with state_partitions(spark, None):
        assert spark.conf.get(key) == old
    with pytest.raises(RuntimeError):
        with state_partitions(spark, 5):
            assert spark.conf.get(key) == "5"
            raise RuntimeError("boom")
    assert spark.conf.get(key) == old


def test_funnel_join_three_steps_stream_equals_batch(spark, tmp_path):
    """r5: N-step funnel = chained stream-stream joins under ONE
    streaming query (multiple stateful operators, propagated
    watermarks).  The inner-join chain is append-complete under
    availableNow, so stream == batch exactly."""
    import pandas as pd

    from dask_geopandas_spark.streaming.joins import funnel_join

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = tmp_path / "f3"
    src.mkdir()
    base = pd.Timestamp("2024-01-01")
    rows = [
        (1, base, 1, "view", 0.0),
        (2, base + pd.Timedelta(minutes=5), 1, "click", 0.0),
        (3, base + pd.Timedelta(minutes=10), 1, "purchase", 9.0),  # full
        (4, base, 2, "view", 0.0),
        (5, base + pd.Timedelta(minutes=5), 2, "click", 0.0),      # no buy
        (6, base + pd.Timedelta(minutes=40), 2, "purchase", 1.0),  # late
        (7, base + pd.Timedelta(hours=6), 3, "view", 0.0),
        (8, base + pd.Timedelta(hours=6), 3, "click", 0.0),
        (9, base + pd.Timedelta(hours=6), 3, "purchase", 2.0),     # full
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                      "event_type", "value"])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(src / "p.parquet")
    static = spark.read.parquet(str(src))

    steps = ["view", "click", "purchase"]
    batch = {(r["step1_id"], r["step2_id"], r["step3_id"]) for r in
             funnel_join(static, steps).collect()}
    assert batch == {(1, 2, 3), (7, 8, 9)}

    stream = spark.readStream.schema(static.schema).parquet(str(src))
    out = funnel_join(stream, steps)
    q = (out.writeStream.format("memory").queryName("f3_test_sink")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["step1_id"], r["step2_id"], r["step3_id"]) for r in
           spark.table("f3_test_sink").collect()}
    assert got == batch

    with pytest.raises(ValueError, match="two steps"):
        funnel_join(static, ["view"])


def test_funnel_join_left_last_hop(spark, tmp_path):
    """r5: last_how='left' keeps step-(N-1) completers with NULL final
    step (deep-funnel abandonment); streaming emits them once the
    watermark rules a match out — below the propagated-watermark
    cutoff the stream equals the batch left chain exactly."""
    import pandas as pd

    from dask_geopandas_spark.streaming.joins import funnel_join

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = tmp_path / "f3l"
    src.mkdir()
    base = pd.Timestamp("2024-01-01")
    rows = [
        (1, base, 1, "view", 0.0),
        (2, base + pd.Timedelta(minutes=5), 1, "click", 0.0),
        (3, base + pd.Timedelta(minutes=10), 1, "purchase", 9.0),
        (4, base, 2, "view", 0.0),
        (5, base + pd.Timedelta(minutes=5), 2, "click", 0.0),  # abandoned
        (6, base + pd.Timedelta(hours=9), 3, "purchase", 1.0),
        (7, base + pd.Timedelta(hours=9), 3, "view", 0.0),
        (8, base + pd.Timedelta(hours=9), 3, "click", 0.0),
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                      "event_type", "value"])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(src / "p.parquet")
    static = spark.read.parquet(str(src))
    steps = ["view", "click", "purchase"]
    batch = {(r["step1_id"], r["step2_id"], r["step3_id"]) for r in
             funnel_join(static, steps, last_how="left").collect()}
    assert batch == {(1, 2, 3), (4, 5, None), (7, 8, 6)}

    stream = spark.readStream.schema(static.schema).parquet(str(src))
    out = funnel_join(stream, steps, last_how="left")
    q = (out.writeStream.format("memory").queryName("f3l_test_sink")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["step1_id"], r["step2_id"], r["step3_id"]) for r in
           spark.table("f3l_test_sink").collect()}
    assert got == batch  # the 9h watermark push flushes the abandonment

    with pytest.raises(ValueError, match="last_how"):
        funnel_join(static, steps, last_how="anti")


def test_knn_graph_nprobe_full_probe_equals_global_knn(spark):
    """r6: with nprobe = n_cells every source probes every cell, so
    knn_graph must equal the GLOBAL brute-force kNN exactly — the
    same-cell recall limit is gone; and nprobe=2's candidate set is a
    superset of nprobe=1's (monotone recall)."""
    import numpy as np

    df, cents = _hot_cell_frame(spark)
    pdf = df.toPandas()
    M = np.array([np.asarray(v, float) for v in pdf["embedding"]])
    norm = M / np.linalg.norm(M, axis=1, keepdims=True)
    cos = norm @ norm.T
    want = {}
    for i in range(len(M)):
        order = sorted(((round(cos[i, j], 9), -j) for j in range(len(M))
                        if j != i), reverse=True)
        for r, (c, nj) in enumerate(order[:3], start=1):
            want[(int(pdf["vec_id"][i]), r)] = int(pdf["vec_id"][-nj])
    got = {(r["src_id"], r["rank"]): r["dst_id"] for r in
           SIM.knn_graph(df, cents, k=3, nprobe=len(cents)).collect()}
    assert got == want
    e1 = {(r["src_id"], r["dst_id"]) for r in
          SIM.knn_graph(df, cents, k=60, nprobe=1).collect()}
    e2 = {(r["src_id"], r["dst_id"]) for r in
          SIM.knn_graph(df, cents, k=60, nprobe=2).collect()}
    assert e1 < e2  # strictly more cross-boundary candidates
    # PQ path agrees with the plain path under full probing too
    books = SIM.train_pq(df, m=2, k=4, sample=60)
    pq = {(r["src_id"], r["rank"]): r["dst_id"] for r in
          SIM.knn_graph(df, cents, k=3, nprobe=len(cents),
                        codebooks=books, shortlist=60).collect()}
    assert pq == want
    with pytest.raises(ValueError, match="nprobe"):
        SIM.knn_graph(df, cents, nprobe=0)


def test_semantic_dedup_nprobe_recovers_boundary_pairs(spark):
    """r6: a near-duplicate cluster sitting ON the k-means cell
    boundary (each member falls to cell 0 or 1 by its noise sign) is
    the published SemDeDup recipe's blind spot — nprobe=1 misses every
    cross-cell pair, nprobe=n_cells must equal the GLOBAL (no cell
    constraint) union-find dedup exactly; edges are unique with
    src < dst whichever direction probing found them; and the PQ-coded
    path composes with probing."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(23)
    e = np.eye(8)
    mid = (e[0] + e[1]) / np.sqrt(2.0)
    rows = [mid + rng.uniform(-0.01, 0.01, 8) for _ in range(20)]
    rows += [e[4], e[5], e[6]]  # untouched singleton directions
    rows = [v / np.linalg.norm(v) for v in rows]
    pdf = pd.DataFrame({
        "vec_id": np.arange(len(rows), dtype=np.int64),
        "embedding": [list(map(float, v)) for v in rows],
    })
    df = spark.createDataFrame(pdf)
    cents = [list(map(float, e[0])), list(map(float, e[1]))]

    M = np.array(rows)
    C = np.asarray(cents, float)
    cells = np.argmin(((M[:, None, :] - C[None, :, :]) ** 2).sum(-1),
                      axis=1)
    assert len(set(cells[:20])) == 2, "cluster must straddle the boundary"
    cos = M @ M.T  # already unit-normalized
    thr = 0.999

    def dedup_ids(pair_ok):
        parent = list(range(len(M)))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        touched = set()
        for i in range(len(M)):
            for j in range(i + 1, len(M)):
                if pair_ok(i, j) and round(cos[i, j], 9) >= thr:
                    parent[find(i)] = find(j)
                    touched |= {i, j}
        comp = {}
        for i in touched:
            comp.setdefault(find(i), []).append(i)
        drop = {i for vs in comp.values() for i in vs if i != min(vs)}
        return sorted(i for i in range(len(M)) if i not in drop)

    want_global = dedup_ids(lambda i, j: True)
    want_cellbound = dedup_ids(lambda i, j: cells[i] == cells[j])
    assert set(want_cellbound) > set(want_global)  # the gap is real

    got1 = sorted(r["vec_id"] for r in
                  SIM.semantic_dedup(df, cents, threshold=thr).collect())
    got2 = sorted(r["vec_id"] for r in
                  SIM.semantic_dedup(df, cents, threshold=thr,
                                     nprobe=2).collect())
    assert got1 == want_cellbound
    assert got2 == want_global

    # edge uniqueness under asymmetric probing: src < dst, no dups
    edges = SIM.semantic_dedup_edges(df, cents, threshold=thr,
                                     nprobe=2).collect()
    pairs = [(r["src_id"], r["dst_id"]) for r in edges]
    assert len(pairs) == len(set(pairs))
    assert all(s < d for s, d in pairs)
    want_edges = {(i, j) for i in range(len(M))
                  for j in range(i + 1, len(M))
                  if round(cos[i, j], 9) >= thr}
    assert set(pairs) == want_edges

    # PQ path + cell_cap compose with probing (generous margin)
    books = SIM.train_pq(df, m=2, k=4, sample=len(rows))
    got_pq = sorted(r["vec_id"] for r in
                    SIM.semantic_dedup(df, cents, threshold=thr,
                                       nprobe=2, codebooks=books,
                                       sdc_margin=0.3,
                                       cell_cap=5).collect())
    assert got_pq == want_global
    SIM.release_cached_salt_inputs()

    with pytest.raises(ValueError, match="nprobe"):
        SIM.semantic_dedup_edges(df, cents, nprobe=0)


def test_train_centroids_rounds_and_carries_empty_cells(spark):
    """r6: train_centroids is exactly SQL-replicable — every Lloyd
    update rounds to round_decimals engine-side (the returned floats
    carry no sub-1e-6 residue), a cell that loses all members keeps
    its previous centroid, and the numpy replica of the whole run
    (seeds → first-min argmin → round-6 means) agrees exactly."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(3)
    # vec 1 duplicates vec 0 exactly: the two seeds are identical, so
    # EVERY point ties and the first-min argmin sends all of them to
    # cell 0 — cell 1 provably empties and must carry its centroid
    M = rng.uniform(0.0, 0.05, (20, 4))
    M[1] = M[0]
    pdf = pd.DataFrame({
        "vec_id": np.arange(20, dtype=np.int64),
        "embedding": [list(map(float, v)) for v in M],
    })
    df = spark.createDataFrame(pdf)
    cents = SIM.train_centroids(df, n_cells=2, iters=2)
    cents1 = SIM.train_centroids(df, n_cells=2, iters=1)

    # numpy replica: identical seeds, argmin-first tiebreak, round-6
    # means, emptied-cell carry
    C = [list(M[0]), list(M[1])]
    for _ in range(2):
        d = ((M[:, None, :] - np.asarray(C)[None, :, :]) ** 2).sum(-1)
        cells = np.argmin(d, axis=1)  # first min on ties, like Spark
        for c in range(2):
            members = M[cells == c]
            if len(members):
                C[c] = [float(round(v, 6)) for v in members.mean(axis=0)]
    assert cents == C
    # after ONE iteration cell 1 is provably empty (every tie broke to
    # cell 0), so it carries its raw (unrounded) seed coordinates;
    # iteration 2 then wins members back to the stale seed — a real
    # point — which the iters=2 replica equality above covers
    assert cents1[1] == list(map(float, M[1]))
    assert cents1[0] != cents1[1]  # cell 0 DID move off the shared seed
    for v in cents[0]:
        assert v == round(v, 6)
    # rounding off → the legacy unrounded path still trains
    raw = SIM.train_centroids(df, n_cells=2, iters=1,
                              round_decimals=None)
    assert len(raw) == 2 and len(raw[0]) == 4


def test_ivf_index_append_equals_rebuild(spark, embeddings, tmp_path):
    """r6: appending a disjoint vector batch (same centroids) to a
    stored IVF index gives identical stored-search results to
    rebuilding over the union."""
    cents = SIM.train_centroids(embeddings, n_cells=8, iters=1)
    a = embeddings.filter("vec_id < 120")
    b = embeddings.filter("vec_id >= 120")
    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    SIM.write_ivf_index(a, inc, cents)
    SIM.write_ivf_index(b, inc, cents, append=True)
    SIM.write_ivf_index(embeddings, full, cents)
    queries = embeddings.filter("vec_id < 10")
    got = sorted((r["query_id"], r["rank"], r["neighbor_id"], r["cos"])
                 for r in SIM.ivf_topk_stored(spark, inc, queries,
                                              cents, k=5, nprobe=3)
                 .collect())
    want = sorted((r["query_id"], r["rank"], r["neighbor_id"], r["cos"])
                  for r in SIM.ivf_topk_stored(spark, full, queries,
                                               cents, k=5, nprobe=3)
                  .collect())
    assert got == want and len(want) == 50


def test_rowwise_quality_ops_run_on_streams(spark, sf_dir, tmp_path):
    """r6: the row-wise curation ops — blocklist filter, classifier
    score, code signals, token-window chunking — are stateless
    expressions, so the SAME calls run unchanged under Structured
    Streaming and agree with batch row-for-row (the engine's
    batch/stream unification claim, attested rather than asserted)."""
    from dask_geopandas_spark.operators.sampling import chunk_documents
    from dask_geopandas_spark.operators.textstats import (
        blocklist_filter, classifier_score, code_signals)

    src_dir = tmp_path / "rw_in"
    (spark.read.parquet(f"{sf_dir}/documents.parquet")
     .select("doc_id", "text").filter("doc_id < 150")
     .write.parquet(str(src_dir)))
    static = spark.read.parquet(str(src_dir))
    stream = (spark.readStream.schema(static.schema)
              .parquet(str(src_dir)))
    weights = [((i * 37) % 101 - 50) / 100.0 for i in range(64)]

    def pipe(df):
        out = blocklist_filter(df, ["slow", "blob"])
        out = classifier_score(out, weights)
        out = out.select("doc_id", "quality_score",
                         code_signals(F.col("text"))["max_line_len"]
                         .alias("mll"), "text")
        return chunk_documents(out, max_tokens=32, overlap=8) \
            .select("doc_id", "quality_score", "mll", "chunk_id", "text")

    q = (pipe(stream).writeStream.format("memory")
         .queryName("rowwise_sink").outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.table("rowwise_sink").collect()))
    want = sorted(map(tuple, pipe(static).collect()))
    assert got == want and len(want) > 20


def test_semantic_dedup_keep_far_from_centroid(spark):
    """r7 (verdict r6 #5): keep='far_from_centroid' retains each
    duplicate cluster's member with the LOWEST cosine to its own cell
    centroid (the published SemDeDup keeper — hard examples survive),
    ties to the smaller id; pass-through rows untouched; min_id stays
    the default."""
    import numpy as np

    df, cents = _hot_cell_frame(spark)
    pdf = df.toPandas()
    M = np.array([np.asarray(v, float) for v in pdf["embedding"]])
    C = np.asarray(cents, float)
    cells = np.argmin(((M[:, None, :] - C[None, :, :]) ** 2).sum(-1),
                      axis=1)
    norm = M / np.linalg.norm(M, axis=1, keepdims=True)
    cos = norm @ norm.T
    thr = 0.999
    parent = list(range(len(M)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    touched = set()
    for i in range(len(M)):
        for j in range(i + 1, len(M)):
            if cells[i] == cells[j] and round(cos[i, j], 9) >= thr:
                parent[find(i)] = find(j)
                touched |= {i, j}
    comp = {}
    for i in touched:
        comp.setdefault(find(i), []).append(i)

    def ccos(i):
        c = C[cells[i]]
        return round(float(M[i] @ c
                           / (np.linalg.norm(M[i]) * np.linalg.norm(c))),
                     9)

    drop = set()
    for vs in comp.values():
        keeper = min(vs, key=lambda i: (ccos(i), int(pdf["vec_id"][i])))
        drop |= {i for i in vs if i != keeper}
    want = sorted(int(pdf["vec_id"][i]) for i in range(len(M))
                  if i not in drop)
    got = sorted(r["vec_id"] for r in
                 SIM.semantic_dedup(df, cents, threshold=thr,
                                    keep="far_from_centroid").collect())
    assert got == want
    # the keeper rule genuinely differs from min_id on this frame
    got_min = sorted(r["vec_id"] for r in
                     SIM.semantic_dedup(df, cents,
                                        threshold=thr).collect())
    assert got != got_min
    assert len(got) == len(got_min)  # same cluster count either way
    import pytest as _pt
    with _pt.raises(ValueError, match="keep"):
        SIM.semantic_dedup(df, cents, keep="nope")
    SIM.release_cached_salt_inputs()


def test_semantic_dedup_keep_composes_with_pq_and_probe(spark):
    """r7: the far-from-centroid keeper is edge-path-independent — it
    composes with codebooks (PQ edge stage) and nprobe unchanged,
    matching brute force with the SAME edge semantics."""
    import numpy as np

    df, cents = _unit_norm_frame(spark)
    thr = 0.99
    # reference: edges from the plain vector path at nprobe=1 (the PQ
    # prefilter at a wide margin keeps every true pair on this frame)
    pdf = df.toPandas()
    M = np.array([np.asarray(v, float) for v in pdf["embedding"]])
    C = np.asarray(cents, float)
    cells = np.argmin(((M[:, None, :] - C[None, :, :]) ** 2).sum(-1),
                      axis=1)
    norm = M / np.linalg.norm(M, axis=1, keepdims=True)
    cos = norm @ norm.T
    parent = list(range(len(M)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    touched = set()
    for i in range(len(M)):
        for j in range(i + 1, len(M)):
            if cells[i] == cells[j] and round(cos[i, j], 9) >= thr:
                parent[find(i)] = find(j)
                touched |= {i, j}
    comp = {}
    for i in touched:
        comp.setdefault(find(i), []).append(i)

    def ccos(i):
        c = C[cells[i]]
        return round(float(M[i] @ c
                           / (np.linalg.norm(M[i]) * np.linalg.norm(c))),
                     9)

    drop = set()
    for vs in comp.values():
        keeper = min(vs, key=lambda i: (ccos(i), int(pdf["vec_id"][i])))
        drop |= {i for i in vs if i != keeper}
    want = sorted(int(pdf["vec_id"][i]) for i in range(len(M))
                  if i not in drop)
    assert drop
    books = SIM.train_pq(df, m=2, k=4, vec_col="embedding")
    got = sorted(r["vec_id"] for r in SIM.semantic_dedup(
        df, cents, threshold=thr, keep="far_from_centroid",
        codebooks=books, sdc_margin=2.0).collect())
    assert got == want
    SIM.release_cached_salt_inputs()


class TestIngestDedup:
    """r7-late: continuous-ingestion exact dedup over the stored exact
    index (streaming/dedup.ingest_dedup_batch /
    streaming_ingest_dedup)."""

    TEXTS = ["tx alpha", "tx bravo", "tx charlie", "tx delta",
             "tx echo"]

    def _batch(self, spark, ids):
        return spark.createDataFrame(
            [(i, self.TEXTS[i % 5]) for i in ids],
            "doc_id long, text string")

    def test_batch_sequence_equals_global_dedup(self, spark, tmp_path):
        from dask_geopandas_spark.streaming.dedup import \
            ingest_dedup_batch

        idx = str(tmp_path / "idx")
        b1 = self._batch(spark, range(0, 20))
        b2 = self._batch(spark, range(20, 40))
        s1 = ingest_dedup_batch(b1, idx)
        # first batch: one keeper per text, min id (in-batch rule)
        assert sorted((r["doc_id"], r["text"]) for r in s1.collect()) \
            == [(i, self.TEXTS[i]) for i in range(5)]
        # second batch: everything already ingested — no survivors
        s2 = ingest_dedup_batch(b2, idx)
        assert s2.count() == 0
        # a batch with one genuinely new text keeps exactly it
        b3 = self._batch(spark, range(40, 45)).union(
            spark.createDataFrame([(99, "brand new")],
                                  "doc_id long, text string"))
        s3 = ingest_dedup_batch(b3, idx)
        assert [(r["doc_id"], r["text"]) for r in s3.collect()] == \
               [(99, "brand new")]

    def test_streaming_matches_batch_oracle(self, spark, tmp_path):
        import os

        from dask_geopandas_spark.streaming.dedup import \
            streaming_ingest_dedup

        src = str(tmp_path / "src")
        idx = str(tmp_path / "idx")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        # file 0 (older mtime) carries ids 0-19, file 1 ids 20-39:
        # every text class appears in file 0 first, so the global
        # keeper (min id per text) equals the first-arrival survivor
        self._batch(spark, range(0, 20)).coalesce(1) \
            .write.parquet(src + "/f0")
        self._batch(spark, range(20, 40)).coalesce(1) \
            .write.parquet(src + "/f1")
        now = 1_700_000_000
        for i, d in enumerate(("f0", "f1")):
            for fn in os.listdir(f"{src}/{d}"):
                os.utime(f"{src}/{d}/{fn}", (now + i, now + i))
        schema = self._batch(spark, [0]).schema
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", "1")
                  .parquet(src + "/f*"))
        q = (streaming_ingest_dedup(stream, idx, out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(300)
        got = sorted((r["doc_id"], r["text"]) for r in
                     spark.read.parquet(out).collect())
        assert got == [(i, self.TEXTS[i]) for i in range(5)]
        # the advanced index now blocks a replayed batch entirely
        from dask_geopandas_spark.streaming.dedup import \
            ingest_dedup_batch
        assert ingest_dedup_batch(self._batch(spark, range(0, 40)),
                                  idx).count() == 0


class TestIngestCrashOrdering:
    """r8: the output-first crash contract of ingest_dedup_batch —
    the sink runs BEFORE the index append, so a crash between the two
    replays the batch at-least-once (duplicate output) instead of
    silently losing it (the r7 ordering bug)."""

    def _batch(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_crash_after_sink_loses_nothing(self, spark, tmp_path,
                                            monkeypatch):
        import dask_geopandas_spark.operators.dedup as D
        from dask_geopandas_spark.streaming.dedup import \
            ingest_dedup_batch

        idx = str(tmp_path / "idx")
        sunk = []

        def sink(df):
            sunk.append(sorted(r["doc_id"] for r in df.collect()))

        ingest_dedup_batch(
            self._batch(spark, [(0, "one"), (1, "two")]), idx,
            sink=sink)
        assert sunk == [[0, 1]]

        # crash DURING the index append of batch 2: the sink must
        # already have run (output-first), the index must not advance
        real_write = D.write_exact_index

        def boom(*a, **k):
            raise RuntimeError("injected crash in index append")

        monkeypatch.setattr(D, "write_exact_index", boom)
        import pytest as _pt
        with _pt.raises(RuntimeError, match="injected"):
            ingest_dedup_batch(
                self._batch(spark, [(2, "three"), (3, "one")]), idx,
                sink=sink)
        assert sunk == [[0, 1], [2]]  # survivor reached the sink

        # replay of the uncommitted batch (index NOT advanced): the
        # survivor is re-emitted — at-least-once, never lost
        monkeypatch.setattr(D, "write_exact_index", real_write)
        ingest_dedup_batch(
            self._batch(spark, [(2, "three"), (3, "one")]), idx,
            sink=sink)
        assert sunk == [[0, 1], [2], [2]]
        # committed now: a further replay emits nothing new
        ingest_dedup_batch(
            self._batch(spark, [(2, "three"), (3, "one")]), idx,
            sink=sink)
        assert sunk == [[0, 1], [2], [2], []]

    def test_crash_in_sink_leaves_index_unadvanced(self, spark,
                                                   tmp_path):
        """If the OUTPUT write itself crashes, the index append must
        not have happened yet — a replay still sees the rows as new."""
        from dask_geopandas_spark.streaming.dedup import \
            ingest_dedup_batch

        idx = str(tmp_path / "idx")

        def bad_sink(df):
            raise RuntimeError("sink crash")

        import pytest as _pt
        with _pt.raises(RuntimeError, match="sink crash"):
            ingest_dedup_batch(
                self._batch(spark, [(0, "one")]), idx, sink=bad_sink)
        got = []
        ingest_dedup_batch(
            self._batch(spark, [(0, "one")]), idx,
            sink=lambda df: got.append(df.count()))
        assert got == [1]

    def test_empty_first_batch_does_not_brick_index(self, spark,
                                                    tmp_path):
        """An entirely-empty first batch must not initialize meta over
        an empty postings dir (the next batch's schema inference would
        fail) — the index write is skipped until rows exist."""
        import os

        from dask_geopandas_spark.streaming.dedup import \
            ingest_dedup_batch

        idx = str(tmp_path / "idx")
        empty = self._batch(spark, [(0, "x")]).filter("doc_id < 0")
        assert ingest_dedup_batch(empty, idx).count() == 0
        assert not os.path.exists(idx + "/meta")
        # the first NON-empty batch initializes normally...
        s = ingest_dedup_batch(
            self._batch(spark, [(1, "a"), (2, "a"), (3, "b")]), idx)
        assert sorted(r["doc_id"] for r in s.collect()) == [1, 3]
        # ...and a later empty batch appends nothing, breaks nothing
        assert ingest_dedup_batch(empty, idx).count() == 0
        s2 = ingest_dedup_batch(
            self._batch(spark, [(4, "a"), (5, "c")]), idx)
        assert sorted(r["doc_id"] for r in s2.collect()) == [5]


class TestIngestNeardup:
    """r8: continuous-ingestion NEAR-duplicate dedup — the MinHash
    twin of TestIngestDedup (streaming/dedup.ingest_neardup_batch /
    streaming_ingest_neardup over write_minhash_index postings)."""

    BASE = ["the quick brown fox jumps over the lazy dog",
            "pack my box with five dozen liquor jugs",
            "how vexingly quick daft zebras jump today",
            "sphinx of black quartz judge my vow now"]

    def _batch(self, spark, ids, tail=None):
        rows = [(i, self.BASE[i % 4]
                 + (f" tail{(i + tail) % 7}" if tail is not None
                    else "")) for i in ids]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_batch_sequence(self, spark, tmp_path):
        from dask_geopandas_spark.streaming.dedup import \
            ingest_neardup_batch

        idx = str(tmp_path / "mhidx")
        # batch 1: 20 docs in 4 exact-duplicate classes → in-batch
        # lsh_dedup keeps the min id per class
        s1 = ingest_neardup_batch(self._batch(spark, range(0, 20)),
                                  idx, threshold=0.5)
        assert sorted(r["doc_id"] for r in s1.collect()) == [0, 1, 2, 3]
        # batch 2: exact copies of stored texts → everything drops
        s2 = ingest_neardup_batch(self._batch(spark, range(100, 120)),
                                  idx, threshold=0.5)
        assert s2.count() == 0
        # batch 3: NEAR copies (tail token differs — the
        # TestMinhashIndex collision fixture) drop; unrelated text
        # survives
        near = self._batch(spark, range(200, 208), tail=1)
        fresh = spark.createDataFrame(
            [(900, "totally unrelated number nine hundred words "
                   "w9a w9b w9c")], "doc_id long, text string")
        s3 = ingest_neardup_batch(near.unionByName(fresh), idx,
                                  threshold=0.5)
        assert sorted(r["doc_id"] for r in s3.collect()) == [900]

    def test_crash_after_sink_loses_nothing(self, spark, tmp_path,
                                            monkeypatch):
        import dask_geopandas_spark.operators.dedup as D
        from dask_geopandas_spark.streaming.dedup import \
            ingest_neardup_batch

        idx = str(tmp_path / "mhidx")
        sunk = []

        def sink(df):
            sunk.append(sorted(r["doc_id"] for r in df.collect()))

        ingest_neardup_batch(self._batch(spark, range(0, 8)), idx,
                             sink=sink)
        assert sunk == [[0, 1, 2, 3]]
        real = D.write_minhash_index

        def boom(*a, **k):
            raise RuntimeError("injected crash in index append")

        monkeypatch.setattr(D, "write_minhash_index", boom)
        fresh = spark.createDataFrame(
            [(50, "totally unrelated number fifty words wfa wfb")],
            "doc_id long, text string")
        import pytest as _pt
        with _pt.raises(RuntimeError, match="injected"):
            ingest_neardup_batch(fresh, idx, sink=sink)
        assert sunk == [[0, 1, 2, 3], [50]]
        monkeypatch.setattr(D, "write_minhash_index", real)
        ingest_neardup_batch(fresh, idx, sink=sink)
        assert sunk == [[0, 1, 2, 3], [50], [50]]
        ingest_neardup_batch(fresh, idx, sink=sink)
        assert sunk == [[0, 1, 2, 3], [50], [50], []]

    def test_empty_first_batch_does_not_brick_index(self, spark,
                                                    tmp_path):
        import os

        from dask_geopandas_spark.streaming.dedup import \
            ingest_neardup_batch

        idx = str(tmp_path / "mhidx")
        empty = self._batch(spark, [0]).filter("doc_id < 0")
        assert ingest_neardup_batch(empty, idx).count() == 0
        assert not os.path.exists(idx + "/meta")
        s = ingest_neardup_batch(self._batch(spark, range(0, 4)), idx)
        assert s.count() == 4

    def test_streaming_matches_batch(self, spark, tmp_path):
        import os

        from dask_geopandas_spark.streaming.dedup import \
            streaming_ingest_neardup

        src = str(tmp_path / "src")
        idx = str(tmp_path / "mhidx")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        self._batch(spark, range(0, 20)).coalesce(1) \
            .write.parquet(src + "/f0")
        self._batch(spark, range(100, 120)).coalesce(1) \
            .write.parquet(src + "/f1")
        now = 1_700_000_000
        for i, d in enumerate(("f0", "f1")):
            for fn in os.listdir(f"{src}/{d}"):
                os.utime(f"{src}/{d}/{fn}", (now + i, now + i))
        schema = self._batch(spark, [0]).schema
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", "1")
                  .parquet(src + "/f*"))
        q = (streaming_ingest_neardup(stream, idx, out, threshold=0.5)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(300)
        got = sorted(r["doc_id"] for r in
                     spark.read.parquet(out).collect())
        assert got == [0, 1, 2, 3]


class TestStreamingTextIndex:
    """r8: continuous BM25 indexing (streaming/indexing.py) — per-batch
    commit markers give exactly-once appends on plain parquet, and the
    sum_dl stats merge makes an N-batch index bit-identical to the
    single-shot build."""

    def _docs(self, spark, ids):
        return spark.createDataFrame(
            [(i, f"shared term doc{i} unique{i % 7} words") for i in ids],
            "doc_id long, text string")

    def test_appended_equals_single_build(self, spark, tmp_path):
        from dask_geopandas_spark.operators.textstats import (
            bm25_batch_topk_stored, write_text_index)
        from dask_geopandas_spark.streaming.indexing import \
            index_documents_batch

        inc = str(tmp_path / "inc")
        one = str(tmp_path / "one")
        assert index_documents_batch(self._docs(spark, range(0, 30)),
                                     inc, batch_id=0, n_buckets=8)
        assert index_documents_batch(self._docs(spark, range(30, 60)),
                                     inc, batch_id=1, n_buckets=8)
        write_text_index(self._docs(spark, range(0, 60)), one,
                         n_buckets=8)
        # stats identical INCLUDING the double avgdl (exact sum merge)
        si = spark.read.parquet(inc + "/stats").head()
        so = spark.read.parquet(one + "/stats").head()
        assert (si["n_docs"], si["sum_dl"], si["avgdl"]) == \
               (so["n_docs"], so["sum_dl"], so["avgdl"])
        q = spark.createDataFrame(
            [(1, "shared unique3"), (2, "doc5 words")],
            "query_id long, query string")
        got = sorted(map(tuple, bm25_batch_topk_stored(
            spark, inc, q, k=5).collect()))
        want = sorted(map(tuple, bm25_batch_topk_stored(
            spark, one, q, k=5).collect()))
        assert got == want and len(got) == 10

    def test_replayed_batch_skipped(self, spark, tmp_path):
        from dask_geopandas_spark.streaming.indexing import \
            index_documents_batch

        p = str(tmp_path / "idx")
        b = self._docs(spark, range(0, 10))
        assert index_documents_batch(b, p, batch_id=0) is True
        n1 = spark.read.parquet(p + "/stats").head()["n_docs"]
        # replay: the commit marker short-circuits the append
        assert index_documents_batch(b, p, batch_id=0) is False
        n2 = spark.read.parquet(p + "/stats").head()["n_docs"]
        assert n1 == n2 == 10

    def test_empty_batch_commits_without_index(self, spark, tmp_path):
        import os

        from dask_geopandas_spark.streaming.indexing import \
            index_documents_batch

        p = str(tmp_path / "idx")
        empty = self._docs(spark, [0]).filter("doc_id < 0")
        assert index_documents_batch(empty, p, batch_id=0) is True
        assert not os.path.exists(p + "/stats")
        assert os.path.exists(p + "/batches/batch-0")
        assert index_documents_batch(empty, p, batch_id=0) is False

    def test_commit_marker_inside_append_window(self, spark, tmp_path):
        """The marker is created BEFORE _append_in_progress is removed:
        marker-present always implies a fully-committed append, and a
        torn append (in-progress marker still there) is refused by the
        stored readers."""
        import os

        import pytest

        from dask_geopandas_spark.operators.textstats import (
            bm25_topk_stored, write_text_index)

        p = str(tmp_path / "idx")
        write_text_index(self._docs(spark, range(0, 5)), p, n_buckets=4)
        cm = p + "/batches/batch-1"
        os.makedirs(p + "/batches", exist_ok=True)
        write_text_index(self._docs(spark, range(5, 10)), p,
                         append=True, commit_marker=cm)
        assert os.path.exists(cm)
        assert not os.path.exists(p + "/_append_in_progress")
        # simulate the torn window: in-progress marker present
        with open(p + "/_append_in_progress", "w") as f:
            f.write("torn")
        with pytest.raises(RuntimeError, match="inconsistent"):
            bm25_topk_stored(spark, p, ["shared"], k=3)

    def test_stale_in_progress_heals_on_replay(self, spark, tmp_path):
        """Crash between commit-marker creation and in-progress
        removal: the index is fully committed but flagged torn.  The
        replayed batch sees its commit marker, clears the stale flag,
        and skips — readers work again without a rebuild."""
        import os

        from dask_geopandas_spark.operators.textstats import \
            bm25_topk_stored
        from dask_geopandas_spark.streaming.indexing import \
            index_documents_batch

        p = str(tmp_path / "idx")
        b = self._docs(spark, range(0, 10))
        assert index_documents_batch(b, p, batch_id=0) is True
        # simulate the post-commit sliver crash
        with open(p + "/_append_in_progress", "w") as f:
            f.write("stale")
        assert index_documents_batch(b, p, batch_id=0) is False
        assert not os.path.exists(p + "/_append_in_progress")
        assert len(bm25_topk_stored(
            spark, p, ["shared"], k=3).collect()) == 3

    def test_streaming_end_to_end_with_compaction(self, spark,
                                                  tmp_path):
        import glob as g
        import os

        from dask_geopandas_spark.operators.textstats import (
            bm25_batch_topk_stored, write_text_index)
        from dask_geopandas_spark.streaming.indexing import \
            streaming_index_documents

        src = str(tmp_path / "src")
        idx = str(tmp_path / "idx")
        one = str(tmp_path / "one")
        ckpt = str(tmp_path / "ckpt")
        for b in range(3):
            self._docs(spark, range(b * 20, b * 20 + 20)).coalesce(1) \
                .write.parquet(f"{src}/f{b}")
        now = 1_700_000_000
        for b in range(3):
            for fn in os.listdir(f"{src}/f{b}"):
                os.utime(f"{src}/f{b}/{fn}", (now + b, now + b))
        stream = (spark.readStream
                  .schema("doc_id long, text string")
                  .option("maxFilesPerTrigger", "1")
                  .parquet(src + "/f*"))
        q = (streaming_index_documents(stream, idx, n_buckets=8,
                                       compact_every=3)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(300)
        write_text_index(self._docs(spark, range(0, 60)), one,
                         n_buckets=8)
        qs = spark.createDataFrame(
            [(1, "shared unique2")], "query_id long, query string")
        got = sorted(map(tuple, bm25_batch_topk_stored(
            spark, idx, qs, k=8).collect()))
        want = sorted(map(tuple, bm25_batch_topk_stored(
            spark, one, qs, k=8).collect()))
        assert got == want and len(got) == 8
        # final compaction (batch id 2 == compact_every-1 mod 3) left
        # one file per bucket
        for b in g.glob(idx + "/postings/term_bucket=*"):
            files = [f for f in g.glob(b + "/*")
                     if not f.rsplit("/", 1)[-1].startswith(("_", "."))]
            assert len(files) == 1, b


def test_ingest_neardup_leaves_no_cached_tables(spark, tmp_path):
    """r8 self-audit: a long-running ingestion stream must not
    accumulate persisted signature tables across micro-batches —
    lsh_dedup's auto-persist is forced off inside the batch step."""
    import dask_geopandas_spark.operators.dedup as D
    from dask_geopandas_spark.streaming.dedup import ingest_neardup_batch

    src = str(tmp_path / "b0")
    spark.createDataFrame(
        [(i, f"totally distinct text number {i} w{i}a w{i}b")
         for i in range(8)],
        "doc_id long, text string").write.parquet(src)
    batch = spark.read.parquet(src)  # file-backed => measurably small
    # the tracked signature-cache registry must not grow: lsh_dedup's
    # auto-persist would have appended here (localCheckpoint RDDs are
    # separate and GC-released, so the raw persistent-RDD count is not
    # a stable signal under a full test session)
    before = len(D._PERSISTED_STAGES)
    ingest_neardup_batch(batch, str(tmp_path / "idx"))
    after = len(D._PERSISTED_STAGES)
    assert after == before, (before, after)


class TestStreamingVectorIndex:
    """r9: continuous embedding ingestion (streaming_ingest_vectors) —
    the vector-DB upsert shape: per-batch commit markers give
    exactly-once IVF appends on plain parquet, centroids persist in a
    _centroids.json sidecar validated on every append."""

    CENTS = [[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]]

    def _vecs(self, spark, ids):
        return spark.createDataFrame(
            [(i, [float(i % 3) * 5.0, float((i + 1) % 3) * 5.0])
             for i in ids],
            "vec_id long, embedding array<double>")

    def _topk(self, spark, path, centroids=None):
        from dask_geopandas_spark.operators.similarity import \
            ivf_topk_stored

        q = spark.createDataFrame(
            [(999, [0.5, 0.5])], "vec_id long, embedding array<double>")
        return sorted(map(tuple, ivf_topk_stored(
            spark, path, q, centroids, k=5, nprobe=2).collect()))

    def test_appended_equals_single_build(self, spark, tmp_path):
        from dask_geopandas_spark.operators.similarity import \
            write_ivf_index
        from dask_geopandas_spark.streaming.indexing import \
            ingest_vectors_batch

        inc = str(tmp_path / "inc")
        one = str(tmp_path / "one")
        assert ingest_vectors_batch(self._vecs(spark, range(0, 12)),
                                    inc, self.CENTS, batch_id=0)
        assert ingest_vectors_batch(self._vecs(spark, range(12, 24)),
                                    inc, self.CENTS, batch_id=1)
        write_ivf_index(self._vecs(spark, range(0, 24)), one,
                        self.CENTS)
        # sidecar-loaded centroids on the incremental side
        assert self._topk(spark, inc) == self._topk(spark, one,
                                                    self.CENTS)

    def test_replayed_batch_skipped(self, spark, tmp_path):
        from dask_geopandas_spark.streaming.indexing import \
            ingest_vectors_batch

        p = str(tmp_path / "idx")
        b = self._vecs(spark, range(0, 9))
        assert ingest_vectors_batch(b, p, self.CENTS, batch_id=0) \
            is True
        n1 = spark.read.parquet(p).count()
        assert ingest_vectors_batch(b, p, self.CENTS, batch_id=0) \
            is False
        assert spark.read.parquet(p).count() == n1 == 9

    def test_empty_batch_commits_without_index(self, spark, tmp_path):
        import os

        from dask_geopandas_spark.streaming.indexing import \
            ingest_vectors_batch

        p = str(tmp_path / "idx")
        empty = self._vecs(spark, [0]).filter("vec_id < 0")
        assert ingest_vectors_batch(empty, p, self.CENTS,
                                    batch_id=0) is True
        assert not os.path.exists(p + "/_centroids.json")
        assert os.path.exists(p + "/_batches/batch-0")
        assert ingest_vectors_batch(empty, p, self.CENTS,
                                    batch_id=0) is False

    def test_torn_append_refused_and_heals(self, spark, tmp_path):
        import os

        import pytest

        from dask_geopandas_spark.streaming.indexing import \
            ingest_vectors_batch

        p = str(tmp_path / "idx")
        b = self._vecs(spark, range(0, 9))
        assert ingest_vectors_batch(b, p, self.CENTS, batch_id=0)
        with open(p + "/_append_in_progress", "w") as f:
            f.write("torn")
        with pytest.raises(RuntimeError, match="inconsistent"):
            self._topk(spark, p)
        # post-commit sliver: replay sees the marker, heals the flag
        assert ingest_vectors_batch(b, p, self.CENTS,
                                    batch_id=0) is False
        assert not os.path.exists(p + "/_append_in_progress")
        assert len(self._topk(spark, p)) == 5

    def test_centroid_validation_on_append(self, spark, tmp_path):
        import pytest

        from dask_geopandas_spark.operators.similarity import \
            write_ivf_index

        p = str(tmp_path / "idx")
        write_ivf_index(self._vecs(spark, range(0, 9)), p, self.CENTS)
        drifted = [[0.0, 0.1], [10.0, 0.0], [0.0, 10.0]]
        with pytest.raises(ValueError, match="centroids"):
            write_ivf_index(self._vecs(spark, range(9, 12)), p,
                            drifted, append=True)
        # centroids=None on append loads the sidecar
        write_ivf_index(self._vecs(spark, range(9, 12)), p,
                        append=True)
        assert spark.read.parquet(p).count() == 12
        # fresh write requires centroids
        with pytest.raises(ValueError, match="required"):
            write_ivf_index(self._vecs(spark, range(3)),
                            str(tmp_path / "fresh"))

    def test_streaming_end_to_end_with_compaction(self, spark,
                                                  tmp_path):
        import glob as g
        import os

        from dask_geopandas_spark.streaming.indexing import \
            streaming_ingest_vectors

        src = str(tmp_path / "src")
        idx = str(tmp_path / "idx")
        ckpt = str(tmp_path / "ckpt")
        for b in range(3):
            self._vecs(spark, range(b * 8, b * 8 + 8)).coalesce(1) \
                .write.parquet(f"{src}/f{b}")
        now = 1_700_000_000
        for b in range(3):
            for fn in os.listdir(f"{src}/f{b}"):
                os.utime(f"{src}/f{b}/{fn}", (now + b, now + b))
        stream = (spark.readStream
                  .schema("vec_id long, embedding array<double>")
                  .option("maxFilesPerTrigger", "1")
                  .parquet(src + "/f*"))
        q = (streaming_ingest_vectors(stream, idx, self.CENTS,
                                      compact_every=3)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(300)
        assert q.exception() is None
        # compaction left one file per cell AND kept the sidecar +
        # commit markers across the swap
        assert os.path.exists(idx + "/_centroids.json")
        assert os.path.exists(idx + "/_batches/batch-2")
        for cell in g.glob(idx + "/ivf_cell=*"):
            files = [f for f in g.glob(cell + "/*")
                     if not f.rsplit("/", 1)[-1].startswith(("_", "."))]
            assert len(files) == 1, cell
        assert len(self._topk(spark, idx)) == 5


class TestScalarQuantization:
    """SQ8 (similarity.train_sq/sq_encode/sq_topk): exact-range
    training, clamped linear codes, dequantized ADC search."""

    @pytest.fixture()
    def vecs(self, spark):
        rng = np.random.RandomState(29)
        rows = [(i, [float(v) for v in rng.uniform(-3, 3, 12)])
                for i in range(240)]
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>")

    def test_train_is_exact_minmax(self, spark, vecs):
        from dask_geopandas_spark.operators.similarity import train_sq

        lo, hi = train_sq(vecs)
        X = np.asarray([r["embedding"] for r in
                        vecs.orderBy("vec_id").collect()],
                       dtype=np.float64)
        assert lo == [float(v) for v in X.min(axis=0)]
        assert hi == [float(v) for v in X.max(axis=0)]

    def test_encode_matches_numpy_and_clamps(self, spark, vecs):
        from dask_geopandas_spark.operators.similarity import (sq_encode,
                                                               train_sq)

        lo, hi = train_sq(vecs)
        got = {r["vec_id"]: list(r["sq_code"]) for r in
               sq_encode(vecs, lo, hi).collect()}
        import decimal
        for r in vecs.collect():
            want = []
            for x, l, h in zip(r["embedding"], lo, hi):
                s = 255.0 / (h - l) if h > l else 0.0
                t = (float(np.float32(x)) - l) * s
                # Spark round() is HALF_UP on the decimal value
                want.append(int(min(255, max(0, int(
                    decimal.Decimal(t).quantize(
                        0, rounding=decimal.ROUND_HALF_UP))))))
            assert got[r["vec_id"]] == want, r["vec_id"]
        # out-of-range data saturates instead of overflowing
        wild = spark.createDataFrame(
            [(999, [1e6] * 12), (998, [-1e6] * 12)],
            "vec_id long, embedding array<float>")
        codes = {r["vec_id"]: set(r["sq_code"]) for r in
                 sq_encode(wild, lo, hi).collect()}
        assert codes[999] == {255} and codes[998] == {0}

    def test_1nn_recall_at_10(self, spark, vecs):
        """SQ8 quantization error is tiny next to PQ — the true L2
        nearest neighbor should appear in the top-10 essentially
        always on smooth data."""
        from dask_geopandas_spark.operators.similarity import (sq_encode,
                                                               sq_topk,
                                                               train_sq)

        lo, hi = train_sq(vecs)
        codes = sq_encode(vecs, lo, hi)
        queries = vecs.filter(F.col("vec_id") < 20)
        got = {}
        for r in sq_topk(codes, queries, lo, hi, k=10).collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        X = np.asarray([r["embedding"] for r in
                        vecs.orderBy("vec_id").collect()],
                       dtype=np.float64)
        hits = 0
        for qid in range(20):
            d = ((X - X[qid][None, :]) ** 2).sum(axis=1)
            d[qid] = np.inf
            hits += int(int(d.argmin()) in got.get(qid, set()))
        assert hits / 20 >= 0.95, hits / 20

    def test_plans_native_and_broadcast(self, spark, vecs):
        from dask_geopandas_spark.operators.similarity import (sq_encode,
                                                               sq_topk,
                                                               train_sq)

        lo, hi = train_sq(vecs)
        codes = sq_encode(vecs, lo, hi)
        plan = codes._sc._jvm.PythonSQLUtils.explainString(
            codes._jdf.queryExecution(), "formatted")
        assert "EvalPython" not in plan and "Exchange" not in plan
        out = sq_topk(codes, vecs.limit(3), lo, hi, k=5)
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted")
        assert "EvalPython" not in plan
        assert "SortMergeJoin" not in plan


class TestVectorDeletes:
    """delete_vectors tombstones on the stored IVF index: deleted
    vectors never surface as neighbors, idempotent re-delete,
    equality with an index that never contained them."""

    def test_delete_equals_fresh_and_idempotent(self, spark, tmp_path):
        from dask_geopandas_spark.operators.similarity import (
            delete_vectors, ivf_topk_stored, train_centroids,
            write_ivf_index)

        rng = np.random.RandomState(41)
        rows = [(i, [float(v) for v in rng.uniform(-2, 2, 8)])
                for i in range(150)]
        vecs = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>")
        cents = train_centroids(vecs, n_cells=4, iters=2)
        path = str(tmp_path / "ivf")
        gold = str(tmp_path / "ivf_gold")
        write_ivf_index(vecs, path, cents)
        deleted = [5, 6, 7, 8, 9]
        assert delete_vectors(spark, path, deleted) == 5
        assert delete_vectors(spark, path, deleted) == 0  # idempotent
        write_ivf_index(
            vecs.filter(~F.col("vec_id").isin(deleted)), gold, cents)
        queries = vecs.filter(F.col("vec_id") < 5)
        got = sorted(map(tuple, ivf_topk_stored(
            spark, path, queries, cents, k=5, nprobe=3).collect()))
        want = sorted(map(tuple, ivf_topk_stored(
            spark, gold, queries, cents, k=5, nprobe=3).collect()))
        assert got == want
        assert all(r[1] not in deleted for r in got)

    def test_sidecar_centroids_path_sees_deletes(self, spark,
                                                 tmp_path):
        from dask_geopandas_spark.operators.similarity import (
            delete_vectors, ivf_topk_stored, train_centroids,
            write_ivf_index)

        rng = np.random.RandomState(43)
        vecs = spark.createDataFrame(
            [(i, [float(v) for v in rng.uniform(-1, 1, 8)])
             for i in range(80)],
            "vec_id long, embedding array<float>")
        cents = train_centroids(vecs, n_cells=4, iters=2)
        path = str(tmp_path / "ivf2")
        write_ivf_index(vecs, path, cents)
        delete_vectors(spark, path, [70, 71])
        out = ivf_topk_stored(spark, path,
                              vecs.filter(F.col("vec_id") < 3),
                              centroids=None, k=60, nprobe=4)
        ids = {r["neighbor_id"] for r in out.collect()}
        assert 70 not in ids and 71 not in ids


class TestBinaryQuantization:
    """BQ (similarity.train_bq/bq_encode/bq_topk, r13): exact-midpoint
    thresholds, 63-bit-word sign codes, symmetric Hamming search."""

    @pytest.fixture()
    def vecs(self, spark):
        rng = np.random.RandomState(31)
        rows = [(i, [float(v) for v in rng.uniform(-2, 2, 70)])
                for i in range(240)]
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>")

    def test_encode_matches_numpy_bit_packing(self, spark, vecs):
        from dask_geopandas_spark.operators.similarity import (
            bq_encode, train_bq)

        thr = train_bq(vecs)
        X = np.asarray([r["embedding"] for r in
                        vecs.orderBy("vec_id").collect()],
                       dtype=np.float64)
        assert thr == [float(v) for v in
                       (X.min(axis=0) + X.max(axis=0)) / 2.0]
        got = {r["vec_id"]: r["bq_code"] for r in
               bq_encode(vecs, thr).collect()}
        for i, x in enumerate(X):
            words = [0, 0]
            for dim in range(70):
                if x[dim] > thr[dim]:
                    words[dim // 63] |= 1 << (dim % 63)
            assert got[i] == words, i

    def test_hamming_topk_recall_and_exactness(self, spark, vecs):
        from dask_geopandas_spark.operators.similarity import (
            bq_encode, bq_topk, train_bq)

        thr = train_bq(vecs)
        codes = bq_encode(vecs, thr)
        queries = vecs.filter(F.col("vec_id") < 20)
        rows = bq_topk(codes, queries, thr, k=10).collect()
        got = {}
        for r in rows:
            got.setdefault(r["query_id"], []).append(
                (r["rank"], r["neighbor_id"], r["hamming"]))
        X = np.asarray([r["embedding"] for r in
                        vecs.orderBy("vec_id").collect()],
                       dtype=np.float64)
        B = (X > np.asarray(thr)[None, :])
        hits = 0
        for qid in range(20):
            # engine hamming must EQUAL brute hamming (integers)
            ham = (B ^ B[qid][None, :]).sum(axis=1)
            for rk, nid, h in got[qid]:
                assert h == int(ham[nid]), (qid, nid)
            # brute rank agreement under the same (ham, id) tie-break
            order = sorted((int(ham[i]), i) for i in range(240)
                           if i != qid)[:10]
            assert sorted(got[qid]) == [
                (rk + 1, nid, h) for rk, (h, nid)
                in enumerate(order)], qid
            # recall sanity vs exact L2 1-NN — deliberately loose:
            # 1-bit codes on UNIFORM data are the worst case (real
            # embedding distributions cluster), and the production
            # recipe re-ranks the Hamming shortlist exactly; the
            # correctness property is the bit-exact Hamming ranking
            # asserted above
            d = ((X - X[qid][None, :]) ** 2).sum(axis=1)
            d[qid] = np.inf
            hits += int(int(d.argmin()) in {n for _, n, _ in got[qid]})
        assert hits / 20 >= 0.5, hits / 20

    def test_plans_native_and_broadcast(self, spark, vecs):
        from dask_geopandas_spark.operators.similarity import (
            bq_encode, bq_topk, train_bq)

        thr = train_bq(vecs)
        codes = bq_encode(vecs, thr)
        plan = codes._sc._jvm.PythonSQLUtils.explainString(
            codes._jdf.queryExecution(), "formatted")
        assert "EvalPython" not in plan and "Exchange" not in plan
        out = bq_topk(codes, vecs.limit(3), thr, k=5)
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted")
        assert "EvalPython" not in plan
        assert "SortMergeJoin" not in plan


class TestSemanticContamination:
    """Cross-frame embedding decontamination (dedup.
    semantic_contamination, r13): planted paraphrase recall, numpy
    cosine exactness, broadcast/shuffled agreement, anti-join drop."""

    def _frames(self, spark):
        rng = np.random.RandomState(37)
        rows = [(i, [float(v) for v in rng.normal(0, 1, 32)])
                for i in range(150)]
        corpus = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>")
        # benchmark = slightly perturbed copies of ids %10==0 plus
        # two genuinely novel vectors
        bench_rows = [(i, [v + (0.03 if j == 0 else 0.0)
                           for j, v in enumerate(vec)])
                      for i, vec in rows if i % 10 == 0]
        bench_rows += [(900 + j,
                        [float(v) for v in rng.normal(5, 1, 32)])
                       for j in range(2)]
        bench = spark.createDataFrame(
            bench_rows, "bench_id long, embedding array<double>")
        return corpus, bench, rows

    def test_planted_recall_and_exact_cosine(self, spark):
        from dask_geopandas_spark.operators.dedup import \
            semantic_contamination

        corpus, bench, rows = self._frames(spark)
        got = semantic_contamination(
            corpus, bench, id_col="vec_id", bench_id_col="bench_id",
            threshold=0.95, n_bits=32, bands=4, dim=32).collect()
        pairs = {(r["vec_id"], r["bench_id"]): r["cos"] for r in got}
        X = {i: np.asarray(v, dtype=np.float64) for i, v in rows}
        # every planted (i, i) pair found
        for i in range(0, 150, 10):
            assert (i, i) in pairs, i
        # every reported cosine equals numpy (and clears threshold)
        bvecs = {i: X[i].copy() for i in range(0, 150, 10)}
        for i in bvecs:
            bvecs[i][0] += 0.03
        for (cid, bid), c in pairs.items():
            assert bid in bvecs  # the novel far vectors never match
            a, b = X[cid], bvecs[bid]
            want = float(a @ b / (np.linalg.norm(a)
                                  * np.linalg.norm(b)))
            assert c == pytest.approx(want, abs=1e-12)
            assert c >= 0.95

    def test_broadcast_and_shuffled_agree(self, spark):
        from dask_geopandas_spark.operators.dedup import \
            semantic_contamination

        corpus, bench, _ = self._frames(spark)
        kw = dict(id_col="vec_id", bench_id_col="bench_id",
                  threshold=0.9, n_bits=32, bands=4, dim=32)
        a = sorted(map(tuple, semantic_contamination(
            corpus, bench, broadcast=True, **kw).collect()))
        b = sorted(map(tuple, semantic_contamination(
            corpus, bench, broadcast=False, **kw).collect()))
        assert a == b and len(a) >= 15

    def test_decontaminate_drops_flagged_only(self, spark):
        from dask_geopandas_spark.operators.dedup import (
            semantic_contamination, semantic_decontaminate)

        corpus, bench, _ = self._frames(spark)
        kw = dict(id_col="vec_id", bench_id_col="bench_id",
                  threshold=0.95, n_bits=32, bands=4, dim=32)
        flagged = {r["vec_id"] for r in semantic_contamination(
            corpus, bench, **kw).collect()}
        kept = {r["vec_id"] for r in semantic_decontaminate(
            corpus, bench, **kw).collect()}
        assert kept == set(range(150)) - flagged
        assert flagged  # non-vacuous

    def test_corpus_never_shuffles_under_broadcast(self, spark):
        from dask_geopandas_spark.operators.dedup import \
            semantic_contamination

        corpus, bench, _ = self._frames(spark)
        out = semantic_contamination(
            corpus, bench, id_col="vec_id", bench_id_col="bench_id",
            threshold=0.95, n_bits=32, bands=4, dim=32)
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted")
        assert "EvalPython" not in plan
        assert "SortMergeJoin" not in plan


def test_semantic_contamination_empty_corpus(spark):
    """Empty corpus with dim unset returns an empty frame with the
    output schema instead of TypeError on the dim probe (r13 review
    finding); decontaminate stays empty too."""
    from dask_geopandas_spark.operators.dedup import (
        semantic_contamination, semantic_decontaminate)

    corpus = spark.createDataFrame(
        [], "vec_id long, embedding array<double>")
    bench = spark.createDataFrame(
        [(1, [1.0, 2.0])], "bench_id long, embedding array<double>")
    out = semantic_contamination(corpus, bench,
                                 bench_id_col="bench_id")
    assert out.columns == ["vec_id", "bench_id", "cos"]
    assert out.count() == 0
    assert semantic_decontaminate(corpus, bench,
                                  bench_id_col="bench_id").count() == 0
