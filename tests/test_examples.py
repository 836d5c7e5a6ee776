"""The examples/ scripts must run end-to-end at the smoke scale."""


def test_training_data_pipeline_example(spark, sf_dir):
    import sys
    sys.path.insert(0, "examples")
    from training_data_pipeline import run_pipeline

    stages, packed = run_pipeline(spark, sf_dir)
    assert stages["raw"] > 0
    # each stage only ever removes rows
    order = ["raw", "url_dedup", "quality_gate", "classifier_gate",
             "line_dedup", "exact_dedup", "neardup_dedup",
             "decontaminated", "sampled"]
    for a, b in zip(order, order[1:]):
        assert stages[b] <= stages[a]
    assert stages["pack_bins"] >= 1
    assert "pack_bin" in packed.columns


def test_geospatial_tour_example(spark, sf_dir):
    import sys
    sys.path.insert(0, "examples")
    from geospatial_tour import run_tour

    out = run_tour(spark, sf_dir)
    assert out["reprojected"] > 0
    assert out["dissolved_regions"] >= 1
    assert out["overlay_pieces"] >= 1
    assert 0 < out["windowed_readback"] <= out["reprojected"]
    # the persisted co-bucketed join sees the same pairs as the
    # per-join broadcast plan
    assert out["cobucket_matches"] == out["sjoin_matches"]
    assert 0 < out["pruned_readback"] <= out["reprojected"]


def test_corpus_curation_example(spark, sf_dir):
    import sys
    sys.path.insert(0, "examples")
    from corpus_curation import run_curation

    out, kw = run_curation(spark, sf_dir)
    assert out["vectors"] > 0
    assert out["bm25_hits"] > 0
    assert out["keyword_rows"] > 0
    assert {"doc_id", "term", "tfidf", "rank"} <= set(kw.columns)
    if "holdout_docs" in out:
        assert 0 < out["holdout_docs"] < out["vectors"]
        assert out["weighted_picks"] == 50


def test_retrieval_pipeline_example(spark, sf_dir):
    import sys

    sys.path.insert(0, "examples")
    from retrieval_pipeline import run_retrieval

    stages, hits = run_retrieval(spark, sf_dir)
    assert stages["chunks"] >= stages["docs"] > 0
    assert stages["top_hits"] == 5
    assert stages["batch_hits"] == 15
    assert stages["top_hits_after_append"] == 5
    assert stages["stream_index_hits"] == 5
    rows = hits.collect()
    assert all(r["rank"] == i + 1 for i, r in enumerate(
        sorted(rows, key=lambda r: r["rank"])))


def test_crawl_ingest_pipeline_example(spark, sf_dir):
    import shutil
    import sys
    sys.path.insert(0, "examples")
    from crawl_ingest_pipeline import run_crawl_pipeline

    out, base = run_crawl_pipeline(spark, sf_dir)
    try:
        assert out["records"] > 0
        # the robots gate drops the /doc-1* captures, nothing else
        assert 0 < out["robots_kept"] < out["records"]
        # the leader construction makes every 4-group collapse
        assert out["after_exact_dedup"] <= out["records"] / 2
        assert out["distinct_urls"] == out["after_exact_dedup"]
        # each gate only narrows
        assert 0 < out["lang_en"] <= out["after_exact_dedup"]
        assert 0 < out["quality_kept"] <= out["lang_en"]
        assert 0 < out["selected"] <= out["quality_kept"]
        assert out["shards"] >= 1
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_incremental_crawl_refresh_example(spark, sf_dir, tmp_path):
    """The monthly refresh loop (r13): diff is index-sized, refetch
    is selective (exactly the changed+new members), the near-dup gate
    passes every genuinely-new page and drops trivially-edited ones,
    and compaction folds the appended postings."""
    import sys
    sys.path.insert(0, "examples")
    from incremental_crawl_refresh import run_incremental_refresh

    out = run_incremental_refresh(spark, sf_dir,
                                  workdir=str(tmp_path / "refresh"))
    st = out["diff_status"]
    # the synthetic world: every status class is populated and the
    # classes partition the union of both crawls
    assert all(st.get(s, 0) > 0
               for s in ("gone", "changed", "new", "unchanged"))
    assert st["new"] == 8
    # refetch monotonicity: exactly the changed+new members were
    # fetched — never the unchanged majority, never the whole crawl
    assert out["refetch_members"] == st["changed"] + st["new"]
    assert out["refetched_records"] == out["refetch_members"]
    assert out["refetch_members"] < out["jan_records"]
    # gate monotonicity: survivors <= refetched; every genuinely new
    # page survives; at least some trivially-edited page was dropped
    # as a near-dup of last month's content
    assert out["feb_new_survivors"] == 8
    assert (out["feb_new_survivors"] <= out["feb_survivors"]
            <= out["refetched_records"])
    assert out["feb_survivors"] - out["feb_new_survivors"] \
        < st["changed"]
    # the pool accumulates exactly the two survivor waves
    assert out["pool_docs"] == out["jan_survivors"] \
        + out["feb_survivors"]
    # compaction folded the appended postings
    cf = out["compacted_files"]
    assert cf["files_after"] <= cf["files_before"]


def test_data_card_example(spark, sf_dir):
    """The data-card pass (r13): the sketch-family tables agree with
    each other and with exact ground truth at this scale."""
    import sys
    sys.path.insert(0, "examples")
    from data_card import build_data_card
    from pyspark.sql import functions as F

    card = build_data_card(spark, sf_dir)
    stats = {r["source"]: r.asDict() for r in
             card["stats"].collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    assert sum(s["n_docs"] for s in stats.values()) == n_docs
    for s in stats.values():
        # percentile ordering and bounds against the exact aggregates
        assert (s["p50_tokens"] <= s["p90_tokens"]
                <= s["p99_tokens"] <= s["max_tokens"])
    div = {r["source"]: r["distinct_frac"] for r in
           card["diversity"].collect()}
    assert all(0.0 < v <= 1.0 for v in div.values())
    hll = {r["source"]: r["approx_distinct"] for r in
           card["distinct_texts"].collect()}
    for src, s in stats.items():
        # HLL distinct within 10% of the exact distinct count
        assert abs(hll[src] - s["distinct_texts"]) \
            <= max(2, 0.1 * s["distinct_texts"]), src
    heavy = card["heavy_tokens"].collect()
    assert heavy  # some token clears total//50 at every sf
    # exactness: every reported heavy count matches a plain groupBy
    from dask_geopandas_spark.operators.textstats import tokens
    toks = docs.select(F.explode(
        F.filter(tokens(F.col("text")),
                 lambda x: x != F.lit(""))).alias("token"))
    exact = {r["token"]: r["n"] for r in
             toks.groupBy("token").agg(F.count("*").alias("n"))
             .collect()}
    for r in heavy:
        assert exact[r["token"]] == r["n_count"], r["token"]
    if "overlap" in card:
        row = card["overlap"].head()
        assert 0.0 <= row["jaccard"] <= 1.0


def test_webgraph_pipeline_example(spark, sf_dir):
    import sys
    sys.path.insert(0, "examples")
    from webgraph_pipeline import run_webgraph

    out = run_webgraph(spark, sf_dir)
    assert out["n_hosts"] == 40
    # every host sits in some SCC; the dense arithmetic graph is one
    # strongly connected blob or a few
    assert 1 <= out["n_sccs"] <= out["n_hosts"]
    regions = {r["region"]: r["n_nodes"]
               for r in out["bowtie"].collect()}
    assert sum(regions.values()) == out["n_hosts"]
    assert regions.get("CORE", 0) >= 1
    # modularity of a real partition is a finite number in [-0.5, 1]
    assert -0.5 <= out["modularity_q"] <= 1.0
    assert out["n_walks"] == 2 * out["n_hosts"]
    assert out["n_pairs"] > 0
    ppmi = out["ppmi"].collect()
    assert all(r["ppmi"] >= 0.0 for r in ppmi)
    # pagerank mass sums to ~1 (the operator's own invariant)
    pr = sum(r["pagerank"] for r in out["pagerank"].collect())
    assert abs(pr - 1.0) < 1e-6
