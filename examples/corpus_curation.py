"""Corpus curation with the round-4/5 operators — retrieval scoring,
embedding-graph clustering, and cluster-level dedup as declarative
stages:

    embeddings → IVF kNN graph (PQ-pruned, hot-cell-safe)
               → cluster_dedup (components → one keeper per cluster)
    documents  → BM25 retrieval of topic-relevant docs
               → per-doc TF-IDF keywords for the survivors

Run:  python examples/corpus_curation.py [sf_dir]
(defaults to /root/testdata/sf0.001; prints per-stage counts)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run_curation(spark: SparkSession, sf_dir: str):
    from dask_geopandas_spark.operators import dedup as DD
    from dask_geopandas_spark.operators import similarity as SIM
    from dask_geopandas_spark.operators import textstats as TX

    out = {}
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out["vectors"] = emb.count()

    # 1. approximate kNN graph over the corpus: per-IVF-cell self-join,
    #    PQ codes through the quadratic stage, cell_cap salt split
    cents = SIM.train_centroids(emb, n_cells=8, iters=1)
    books = SIM.train_pq(emb, m=4, k=8, sample=256)
    edges = SIM.knn_graph(emb, cents, k=3, codebooks=books,
                          cell_cap=256)
    strong = edges.filter(F.col("cos") >= 0.8).select("src_id", "dst_id")
    out["strong_edges"] = strong.count()

    # 2. cluster-level dedup in ONE call (r5): connected components over
    #    the near-dup graph, keep each cluster's min-id vector, pass
    #    edge-free vectors through — a single left-anti join
    if out["strong_edges"]:
        kept = DD.cluster_dedup(emb, strong, id_col="vec_id",
                                src="src_id", dst="dst_id")
        dropped = out["vectors"] - kept.count()
    else:
        dropped = 0
    out["cluster_dropped"] = dropped
    SIM.release_cached_salt_inputs()  # free the cell-join cache

    # 3. BM25: pull the docs most relevant to a topic bag
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    hits = TX.bm25_topk(docs, ["data", "model", "learning"], k=25)
    out["bm25_hits"] = hits.count()

    # 4. TF-IDF keywords for the retrieved docs
    kw = TX.tfidf_top_terms(
        docs.join(hits.select("doc_id"), on="doc_id"), k=3)
    out["keyword_rows"] = kw.count()

    # 5. leakage-safe eval split (r7): the near-dup graph from stage 1
    #    keys the split by CLUSTER representative, so a memorized
    #    near-duplicate can never sit in the holdout while its twin
    #    trains — then a deterministic quality-weighted draw
    #    (Efraimidis-Spirakis) picks the training subset, both
    #    reproducible bit-for-bit on re-runs
    from dask_geopandas_spark.operators.sampling import (split_by_cluster,
                                                         weighted_sample)

    split = split_by_cluster(
        docs, strong, holdout_fraction=0.1, id_col="doc_id",
        src="src_id", dst="dst_id") if out["strong_edges"] else None
    if split is not None:
        out["holdout_docs"] = split.filter(
            F.col("split") == "holdout").count()
        train = split.filter(F.col("split") == "train") \
            .withColumn("w", F.length("text").cast("double"))
        picked = weighted_sample(train, 50, "w")
        out["weighted_picks"] = picked.count()
    return out, kw


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    out, _ = run_curation(spark, sf)
    for name, n in out.items():
        print(f"{name:>16}: {n}")
    spark.stop()
