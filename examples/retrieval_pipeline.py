"""Retrieval prep with the round-6 operators — chunking, a stored
inverted index, and index-backed search as declarative stages:

    documents  → token-window chunks (overlap, RAG-sized)
    chunks     → stored inverted index (postings hive-partitioned by
                 term-hash bucket + 1-row stats)
    index      → single-query BM25 top-k (only the query's buckets
                 are read — static partition pruning)
               → batch BM25 for a whole query table
               → incremental append of a late document batch

Run:  python examples/retrieval_pipeline.py [sf_dir]
(defaults to /root/testdata/sf0.001; prints per-stage counts)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run_retrieval(spark: SparkSession, sf_dir: str):
    from dask_geopandas_spark.operators import sampling as SA
    from dask_geopandas_spark.operators import textstats as TX

    out = {}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out["docs"] = docs.count()

    # 1. chunk to retrieval units: every chunk carries its source doc
    #    id and token offset, metadata columns ride through — one scan,
    #    no shuffle (the explode multiplies rows map-side)
    chunks = SA.chunk_documents(docs.select("doc_id", "source", "text"),
                                max_tokens=64, overlap=16)
    chunks = chunks.withColumn(
        "chunk_key", F.concat_ws("#", "doc_id", "chunk_id"))
    out["chunks"] = chunks.count()

    # 2. build the stored index over the chunks (the lexical twin of
    #    the IVF vector index: postings partitioned by term bucket)
    path = os.path.join(tempfile.gettempdir(), "dgs_retrieval_index")
    shutil.rmtree(path, ignore_errors=True)
    TX.write_text_index(chunks, path, n_buckets=32, id_col="chunk_key")
    out["index_buckets"] = 32

    # 3. query it: only the query terms' buckets are read
    hits = TX.bm25_topk_stored(spark, path,
                               ["stream", "window", "merge"],
                               k=5, id_col="chunk_key")
    out["top_hits"] = hits.count()

    # 4. batch mining: a whole query table in one pruned read
    queries = spark.createDataFrame(
        [(0, "hash join"), (1, "sort merge"), (2, "vector scan")],
        "query_id long, query string")
    batch = TX.bm25_batch_topk_stored(spark, path, queries, k=5,
                                      id_col="chunk_key")
    out["batch_hits"] = batch.count()

    # 5. a late batch appends without rebuilding (stats merge by
    #    exact integer sum_dl addition — bit-identical to a single
    #    build; df recomputes from the unioned postings)
    late = chunks.withColumn(
        "chunk_key", F.concat_ws("#", F.lit("late"), "chunk_key"))
    TX.write_text_index(late, path, append=True, id_col="chunk_key")
    hits2 = TX.bm25_topk_stored(spark, path,
                                ["stream", "window", "merge"],
                                k=5, id_col="chunk_key")
    out["top_hits_after_append"] = hits2.count()

    # 6. the same index built CONTINUOUSLY: two streamed micro-batches
    #    under per-batch commit markers (exactly-once on replay), a
    #    final per-bucket compaction, then the identical pruned query
    #    — batch boundaries are invisible to retrieval
    from dask_geopandas_spark.streaming.indexing import \
        streaming_index_documents

    sbase = os.path.join(tempfile.gettempdir(), "dgs_retrieval_stream")
    shutil.rmtree(sbase, ignore_errors=True)
    half = chunks.agg(F.expr("percentile(doc_id, 0.5)")).head()[0]
    chunks.filter(F.col("doc_id") <= half).coalesce(1) \
        .write.parquet(sbase + "/src/f0")
    chunks.filter(F.col("doc_id") > half).coalesce(1) \
        .write.parquet(sbase + "/src/f1")
    now = 1_700_000_000
    for i, d in enumerate(("f0", "f1")):
        for fn in os.listdir(f"{sbase}/src/{d}"):
            os.utime(f"{sbase}/src/{d}/{fn}", (now + i, now + i))
    stream = (spark.readStream.schema(chunks.schema)
              .option("maxFilesPerTrigger", "1")
              .parquet(sbase + "/src/f*"))
    q = (streaming_index_documents(stream, sbase + "/idx",
                                   n_buckets=32, id_col="chunk_key",
                                   compact_every=2)
         .option("checkpointLocation", sbase + "/ckpt")
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    shits = TX.bm25_topk_stored(spark, sbase + "/idx",
                                ["stream", "window", "merge"],
                                k=5, id_col="chunk_key")
    out["stream_index_hits"] = shits.count()

    # return the POST-append frame: the append overwrote the stats
    # file, so plans built before it (hits) must not be re-collected
    # — standard Spark overwritten-file semantics.  The index dir
    # stays for the returned lazy frame; the rmtree at start reclaims
    # it next run.
    return out, hits2


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    stages, hits = run_retrieval(spark, sf)
    for k, v in stages.items():
        print(f"{k:>24}: {v}")
    hits.show(truncate=False)
