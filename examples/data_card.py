"""The DATA CARD pass — the summary tables a corpus release publishes,
composed from the engine's sketch/statistics family in the shapes that
survive 100 TB:

    corpus_stats(percentiles=)   docs / tokens / dup rate / length mix
                                 + q-digest length percentiles
                                 (one scan + one histogram pass)
    ngram_diversity              distinct-bigram ratio per source
    hll_count                    distinct texts per source (mergeable
                                 registers — the cross-release form)
    heavy_hitters                exact over-N tokens via CMS pruning
                                 (never a full-vocabulary shuffle)
    kmv_overlap                  cross-source URL overlap from two
                                 k-row sketches (the corpora never
                                 join)

Run:  python examples/data_card.py [sf_dir]
(defaults to /root/testdata/sf0.001; prints each table)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def build_data_card(spark: SparkSession, sf_dir: str) -> dict:
    from dask_geopandas_spark.operators.sketches import (heavy_hitters,
                                                         hll_count,
                                                         kmv_overlap,
                                                         kmv_sketch)
    from dask_geopandas_spark.operators.textstats import (
        corpus_stats, ngram_diversity, tokens)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    card = {}
    card["stats"] = corpus_stats(
        docs, group_col="source", percentiles=[0.5, 0.9, 0.99],
        percentile_k=2048, percentile_bits=10)
    card["diversity"] = ngram_diversity(docs, n=2, by=["source"])
    card["distinct_texts"] = hll_count(docs, "text", p=12,
                                       by=["source"])
    toks = docs.select(F.explode(
        F.filter(tokens(F.col("text")),
                 lambda x: x != F.lit(""))).alias("token"))
    total = toks.count()
    card["heavy_tokens"] = heavy_hitters(
        toks, "token", min_count=max(2, total // 50))
    # cross-source text overlap from two k-row sketches
    srcs = [r["source"] for r in
            docs.select("source").distinct().orderBy("source")
            .limit(2).collect()]
    if len(srcs) == 2:
        a = kmv_sketch(docs.filter(F.col("source") == srcs[0]),
                       "text", k=128)
        b = kmv_sketch(docs.filter(F.col("source") == srcs[1]),
                       "text", k=128)
        card["overlap"] = kmv_overlap(a, b, k=128)
    # tokenizer metrics per (source, lang): train a small byte-level
    # BPE on the corpus itself, then the published bytes-per-token /
    # fertility table (r16)
    from dask_geopandas_spark.operators.bpe import (
        bpe_byte_token_count, tokenizer_datacard, train_bpe_bytes)
    merges = train_bpe_bytes(docs, num_merges=8)
    counts = bpe_byte_token_count(docs, merges)
    card["tokenizer"] = tokenizer_datacard(docs, counts)
    return card


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    s = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false").getOrCreate())
    for name, df in build_data_card(s, sf).items():
        print(f"== {name}")
        df.show(20, truncate=False)
    s.stop()
