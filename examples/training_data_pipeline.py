"""End-to-end training-data pipeline on the engine — every stage is a
first-class operator, the whole flow is a handful of declarative calls.

    corpus → language/quality filter → model-based quality score (r6)
           → line-level boilerplate dedup (r6) → substring dedup (r6)
           → exact dedup
           → near-dup (LSH) → benchmark decontamination
           → per-source quota cap (r5) → epochs-per-source mixing (r6)
           → deterministic sampling
           → train/holdout split → sequence packing
           → sharded materialization (r6) → stats

Run:  python examples/training_data_pipeline.py [sf_dir]
(defaults to /root/testdata/sf0.001; prints per-stage counts)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run_pipeline(spark: SparkSession, sf_dir: str):
    from dask_geopandas_spark.operators import dedup as DD
    from dask_geopandas_spark.operators import sampling as SA
    from dask_geopandas_spark.operators import textstats as TX

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stages = {"raw": docs.count()}

    # 0. URL-level dedup (r8) — the cheapest dedup a crawl pipeline
    #    runs, BEFORE any text comparison: the same page refetched as
    #    http/https, with/without www, with rotating utm_ tags
    #    collapses on its canonical URL (documents carry no url column
    #    here, so graft one: source-derived with tracking noise)
    with_url = docs.withColumn(
        "url", F.concat(
            F.lit("https://"),
            F.when(F.col("doc_id") % 2 == 0, F.lit("WWW.")).otherwise(F.lit("")),
            F.col("source"), F.lit(".example.com/doc/"),
            (F.col("doc_id") % 500).cast("string"),
            F.lit("?utm_source=crawler")))
    url_keep = TX.url_dedup(with_url).select(
        F.col("keeper_id").alias("doc_id"))
    docs = docs.join(url_keep, on="doc_id", how="inner")
    stages["url_dedup"] = docs.count()

    # 1. language + quality gate (native projections)
    scored = docs.select(
        "*",
        TX.lang_id(F.col("text")).alias("lang_guess"),
        TX.quality_score(F.col("text")).alias("quality"),
        TX.token_count(F.col("text")).alias("n_tokens"),
    )
    kept = scored.filter((F.col("quality") > 0.3) & (F.col("n_tokens") >= 5))
    stages["quality_gate"] = kept.count()

    # 1b. model-based quality score (r6): hashed-bucket linear
    #     classifier, one row-wise scan — weights would come from a
    #     trained fastText-style model; here a fixed demo vector
    weights = [((b * 37 % 101) - 50) / 100.0 for b in range(64)]
    kept = TX.classifier_score(kept, weights).filter(
        F.col("quality_score") > -0.05)
    stages["classifier_gate"] = kept.count()

    # 1c. line-level boilerplate dedup (r6): drop lines repeated
    #     corpus-wide (cookie banners, footers), keep doc structure
    kept = DD.line_dedup(kept.drop("n_tokens"), max_occurrences=5)
    kept = kept.withColumn("n_tokens", TX.token_count(F.col("text"))) \
        .filter(F.col("n_tokens") >= 5).drop("n_dropped")
    stages["line_dedup"] = kept.count()

    # 1d. substring dedup (r6, Lee et al. ExactSubstr): cut every
    #     corpus-duplicated k-token span out of every doc
    kept = DD.remove_duplicated_spans(kept.drop("n_tokens"),
                                      k=8, min_occurrences=4)
    kept = kept.withColumn("n_tokens", TX.token_count(F.col("text"))) \
        .filter(F.col("n_tokens") >= 5).drop("n_removed_tokens")
    stages["span_removal"] = kept.count()

    # 2. exact dedup (md5 groupBy keeper join)
    keepers = DD.exact_dedup(kept).select(
        F.col("keeper_id").alias("doc_id"))
    kept = kept.join(keepers, on="doc_id", how="inner")
    stages["exact_dedup"] = kept.count()

    # 3. near-dup removal (LSH bucket-min representatives)
    reps = DD.lsh_dedup(kept, num_hashes=8, bands=4)
    kept = (kept.join(reps, on="doc_id")
            .filter(F.col("rep_id") == F.col("doc_id")).drop("rep_id"))
    stages["neardup_dedup"] = kept.count()

    # 4. benchmark decontamination (broadcast shingle-hash anti-join)
    benchmark = docs.filter(F.col("doc_id") % 97 == 0)
    kept = DD.decontaminate(kept, benchmark)
    stages["decontaminated"] = kept.count()

    # Lineage barrier: a dozen chained operators deepen the plan until
    # AQE's per-stage plan stringification alone costs real heap (the
    # crawl example hit the sibling failure mode, codegen re-inlining
    # past the JVM's 64 KB method limit).  The survivor frame is tiny
    # by now — materialize it and truncate.
    kept = kept.localCheckpoint()

    # 4b. per-source quota (C4/RefinedWeb-style domain cap, r5):
    #     under-cap sources bypass the sort window entirely
    kept = SA.cap_per_group(kept, group_col="source", cap=50)
    stages["source_capped"] = kept.count()

    # 4c. epochs-per-source mixing (r6): repeat the highest-quality
    #     source, thin a noisy one — deterministic, copy_id salts
    #     repeats apart downstream
    kept = SA.oversample(kept, {"src0": 2.0, "src1": 0.5},
                         group_col="source")
    stages["source_mixed"] = kept.count()

    # 5. deterministic subsample + leak-proof split
    kept = SA.hash_sample(kept, 0.9)
    kept = SA.split_train_holdout(kept, holdout_fraction=0.02)
    stages["sampled"] = kept.count()

    # 6. sequence packing per (split, lang) shard
    packed = SA.pack_documents(
        kept.withColumn("_shard", F.concat_ws("/", "split", "lang")),
        budget=4096, by="_shard")
    bins = packed.groupBy("_shard", "pack_bin").agg(
        F.sum("n_tokens").alias("bin_tokens"))
    stages["pack_bins"] = bins.count()

    # 7. materialize: hive-partitioned shards with a seeded
    #    deterministic global shuffle (r6) — the loader's input
    import tempfile

    out_dir = os.path.join(tempfile.gettempdir(), "dgs_train_shards")
    # copy_id (from oversample) folds into the shard key automatically,
    # so replicas of one doc land in different shards/positions
    SA.write_training_shards(packed, out_dir, n_shards=4,
                             key_col="doc_id", seed="tour")
    spark_ = packed.sparkSession
    stages["shards"] = spark_.read.parquet(out_dir) \
        .select("shard").distinct().count()
    return stages, packed


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    stages, _ = run_pipeline(spark, sf)
    for name, n in stages.items():
        print(f"{name:>16}: {n}")
    spark.stop()
