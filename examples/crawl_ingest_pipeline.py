"""Crawl ingestion end-to-end from the container format up — the
C4/RefinedWeb replication path, every stage a declarative operator:

    (synthesize a .warc.gz crawl: response records, messy URLs)
    read_warc → robots_filter (the C4 robots gate)
              → http_response_body → extract_text (boilerplate off)
              → canonicalize_url → url_dedup → exact_dedup
              → lang_id_model (25-language hashed char-ngram NB)
              → train_text_classifier + classifier_score (quality)
              → dsir_logweights vs an English target → weighted_sample
              → write_training_shards

The container parse is the pipeline's ONLY Python stage; extraction,
HTTP splitting, canonicalization, dedup keys and DSIR scoring are all
native Spark SQL expressions riding the same scan.

Run:  python examples/crawl_ingest_pipeline.py [sf_dir]
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


def run_crawl_pipeline(spark: SparkSession, sf_dir: str,
                       workdir: str | None = None):
    from dask_geopandas_spark.operators.dedup import exact_dedup
    from dask_geopandas_spark.operators.html import (extract_text,
                                                     html_escape)
    from dask_geopandas_spark.operators.sampling import (
        weighted_sample, write_training_shards)
    from dask_geopandas_spark.operators.textstats import (
        canonicalize_url, dsir_logweights, url_dedup)
    from dask_geopandas_spark.sources.warc import (http_response_body,
                                                   payload_text,
                                                   read_warc, to_warc)

    base = workdir or tempfile.mkdtemp(prefix="crawl_pipeline_")
    shutil.rmtree(base, ignore_errors=True)
    out = {}

    # 0. synthesize the crawl: one HTTP response record per document,
    #    every 4th document a refetch of its group leader (the exact
    #    dups a real crawl carries), messy URLs
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .filter(F.col("text").isNotNull())
    leader = (F.col("doc_id") - F.col("doc_id") % 4).alias("leader")
    lead = docs.select(F.col("doc_id").alias("leader"),
                       F.col("text").alias("ltext"),
                       F.col("lang").alias("llang"))
    j = docs.select("doc_id", leader).join(lead, on="leader")
    url = F.concat(F.lit("http://Crawl.TEST"),
                   F.when(F.col("doc_id") % 3 == 0, F.lit(":80"))
                   .otherwise(F.lit("")),
                   F.lit("/doc-"), F.col("leader").cast("string"),
                   F.when(F.col("doc_id") % 2 == 0,
                          F.lit("?utm_source=feed")).otherwise(F.lit("")))
    page = F.concat(
        F.lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
              "<html><body><nav><a href=\"/\">Home</a></nav><p>"),
        html_escape(F.col("ltext")), F.lit("</p></body></html>"))
    to_warc(j.select(url.alias("url"), page.alias("payload"),
                     F.col("llang").alias("lang")),
            f"{base}/crawl", rec_type="response",
            content_type="application/http; msgtype=response")

    # 1. the container read: range-owned gzip members, one Python pass
    recs = read_warc(spark, f"{base}/crawl", records="response")
    out["records"] = recs.count()

    # 1.5 robots gate (C4): the host disallows /doc-1* — those
    #     captures never enter the pipeline
    from dask_geopandas_spark.operators.textstats import (
        parse_robots, robots_filter)

    # rules are per ORIGIN — the crawl fetches both crawl.test and
    # crawl.test:80 forms, so both carry the policy
    robots = spark.createDataFrame(
        [("crawl.test", "User-agent: *\nDisallow: /doc-1\n"),
         ("crawl.test:80", "User-agent: *\nDisallow: /doc-1\n")],
        "host string, robots_txt string")
    recs = robots_filter(recs, parse_robots(robots))
    out["robots_kept"] = recs.count()

    # 2. HTTP split + boilerplate-filtered extraction + canonical URL
    pages = recs.select(
        canonicalize_url(F.col("url")).alias("curl"),
        payload_text(http_response_body(F.col("payload"))).alias("html"))
    text = extract_text(pages, html_col="html", out_col="text",
                        main_only=True, max_link_density=0.2) \
        .drop("html")

    # 3. URL-level dedup (the cheap first pass), then exact text dedup
    out["distinct_urls"] = url_dedup(
        text.withColumn("doc_id", F.monotonically_increasing_id()),
        url_col="curl").count()
    ided = text.withColumn(
        "doc_id", F.regexp_extract(F.col("curl"), "doc-([0-9]+)", 1)
        .cast("long"))
    keep = exact_dedup(ided)
    out["after_exact_dedup"] = keep.count()
    # materialize the dedup output before the model stages: the
    # extraction chain's codegen would otherwise re-inline into every
    # downstream scoring expression (a real pipeline checkpoints
    # between major stages for exactly this reason)
    survivors = ided.join(
        keep.select(F.col("keeper_id").alias("doc_id")).distinct(),
        on="doc_id").dropDuplicates(["doc_id"]).localCheckpoint()

    # 3.5 language gate: the 25-language hashed char-ngram NB, seed
    #     model — keep documents identified as English
    from dask_geopandas_spark.operators.textstats import (
        lang_id_model, seed_lang_corpus, train_lang_model)

    lm = train_lang_model(seed_lang_corpus(spark))
    pred = lang_id_model(survivors, lm)
    survivors = survivors.join(
        pred.filter(F.col("pred_lang") == "en").select("doc_id"),
        on="doc_id")
    out["lang_en"] = survivors.count()

    # 3.6 model-based quality: train the reference-vs-crawl logistic
    #     regression on the labeled documents table, score survivors,
    #     drop the below-bias half (score < bias ~ crawl-likelier)
    from dask_geopandas_spark.operators.textstats import (
        classifier_score, train_text_classifier)

    labeled = docs.select(
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0)
        .alias("label"), "text")
    qmodel = train_text_classifier(labeled, n_buckets=1024, iters=3,
                                   lr=2.0)
    qbias = qmodel.filter(F.col("bucket") == -1).head()["weight"]
    qscored = classifier_score(
        survivors, weights_df=qmodel.filter(F.col("bucket") >= 0),
        dim=1024, bias=float(qbias))
    # keep the above-batch-mean half (a relative cut — absolute
    # thresholds are corpus-specific)
    qmean = qscored.agg(F.avg("quality_score").alias("_m"))
    survivors = (qscored.crossJoin(F.broadcast(qmean))
                 .filter(F.col("quality_score") >= F.col("_m"))
                 .drop("_m"))
    out["quality_kept"] = survivors.count()

    # 4. DSIR: weight survivors toward the English documents
    target = docs.filter(F.col("lang") == "en").select("text")
    w = dsir_logweights(survivors, target, n_buckets=2048)
    scored = survivors.join(w, on="doc_id") \
        .withColumn("w", F.exp(F.col("avg_logratio")))
    picked = weighted_sample(scored, min(64, out["after_exact_dedup"]),
                             "w")
    out["selected"] = picked.count()

    # 5. shard the selection for training
    write_training_shards(picked.select("doc_id", "text"),
                          f"{base}/shards", n_shards=4,
                          key_col="doc_id")
    out["shards"] = len([f for f in os.listdir(f"{base}/shards")
                         if not f.startswith("_")])
    return out, base


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    out, base = run_crawl_pipeline(spark, sf)
    for name, n in out.items():
        print(f"{name:>18}: {n}")
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()
