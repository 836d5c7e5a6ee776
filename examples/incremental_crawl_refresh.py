"""The MONTHLY INCREMENTAL-CRAWL REFRESH loop — the operational
workflow every month-over-month crawl corpus runs, composed entirely
from this engine's operators (each stage is the 100-TB shape):

    MONTH 1:  to_warc (synthesize crawl-01)
              read_warc → digest → write_cdx        (index the crawl)
              payload_text → ingest_neardup_batch   (seed the corpus
                                  + stored MinHash index)
    MONTH 2:  to_warc (crawl-02: some pages changed, some new,
                                 some gone, most byte-identical)
              read_warc → digest → write_cdx
              cdx_diff(old, new)                    (what changed?)
              changed+new ⋈ new CDX → read_warc_records
                                  (SELECTIVE refetch: only the diffed
                                   members are ever decompressed —
                                   never the crawl)
              ingest_neardup_batch                  (near-dup gate vs
                                  the stored index: trivially-edited
                                  pages drop, genuinely new survive,
                                  survivors append to the index)
              compact_index                         (fold the appended
                                  postings back to one file/bucket)

Why this is the at-scale shape: the diff runs over CDX indexes
(~1/1000 the crawl bytes, three urlkey-keyed shuffles), the refetch
decompresses only the changed/new gzip members (offset-addressed),
and the dedup gate reads only the band-bucket postings the batch's
signatures prune to — at no point is last month's corpus re-scanned.

Run:  python examples/incremental_crawl_refresh.py [sf_dir]
(defaults to /root/testdata/sf0.001; prints per-stage counts)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _write_crawl(df, path):
    """One resource record per (url, text) row."""
    from dask_geopandas_spark.sources.warc import to_warc

    to_warc(df.select(F.col("url"), F.col("text").alias("payload")),
            path, rec_type="resource", content_type="text/plain")


def _index_crawl(spark, crawl_path, cdx_path):
    """read_warc → content digest → CDXJ index (the per-crawl index
    pass: one Python container parse, everything else native)."""
    from dask_geopandas_spark.sources.warc import read_warc, write_cdx

    recs = read_warc(spark, crawl_path, records="resource")
    write_cdx(recs.withColumn("digest", F.md5(F.col("payload"))),
              cdx_path, digest_col="digest")
    return recs


def run_incremental_refresh(spark: SparkSession, sf_dir: str,
                            workdir: str | None = None):
    from dask_geopandas_spark.operators.dedup import compact_index
    from dask_geopandas_spark.sources.warc import (cdx_diff,
                                                   payload_text,
                                                   read_cdx,
                                                   read_warc_records)
    from dask_geopandas_spark.streaming.dedup import \
        ingest_neardup_batch

    base = workdir or tempfile.mkdtemp(prefix="crawl_refresh_")
    shutil.rmtree(base, ignore_errors=True)
    out = {}
    index = f"{base}/neardup_index"
    pool = f"{base}/training_pool"

    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .filter(F.col("text").isNotNull())
            .select("doc_id", "text"))
    url = F.concat(F.lit("http://site.test/page-"),
                   F.col("doc_id").cast("string"))

    # ---- MONTH 1: crawl, index, seed the corpus ----
    jan = docs.select(url.alias("url"), "doc_id", "text")
    _write_crawl(jan, f"{base}/crawl-01")
    jan_recs = _index_crawl(spark, f"{base}/crawl-01",
                            f"{base}/cdx-01")
    out["jan_records"] = jan_recs.count()
    jan_docs = jan_recs.select(
        F.col("url"),
        F.regexp_extract("url", r"page-(\d+)", 1).cast("long")
        .alias("doc_id"),
        payload_text(F.col("payload")).alias("text"))
    seeded = ingest_neardup_batch(
        jan_docs, index, threshold=0.7,
        sink=lambda d: d.write.mode("append").parquet(pool))
    out["jan_survivors"] = seeded.count()

    # ---- MONTH 2: the world moved ----
    #   %7==0 pages GONE, %5==0 (and alive) CHANGED by a small edit,
    #   8 genuinely NEW pages, everything else byte-identical
    alive = docs.filter(F.col("doc_id") % 7 != 0)
    feb_text = F.when(F.col("doc_id") % 5 == 0,
                      F.concat(F.col("text"),
                               F.lit(" [updated this month]"))) \
        .otherwise(F.col("text"))
    new_pages = spark.range(8).select(
        F.concat(F.lit("http://site.test/new-"),
                 F.col("id").cast("string")).alias("url"),
        (F.col("id") + 10_000_000).alias("doc_id"),
        F.concat(F.lit("entirely fresh coverage of topic "),
                 F.col("id").cast("string"),
                 F.lit(" with novel phrasing "),
                 F.repeat(F.concat(F.lit("detail"),
                                   F.col("id").cast("string"),
                                   F.lit(" ")), 40)).alias("text"))
    feb = (alive.select(url.alias("url"), "doc_id",
                        feb_text.alias("text"))
           .unionByName(new_pages))
    _write_crawl(feb, f"{base}/crawl-02")
    _index_crawl(spark, f"{base}/crawl-02", f"{base}/cdx-02")

    # ---- the diff: index-sized work, never the crawl ----
    old_cdx = read_cdx(spark, f"{base}/cdx-01")
    new_cdx = read_cdx(spark, f"{base}/cdx-02")
    diff = cdx_diff(old_cdx, new_cdx).localCheckpoint()
    out["diff_status"] = {r["status"]: r["n"] for r in
                          diff.groupBy("status")
                          .agg(F.count("*").alias("n")).collect()}

    # ---- selective refetch: only changed+new members decompress ----
    want = diff.filter(F.col("status").isin("changed", "new")) \
        .select("urlkey")
    locs = want.join(new_cdx, "urlkey") \
        .select("warc_file", "record_offset")
    out["refetch_members"] = locs.count()
    refetched = read_warc_records(locs)
    out["refetched_records"] = refetched.count()

    # ---- near-dup gate + index append: trivially-edited pages drop
    #      against last month's signatures, new pages survive ----
    feb_docs = refetched.select(
        F.col("url"),
        F.when(F.col("url").contains("/new-"),
               F.regexp_extract("url", r"new-(\d+)", 1).cast("long")
               + 10_000_000)
        .otherwise(F.regexp_extract("url", r"page-(\d+)", 1)
                   .cast("long")).alias("doc_id"),
        payload_text(F.col("payload")).alias("text"))
    survivors = ingest_neardup_batch(
        feb_docs, index, threshold=0.7,
        sink=lambda d: d.write.mode("append").parquet(pool))
    out["feb_survivors"] = survivors.count()
    out["feb_new_survivors"] = survivors.filter(
        F.col("url").contains("/new-")).count()

    # ---- maintenance: fold the appended postings ----
    stats = compact_index(spark, index)
    out["compacted_files"] = stats
    out["pool_docs"] = spark.read.parquet(pool).count()
    return out


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    s = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false").getOrCreate())
    for k, v in run_incremental_refresh(s, sf).items():
        print(f"{k}: {v}")
    s.stop()
