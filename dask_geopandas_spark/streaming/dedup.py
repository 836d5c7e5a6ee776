"""Streaming deduplication for training-data ingest pipelines.

The batch dedup operators (operators/dedup.py) assume a bounded input;
an ingest pipeline sees an unbounded stream.  Structured Streaming's
stateful dropDuplicates is the native answer: the fingerprint state
lives in the state store (RocksDB at cluster scale), partitioned by the
dedup key, so throughput scales with executors and no task ever holds
the whole key set.

No direct reference analog (the reference is batch-only,
dask_geopandas/tests exercise no streaming); BASELINE.json north-star
scope (training-data pipeline operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(stream: DataFrame, text_col: str = "text",
                          watermark: str | None = None,
                          ts_col: str | None = None) -> DataFrame:
    """Keep the first-seen document per normalized-text fingerprint.

    Without a watermark the fingerprint state grows with the distinct
    count (fine for bounded replays / availableNow backfills).  For a
    true unbounded stream pass ``ts_col`` + ``watermark``: state then
    expires via ``dropDuplicatesWithinWatermark`` — late re-arrivals
    inside the watermark still dedup, state stays bounded by the
    watermark window (the standard streaming tradeoff).

    WHICH row survives depends on arrival order (nondeterministic
    under parallel replay); the surviving fingerprint SET is exact —
    deterministic checks should compare fingerprints, not doc ids."""
    from ..operators.textstats import fingerprint
    from .geo import _watermarkable_ts

    out = stream.withColumn("_fp", fingerprint(F.col(text_col)))
    if ts_col is not None and watermark is not None:
        out = (_watermarkable_ts(out, ts_col)
               .withWatermark(ts_col, watermark)
               .dropDuplicatesWithinWatermark(["_fp"]))
    else:
        out = out.dropDuplicates(["_fp"])
    return out.drop("_fp")


def streaming_neardup_dedup(stream: DataFrame, text_col: str = "text",
                            bits: int = 32,
                            watermark: str | None = None,
                            ts_col: str | None = None) -> DataFrame:
    """Streaming NEAR-duplicate suppression at simhash-bucket
    granularity: keep the first-seen document per simhash value.

    Near-identical documents collapse onto equal simhashes with high
    probability (the batch suite pins hamming-closeness for near-dups),
    so bucket-exact dropDuplicates gives a streaming near-dup filter
    with the same native state-store mechanics as the exact variant —
    state is one entry per distinct simhash, expiring via the watermark
    when given.  Precision/recall trade with ``bits`` (fewer bits →
    more aggressive collapsing).  The simhash expression is pure native
    SQL, so this is dropDuplicates-grade cheap on the stream."""
    from ..operators.dedup import simhash
    from .geo import _watermarkable_ts

    out = stream.withColumn("_sh", simhash(F.col(text_col), bits=bits))
    if ts_col is not None and watermark is not None:
        out = (_watermarkable_ts(out, ts_col)
               .withWatermark(ts_col, watermark)
               .dropDuplicatesWithinWatermark(["_sh"]))
    else:
        out = out.dropDuplicates(["_sh"])
    return out.drop("_sh")


def ingest_dedup_batch(batch_df: DataFrame, index_path: str,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """One ingestion step of the INCREMENTAL exact-dedup pipeline:
    (1) in-batch exact dedup — keep the min-id row per md5(text) (one
    rank window on the 16-byte hash, the `exact_dedup` keeper rule);
    (2) drop rows whose text is already in the stored
    `write_exact_index` at ``index_path`` (static-partition-pruned
    hash join — see `dedup_exact_against_index`); (3) append the
    survivors' hashes to the index so the NEXT batch sees them.
    Returns the surviving rows (batch_df's schema).

    A missing index (first batch ever) initializes it.  The existence
    probe goes through the Hadoop FS API, so it works on s3a/gs the
    same as locally.  Crash between the output write and the index
    append re-ingests at-least-once — downstream exact dedup is
    idempotent by construction (the re-ingested rows hash-match and
    drop next time)."""
    from pyspark.sql import Window

    from ..operators.dedup import (dedup_exact_against_index,
                                   write_exact_index)

    spark = batch_df.sparkSession
    base = index_path.rstrip("/")
    jvm = spark._jvm
    meta = jvm.org.apache.hadoop.fs.Path(base + "/meta")
    fs = meta.getFileSystem(spark._jsc.hadoopConfiguration())
    have_index = fs.exists(meta)

    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(id_col)
    firsts = (batch_df.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") == 1).drop("_rn"))
    survivors = (dedup_exact_against_index(firsts, base, text_col,
                                           id_col)
                 if have_index else firsts)
    # localCheckpoint: the survivor frame is consumed twice (index
    # append + caller's sink) and its lineage includes the index read
    # that the append itself mutates — cut it before the write
    survivors = survivors.localCheckpoint(eager=True)
    write_exact_index(survivors, base, text_col=text_col,
                      id_col=id_col, append=have_index)
    return survivors


def streaming_ingest_dedup(stream: DataFrame, index_path: str,
                           output_path: str,
                           text_col: str = "text",
                           id_col: str = "doc_id"):
    """Continuous-ingestion exact dedup: each micro-batch dedups
    in-batch, then against EVERYTHING previously ingested (the stored
    exact index — never a corpus re-scan), appends its survivors to
    ``output_path`` and advances the index — `ingest_dedup_batch`
    under ``foreachBatch``.  Returns the DataStreamWriter; the caller
    picks trigger/checkpoint and calls ``.start()``:

        (streaming_ingest_dedup(stream, idx, out)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())

    State lives in the hive-partitioned index (16-byte hashes), not
    the state store: unlike ``streaming_exact_dedup`` this survives
    query restarts WITHOUT replay and is queryable between runs."""
    def _fb(batch_df: DataFrame, _batch_id: int) -> None:
        surv = ingest_dedup_batch(batch_df, index_path, text_col,
                                  id_col)
        surv.write.mode("append").parquet(output_path)

    return stream.writeStream.foreachBatch(_fb)
