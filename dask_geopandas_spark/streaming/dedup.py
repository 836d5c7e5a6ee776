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
                       id_col: str = "doc_id",
                       sink=None) -> DataFrame:
    """One ingestion step of the INCREMENTAL exact-dedup pipeline:
    (1) in-batch exact dedup — keep the min-id row per md5(text) (one
    rank window on the 16-byte hash, the `exact_dedup` keeper rule);
    (2) drop rows whose text is already in the stored
    `write_exact_index` at ``index_path`` (static-partition-pruned
    hash join — see `dedup_exact_against_index`); (3) run ``sink``
    (e.g. the output write) on the survivors; (4) append the
    survivors' hashes to the index so the NEXT batch sees them.
    Returns the surviving rows (batch_df's schema).

    ORDERING IS THE CRASH CONTRACT: the sink runs BEFORE the index
    append.  A crash between the two re-delivers the batch with the
    index NOT yet advanced, so the replay re-emits the same survivors
    — duplicate output rows, at-least-once, never loss.  (Index-first
    would be the losing order: a replayed batch hash-matches the
    already-advanced index, the anti-join drops it, and the rows never
    reach the sink.)  Downstream exact dedup absorbs the replay
    duplicates, and duplicate index postings are harmless to the
    left-anti.  A caller that writes output OUTSIDE ``sink`` (after
    this returns) reintroduces the loss window — don't.

    A missing index (first batch ever) initializes it; an EMPTY
    survivor set skips the index write entirely (appending zero rows
    is a no-op, and initializing meta over an empty postings dir would
    break the next batch's schema inference).  The existence probe
    goes through the Hadoop FS API, so it works on s3a/gs the same as
    locally."""
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
    # localCheckpoint: the survivor frame is consumed twice (sink +
    # index append) and its lineage includes the index read that the
    # append itself mutates — cut it before either write
    survivors = survivors.localCheckpoint(eager=True)
    if sink is not None:
        sink(survivors)
    if not survivors.isEmpty():
        write_exact_index(survivors, base, text_col=text_col,
                          id_col=id_col, append=have_index)
    return survivors


def streaming_ingest_dedup(stream: DataFrame, index_path: str,
                           output_path: str,
                           text_col: str = "text",
                           id_col: str = "doc_id",
                           compact_every: int | None = None):
    """Continuous-ingestion exact dedup: each micro-batch dedups
    in-batch, then against EVERYTHING previously ingested (the stored
    exact index — never a corpus re-scan), appends its survivors to
    ``output_path`` and THEN advances the index — `ingest_dedup_batch`
    under ``foreachBatch`` with the output write as its ``sink`` (the
    output-first crash ordering; see `ingest_dedup_batch`).  Returns
    the DataStreamWriter; the caller picks trigger/checkpoint and
    calls ``.start()``:

        (streaming_ingest_dedup(stream, idx, out)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())

    State lives in the hive-partitioned index (16-byte hashes), not
    the state store: unlike ``streaming_exact_dedup`` this survives
    query restarts WITHOUT replay and is queryable between runs.

    ``compact_every=N`` runs `compact_index` on the exact index after
    every Nth micro-batch (batch ids N-1, 2N-1, ...): each append
    leaves one file set per touched bucket, so a long-running query
    otherwise accretes thousands of small files per bucket and the
    pruned lookups slow down over time.  Inside ``foreachBatch`` no
    other reader of the index is active, which is exactly the
    maintenance window compaction wants; a replayed batch id
    re-compacts harmlessly (idempotent)."""
    from ..operators.dedup import compact_index

    if compact_every is not None and int(compact_every) < 1:
        raise ValueError(
            f"compact_every must be >= 1, got {compact_every}")

    def _fb(batch_df: DataFrame, batch_id: int) -> None:
        ingest_dedup_batch(
            batch_df, index_path, text_col, id_col,
            sink=lambda s: s.write.mode("append").parquet(output_path))
        if compact_every and batch_id % int(compact_every) == \
                int(compact_every) - 1:
            compact_index(batch_df.sparkSession, index_path,
                          missing_ok=True)

    return stream.writeStream.foreachBatch(_fb)


def ingest_neardup_batch(batch_df: DataFrame, index_path: str,
                         threshold: float = 0.7,
                         text_col: str = "text",
                         id_col: str = "doc_id",
                         num_hashes: int = 8, bands: int = 4,
                         k: int = 3, n_buckets: int = 64,
                         sink=None) -> DataFrame:
    """One ingestion step of the INCREMENTAL NEAR-dup pipeline — the
    MinHash twin of `ingest_dedup_batch`: (1) in-batch near-dup dedup
    (`lsh_dedup`, the linear bucket-min form — never quadratic in a
    bucket); (2) drop rows near-duplicating anything already in the
    stored `write_minhash_index` at ``index_path``
    (static-partition-pruned band join, signature verify at
    ``threshold`` — see `dedup_against_index`); (3) run ``sink`` on
    the survivors; (4) append the survivors' signatures to the index.
    Returns the surviving rows.

    Same output-first crash contract as `ingest_dedup_batch`: a crash
    between sink and index append replays the batch at-least-once
    (duplicate output, never loss); duplicate index postings only
    duplicate candidate rows, which `minhash_index_matches`
    dropDuplicates away.  A missing index initializes under the given
    (num_hashes, bands, k, n_buckets); append-time parameters are
    validated against stored meta by `write_minhash_index`.  Empty
    survivor sets skip the index write (same schema-inference guard as
    the exact twin)."""
    from ..operators.dedup import (dedup_against_index, lsh_dedup,
                                   write_minhash_index)

    spark = batch_df.sparkSession
    base = index_path.rstrip("/")
    jvm = spark._jvm
    meta = jvm.org.apache.hadoop.fs.Path(base + "/meta")
    fs = meta.getFileSystem(spark._jsc.hadoopConfiguration())
    have_index = fs.exists(meta)

    # lsh_dedup returns the (id, rep_id) mapping; in-batch survivors
    # are the representatives themselves (one semi join back to rows).
    # materialize="none": a file-backed micro-batch is measurably
    # small, so "auto" would PERSIST its signature table — and a
    # long-running stream would accumulate one tracked cache per
    # batch, never released inside foreachBatch.  Recomputing a
    # micro-batch's single-pass signatures is the cheap, leak-free
    # side.
    reps = (lsh_dedup(batch_df, text_col=text_col, id_col=id_col,
                      num_hashes=num_hashes, bands=bands, k=k,
                      materialize="none")
            .filter(F.col("rep_id") == F.col(id_col)).select(id_col))
    firsts = batch_df.join(reps, on=id_col, how="left_semi")
    survivors = (dedup_against_index(firsts, base, threshold,
                                     text_col, id_col)
                 if have_index else firsts)
    survivors = survivors.localCheckpoint(eager=True)
    if sink is not None:
        sink(survivors)
    if not survivors.isEmpty():
        write_minhash_index(survivors, base, text_col=text_col,
                            id_col=id_col, num_hashes=num_hashes,
                            bands=bands, k=k, n_buckets=n_buckets,
                            append=have_index)
    return survivors


def streaming_ingest_neardup(stream: DataFrame, index_path: str,
                             output_path: str,
                             threshold: float = 0.7,
                             text_col: str = "text",
                             id_col: str = "doc_id",
                             num_hashes: int = 8, bands: int = 4,
                             k: int = 3, n_buckets: int = 64,
                             compact_every: int | None = None):
    """Continuous-ingestion NEAR-duplicate dedup — each micro-batch
    LSH-dedups in-batch, then against everything previously ingested
    via the stored `write_minhash_index` postings (band-bucket-pruned
    reads, never a corpus re-scan), writes survivors to
    ``output_path`` and THEN appends their signatures to the index:
    `ingest_neardup_batch` under ``foreachBatch``, output-first crash
    ordering throughout.  This is the granularity real crawl
    pipelines dedup at (near-dup, not byte-exact): state is the
    hive-partitioned postings index, restart-safe without replay and
    queryable between runs.  Returns the DataStreamWriter.
    ``compact_every``: as in `streaming_ingest_dedup` — periodic
    per-bucket coalesce of the postings inside the batch boundary."""
    from ..operators.dedup import compact_index

    if compact_every is not None and int(compact_every) < 1:
        raise ValueError(
            f"compact_every must be >= 1, got {compact_every}")

    def _fb(batch_df: DataFrame, batch_id: int) -> None:
        ingest_neardup_batch(
            batch_df, index_path, threshold, text_col, id_col,
            num_hashes, bands, k, n_buckets,
            sink=lambda s: s.write.mode("append").parquet(output_path))
        if compact_every and batch_id % int(compact_every) == \
                int(compact_every) - 1:
            compact_index(batch_df.sparkSession, index_path,
                          missing_ok=True)

    return stream.writeStream.foreachBatch(_fb)
