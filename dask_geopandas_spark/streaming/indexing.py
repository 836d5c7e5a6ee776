"""Streaming incremental indexing for retrieval pipelines.

The stored BM25 index (`operators/textstats.write_text_index`) is
appendable by design — postings are bucketed per term, so a new batch
never rewrites old ones, and stats merge by exact integer addition.
This module drives those appends from Structured Streaming, one
micro-batch per append, with a per-batch COMMIT MARKER giving the
pipeline exactly-once semantics on plain parquet:

* a replayed micro-batch whose marker exists is SKIPPED (the common
  crash point — after the batch committed but before the streaming
  checkpoint advanced — costs nothing);
* a crash INSIDE the append window leaves `write_text_index`'s
  ``_append_in_progress`` marker in place, every stored reader refuses
  the index, and the documented recovery is a rebuild — a torn append
  is detectable, never a silent double-count (double-appending an
  inverted index is NOT idempotent, unlike the exact/minhash dedup
  indexes where duplicate postings are absorbed by the join);
* a crash AFTER commit-marker creation but before in-progress removal
  (the marker proves the append fully committed) self-heals: the
  replayed batch sees its commit marker, clears the stale in-progress
  flag, and skips — no rebuild.

No direct reference analog (the reference is batch-only); BASELINE.json
north-star scope (training-data pipeline operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _hadoop_fs(spark, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p


def index_documents_batch(batch_df: DataFrame, index_path: str,
                          batch_id: int | None = None,
                          n_buckets: int = 64,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> bool:
    """One ingestion step of the INCREMENTAL BM25 index: append the
    batch's postings/stats to the `write_text_index` layout at
    ``index_path`` (initializing on first use), guarded by a per-batch
    commit marker under ``<index>/batches/``.  Returns True if the
    batch was indexed, False if it was skipped as already committed
    (exactly-once under micro-batch replay).

    The marker is created by `write_text_index(commit_marker=)` BEFORE
    its in-progress marker is removed, so "marker exists" always means
    "append fully committed".  Empty batches commit without touching
    the index (appending zero rows is a no-op, and initializing stats
    over an empty postings dir would break later schema inference).

    Dedup is deliberately NOT built in: compose upstream
    (`streaming/dedup.ingest_dedup_batch` or the batch dedup
    operators) — indexing a row twice double-counts it, which is why
    the commit marker exists."""
    spark = batch_df.sparkSession
    base = index_path.rstrip("/")
    fs, _ = _hadoop_fs(spark, base)
    HP = spark._jvm.org.apache.hadoop.fs.Path
    marker = None
    if batch_id is not None:
        marker = f"{base}/batches/batch-{int(batch_id)}"
        if fs.exists(HP(marker)):
            # The commit marker is created BEFORE _append_in_progress
            # is removed, so a crash in that sliver leaves a
            # fully-committed index that every stored reader refuses.
            # The marker's existence proves the append committed —
            # clearing a lingering in-progress flag here is safe and
            # turns that crash window's recovery from "full rebuild"
            # into "replay skips the batch and heals the flag".
            fs.delete(HP(base + "/_append_in_progress"), False)
            return False
    if batch_df.isEmpty():
        if marker is not None:
            fs.mkdirs(HP(base + "/batches"))
            fs.create(HP(marker), True).close()
        return True
    from ..operators.textstats import write_text_index

    have = fs.exists(HP(base + "/stats"))
    if marker is not None:
        fs.mkdirs(HP(base + "/batches"))
    write_text_index(batch_df, base, n_buckets=n_buckets,
                     text_col=text_col, id_col=id_col, append=have,
                     commit_marker=marker)
    return True


def streaming_index_documents(stream: DataFrame, index_path: str,
                              n_buckets: int = 64,
                              text_col: str = "text",
                              id_col: str = "doc_id",
                              compact_every: int | None = None):
    """Continuous BM25 indexing: each micro-batch appends its postings
    to the stored inverted index — `index_documents_batch` under
    ``foreachBatch`` (see there for the exactly-once contract).
    Returns the DataStreamWriter; the caller picks trigger/checkpoint
    and calls ``.start()``:

        (streaming_index_documents(stream, idx)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())

    The index is queryable BETWEEN micro-batches with the stored BM25
    readers (`bm25_topk_stored` / `bm25_batch_topk_stored`) — df is
    recomputed from the pruned postings at query time, so no stats
    merge is ever pending.  ``compact_every=N``: every Nth micro-batch
    ends with a per-bucket coalesce of the postings
    (`operators/dedup.compact_index`) inside the batch boundary — the
    maintenance pass that keeps thousands of appends from drowning the
    term-bucket-pruned reads in small files."""
    from ..operators.dedup import compact_index

    if compact_every is not None and int(compact_every) < 1:
        raise ValueError(
            f"compact_every must be >= 1, got {compact_every}")

    def _fb(batch_df: DataFrame, batch_id: int) -> None:
        done = index_documents_batch(batch_df, index_path, batch_id,
                                     n_buckets, text_col, id_col)
        if done and compact_every and batch_id % int(compact_every) \
                == int(compact_every) - 1:
            compact_index(batch_df.sparkSession, index_path,
                          missing_ok=True)

    return stream.writeStream.foreachBatch(_fb)


def ingest_vectors_batch(batch_df: DataFrame, index_path: str,
                         centroids=None, batch_id: int | None = None,
                         vec_col: str = "embedding") -> bool:
    """One ingestion step of the INCREMENTAL vector index — the
    vector-DB upsert shape: append the batch's vectors to the
    `write_ivf_index` layout at ``index_path`` (initializing on first
    use — ``centroids`` required then; later batches validate against
    or load the stored ``_centroids.json`` sidecar), guarded by a
    per-batch commit marker under ``<index>/_batches/`` (underscore:
    invisible to parquet discovery in the root-partitioned layout).
    Returns True if the batch was indexed, False if skipped as
    already committed.

    Exactly-once contract mirrors `index_documents_batch`:
    re-appending a vector duplicates it in every probe (NOT
    idempotent), so the marker is created inside the append's
    in-progress window (marker-present always means fully-committed;
    a torn append leaves ``_append_in_progress`` and every stored
    reader refuses; a crash in the post-commit sliver self-heals on
    replay).

    The batch's NON-vector columns (ids, payloads) ride along into
    the stored layout untouched; there is deliberately no id-based
    dedup of re-appended vectors here — dedup the stream upstream
    (`streaming_ingest_dedup`) if re-sends are possible, exactly as
    the docs ingester's contract states."""
    spark = batch_df.sparkSession
    base = index_path.rstrip("/")
    fs, _ = _hadoop_fs(spark, base)
    HP = spark._jvm.org.apache.hadoop.fs.Path
    marker = None
    if batch_id is not None:
        marker = f"{base}/_batches/batch-{int(batch_id)}"
        if fs.exists(HP(marker)):
            # commit marker proves the append committed — clear a
            # stale in-progress flag from the post-commit crash sliver
            fs.delete(HP(base + "/_append_in_progress"), False)
            return False
    if batch_df.isEmpty():
        if marker is not None:
            fs.mkdirs(HP(base + "/_batches"))
            fs.create(HP(marker), True).close()
        return True
    from ..operators.similarity import write_ivf_index

    have = fs.exists(HP(base + "/_centroids.json"))
    if marker is not None:
        fs.mkdirs(HP(base + "/_batches"))
    write_ivf_index(batch_df, base, centroids, vec_col=vec_col,
                    append=have, commit_marker=marker)
    return True


def streaming_ingest_vectors(stream: DataFrame, index_path: str,
                             centroids=None,
                             vec_col: str = "embedding",
                             compact_every: int | None = None):
    """Continuous embedding ingestion: each micro-batch appends its
    vectors to the stored IVF index — `ingest_vectors_batch` under
    ``foreachBatch`` (see there for the exactly-once contract).
    Returns the DataStreamWriter; the caller picks trigger/checkpoint
    and calls ``.start()``.

    The index is searchable BETWEEN micro-batches with
    `ivf_topk_stored` (centroids ride in the sidecar; no stats merge
    is ever pending).  ``compact_every=N``: every Nth micro-batch ends
    with a per-cell coalesce (`compact_index(dataset=None)` — the
    root-partitioned form; sidecars and commit markers are carried
    across the swap)."""
    from ..operators.dedup import compact_index

    if compact_every is not None and int(compact_every) < 1:
        raise ValueError(
            f"compact_every must be >= 1, got {compact_every}")

    def _fb(batch_df: DataFrame, batch_id: int) -> None:
        done = ingest_vectors_batch(batch_df, index_path, centroids,
                                    batch_id, vec_col)
        if done and compact_every and batch_id % int(compact_every) \
                == int(compact_every) - 1:
            compact_index(batch_df.sparkSession, index_path,
                          dataset=None, missing_ok=True)

    return stream.writeStream.foreachBatch(_fb)


def ingest_hll_batch(batch_df: DataFrame, sketch_path: str,
                     col: str, p: int = 12,
                     by: list[str] | None = None,
                     batch_id: int | None = None) -> bool:
    """One ingestion step of the INCREMENTAL distinct counter: append
    the batch's HLL register frame (≤ 2^p rows per group) under
    ``<sketch>/registers``.  Returns False if the batch's commit
    marker already exists (replay skipped).

    Unlike the BM25/vector ingesters, correctness here does NOT
    depend on the marker: register merge is MAX, and max is
    idempotent — a replayed or torn append adds duplicate register
    rows that the read-time merge absorbs exactly.  The marker is a
    pure cost optimization (skip re-scanning a replayed batch), and
    there is no in-progress flag and no rebuild scenario: every
    crash point leaves a readable, correct sketch.  That crash-safety
    -by-algebra is the reason to count distincts with a sketch
    instead of an exact groupBy in a stream."""
    spark = batch_df.sparkSession
    base = sketch_path.rstrip("/")
    fs, _ = _hadoop_fs(spark, base)
    HP = spark._jvm.org.apache.hadoop.fs.Path
    marker = None
    if batch_id is not None:
        marker = f"{base}/_batches/batch-{int(batch_id)}"
        if fs.exists(HP(marker)):
            return False
    from ..operators.sketches import hll_registers

    (hll_registers(batch_df, col, p, by)
     .write.mode("append").parquet(base + "/registers"))
    if marker is not None:
        fs.mkdirs(HP(base + "/_batches"))
        fs.create(HP(marker), True).close()
    return True


def hll_count_stored(spark, sketch_path: str, p: int = 12,
                     by: list[str] | None = None,
                     count_col: str = "approx_distinct") -> DataFrame:
    """Finish the stored register frames into per-group estimates:
    read-time max-merge + the HLL estimator.  Because merge is
    lossless, the result is IDENTICAL to `operators.sketches.
    hll_count` over the concatenated batches — batch boundaries are
    invisible."""
    from ..operators.sketches import hll_estimate, hll_merge

    regs = spark.read.parquet(sketch_path.rstrip("/") + "/registers")
    return hll_estimate(hll_merge(regs, by=by), p, by, count_col)


def compact_hll_stored(spark, sketch_path: str,
                       by: list[str] | None = None) -> None:
    """Algebraic compaction: materialize the merged register frame,
    APPEND it, then delete the pre-existing part files.  Every
    intermediate state reads correctly — before the deletes the
    duplicates are absorbed by max-merge, after them the appended
    merge is complete — so no atomic swap, no in-progress marker,
    no rebuild path."""
    from ..operators.sketches import hll_merge

    base = sketch_path.rstrip("/") + "/registers"
    fs, _ = _hadoop_fs(spark, base)
    HP = spark._jvm.org.apache.hadoop.fs.Path
    old = [f.getPath() for f in fs.listStatus(HP(base))
           if f.getPath().getName().startswith("part-")]
    merged = hll_merge(spark.read.parquet(base), by=by) \
        .localCheckpoint()
    merged.write.mode("append").parquet(base)
    for pth in old:
        fs.delete(pth, False)


def _kmv_k(base: str) -> int:
    meta = _sidecar_read(base, "_kmv.json")
    if meta is None:
        raise ValueError(f"no _kmv.json sidecar at {base!r} — not a "
                         "stored KMV sketch")
    return int(meta["k"])


def ingest_kmv_batch(batch_df: DataFrame, sketch_path: str, col: str,
                     k: int = 256, by: list[str] | None = None,
                     batch_id: int | None = None) -> bool:
    """One ingestion step of the INCREMENTAL distinct-sample store
    (the uniform-sample counter `kmv_overlap` needs where HLL cannot
    serve): append the batch's k-smallest-hash frame (≤ k rows per
    group) under ``<sketch>/hashes``.  Returns False when the
    batch's commit marker exists (replay skipped).

    Crash-safe BY ALGEBRA like the HLL ingester: merge is
    distinct-then-k-smallest, so a replayed or torn append only adds
    duplicate hash rows the read-time distinct absorbs exactly — the
    marker is a pure cost optimization, no in-progress flag, no
    rebuild path.  Unlike HLL, ``k`` is the store's IDENTITY (a
    k=128 store read as k=256 has a biased (k-1)/theta estimator),
    so it pins in a ``_kmv.json`` sidecar on first use and
    mismatches refuse — the CMS/Bloom sidecar contract."""
    import json

    spark = batch_df.sparkSession
    base = sketch_path.rstrip("/")
    fs, _ = _hadoop_fs(spark, base)
    HP = spark._jvm.org.apache.hadoop.fs.Path
    marker = None
    if batch_id is not None:
        marker = f"{base}/_batches/batch-{int(batch_id)}"
        if fs.exists(HP(marker)):
            return False
    stored = _sidecar_read(base, "_kmv.json")
    if stored is not None:
        if int(stored["k"]) != int(k):
            raise ValueError(
                f"stored KMV at {base!r} has k={stored['k']}; ingest "
                f"requested k={k} — k is the sketch's identity")
    else:
        from ..sources.fs import write_atomic

        fs.mkdirs(HP(base))
        write_atomic(base + "/_kmv.json",
                     json.dumps({"k": int(k)}).encode())
    from ..operators.sketches import kmv_sketch

    (kmv_sketch(batch_df, col, k, by)
     .write.mode("append").parquet(base + "/hashes"))
    if marker is not None:
        fs.mkdirs(HP(base + "/_batches"))
        fs.create(HP(marker), True).close()
    return True


def kmv_estimate_stored(spark, sketch_path: str,
                        by: list[str] | None = None,
                        count_col: str = "approx_distinct") \
        -> DataFrame:
    """Finish the stored hash frames into per-group estimates:
    read-time distinct + k-smallest (the lossless merge) + the
    (k-1)/theta estimator, with k from the sidecar.  Equals the
    single-shot `kmv_estimate(kmv_sketch(...))` over the
    concatenated batches — batch boundaries are invisible."""
    from ..operators.sketches import kmv_estimate, kmv_merge

    base = sketch_path.rstrip("/")
    k = _kmv_k(base)
    hashes = spark.read.parquet(base + "/hashes")
    return kmv_estimate(kmv_merge(hashes, k=k, by=by), k, by,
                        count_col)


def kmv_sketch_stored(spark, sketch_path: str,
                      by: list[str] | None = None) -> DataFrame:
    """The stored store merged back to a plain sketch frame — feeds
    `operators.sketches.kmv_overlap` against another sketch (stored
    or single-shot) for cross-crawl overlap estimates."""
    from ..operators.sketches import kmv_merge

    base = sketch_path.rstrip("/")
    return kmv_merge(spark.read.parquet(base + "/hashes"),
                     k=_kmv_k(base), by=by)


def compact_kmv_stored(spark, sketch_path: str,
                       by: list[str] | None = None) -> None:
    """Algebraic compaction (the HLL shape): append the merged
    k-smallest frame, then delete the pre-existing part files —
    every intermediate state reads correctly because the read-time
    distinct + k-smallest absorbs duplicates."""
    from ..operators.sketches import kmv_merge

    base = sketch_path.rstrip("/")
    k = _kmv_k(base)
    hbase = base + "/hashes"
    fs, _ = _hadoop_fs(spark, hbase)
    HP = spark._jvm.org.apache.hadoop.fs.Path
    old = [f.getPath() for f in fs.listStatus(HP(hbase))
           if f.getPath().getName().startswith("part-")]
    merged = kmv_merge(spark.read.parquet(hbase), k=k, by=by) \
        .localCheckpoint()
    merged.write.mode("append").parquet(hbase)
    for pth in old:
        fs.delete(pth, False)


def streaming_ingest_kmv(stream: DataFrame, sketch_path: str,
                         col: str, k: int = 256,
                         by: list[str] | None = None,
                         compact_every: int | None = None):
    """Continuous distinct-sample maintenance: each micro-batch
    appends its k-smallest-hash frame (`ingest_kmv_batch` under
    ``foreachBatch``; crash-safe by algebra, see there), readable
    between batches with `kmv_estimate_stored` /
    `kmv_sketch_stored`.  ``compact_every=N`` runs the algebraic
    compaction every Nth batch.  Returns the DataStreamWriter."""
    if compact_every is not None and int(compact_every) < 1:
        raise ValueError(
            f"compact_every must be >= 1, got {compact_every}")

    def _fb(batch_df: DataFrame, batch_id: int) -> None:
        done = ingest_kmv_batch(batch_df, sketch_path, col, k, by,
                                batch_id)
        if done and compact_every and batch_id % int(compact_every) \
                == int(compact_every) - 1:
            compact_kmv_stored(batch_df.sparkSession, sketch_path, by)

    return stream.writeStream.foreachBatch(_fb)


def streaming_ingest_hll(stream: DataFrame, sketch_path: str,
                         col: str, p: int = 12,
                         by: list[str] | None = None,
                         compact_every: int | None = None):
    """Continuous distinct counting: each micro-batch appends its
    register frame (`ingest_hll_batch` under ``foreachBatch``; see
    there for why this is crash-safe WITHOUT exactly-once machinery).
    The counter is readable between batches with `hll_count_stored`.
    ``compact_every=N`` runs the algebraic compaction every Nth
    batch.  Returns the DataStreamWriter; caller picks
    trigger/checkpoint and ``.start()``."""
    if compact_every is not None and int(compact_every) < 1:
        raise ValueError(
            f"compact_every must be >= 1, got {compact_every}")

    def _fb(batch_df: DataFrame, batch_id: int) -> None:
        done = ingest_hll_batch(batch_df, sketch_path, col, p, by,
                                batch_id)
        if done and compact_every and batch_id % int(compact_every) \
                == int(compact_every) - 1:
            compact_hll_stored(batch_df.sparkSession, sketch_path, by)

    return stream.writeStream.foreachBatch(_fb)


def _sidecar_read(base: str, name: str) -> dict | None:
    import json

    from pyarrow import fs as pafs

    from ..sources.fs import resolve_fs

    fsys, p = resolve_fs(base.rstrip("/") + "/" + name)
    info = fsys.get_file_info(p)
    if info.type == pafs.FileType.NotFound:
        return None
    with fsys.open_input_stream(p) as f:
        return json.loads(f.read().decode())


def _check_no_torn(spark, base: str, kind: str) -> None:
    fs, _ = _hadoop_fs(spark, base)
    HP = spark._jvm.org.apache.hadoop.fs.Path
    if fs.exists(HP(base + "/_append_in_progress")):
        raise RuntimeError(
            f"stored {kind} at {base!r} was left inconsistent by a "
            "failed append (_append_in_progress marker present): a "
            "replayed batch would double-count — rebuild the store "
            "(it is derived data)")


def _exactly_once_append(spark, base: str, sidecar: str,
                         params: dict, kind: str, dataset: str,
                         frame: DataFrame,
                         batch_id: int | None) -> bool:
    """THE exactly-once append contract shared by every SUM-merge
    store (CMS cells, q-digest leaves — where a replayed append
    double-counts, unlike HLL's idempotent max): the batch's commit
    marker skips replays (and heals a lingering in-progress flag);
    the ``sidecar`` pins ``params`` as the store's identity on first
    use and refuses mismatches; ``_append_in_progress`` wraps the
    write with the marker created BEFORE the flag clears
    (marker-present always means fully-committed), so a torn append
    leaves the flag and every stored reader refuses.  One
    implementation — a fix to any crash-consistency path propagates
    to every store (the r13 review's dedup order)."""
    import json

    fs, _ = _hadoop_fs(spark, base)
    HP = spark._jvm.org.apache.hadoop.fs.Path
    marker = None
    if batch_id is not None:
        marker = f"{base}/_batches/batch-{int(batch_id)}"
        if fs.exists(HP(marker)):
            fs.delete(HP(base + "/_append_in_progress"), False)
            return False
    _check_no_torn(spark, base, kind)
    stored = _sidecar_read(base, sidecar)
    if stored is not None:
        if {k: int(v) for k, v in stored.items()} != params:
            raise ValueError(
                f"stored {kind} at {base!r} has {stored}; ingest "
                f"requested {params} — parameters are the store's "
                "identity")
    else:
        from ..sources.fs import write_atomic

        fs.mkdirs(HP(base))
        write_atomic(base + "/" + sidecar,
                     json.dumps(params).encode())
    if marker is not None:
        fs.mkdirs(HP(base + "/_batches"))
    fs.create(HP(base + "/_append_in_progress"), True).close()
    frame.write.mode("append").parquet(base + "/" + dataset)
    if marker is not None:
        fs.create(HP(marker), True).close()
    fs.delete(HP(base + "/_append_in_progress"), False)
    return True


def _cms_params(base: str) -> tuple[int, int]:
    meta = _sidecar_read(base, "_cms.json")
    if meta is None:
        raise ValueError(f"no _cms.json sidecar at {base!r} — not a "
                         "stored Count-Min sketch")
    return int(meta["width"]), int(meta["depth"])


def _check_cms_consistent(spark, base: str) -> None:
    _check_no_torn(spark, base, "CMS")


def ingest_cms_batch(batch_df: DataFrame, sketch_path: str, col: str,
                     width: int = 1024, depth: int = 4,
                     weight_col: str | None = None,
                     by: list[str] | None = None,
                     batch_id: int | None = None) -> bool:
    """One ingestion step of the INCREMENTAL frequency counter:
    append the batch's Count-Min cell frame under
    ``<sketch>/cells``; (width, depth) pin in a ``_cms.json``
    sidecar on first use and cannot change.  Returns False if the
    batch's commit marker exists (replay skipped).

    Unlike the HLL ingester, CMS NEEDS the exactly-once machinery:
    cell merge is SUM, and summing a replayed batch double-counts —
    the shared `_exactly_once_append` contract (flag + commit marker
    + ``_cms.json`` identity pin)."""
    from ..operators.sketches import cms_sketch

    return _exactly_once_append(
        batch_df.sparkSession, sketch_path.rstrip("/"), "_cms.json",
        {"width": int(width), "depth": int(depth)}, "CMS", "cells",
        cms_sketch(batch_df, col, width, depth, weight_col, by),
        batch_id)


def cms_stored(spark, sketch_path: str,
               by: list[str] | None = None):
    """(merged cell frame, width, depth) of a stored sketch — the
    read-time per-cell sum is the lossless CMS merge, so the result
    equals a single-shot `cms_sketch` over all ingested batches.  A
    torn append refuses (see `ingest_cms_batch`)."""
    from ..operators.sketches import cms_merge

    base = sketch_path.rstrip("/")
    _check_cms_consistent(spark, base)
    width, depth = _cms_params(base)
    cells = cms_merge(spark.read.parquet(base + "/cells"), by=by)
    return cells, width, depth


def cms_lookup_stored(df: DataFrame, col: str, sketch_path: str,
                      est_col: str = "est_count",
                      by: list[str] | None = None) -> DataFrame:
    """Point-query a stored sketch: parameters load from the sidecar
    (no way to probe with mismatched sizing), cells merge at read,
    then `cms_lookup` — ``by`` must match the ingest's grouping and
    threads through to the per-group lookup."""
    from ..operators.sketches import cms_lookup

    cells, width, depth = cms_stored(df.sparkSession, sketch_path, by)
    return cms_lookup(df, col, cells, width, depth, est_col, by)


def streaming_ingest_cms(stream: DataFrame, sketch_path: str,
                         col: str, width: int = 1024,
                         depth: int = 4,
                         weight_col: str | None = None,
                         by: list[str] | None = None):
    """Continuous frequency counting: each micro-batch appends its
    cell frame under the exactly-once contract (`ingest_cms_batch`).
    The counter is readable between batches with
    `cms_lookup_stored`.  Returns the DataStreamWriter; caller picks
    trigger/checkpoint and ``.start()``."""

    def _fb(batch_df: DataFrame, batch_id: int) -> None:
        ingest_cms_batch(batch_df, sketch_path, col, width, depth,
                         weight_col, by, batch_id)

    return stream.writeStream.foreachBatch(_fb)


def _qd_params(base: str) -> int:
    meta = _sidecar_read(base, "_qd.json")
    if meta is None:
        raise ValueError(f"no _qd.json sidecar at {base!r} — not a "
                         "stored q-digest leaf store")
    return int(meta["bits"])


def _check_qd_consistent(spark, base: str) -> None:
    _check_no_torn(spark, base, "q-digest")


def ingest_qd_batch(batch_df: DataFrame, sketch_path: str, col: str,
                    bits: int = 20,
                    weight_col: str | None = None,
                    by: list[str] | None = None,
                    batch_id: int | None = None) -> bool:
    """One ingestion step of the INCREMENTAL quantile store: append
    the batch's LEAF HISTOGRAM (exact per-value counts as q-digest
    leaf nodes — compression deliberately deferred to read time, so
    the read-time sum + one compress equals a single-shot
    `sketches.qd_sketch` over all batches EXACTLY and batch
    boundaries are invisible to the oracle).  ``bits`` pins in a
    ``_qd.json`` sidecar — the universe is the store's identity;
    ``k`` is a read-time choice.  The per-batch frame is bounded by
    the batch's distinct values (and the store by 2^bits rows per
    group), the right size for the integer METRICS this is for
    (lengths, token counts, scores) — not for raw high-cardinality
    payloads.

    Leaf merge is SUM, so like the CMS ingester this needs the full
    exactly-once machinery — the shared `_exactly_once_append`
    contract (flag + commit marker + ``_qd.json`` identity pin)."""
    from ..operators.sketches import _qd_leaves

    return _exactly_once_append(
        batch_df.sparkSession, sketch_path.rstrip("/"), "_qd.json",
        {"bits": int(bits)}, "q-digest", "leaves",
        _qd_leaves(batch_df, col, bits, weight_col, list(by or [])),
        batch_id)


def qd_stored(spark, sketch_path: str, k: int = 512,
              by: list[str] | None = None):
    """(compressed digest, bits) of a stored leaf store: per-node sum
    (the lossless leaf merge) + ONE fresh compression at the caller's
    ``k`` — identical to a single-shot `qd_sketch` over all ingested
    batches.  A torn append refuses (see `ingest_qd_batch`)."""
    from pyspark.sql import functions as F

    from ..operators.sketches import _qd_compress

    base = sketch_path.rstrip("/")
    _check_qd_consistent(spark, base)
    bits = _qd_params(base)
    keys = list(by or [])
    leaves = (spark.read.parquet(base + "/leaves")
              .groupBy(*keys, "qd_id")
              .agg(F.sum("qd_count").alias("qd_count")))
    return _qd_compress(leaves, k, bits, keys, fresh=True), bits


def qd_quantiles_stored(spark, sketch_path: str, qs: list[float],
                        k: int = 512,
                        by: list[str] | None = None,
                        q_col: str = "q",
                        value_col: str = "quantile") -> DataFrame:
    """Quantiles of a stored leaf store: sidecar-pinned universe,
    read-time merge + compress, then `sketches.qd_quantiles` —
    equal to quantiles of a single-shot sketch over all batches."""
    from ..operators.sketches import qd_quantiles

    sk, bits = qd_stored(spark, sketch_path, k, by)
    return qd_quantiles(sk, qs, bits, by, q_col, value_col)


def streaming_ingest_qd(stream: DataFrame, sketch_path: str,
                        col: str, bits: int = 20,
                        weight_col: str | None = None,
                        by: list[str] | None = None):
    """Continuous quantile tracking: each micro-batch appends its
    leaf histogram under the exactly-once contract
    (`ingest_qd_batch`).  Readable between batches with
    `qd_quantiles_stored`.  Returns the DataStreamWriter; caller
    picks trigger/checkpoint and ``.start()``."""

    def _fb(batch_df: DataFrame, batch_id: int) -> None:
        ingest_qd_batch(batch_df, sketch_path, col, bits, weight_col,
                        by, batch_id)

    return stream.writeStream.foreachBatch(_fb)
