"""Deterministic sampling & sequence-packing operators for LLM
training-data pipelines.

At 100 TB, `rand()`-based sampling is a liability: re-runs draw
different rows, retried tasks can double-sample, and an oracle cannot
reproduce the choice.  Every operator here is a pure function of the
data — hash-based, shuffle-free where possible, and bit-reproducible
in the DuckDB oracle:

* ``hash_sample``        — keep a row iff ``portable_hash(key) mod M``
  falls under the fraction; a narrow native filter that pushes down to
  the scan (no shuffle, no state, stable across retries/re-runs).
* ``stratified_hash_sample`` — per-stratum fractions (e.g. languages
  kept at different rates), same single-pass filter via a CASE chain.
* ``split_train_holdout`` — disjoint, exhaustive train/holdout tagging
  by hash bucket: the classic deterministic eval-split.
* ``pack_documents``     — assign documents to fixed token-budget bins
  by exclusive running token count (the distributable form of greedy
  sequence packing): one window over the pack ordering per group.

The window in ``pack_documents`` is per-``by``-group: with ``by`` (the
normal usage — pack per language/source shard) Spark evaluates it as a
partitioned window after one hash shuffle on the group key; a global
pack (``by=None``) serializes through a single window partition and is
flagged for small inputs only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .dedup import portable_hash
from .textstats import let

_MOD = 1_000_000
# oversample: rate tables past this size broadcast-join instead of
# compiling one CASE branch per key (plan size is O(keys) otherwise)
_RATE_JOIN_THRESHOLD = 64
# collision-resistant internal helper names for the rate-join path (a
# caller column named like these would silently vanish otherwise)
_RATE_WHOLE = "__dgs_oversample_whole"
_RATE_FTHR = "__dgs_oversample_fthr"


def _bucket(key: Column) -> Column:
    """Stable bucket in [0, 1e6) from the portable 60-bit hash (same
    value in DuckDB: ``pmod`` of the md5-prefix bigint over the key
    cast to its string form)."""
    return F.pmod(portable_hash(key.cast("string")), F.lit(_MOD))


def hash_sample(df: DataFrame, fraction: float,
                key_col: str = "doc_id") -> DataFrame:
    """Deterministic ~``fraction`` sample: keep rows whose hash bucket
    < fraction·1e6.  Pure narrow filter — no shuffle, no RNG state,
    identical result on every run and every retry."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return df.filter(_bucket(F.col(key_col)) < int(fraction * _MOD))


def stratified_hash_sample(df: DataFrame, fractions: dict,
                           strata_col: str,
                           key_col: str = "doc_id",
                           default: float = 0.0) -> DataFrame:
    """Per-stratum deterministic sampling: ``fractions`` maps stratum
    value → keep fraction; unlisted strata keep ``default``.  One CASE
    chain over the stratum column — still a single narrow filter."""
    thr = F.lit(int(default * _MOD))
    for val, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {val!r} must be in [0, 1]")
        thr = F.when(F.col(strata_col) == F.lit(val),
                     F.lit(int(frac * _MOD))).otherwise(thr)
    return df.filter(_bucket(F.col(key_col)) < thr)


def split_train_holdout(df: DataFrame, holdout_fraction: float = 0.01,
                        key_col: str = "doc_id",
                        split_col: str = "split") -> DataFrame:
    """Disjoint, exhaustive train/holdout tag: rows with hash bucket
    under the holdout fraction become 'holdout', the rest 'train'.
    Deterministic → the same document can never leak across the split
    on a re-run or a retried task."""
    if not 0.0 <= holdout_fraction <= 1.0:
        raise ValueError("holdout_fraction must be in [0, 1]")
    return df.withColumn(
        split_col,
        F.when(_bucket(F.col(key_col)) < int(holdout_fraction * _MOD),
               F.lit("holdout")).otherwise(F.lit("train")))


def split_by_cluster(df: DataFrame, edges: DataFrame,
                     holdout_fraction: float = 0.01,
                     id_col: str = "doc_id", split_col: str = "split",
                     src: str = "src", dst: str = "dst",
                     max_iter: int = 10) -> DataFrame:
    """LEAKAGE-SAFE train/holdout split: near-duplicate documents must
    land on the SAME side, or the holdout silently scores memorization
    — ``split_train_holdout`` buckets each doc independently, so a
    near-dup pair straddles the split with probability
    2·f·(1-f) per pair.  Here the split key is the document's
    near-dup CLUSTER representative: connected components over
    ``edges`` (any pair source — ``lsh_candidate_pairs``,
    ``embedding_neardup_pairs``, ``knn_graph``), each doc keyed by its
    component's min id (docs in no edge key by their own id, exactly
    matching ``split_train_holdout``), then the same deterministic
    hash bucketing on the representative.  Whole clusters move
    together by construction.

    Distributed shape: the CC runs over the edge list (edge-sized, not
    corpus-sized), and the corpus sees ONE left join against the
    node→component table plus a narrow hash filter.  CC
    non-convergence RAISES (not warns): a half-propagated component
    could still straddle the split, which is the one failure mode this
    operator exists to prevent — raise ``max_iter``.

    Already have a cluster id column?  Skip the edges and use
    ``split_train_holdout(df, f, key_col=<cluster_col>)`` directly."""
    if not 0.0 <= holdout_fraction <= 1.0:
        raise ValueError("holdout_fraction must be in [0, 1]")
    clash = {"__dgs_split_rep", "__dgs_split_key"} & set(df.columns)
    if clash:
        raise ValueError(
            f"split_by_cluster reserves internal column names "
            f"{sorted(clash)}; rename those columns first")
    from .dedup import connected_components

    comp = connected_components(edges, src=src, dst=dst,
                                max_iter=max_iter,
                                on_nonconverged="raise")
    rep = comp.select(F.col("node").alias(id_col),
                      F.col("component").alias("__dgs_split_rep"))
    out = (df.join(rep, on=id_col, how="left")
           .withColumn(
               "__dgs_split_key",
               F.coalesce(F.col("__dgs_split_rep"), F.col(id_col)))
           .withColumn(
               split_col,
               F.when(_bucket(F.col("__dgs_split_key"))
                      < int(holdout_fraction * _MOD),
                      F.lit("holdout")).otherwise(F.lit("train"))))
    return out.drop("__dgs_split_rep", "__dgs_split_key")


def weighted_sample(df: DataFrame, k: int, weight_col: str,
                    key_col: str = "doc_id", by: str | None = None,
                    seed: str = "") -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement — the
    Efraimidis & Spirakis 2006 A-ES scheme, RNG-free: every row gets
    the key ``ln(u) / w`` for a hash-derived uniform
    ``u = (bucket(seed‖key) + 0.5) / 1e6`` and the k LARGEST keys win
    (equivalent ordering to the published ``u^(1/w)``; higher weight →
    key closer to 0 → more likely sampled).  Pure function of
    (seed, key, weight): re-runs, retried tasks, and the DuckDB oracle
    all draw the same rows.  The key rounds to 9 decimals before
    ranking (ties then break on ``key_col``) so the rule survives
    libm ulp differences across engines.

    ``by=None`` takes the global top-k — Spark plans it as
    TakeOrderedAndProject (no full sort, no single-partition window);
    with ``by`` one rank window per group after a single hash shuffle.
    Rows with NULL or non-positive weight are excluded — they have
    zero sampling mass (the A-ES domain is w > 0).

    The classic use: quality-weighted data selection — sample a
    training subset proportional to a classifier score while keeping
    the choice reproducible end-to-end."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    clash = {"_es_key", "_es_rn"} & set(df.columns)
    if clash:
        raise ValueError(
            f"weighted_sample reserves internal column names "
            f"{sorted(clash)}; rename those columns first")
    u = (_bucket(F.concat(F.lit(seed), F.col(key_col).cast("string")))
         + F.lit(0.5)) / F.lit(float(_MOD))
    es = F.round(F.log(u) / F.col(weight_col).cast("double"), 9)
    cand = df.filter(F.col(weight_col) > 0).withColumn("_es_key", es)
    if by is None:
        out = (cand.orderBy(F.col("_es_key").desc(), F.col(key_col))
               .limit(k))
    else:
        w = Window.partitionBy(by).orderBy(F.col("_es_key").desc(),
                                           F.col(key_col))
        out = (cand.withColumn("_es_rn", F.row_number().over(w))
               .filter(F.col("_es_rn") <= k).drop("_es_rn"))
    return out.drop("_es_key")


def pack_documents(df: DataFrame, budget: int,
                   token_col: str = "n_tokens",
                   order_col: str = "doc_id",
                   by: str | None = None,
                   bin_col: str = "pack_bin") -> DataFrame:
    """Assign each document a fixed-budget pack bin:
    ``bin = floor(exclusive_running_sum(tokens) / budget)`` over the
    ``order_col`` ordering (within each ``by`` group when given).

    This is the distributable form of greedy sequence packing: bins
    fill in order and a document whose tokens straddle a boundary
    starts the next bin's count (documents are not split — the training
    loader truncates or pads per bin).  One window, no Python.

    ``by=None`` computes a GLOBAL pack — a single window partition that
    funnels through one task; use only for small frames (per-shard
    packing with ``by`` is the cluster-scale form).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    w = (Window.partitionBy(by) if by else Window.partitionBy()) \
        .orderBy(order_col) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    running_incl = F.sum(F.col(token_col)).over(w)
    exclusive = running_incl - F.col(token_col)
    return df.withColumn(
        bin_col, F.floor(exclusive / F.lit(budget)).cast("long"))


def pack_chunks(df: DataFrame, budget: int,
                token_col: str = "n_tokens",
                order_col: str = "doc_id",
                by: str | None = None,
                bin_col: str = "pack_bin") -> DataFrame:
    """Concat-then-chunk sequence packing — the GPT-2/3 pretraining
    shape `pack_documents` deliberately is NOT: documents concatenate
    in ``order_col`` order into one token stream (per ``by`` group),
    which is cut into exact ``budget``-token bins; a document
    straddling a boundary is SPLIT across bins, so every bin except
    the stream's last is exactly full (zero padding waste, the
    published trade-off against `pack_documents`' no-split form which
    never cuts a document but underfills bins).

    Emits one row per (document, bin) SPAN with the input columns
    plus ``bin_col``, ``tok_start``/``tok_end`` (doc-LOCAL token
    offsets of the span, end-exclusive — the loader slices
    ``tokens[tok_start:tok_end]``) and ``bin_offset`` (where the span
    begins inside its bin).  Rows with ``token_col <= 0`` contribute
    nothing to the stream and emit no span (they drop).

    Pure integer arithmetic over one running-sum window + one
    sequence explode (a doc of n tokens spans
    ``off div budget .. (off+n-1) div budget``; LONG ``div``, not a
    double-floor — exact past 2^53 stream offsets) — no Python,
    engine-portable exactly.  ``by=None`` packs globally through a
    single window partition (small frames only); per-shard ``by`` is
    the cluster-scale form, as in `pack_documents`."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    b = F.lit(int(budget))
    w = (Window.partitionBy(by) if by else Window.partitionBy()) \
        .orderBy(order_col) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    n = F.col(token_col)
    off = (F.sum(n).over(w) - n).alias("_off")
    spans = (df.filter(n > 0)
             .withColumn("_off", off)
             .withColumn(bin_col, F.explode(F.sequence(
                 F.expr(f"`_off` div {int(budget)}"),
                 F.expr(f"(`_off` + `{token_col}` - 1) "
                        f"div {int(budget)}"))))
             .withColumn("_gs", F.greatest(
                 F.col("_off"), F.col(bin_col) * b))
             .withColumn("_ge", F.least(
                 F.col("_off") + n, (F.col(bin_col) + 1) * b)))
    return (spans
            .withColumn("tok_start",
                        (F.col("_gs") - F.col("_off")).cast("long"))
            .withColumn("tok_end",
                        (F.col("_ge") - F.col("_off")).cast("long"))
            .withColumn("bin_offset",
                        (F.col("_gs") - F.col(bin_col) * b)
                        .cast("long"))
            .withColumn(bin_col, F.col(bin_col).cast("long"))
            .drop("_off", "_gs", "_ge"))


def pack_best_fit(df: DataFrame, budget: int,
                  token_col: str = "n_tokens",
                  order_col: str = "doc_id",
                  by: str | None = None,
                  bin_col: str = "pack_bin") -> DataFrame:
    """Best-fit-decreasing sequence packing (the "fewer truncations"
    recipe, Ding et al. 2024): documents sort by token count
    DESCENDING (ties on ``order_col`` ascending) and each takes the
    fullest bin it still fits — the classic BFD bound guarantees
    ≤ 11/9·OPT + 1 bins, so far less padding than `pack_documents`'
    in-order boundaries while never splitting a document (contrast
    `pack_chunks`, which splits for exactly-full bins).  A document
    LONGER than ``budget`` gets a bin of its own (the paper
    pre-splits long docs — compose with `chunk_documents` /
    `pack_chunks` first if that matters).  Returns the input plus
    ``bin_col`` (per-group ids from 0, in bin-opening order).

    BFD's bin state is inherently sequential, so this is one of the
    package's few sanctioned ``applyInPandas`` operators (the
    format-parse convention): each ``by`` group packs independently
    in one task — exactly the paper's own sharding — with state =
    one heap over that group's bins and the group's (tokens, order)
    pairs in memory.  ``by=None`` packs globally in a single task;
    use per-shard ``by`` at cluster scale, as in `pack_documents`.
    Deterministic for unique ``order_col`` values: no RNG, identical
    on every run and every partitioning."""
    import pandas as pd

    if budget <= 0:
        raise ValueError("budget must be positive")
    b = int(budget)
    # a FRESH StructType — StructType.add mutates in place, and a
    # mutated df.schema makes applyInPandas resolve a phantom column
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(bin_col, T.LongType())])
    cols = [f.name for f in df.schema.fields if f.name != bin_col]

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        # deterministic spec (the brute pytest replica states it the
        # naive way): docs by (tokens DESC, order ASC); each doc
        # takes the bin with the SMALLEST sufficient remaining
        # capacity, ties on remaining broken by LOWEST bin id; no
        # fit -> open bin len(bins).  Structure: per-capacity min-
        # heaps of bin ids + a Fenwick tree over the capacity
        # classes for O(log b) first-nonempty-class >= need.
        import heapq

        order = sorted(range(len(pdf)),
                       key=lambda i: (-int(pdf[token_col].iat[i]),
                                      pdf[order_col].iat[i]))
        by_rem = [[] for _ in range(b + 1)]   # rem -> min-heap ids
        fen = [0] * (b + 2)                   # Fenwick over rem

        def _add(r, d):
            r += 1
            while r <= b + 1:
                fen[r] += d
                r += r & (-r)

        def _prefix(r):
            r += 1
            s = 0
            while r > 0:
                s += fen[r]
                r -= r & (-r)
            return s

        def _first_at_least(need):
            # smallest rem in [need, b] with a live bin, else None
            below = _prefix(need - 1)
            if _prefix(b) == below:
                return None
            lo, hi = need, b
            while lo < hi:                    # first prefix > below
                mid = (lo + hi) // 2
                if _prefix(mid) > below:
                    hi = mid
                else:
                    lo = mid + 1
            return lo

        bins = []
        assign = [0] * len(pdf)
        for i in order:
            need = int(pdf[token_col].iat[i])
            if need >= b:
                bins.append(max(0, b - need))
                assign[i] = len(bins) - 1
                continue
            r = _first_at_least(need)
            if r is None:
                bins.append(b)
                chosen = len(bins) - 1
            else:
                chosen = heapq.heappop(by_rem[r])
                _add(r, -1)
                bins[chosen] = r
            bins[chosen] -= need
            heapq.heappush(by_rem[bins[chosen]], chosen)
            _add(bins[chosen], 1)
            assign[i] = chosen
        res = pdf[cols].copy()
        res[bin_col] = pd.array(assign, dtype="int64")
        return res

    grouped = df.groupBy(by) if by else df.groupBy()
    return grouped.applyInPandas(_pack, schema=out_schema)


def cap_per_group(df: DataFrame, group_col: str = "source",
                  cap: int = 100, order_col: str = "doc_id") -> DataFrame:
    """Per-group quota (the C4/RefinedWeb-style per-domain cap): keep
    at most ``cap`` rows per ``group_col`` value, preferring smaller
    ``order_col`` (deterministic for unique ``order_col`` values — no
    RNG, identical on every run; ties on ``order_col`` keep an
    arbitrary-but-cap-bounded subset, as any per-key top-k must).

    Distributed shape — three stages, none of which ever funnels a hot
    group through one task:

    1. **Quota scan**: one hash aggregation finds the over-cap groups
       (at web scale a tiny minority of domains holds most rows).
       Rows of under-cap groups BYPASS everything downstream via a
       left-anti join against that list; the over-cap list is tiny, so
       the anti/semi joins plan as BROADCAST joins whenever the scan
       has size statistics (plan-pinned on parquet input), and AQE's
       runtime conversion covers statistics-free sources.  NULL group
       keys participate via null-safe (``<=>``) join keys, so a group
       whose key is NULL more than ``cap`` times is capped exactly
       like any other (matching the row_number-window oracle).
    2. **Partition-local pre-trim**: each *input partition* of the
       over-cap subset is trimmed to its ``cap`` smallest
       ``order_col`` rows per group, by a window keyed on
       ``(spark_partition_id, group)``.  The partition id spreads the
       hottest group across as many reducers as the input has
       partitions, so no window partition ever exceeds one input
       partition's rows — the Zipf-head domain at several percent of
       a 100 TB corpus sorts as P bounded slices, not one task.
       Lossless: a row outside its own partition's cap-smallest has
       ``>= cap`` same-partition same-group rows ahead of it, so it
       cannot be in the global cap-smallest either.
    3. **Global trim**: the existing per-group sort window, now over
       ``<= cap * num_partitions`` rows per group instead of the
       group's full row set — bounded regardless of skew."""
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    over = (df.groupBy(group_col).agg(F.count("*").alias("_n"))
            .filter(F.col("_n") > int(cap))
            .select(F.col(group_col).alias("_over_g")))
    quota_key = F.col(group_col).eqNullSafe(F.col("_over_g"))
    keep_small = df.join(over, on=quota_key, how="left_anti")
    hot = (df.join(over, on=quota_key, how="left_semi")
           .withColumn("_pid", F.spark_partition_id()))
    pre_w = Window.partitionBy("_pid", group_col).orderBy(F.asc(order_col))
    trimmed = (hot.withColumn("_prn", F.row_number().over(pre_w))
               .filter(F.col("_prn") <= int(cap)).drop("_prn", "_pid"))
    w = Window.partitionBy(group_col).orderBy(F.asc(order_col))
    capped = (trimmed.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") <= int(cap)).drop("_rn"))
    return keep_small.unionByName(capped)


def chunk_documents(df: DataFrame, max_tokens: int = 128,
                    overlap: int = 0, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Split documents into overlapping token-window CHUNKS — the
    retrieval/embedding prep stage (fixed-window chunking with stride
    ``max_tokens - overlap``, the standard RAG/dense-retrieval recipe):
    one output row per chunk with the source id, a 0-based
    ``chunk_id``, the 1-based ``chunk_start`` token offset, the chunk's
    token count, and ``text_col`` rewritten to the chunk's tokens
    joined by single spaces (whitespace-normalized; tokens keep their
    original case and punctuation — this splits on whitespace, not the
    dedup family's lowercasing tokenizer).

    Window starts step by the stride; a would-be final window that
    adds no NEW tokens (its fresh tail lies entirely inside the
    previous window's overlap) is dropped, so every token appears in
    at least one and at most ⌈max_tokens/stride⌉ chunks and no chunk
    is a suffix-duplicate of its predecessor.  Every other input
    column is preserved (the line_dedup convention).

    All native: one ``sequence``/``filter`` comprehension builds the
    start list per row, ``posexplode`` fans out — chunking 100 TB is
    one scan with no shuffle at all (the explode multiplies rows
    map-side); downstream embedding UDFs see rows already sized to the
    model's context."""
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    if not 0 <= overlap < max_tokens:
        raise ValueError(
            f"overlap must be in [0, max_tokens), got {overlap}")
    stride = max_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    starts = let(
        F.size(toks),
        lambda n: F.filter(
            F.sequence(F.lit(1), F.greatest(n, F.lit(1)),
                       F.lit(stride)),
            lambda s: (s == 1) | (s <= n - overlap)))
    out_cols = [F.col(c) for c in df.columns if c != text_col]
    return (df.withColumn("_toks", toks)
            .select("*", F.posexplode(starts).alias("chunk_id", "_s"))
            .select(
                *out_cols,
                F.col("chunk_id").cast("long"),
                F.col("_s").cast("long").alias("chunk_start"),
                F.slice(F.col("_toks"), F.col("_s"),
                        F.lit(max_tokens)).alias("_chunk"))
            .select(
                *out_cols, "chunk_id", "chunk_start",
                F.size("_chunk").cast("long").alias("n_chunk_tokens"),
                F.array_join("_chunk", " ").alias(text_col)))


def oversample(df: DataFrame, rates: dict, group_col: str = "source",
               key_col: str = "doc_id", default: float = 1.0,
               copy_col: str = "copy_id") -> DataFrame:
    """Source MIXING with rates above (and below) 1 — the
    epochs-per-source stage of published pretraining mixes (the Pile /
    Llama / Dolma re-weight high-quality sources by repeating them):
    each row is emitted ``floor(rate)`` times plus one more for the
    deterministic ``frac(rate)`` hash-slice of its keys, so a source
    at rate 2.5 contributes every row twice and half its rows a third
    time — expected multiplicity exactly ``rate``, no RNG, identical
    on every run and retry (the same md5-bucket mechanics as
    `hash_sample`; rate ≤ 1 degrades to `stratified_hash_sample`
    semantics with copy_id 0).

    Appends ``copy_col`` (0-based repeat index) so downstream
    shuffling/packing can salt repeated documents apart instead of
    training on adjacent duplicates.  Rows with multiplicity 0 vanish
    in the explode (an empty sequence emits nothing); no shuffle of
    the corpus, no UDF, either way the rates ride in.

    Plan shape scales with the rate table: a handful of sources
    compiles to one CASE chain (pure codegen, zero joins); past
    ``_RATE_JOIN_THRESHOLD`` entries — per-DOMAIN rate tables run to
    hundreds of thousands of keys, where a CASE per key would explode
    the plan — the rates become a broadcast-joined lookup table
    instead (one hash lookup per row, same multiplicities)."""
    if default < 0:
        raise ValueError(f"default must be >= 0, got {default}")
    for val, rate in rates.items():
        if rate < 0:
            raise ValueError(f"rate for {val!r} must be >= 0, got {rate}")

    def _ncopies(whole_col, frac_thr_col):
        return whole_col.cast("int") + (
            _bucket(F.col(key_col)) < frac_thr_col).cast("int")

    if len(rates) <= _RATE_JOIN_THRESHOLD:
        ncopies = _ncopies(
            F.lit(int(default)),
            F.lit(int(round((default - int(default)) * _MOD))))
        for val, rate in rates.items():
            whole, frac = int(rate), rate - int(rate)
            ncopies = F.when(
                F.col(group_col) == F.lit(val),
                _ncopies(F.lit(whole),
                         F.lit(int(round(frac * _MOD))))
            ).otherwise(ncopies)
        joined = df
    else:
        spark = df.sparkSession
        # key type inferred from the rate dict so numeric group
        # columns join without an implicit cast
        clash = {_RATE_WHOLE, _RATE_FTHR} & set(df.columns)
        if clash:
            raise ValueError(
                f"oversample reserves internal column names {sorted(clash)}"
                " on the rate-join path; rename those columns first")
        rt = spark.createDataFrame(
            [(k, int(v), int(round((v - int(v)) * _MOD)))
             for k, v in rates.items()],
            [group_col, _RATE_WHOLE, _RATE_FTHR])
        rt = rt.withColumn(_RATE_WHOLE, F.col(_RATE_WHOLE).cast("int")) \
            .withColumn(_RATE_FTHR, F.col(_RATE_FTHR).cast("int"))
        joined = df.join(F.broadcast(rt), on=group_col, how="left")
        ncopies = _ncopies(
            F.coalesce(F.col(_RATE_WHOLE), F.lit(int(default))),
            F.coalesce(F.col(_RATE_FTHR),
                       F.lit(int(round((default - int(default))
                                       * _MOD)))))
    seq = F.when(ncopies > 0,
                 F.sequence(F.lit(0), ncopies - 1)) \
        .otherwise(F.array().cast("array<int>"))
    return (joined.select("*", F.explode(seq).alias(copy_col))
            .drop(_RATE_WHOLE, _RATE_FTHR)
            .withColumn(copy_col, F.col(copy_col).cast("long")))


def temperature_mix(df: DataFrame, alpha: float = 0.3,
                    group_col: str = "source", key_col: str = "doc_id",
                    copy_col: str = "copy_id",
                    round_rates: int | None = 6) -> DataFrame:
    """Temperature-flattened group mixing — the multilingual-
    pretraining recipe (mT5, Xue et al. 2021; also the
    low-resource-language upsampling of XLM-R and the Pile's source
    balancing): re-weight each group so it is sampled with probability
    proportional to ``p_s ** alpha`` instead of its natural share
    ``p_s``.  ``alpha=1`` is a no-op, ``alpha=0`` equalizes groups,
    the published sweet spots sit around 0.2-0.7 (mT5 ships 0.3).

    Realized as deterministic `oversample` rates
    ``r_s = p_s**(alpha-1) / Z`` with ``Z = sum_t p_t**alpha``, which
    preserves the EXPECTED corpus size (``sum n_s * r_s = N``) while
    shifting its composition to the flattened distribution — no RNG,
    md5-slice multiplicities, identical on every run and retry, and
    the ``copy_col`` replica counter feeds `write_training_shards`'
    automatic copy fold exactly like a hand-written rate table.

    Group sizes come from ONE count aggregation collected driver-side
    — bounded by GROUP cardinality (languages / sources / domains:
    dozens to thousands of rows), never corpus rows; for
    domain-grained tables past `oversample`'s literal threshold the
    rates ride in as a broadcast join automatically.  Rows with a
    NULL group stay outside the model and pass through at rate 1
    (a NULL rate entry could never match `oversample`'s equality
    CASE and would silently drop them).  Rates round to
    ``round_rates`` decimals (default 6 — exactly `oversample`'s
    md5-bucket granularity) so the derivation is replicable across
    engines; groups are folded into ``Z`` in sorted order for the
    same reason."""
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    # NULL groups stay OUTSIDE the temperature model: oversample's
    # rate CASE matches by equality, which a NULL never satisfies, so
    # a NULL rate entry would silently DROP those rows and its count
    # would distort every other group's share — instead NULL-group
    # rows pass through at rate 1 (the default below) and the
    # flattening applies to the named groups only
    counts = {r[0]: r[1] for r in
              df.groupBy(group_col).count().collect()
              if r[0] is not None}
    n = sum(counts.values())
    if n == 0:
        return oversample(df, {}, group_col=group_col,
                          key_col=key_col, copy_col=copy_col)
    ordered = sorted(counts.items(), key=lambda kv: str(kv[0]))
    ps = [(s, c / n) for s, c in ordered]
    z = 0.0
    for _, p in ps:
        z += p ** alpha
    rates = {s: (p ** alpha / z) / p for s, p in ps}
    if round_rates is not None:
        rates = {s: round(r, round_rates) for s, r in rates.items()}
    return oversample(df, rates, group_col=group_col, key_col=key_col,
                      default=1.0, copy_col=copy_col)


def shard_assignment(key: Column, n_shards: int, seed: str = "") -> Column:
    """Deterministic shard id in [0, n_shards): the 60-bit md5 hash of
    ``seed || key`` mod the shard count — no RNG state, identical on
    every run/retry, uniform across shards."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    return F.pmod(
        portable_hash(F.concat(F.lit(str(seed)), key.cast("string"))),
        F.lit(int(n_shards))).cast("int")


def shard_key(df: DataFrame, key_col, copy_col: str | None = "copy_id"
              ) -> Column:
    """The string key `write_training_shards` hashes: the named key
    column(s) joined with the 0x1f unit separator, with ``copy_col``
    (an `oversample` replica counter) folded in automatically when the
    frame carries it — so the two copies of an oversampled document
    hash to DIFFERENT shards and shuffle positions instead of landing
    adjacent in the training stream.  Pass ``copy_col=None`` to opt
    out.  A single key column passes through unchanged (concat_ws of
    one value is the value itself), so single-key hashes are stable
    across versions."""
    cols = [key_col] if isinstance(key_col, str) else list(key_col)
    if not cols:
        raise ValueError("key_col must name at least one column")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"key columns {missing} not in DataFrame "
                         f"columns {df.columns}")
    if copy_col and copy_col in df.columns and copy_col not in cols:
        cols = cols + [copy_col]
    return F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols])


def write_training_shards(df: DataFrame, path: str, n_shards: int = 64,
                          key_col="doc_id", seed: str = "",
                          shard_col: str = "shard",
                          order_col: str = "shuffle_key",
                          copy_col: str | None = "copy_id") -> None:
    """Materialize the final training mix as hive-partitioned shards
    with a DETERMINISTIC global shuffle — the last stage of a data
    pipeline (loaders consume shard directories in parallel and read
    examples in ``order_col`` order):

    - ``shard`` = md5(seed || key) mod n_shards (`shard_assignment`) —
      reproducible placement, no RNG, uniform occupancy;
    - ``shuffle_key`` = md5(seed || key) hex — ordering by it inside a
      shard is a seeded permutation decorrelated from ingest order
      (adjacent source documents land apart), and it rides as a
      COLUMN so the order survives any file split/merge: loaders sort
      their shard by it (or trust per-file order, which the
      sorted-before-write parquet preserves).

    ``key_col`` accepts a list of columns (joined with the 0x1f unit
    separator before hashing), and when the frame carries an
    `oversample` ``copy_col`` it folds into the key AUTOMATICALLY —
    otherwise every copy of an oversampled document would share one
    md5 and land in the same shard at the same sort position, exactly
    the adjacency ``copy_id`` exists to prevent (see `shard_key`).

    One repartition on the shard id + an intra-partition sort — the
    only shuffle moves each row once; no global sort, no window."""
    key = shard_key(df, key_col, copy_col)
    out = (df.withColumn(shard_col,
                         shard_assignment(key, n_shards, seed))
           .withColumn(order_col,
                       F.md5(F.concat(F.lit(str(seed)),
                                      key.cast("string")))))
    (out.repartition(F.col(shard_col))
        .sortWithinPartitions(shard_col, order_col)
        .write.mode("overwrite").partitionBy(shard_col).parquet(path))
