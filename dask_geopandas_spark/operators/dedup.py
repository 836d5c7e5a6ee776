"""Deduplication operators for LLM training-data pipelines: exact,
MinHash+LSH, SimHash, n-gram Jaccard (BASELINE.json north star).

Design for 100 TB:
- exact dedup = hash groupBy (one shuffle on a 16-byte key, map-side
  partial aggregation, no Python);
- MinHash signatures & LSH banding are pure native SQL expressions
  (higher-order functions over token arrays + md5 → JVM codegen, no UDF);
  the candidate-pair join is an equi-join on (band_index, band_hash) —
  shuffle-partitionable and skew-safe, never a cross join;
- all hashes use the portable ``bigint(substr(md5(x),1,15))`` trick so the
  DuckDB oracle reproduces values bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from ..barrier import plan_barrier

from .textstats import let, tokens


def portable_hash(col: Column) -> Column:
    """60-bit deterministic hash identical in Spark and DuckDB:
    first 15 hex chars of md5, as bigint."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def seeded_bucket(col: Column, seed: int, modulus: int) -> Column:
    """``portable_hash(concat(seed, ':', value)) mod modulus`` — the
    shared seeded-bucket construction (Bloom positions, Count-Min
    rows): the seed prefix makes each hash independently uniform
    while staying replicable as the same concat+md5 in SQL."""
    return F.pmod(
        portable_hash(F.concat(F.lit(f"{int(seed)}:"),
                               col.cast("string"))),
        F.lit(int(modulus))).cast("long")


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row per distinct text: the minimum id (deterministic
    keeper).  Returns (hash, keeper_id, dup_count)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("keeper_id"), F.count("*").alias("dup_count"))
    )


def shingles_of_tokens(toks: Column, k: int = 3) -> Column:
    """Word k-shingles from a token-array column (native higher-order fns)."""
    n = F.size(toks)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(k)]),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))


def shingles(text: Column, k: int = 3) -> Column:
    """Word k-shingles as an array of strings.

    NOTE for pipelines: Catalyst's projection collapse inlines ``text``'s
    tokenization into every element access, turning this O(n) expression
    O(n^2) when composed further.  Compose via ``let`` (see
    `hashed_shingles`) to keep it one tokenizer pass."""
    return let(tokens(text), lambda t: shingles_of_tokens(t, k))


def _seed_const(s: int) -> int:
    """Fixed 60-bit per-seed constant (md5 of 'seed<s>'), reproducible in
    the DuckDB oracle."""
    import hashlib

    return int(hashlib.md5(f"seed{s}".encode()).hexdigest()[:15], 16)


# let-binding helper shared with textstats (single definition there);
# re-exported here because the dedup pipelines are its heaviest users
# (one regex + one md5 pass per row instead of one per reference --
# measured ~50x at sf0.01)


def hashed_shingles(text: Column, k: int = 3) -> Column:
    """array<long> of portable k-shingle hashes, as ONE streaming
    expression: the token array is let-bound so the regex tokenizer runs
    once per row, not once per element access."""
    return let(
        tokens(text),
        lambda t: F.transform(shingles_of_tokens(t, k),
                              lambda s: portable_hash(s)),
    )


def hashed_shingle_table(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """(id, _shh: array<long>) — portable hash of each k-shingle.

    Pure streaming projection (no persist barrier needed): `let`
    bindings stop CollapseProject from inlining the tokenizer into
    every element access, so tokenization and the md5-per-shingle pass
    each run exactly once per row."""
    return df.select(
        F.col(id_col), hashed_shingles(F.col(text_col), k).alias("_shh"))


def minhash_signature_struct(text: Column, num_hashes: int = 8,
                             k: int = 3) -> Column:
    """struct<mh0..mhN> MinHash signature as one streaming expression:
    tokens and shingle hashes are each let-bound (computed once), seed
    variants derived by XOR with fixed constants — one regex pass + one
    md5 pass per row total, no staging/persist at any scale."""
    return let(
        hashed_shingles(text, k),
        lambda shh: F.struct(*[
            F.array_min(
                F.transform(shh, lambda h: h.bitwiseXOR(F.lit(_seed_const(s))))
            ).alias(f"mh{s}")
            for s in range(num_hashes)
        ]),
    )


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", num_hashes: int = 8,
                       k: int = 3) -> DataFrame:
    """MinHash signature columns (id, mh0..mhN).  The signature struct is
    routed through ``explode(array(...))``: the Generate node evaluates
    it once per row, and the field-expansion projection above it cannot
    be collapsed into 8 copies of the expression tree."""
    sig = minhash_signature_struct(F.col(text_col), num_hashes, k)
    return (
        df.select(F.col(id_col), F.explode(F.array(sig)).alias("_sig"))
        .select(F.col(id_col), F.col("_sig.*"))
    )


_AUTO_MEMORY_CONF = "spark.dask_geopandas.lsh.autoMemoryBytes"
_AUTO_MEMORY_DEFAULT = 1 << 30  # 1 GiB of input files

# Handles persisted by materialize='memory'/'auto' staging.  The caller of
# lsh_candidate_pairs/lsh_dedup/ngram_jaccard_pairs only ever sees the
# derived frame, so without a registry the cached signature tables would
# live until spark.catalog.clearCache(); release_cached_signatures() frees
# them once the consuming actions are done.
_PERSISTED_STAGES: list = []


def _stage_persist(df: DataFrame) -> DataFrame:
    df = df.persist()
    _PERSISTED_STAGES.append(df)
    return df


def release_cached_signatures() -> int:
    """Unpersist every signature/shingle table cached by the dedup
    operators' ``materialize='memory'`` (or size-triggered ``'auto'``)
    staging in this session, returning how many were released.  Call
    after the consuming actions complete; derived frames stay valid and
    simply recompute if re-executed."""
    n = 0
    while _PERSISTED_STAGES:
        try:
            _PERSISTED_STAGES.pop().unpersist()
            n += 1
        except Exception:
            pass
    return n


def _auto_materialize(df: DataFrame) -> str:
    """Size-aware staging pick for ``materialize="auto"``: persist in
    memory only when the frame's scan inputs are provably small (public
    ``inputFiles`` metadata, same signal as the sjoin broadcast guess);
    anything unmeasurable or large recomputes — the scale-safe side of
    every ambiguity.  Threshold conf: ``{_AUTO_MEMORY_CONF}``."""
    from .sjoin import _input_file_bytes

    size = _input_file_bytes(df)
    if size is None:
        return "none"
    try:
        thr = int(df.sparkSession.conf.get(
            _AUTO_MEMORY_CONF, str(_AUTO_MEMORY_DEFAULT)))
    except Exception:
        thr = _AUTO_MEMORY_DEFAULT
    return "memory" if size <= thr else "none"


def _banded(df: DataFrame, text_col: str, id_col: str, num_hashes: int,
            bands: int, k: int, materialize: str = "auto") -> DataFrame:
    """(id, bk=struct<band,bh>) — one row per doc per LSH band.

    The signature table is consumed twice by every caller (both sides
    of the band self-join), so ``materialize`` picks the re-use
    strategy: ``"auto"`` (default) persists in memory only when the
    input's file metadata proves it small (< 1 GiB by default,
    ``spark.dask_geopandas.lsh.autoMemoryBytes``) and otherwise
    recomputes — unmeasurable inputs count as large, so the default
    never plants an unbounded cache barrier at 100 TB; ``"none"``
    always recomputes the single-pass native expressions per consumer
    (zero cache, one extra scan); ``"memory"`` always persists (handles
    are tracked — call :func:`release_cached_signatures` after the
    consuming actions to free them, otherwise the cached tables live
    for the session); any other string is a directory path the
    signatures are checkpointed to as parquet and re-read from (bounded
    memory AND single computation — the right choice at 100 TB when a
    scratch location exists)."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    if materialize == "auto":
        materialize = _auto_materialize(df)
    sig = minhash_signatures(df, text_col, id_col, num_hashes, k)
    if materialize == "memory":
        sig = _stage_persist(sig)
    elif materialize not in (None, "none"):
        sig.write.mode("overwrite").parquet(materialize)
        sig = sig.sparkSession.read.parquet(materialize)
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh{i}").cast("string")
                 for i in range(b * rows_per_band, (b + 1) * rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"),
                     F.md5(F.concat_ws("|", *parts)).alias("bh"))
        )
    return sig.select(F.col(id_col), F.explode(F.array(*band_cols)).alias("bk"))


def lsh_candidate_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", num_hashes: int = 8,
                        bands: int = 4, k: int = 3,
                        materialize: str = "auto") -> DataFrame:
    """LSH banding: docs sharing any band of the MinHash signature become
    candidate near-dup pairs.  Output: (id_a, id_b) with id_a < id_b.

    Plan shape at scale: signatures (narrow) → explode to (band_key, id)
    → self equi-join on band_key → distinct pairs.  The join is a plain
    shuffled hash join on a high-cardinality key; AQE skew-join splits
    moderately hot buckets.  NOTE the pair list is inherently quadratic
    in bucket size — when the goal is dedup rather than candidate
    scoring, use ``lsh_dedup`` (linear) instead.  ``materialize``: see
    `_banded` (memory / none / parquet-checkpoint path)."""
    banded = _banded(df, text_col, id_col, num_hashes, bands, k, materialize)
    a = banded.select(F.col(id_col).alias("id_a"), F.col("bk"))
    b_ = banded.select(F.col(id_col).alias("id_b"), F.col("bk"))
    return (
        a.join(b_, on="bk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def lsh_dedup(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id", num_hashes: int = 8,
              bands: int = 4, k: int = 3, max_iter: int = 1,
              materialize: str = "auto") -> DataFrame:
    """Linear-cost LSH dedup: (doc_id, rep_id) where rep_id is the min
    doc id over every band bucket the doc belongs to; keep rows with
    rep_id == doc_id to dedup.  This is the 100 TB-safe form: a bucket
    of n near-identical docs costs n rows through two hash aggregations
    (bucket min, then per-doc min) instead of the n² candidate pairs
    ``lsh_candidate_pairs`` would emit — both aggregations are
    partial+final, so hot buckets combine map-side.

    ``max_iter=1`` (default) is one propagation step: chained near-dup
    clusters (A~B~C with A,C not sharing a band) may keep two
    representatives — the standard single-pass tradeoff.

    ``max_iter>1`` iterates bucket-min label propagation to a fixpoint
    (min-label connected components over the doc↔bucket bipartite
    graph), collapsing chains to one representative.  Each iteration is
    the same two partial+final aggregations over the (persisted) banded
    table; labels shrink monotonically, convergence needs at most the
    cluster-graph diameter (near-dup clusters are band-wise cliques, so
    a handful of iterations covers real chains), and an early-stop
    check (one cheap any-row-changed job per iteration) exits as soon
    as an iteration changes nothing.

    ``materialize``: signature re-use strategy, see `_banded`
    (memory / none / parquet-checkpoint path)."""
    banded = _banded(df, text_col, id_col, num_hashes, bands, k, materialize)
    bucket_min = banded.groupBy("bk").agg(F.min(id_col).alias("_bmin"))
    cur = (
        banded.join(bucket_min, on="bk")
        .groupBy(id_col)
        .agg(F.min("_bmin").alias("rep_id"))
    )
    for _ in range(max_iter - 1):
        cur = cur.persist()
        bmin = (banded.join(cur, on=id_col)
                .groupBy("bk").agg(F.min("rep_id").alias("_bmin")))
        nxt = (banded.join(bmin, on="bk")
               .groupBy(id_col).agg(F.min("_bmin").alias("rep_id")).persist())
        converged = (
            nxt.withColumnRenamed("rep_id", "_new")
            .join(cur, on=id_col)
            .filter(F.col("_new") != F.col("rep_id"))
            .limit(1).count() == 0
        )
        cur.unpersist()
        cur = nxt
        if converged:
            break
    if max_iter > 1:
        # The convergence check above already materialized the final
        # iterate; release the cache before handing it back so repeated
        # calls don't accumulate persisted RDDs in executor memory.  The
        # caller's consumption recomputes two hash aggregations — the
        # bounded-memory tradeoff.
        cur.unpersist()
    return cur


def ngram_jaccard_pairs(df: DataFrame, pairs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 3,
                        threshold: float = 0.0,
                        materialize: str = "auto") -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs: broadcast-join
    shingle sets onto the (small) candidate pair list.  ``materialize``
    stages the shingle-set table, probed twice (id_a and id_b sides):
    auto / memory / none / parquet-checkpoint path, as in `_banded`."""
    if materialize == "auto":
        materialize = _auto_materialize(df)
    sh = df.select(
        F.col(id_col),
        F.array_distinct(
            let(tokens(F.col(text_col)),
                lambda t: shingles_of_tokens(t, k))).alias("sh"),
    )
    if materialize == "memory":
        sh = _stage_persist(sh)
    elif materialize not in (None, "none"):
        sh.write.mode("overwrite").parquet(materialize)
        sh = sh.sparkSession.read.parquet(materialize)
    out = (
        pairs.join(sh.withColumnRenamed("sh", "sh_a"),
                   pairs.id_a == F.col(id_col)).drop(id_col)
        .join(sh.withColumnRenamed("sh", "sh_b"),
              F.col("id_b") == F.col(id_col)).drop(id_col)
        .select(
            "id_a", "id_b",
            (F.size(F.array_intersect("sh_a", "sh_b"))
             / F.size(F.array_union("sh_a", "sh_b"))).alias("jaccard"),
        )
    )
    if threshold > 0:
        out = out.filter(F.col("jaccard") >= threshold)
    return out


def simhash(text: Column, bits: int = 32, k: int = 1) -> Column:
    """SimHash: per-token portable hashes vote per bit; the sign vector is
    packed into a ``bits``-wide integer.  Pure SQL: the hashed token
    array is let-bound so tokenization + md5 run once per row (not once
    per bit); each bit's vote is then a cheap aggregate over the bound
    array of longs."""

    def _pack(hashed: Column) -> Column:
        parts = []
        for b in range(bits):
            votes = F.aggregate(
                hashed,
                F.lit(0).cast("long"),
                lambda acc, h: acc
                + F.when(h.bitwiseAND(F.lit(1 << b)) != 0, 1).otherwise(-1),
            )
            parts.append(F.when(votes > 0, F.lit(1 << b)).otherwise(0).cast("long"))
        out = parts[0]
        for p in parts[1:]:
            out = out + p
        return out

    return let(
        F.transform(F.array_distinct(tokens(text)), lambda t: portable_hash(t)),
        _pack,
    )


def signlsh_planes(dim: int, n_bits: int = 32, nnz: int = 8,
                   seed: int = 42) -> list:
    """Seeded sparse random hyperplanes for sign-LSH: ``n_bits`` planes,
    each a list of ``(zero_based_index, ±1.0)`` pairs (Achlioptas-style
    sparse projection).  Deterministic for a given (dim, n_bits, nnz,
    seed), so the DuckDB oracle can embed the identical planes."""
    import numpy as np

    rng = np.random.RandomState(seed)
    planes = []
    for _ in range(n_bits):
        nz = min(nnz, dim)
        idx = np.sort(rng.choice(dim, size=nz, replace=False))
        signs = rng.choice([1.0, -1.0], size=nz)
        planes.append([(int(i), float(s)) for i, s in zip(idx, signs)])
    return planes


def signlsh_bit_sql(plane: list, elem) -> str:
    """SQL text for one sign bit ('1'/'0').  ``elem(i)`` renders 1-based
    element access for the target dialect (Spark ``element_at(v, i)``,
    DuckDB ``v[i]``).  Terms are added strictly left-to-right from a
    0.0 accumulator so Spark and DuckDB produce bit-identical IEEE
    sums — the sign decision is exact, not tolerance-based."""
    expr = "0.0"
    for i, s in plane:
        op = "+" if s > 0 else "-"
        expr += f" {op} CAST({elem(i + 1)} AS DOUBLE)"
    return f"CASE WHEN ({expr}) >= 0.0 THEN '1' ELSE '0' END"


def embedding_neardup_pairs(df: DataFrame, id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            threshold: float = 0.95, n_bits: int = 32,
                            bands: int = 4, nnz: int = 8, seed: int = 42,
                            dim: int | None = None) -> DataFrame:
    """Embedding cosine near-dup via seeded sparse random-hyperplane
    sign-LSH with banded OR-amplification (the MinHash-LSH shape applied
    to vectors).  Returns (id_a, id_b, cos) with id_a < id_b and
    cos >= threshold.

    100 TB plan shape — no stage materializes a whole bucket's VECTORS:
    signature bits are native SQL expressions (sparse ±1 dot products,
    no UDF, no Python); each vector explodes to one row per band; the
    candidate set comes from ONE shuffle — group ids (ids only, 8
    bytes/row) per (band, band_signature) bucket and emit the i<j pairs
    with a nested-transform explode.  This computes the 32-expression
    signature projection once (a self-join would run it on both sides)
    and keeps the quadratic object the candidate PAIR LIST, same as any
    LSH (callers wanting the linear alternative: `lsh_dedup`).  Exact
    cosine runs per candidate pair after ONE vector rejoin: the pair
    list unpivots to (pair, id) rows, joins the vector table once, and
    regroups — shuffling |V| + 2|pairs| vectors instead of 2|V|.

    Recall: vectors at cosine c agree on one random-hyperplane bit with
    probability ≈ 1 - arccos(c)/π; a pair is a candidate if it matches
    *all* bits of *any* band.  Misses are the standard LSH tradeoff —
    more/narrower bands raise recall, fewer/wider bands cut cost.

    Narrow-vs-fused tradeoff: carrying vectors through the band shuffle
    would shuffle bands×|vec| bytes per row (~4500 B/vec for 64-dim×4
    bands) and re-materialize whole buckets of vectors; this plan's
    band shuffle is ~50 B/row of ids and the single rejoin moves each
    vector once.  At cluster scale shuffle volume dominates stage
    latency, so narrow wins; at toy scale the id-only bucket groupBy
    also beats the former self-join by one exchange and one projection
    pass.

    ``dim`` avoids a schema-probe job when known; planes are
    deterministic from (dim, n_bits, nnz, seed) so an oracle can
    replicate bucketing bit-for-bit via `signlsh_bit_sql`.

    Reference contract: near-duplicate pair detection over embedding
    columns (no direct reference analog; BASELINE.json north-star op)."""
    assert n_bits % bands == 0, "n_bits must divide evenly into bands"
    if dim is None:
        dim = df.select(F.size(F.col(vec_col))).first()[0]

    planes = signlsh_planes(dim, n_bits, nnz, seed)
    bit_exprs = [
        F.expr(signlsh_bit_sql(p, lambda i: f"element_at({vec_col}, {i})"))
        for p in planes
    ]
    width = n_bits // bands
    band_keys = [
        F.struct(F.lit(b).alias("band"),
                 F.concat(*bit_exprs[b * width:(b + 1) * width]).alias("bsig"))
        for b in range(bands)
    ]
    banded = df.select(F.col(id_col),
                       F.explode(F.array(*band_keys)).alias("bk"))
    # one shuffle: ids-only buckets, then i<j pairs from a sorted array
    # (nested slice/transform — pure native, no join)
    buckets = (
        banded.groupBy("bk")
        .agg(F.sort_array(F.collect_list(id_col)).alias("_ids"))
        .filter(F.size("_ids") >= 2)
    )
    cand = (
        buckets
        .select(F.explode(F.expr(
            "flatten(transform(_ids, (x, i) -> "
            "transform(slice(_ids, i + 2, size(_ids) - i - 1), "
            "y -> struct(x AS id_a, y AS id_b))))")).alias("_p"))
        .select("_p.id_a", "_p.id_b")
    )
    if bands > 1:
        cand = cand.distinct()

    from .similarity import cosine

    v = df.select(F.col(id_col), F.col(vec_col).alias("_v"))
    unp = cand.select("id_a", "id_b",
                      F.explode(F.array("id_a", "id_b")).alias(id_col))
    paired = (
        unp.join(v, on=id_col)
        .groupBy("id_a", "id_b")
        .agg(F.first(F.when(F.col(id_col) == F.col("id_a"), F.col("_v")),
                     ignorenulls=True).alias("_va"),
             F.first(F.when(F.col(id_col) == F.col("id_b"), F.col("_v")),
                     ignorenulls=True).alias("_vb"))
    )
    return (
        paired.select("id_a", "id_b",
                      cosine(F.col("_va"), F.col("_vb")).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


def contamination_report(train: DataFrame, benchmark: DataFrame,
                         text_col: str = "text", id_col: str = "doc_id",
                         bench_id_col: str = "doc_id",
                         k: int = 3) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    k-shingle with an evaluation/benchmark set (the canonical pipeline
    guard against eval leakage).

    Plan shape at 100 TB: both sides reduce to (id, shingle_hash) pairs
    through the single-pass native shingle expressions; the benchmark
    side is tiny → its exploded hash set broadcasts, and the train side
    streams through one broadcast hash join + one aggregation — the
    full corpus is never shuffled.  Returns
    (train_id, n_shared_shingles, n_bench_docs) per CONTAMINATED train
    doc (clean docs absent — anti-join against this to decontaminate).
    """
    th = (hashed_shingle_table(train, text_col, id_col, k)
          .select(F.col(id_col).alias("train_id"),
                  F.explode(F.array_distinct("_shh")).alias("_h")))
    bh = (hashed_shingle_table(benchmark, text_col, bench_id_col, k)
          .select(F.col(bench_id_col).alias("bench_id"),
                  F.explode(F.array_distinct("_shh")).alias("_h")))
    hits = th.join(F.broadcast(bh), on="_h")
    return (hits.groupBy("train_id")
            .agg(F.count("*").alias("n_shared_shingles"),
                 F.countDistinct("bench_id").alias("n_bench_docs")))


def decontaminate(train: DataFrame, benchmark: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  bench_id_col: str = "doc_id", k: int = 3,
                  min_shared: int = 1) -> DataFrame:
    """Drop training documents sharing ≥ ``min_shared`` k-shingles with
    the benchmark set: one broadcast anti-join against the
    contamination report."""
    bad = contamination_report(train, benchmark, text_col, id_col,
                               bench_id_col, k) \
        .filter(F.col("n_shared_shingles") >= min_shared) \
        .select(F.col("train_id").alias(id_col))
    return train.join(bad, on=id_col, how="left_anti")


def minhash_jaccard_estimate(df: DataFrame, pairs: DataFrame,
                             text_col: str = "text", id_col: str = "doc_id",
                             num_hashes: int = 8, k: int = 3) -> DataFrame:
    """MinHash Jaccard ESTIMATE per candidate pair: the fraction of
    equal signature components — the unbiased estimator that lets a
    pipeline rank/filter near-dup candidates WITHOUT touching shingle
    sets again (exact `ngram_jaccard_pairs` re-joins shingles; this
    joins only the `num_hashes`-wide signatures onto the narrow pair
    list).  Standard error ≈ sqrt(J(1−J)/num_hashes)."""
    sig = minhash_signatures(df, text_col, id_col, num_hashes, k)
    sa = sig.select(F.col(id_col).alias("id_a"),
                    *[F.col(f"mh{i}").alias(f"_ma{i}")
                      for i in range(num_hashes)])
    sb = sig.select(F.col(id_col).alias("id_b"),
                    *[F.col(f"mh{i}").alias(f"_mb{i}")
                      for i in range(num_hashes)])
    joined = pairs.join(sa, on="id_a").join(sb, on="id_b")
    matches = None
    for i in range(num_hashes):
        term = F.when(F.col(f"_ma{i}") == F.col(f"_mb{i}"), 1).otherwise(0)
        matches = term if matches is None else matches + term
    return joined.select(
        "id_a", "id_b",
        (matches / F.lit(float(num_hashes))).alias("est_jaccard"))


def _banded_with_sig(df: DataFrame, text_col: str, id_col: str,
                     num_hashes: int, bands: int, k: int) -> DataFrame:
    """(id, sig array<long>, band, bh) in ONE signature pass — the
    stored-index sibling of `_banded` that also carries the full
    signature (the verify stage needs it; carrying it beats a second
    corpus-sized signature join at query time)."""
    assert num_hashes % bands == 0
    rpb = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, num_hashes, k)
    sig = sig.withColumn(
        "sig", F.array(*[F.col(f"mh{i}") for i in range(num_hashes)]))
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh{i}").cast("string")
                 for i in range(b * rpb, (b + 1) * rpb)]
        band_cols.append(F.struct(
            F.lit(b).alias("band"),
            F.md5(F.concat_ws("|", *parts)).alias("bh")))
    return (sig.select(F.col(id_col), "sig",
                       F.explode(F.array(*band_cols)).alias("bk"))
            .select(F.col(id_col), "sig",
                    F.col("bk.band").alias("band"),
                    F.col("bk.bh").alias("bh")))


def _band_bucket(n_buckets: int) -> Column:
    return F.pmod(
        portable_hash(F.concat(F.col("band").cast("string"),
                               F.lit("|"), F.col("bh"))),
        F.lit(int(n_buckets))).cast("int")



def _write_meta_file(meta_dir: str, names: list, values: list) -> None:
    """Write a 1-row int32 meta dataset driver-side (no Spark job; a
    1-row Spark parquet write costs a full job + commit of pure action
    floor).  Same schema as the r16 Spark write (every meta field is
    an int).  Uses the shared writer (`sources.fs.
    write_one_row_parquet`) — see there for the scheme-less-path
    filesystem caveat."""
    import pyarrow as pa

    from ..sources.fs import write_one_row_parquet

    write_one_row_parquet(
        meta_dir,
        {n: pa.array([int(v)], pa.int32())
         for n, v in zip(names, values)},
        filename="part-00000-meta.parquet")


def write_minhash_index(df: DataFrame, path: str, text_col: str = "text",
                        id_col: str = "doc_id", num_hashes: int = 8,
                        bands: int = 4, k: int = 3, n_buckets: int = 64,
                        append: bool = False) -> None:
    """Persist an LSH near-duplicate index hive-partitioned by
    band-hash bucket — the INCREMENTAL-crawl dedup shape (each day's
    batch dedups against everything already ingested without ever
    re-scanning the stored corpus): ``postings/`` holds one
    (id, sig, band, bh) row per document per MinHash band, partitioned
    by ``pmod(hash(band|bh), n_buckets)`` so a query batch reads ONLY
    its own band buckets (static partition pruning, the
    `write_text_index` layout pattern); ``meta/`` holds the 1-row
    parameter record (num_hashes, bands, k, n_buckets) a query
    re-derives its signatures from.

    The full signature rides IN the postings (num_hashes longs,
    duplicated per band): the verify stage then never joins a
    corpus-sized signature table — candidates carry everything.

    ``append=True`` adds a new batch under the STORED parameters
    (validated — mixed-parameter signatures would never collide) in
    one postings write; meta is immutable.  The caller guarantees
    appended ids are disjoint from stored ones.  A crash mid-append
    leaves the index consistent but the batch partially indexed —
    re-run as a rebuild (re-appending double-inserts)."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if num_hashes % bands != 0:
        raise ValueError("bands must divide num_hashes")
    base = path.rstrip("/")
    spark = df.sparkSession
    if append:
        meta = spark.read.schema("num_hashes int, bands int, k int, n_buckets int") \
            .parquet(base + "/meta").head()
        stored = (int(meta["num_hashes"]), int(meta["bands"]),
                  int(meta["k"]))
        if stored != (num_hashes, bands, k):
            raise ValueError(
                f"append parameters {(num_hashes, bands, k)} != stored "
                f"(num_hashes, bands, k) {stored}; signatures would "
                "never collide across the mix")
        n_buckets = int(meta["n_buckets"])
    posts = (_banded_with_sig(df, text_col, id_col, num_hashes, bands, k)
             .withColumn("band_bucket", _band_bucket(n_buckets)))
    posts.write.mode("append" if append else "overwrite") \
        .partitionBy("band_bucket").parquet(base + "/postings")
    if not append:
        _write_meta_file(base + "/meta",
                         ["num_hashes", "bands", "k", "n_buckets"],
                         [num_hashes, bands, k, n_buckets])


def minhash_index_matches(new_df: DataFrame, path: str,
                          threshold: float = 0.7,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Near-duplicate matches of a NEW batch against a stored
    `write_minhash_index`: (new_id, stored_id, est_jaccard) for every
    stored doc sharing ≥1 LSH band with a batch doc whose signature
    agreement (the `minhash_jaccard_estimate` estimator) reaches
    ``threshold``.  Recall is the banding's, exactly as in
    `lsh_candidate_pairs`; the estimate is the unbiased
    equal-components fraction, not exact Jaccard.

    Distributed shape: the batch signatures compute in one pass; the
    batch's DISTINCT band buckets (≤ n_buckets ints) collect
    driver-side into a static partition filter, so the stored read
    touches n_batch_buckets/n_buckets of the postings and NEVER the
    corpus text; the band equi-join is batch-sized; the verify is a
    native zip_with fold over the two carried signatures — no second
    join, no corpus scan, nothing quadratic beyond band-bucket
    collisions (the same contract as the in-memory LSH)."""
    if not 0.0 <= float(threshold) <= 1.0:
        raise ValueError(f"threshold must be in [0, 1], got {threshold}")
    base = path.rstrip("/")
    spark = new_df.sparkSession
    meta = spark.read.schema("num_hashes int, bands int, k int, n_buckets int") \
        .parquet(base + "/meta").head()
    num_hashes, bands, k = (int(meta["num_hashes"]), int(meta["bands"]),
                            int(meta["k"]))
    n_buckets = int(meta["n_buckets"])
    nb = (_banded_with_sig(new_df, text_col, id_col, num_hashes, bands, k)
          .withColumn("band_bucket", _band_bucket(n_buckets))
          .select(F.col(id_col).alias("new_id"),
                  F.col("sig").alias("_nsig"), "band", "bh",
                  "band_bucket"))
    buckets = sorted(r["band_bucket"] for r in
                     nb.select("band_bucket").distinct().collect())
    if not buckets:
        # empty result keeps the id column's REAL type (string ids
        # would otherwise type-mismatch the non-empty path downstream)
        idt = new_df.schema[id_col].dataType.simpleString()
        return spark.createDataFrame(
            [], f"new_id {idt}, stored_id {idt}, est_jaccard double")
    stored = (spark.read.parquet(base + "/postings")
              .filter(F.col("band_bucket").isin(buckets))
              .select(F.col(id_col).alias("stored_id"),
                      F.col("sig").alias("_ssig"), "band", "bh"))
    cand = (nb.drop("band_bucket")
            .join(stored, on=["band", "bh"])
            .dropDuplicates(["new_id", "stored_id"]))
    matches = F.aggregate(
        F.zip_with(F.col("_nsig"), F.col("_ssig"),
                   lambda a, b: F.when(a == b, 1).otherwise(0)),
        F.lit(0), lambda acc, x: acc + x)
    return (cand.withColumn(
                "est_jaccard",
                F.round(matches.cast("double")
                        / F.lit(float(num_hashes)), 9))
            .filter(F.col("est_jaccard") >= F.lit(float(threshold)))
            .select("new_id", "stored_id", "est_jaccard"))


def dedup_against_index(new_df: DataFrame, path: str,
                        threshold: float = 0.7, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """The incremental dedup filter: drop every NEW row whose text
    near-duplicates something already in the stored
    `write_minhash_index` (see `minhash_index_matches` for the match
    semantics and the pruned-read shape), keep the rest — one
    batch-keyed left-anti join.  Compose with `write_minhash_index(
    append=True)` on the survivors to advance the index for the next
    batch."""
    hits = (minhash_index_matches(new_df, path, threshold, text_col,
                                  id_col)
            .select(F.col("new_id").alias(id_col)).distinct())
    return new_df.join(hits, on=id_col, how="left_anti")


def _hash_bucket(col: Column, n_buckets: int) -> Column:
    return F.pmod(portable_hash(col), F.lit(int(n_buckets))).cast("int")


def write_exact_index(df: DataFrame, path: str, text_col: str = "text",
                      id_col: str = "doc_id", n_buckets: int = 64,
                      append: bool = False) -> None:
    """Persist an EXACT-duplicate index hive-partitioned by text-hash
    bucket — the exact-match member of the stored-layout family (ivf /
    text / minhash / spatial): ``postings/`` holds one
    (id, text_hash) row per document, partitioned by
    ``pmod(hash(text_hash), n_buckets)`` so a query batch reads ONLY
    the buckets its own hashes land in (static partition pruning);
    ``meta/`` holds the 1-row n_buckets record.

    Exact dedup against yesterday's corpus then never re-scans — or
    even re-hashes — the stored text: the index carries 16-byte md5s,
    ~1/1000th of a typical document, and the pruned read touches
    n_batch_buckets/n_buckets of even that.

    ``append=True`` adds a batch under the stored n_buckets
    (validated); meta is immutable.  The caller guarantees appended
    ids are disjoint from stored ones.  A crash mid-append leaves the
    index consistent but the batch partially indexed — re-run as a
    rebuild (re-appending double-inserts)."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    base = path.rstrip("/")
    spark = df.sparkSession
    if append:
        meta = spark.read.schema("n_buckets int") \
            .parquet(base + "/meta").head()
        n_buckets = int(meta["n_buckets"])
    posts = df.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("text_hash")
    ).withColumn("hash_bucket", _hash_bucket(F.col("text_hash"),
                                             n_buckets))
    posts.write.mode("append" if append else "overwrite") \
        .partitionBy("hash_bucket").parquet(base + "/postings")
    if not append:
        _write_meta_file(base + "/meta", ["n_buckets"], [n_buckets])


def exact_index_matches(new_df: DataFrame, path: str,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Exact-duplicate matches of a NEW batch against a stored
    `write_exact_index`: (new_id, stored_id) for every stored doc
    whose md5(text) equals a batch doc's.

    Distributed shape: the batch hashes in one narrow pass; its
    DISTINCT hash buckets (≤ n_buckets ints) collect driver-side into
    a static partition filter, so the stored read touches
    n_batch_buckets/n_buckets of the md5 postings and never any text;
    the match is a batch-sized equi-join on the 16-byte hash."""
    base = path.rstrip("/")
    spark = new_df.sparkSession
    meta = spark.read.schema("n_buckets int") \
        .parquet(base + "/meta").head()
    n_buckets = int(meta["n_buckets"])
    nb = new_df.select(
        F.col(id_col).alias("new_id"),
        F.md5(F.col(text_col)).alias("text_hash")
    ).withColumn("hash_bucket", _hash_bucket(F.col("text_hash"),
                                             n_buckets))
    buckets = sorted(r["hash_bucket"] for r in
                     nb.select("hash_bucket").distinct().collect())
    if not buckets:
        # keep the id column's real type, matching the non-empty path
        idt = new_df.schema[id_col].dataType.simpleString()
        return spark.createDataFrame(
            [], f"new_id {idt}, stored_id {idt}")
    stored = (spark.read.parquet(base + "/postings")
              .filter(F.col("hash_bucket").isin(buckets))
              .select(F.col(id_col).alias("stored_id"), "text_hash"))
    return (nb.drop("hash_bucket")
            .join(stored, on="text_hash")
            .select("new_id", "stored_id"))


def dedup_exact_against_index(new_df: DataFrame, path: str,
                              text_col: str = "text",
                              id_col: str = "doc_id") -> DataFrame:
    """The incremental EXACT dedup filter: drop every NEW row whose
    text byte-equals something already in the stored
    `write_exact_index` (see `exact_index_matches` for the pruned-read
    shape), keep the rest — one batch-keyed left-anti join.  Compose
    with `write_exact_index(append=True)` on the survivors to advance
    the index for the next batch; the near-duplicate analogue is
    `dedup_against_index` over a `write_minhash_index`."""
    hits = (exact_index_matches(new_df, path, text_col, id_col)
            .select(F.col("new_id").alias(id_col)).distinct())
    return new_df.join(hits, on=id_col, how="left_anti")


def _compaction_frame(df: DataFrame, bucket_col: str,
                      max_records_per_file: int | None) -> DataFrame:
    """The compaction rewrite's shuffle shape (split out so tests can
    plan-pin it): one hash shuffle on the bucket id alone when every
    bucket compacts to one file, or on ``(bucket, pmod(hash(row),
    ceil(bucket_rows / max)))`` when ``max_records_per_file`` is set —
    the two-column key lets a Zipf-head bucket's several right-sized
    output files write from several tasks instead of serially from
    one.  The split key hashes the DATA columns (deterministic — a
    task retry re-lands every row in the same partition, unlike a
    rand() salt), and per-bucket split counts come from a count-only
    aggregation broadcast back onto the frame (n_buckets rows).

    Known limit of the deterministic key: BYTE-IDENTICAL duplicate
    rows all hash to the same split, so a bucket made of one row
    repeated N times still writes from one task — acceptable because
    every layout this serves (exact/minhash/text/ivf postings) keys
    on unique ids, so true full-row duplicates don't arise there.  A
    frame with NO data columns beside the bucket id can't split at
    all (``F.hash()`` with zero args is an error): it falls back to
    the one-file-per-bucket shuffle."""
    if max_records_per_file is None:
        return df.repartition(F.col(bucket_col))
    data_cols = [c for c in df.columns if c != bucket_col]
    if not data_cols:
        return df.repartition(F.col(bucket_col))
    counts = (df.groupBy(bucket_col)
              .agg(F.greatest(
                  F.ceil(F.count("*") / F.lit(int(max_records_per_file))),
                  F.lit(1)).cast("int").alias("_nsplit")))
    return (df.join(F.broadcast(counts), on=bucket_col)
            .withColumn("_split", F.pmod(
                F.hash(*[F.col(c) for c in data_cols]),
                F.col("_nsplit")))
            .repartition(F.col(bucket_col), F.col("_split"))
            .drop("_nsplit", "_split"))


def compact_index(spark, path: str, dataset: str | None = "postings",
                  missing_ok: bool = False,
                  max_records_per_file: int | None = None) -> dict:
    """Compact an appendable stored index's ``postings/`` dataset —
    the maintenance pass every streaming-appended layout eventually
    needs: `write_exact_index` / `write_minhash_index` /
    `write_text_index` (and any hive-bucketed layout of the same
    shape) append one new file set per batch, so after thousands of
    micro-batches each bucket directory holds thousands of small
    files and the static-partition-pruned reads the layout exists to
    serve drown in open() overhead.  This rewrites the postings to
    ONE file per bucket (one shuffle on the bucket id, then
    ``partitionBy`` — each bucket lands in exactly one task) and
    swaps the rewrite in via two renames.

    Contents are preserved row-for-row (matches before == matches
    after, pinned in pytest); ``meta/`` / ``stats/`` are untouched —
    compaction changes layout only.  The swap window (rename old out,
    rename new in) is not atomic for CONCURRENT readers: run it like
    any compaction job, between query batches.  A crash mid-swap
    leaves either the original postings or a ``postings_old`` to roll
    back by hand; the rewrite itself goes to a side directory, so the
    live data is never half-written.  Returns
    ``{"files_before": n, "files_after": m, "bucket_col": name}``.

    ``dataset`` names the hive-partitioned subdirectory (default
    ``"postings"`` — the exact/minhash/text index layout); pass
    ``None`` for layouts partitioned directly at ``path`` (the
    `write_ivf_index` shape, hive dirs ``ivf_cell=...`` at the
    root).

    ``missing_ok=True`` turns an absent dataset into a no-op
    returning ``{"files_before": 0, "files_after": 0, "bucket_col":
    None}`` — the streaming ingesters use it because their early
    micro-batches legitimately skip index initialization (empty or
    fully-deduped input), and a scheduled compaction must not kill
    the query for an index that doesn't exist yet.

    ``max_records_per_file`` bounds output file size (Spark's
    ``maxRecordsPerFile``): without it each bucket compacts to
    exactly ONE file, which is right for uniform buckets but turns a
    Zipf-head bucket into one multi-GB single-task read downstream —
    set it to keep hot buckets split into several right-sized files.
    When set, the rewrite also shuffles on ``(bucket,
    pmod(hash(row), ceil(bucket_rows / max)))`` instead of the bucket
    id alone, so a hot bucket's several output files WRITE from
    several tasks in parallel — otherwise the Zipf-head bucket's
    compaction is a single-task straggler by exactly the skew factor
    the option exists to absorb (per-bucket split counts come from
    one count-only scan, broadcast back)."""
    base = path.rstrip("/")
    dpath = base + (f"/{dataset}" if dataset else "")
    jvm = spark._jvm
    HP = jvm.org.apache.hadoop.fs.Path
    posts = HP(dpath)
    fs = posts.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(posts):
        if missing_ok:
            return {"files_before": 0, "files_after": 0,
                    "bucket_col": None}
        raise ValueError(f"no postings dataset at {dpath!r}")

    bucket_col = None
    for st in fs.listStatus(posts):
        nm = st.getPath().getName()
        if st.isDirectory() and "=" in nm:
            bucket_col = nm.split("=", 1)[0]
            break
    if bucket_col is None:
        raise ValueError(
            f"{dpath!r} has no hive partition directories "
            "— not an appendable bucketed index")

    def _count_files(p) -> int:
        n = 0
        it = fs.listFiles(p, True)
        while it.hasNext():
            f = it.next().getPath().getName()
            if not f.startswith("_") and not f.startswith("."):
                n += 1
        return n

    files_before = _count_files(posts)
    tmp = HP(dpath + "_compacting")
    fs.delete(tmp, True)
    writer = (_compaction_frame(spark.read.parquet(dpath), bucket_col,
                                max_records_per_file)
              .write.mode("overwrite").partitionBy(bucket_col))
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile",
                               int(max_records_per_file))
    writer.parquet(dpath + "_compacting")
    # root-partitioned layouts (dataset=None) keep sidecars next to the
    # hive dirs (_centroids.json, _batches commit markers): COPY every
    # non-hive entry into the compacted rewrite BEFORE the swap, so
    # the live path is never without its sidecars — a crash between
    # the swap and a post-swap carry would strand them in _old
    # (ivf_topk_stored would raise 'no sidecar' and the exactly-once
    # commit markers would be lost to a checkpoint-less replay)
    FU = jvm.org.apache.hadoop.fs.FileUtil
    conf = spark._jsc.hadoopConfiguration()
    # sidecars are written by NON-Hadoop writers (pyarrow / plain
    # Python), so copy through the RAW local filesystem where one
    # exists: a checksummed copy would plant .crc files that go stale
    # the moment the engine rewrites the sidecar bytes directly, and
    # every later compaction copy would then die on ChecksumException.
    # HDFS/S3A have no Checksum wrapper — getRawFileSystem is absent
    # and the checksum-free fs is the fs itself.
    try:
        cfs = fs.getRawFileSystem()
    except Exception:
        cfs = fs
    for st in fs.listStatus(posts):
        nm = st.getPath().getName()
        if "=" not in nm and nm != "_SUCCESS":
            dest = HP(dpath + "_compacting/" + nm)
            if not fs.exists(dest):
                FU.copy(cfs, st.getPath(), cfs, dest, False, conf)
    old = HP(dpath + "_old")
    fs.delete(old, True)
    if not fs.rename(posts, old):
        raise IOError(f"could not move live postings aside at {dpath!r}")
    if not fs.rename(tmp, posts):
        fs.rename(old, posts)  # roll back, live data intact
        raise IOError(f"could not swap compacted postings in at {dpath!r}")
    # re-sync sidecars from _old before discarding it: a sidecar
    # update landing between the pre-swap copy and the rename (a
    # concurrent append's new _batches marker, a refreshed
    # _centroids.json) would otherwise lose to the stale copy.
    # Compaction is still documented as a between-batches job — the
    # swap window itself is not atomic for readers — but the
    # copy-if-newer keeps both crash-safety (sidecars present before
    # the swap) and freshness (latest version wins after it).
    for st in fs.listStatus(old):
        nm = st.getPath().getName()
        if "=" in nm or nm == "_SUCCESS":
            continue
        dest = HP(dpath + "/" + nm)
        if not fs.exists(dest) or (st.getModificationTime()
                                   > fs.getFileStatus(dest)
                                   .getModificationTime()):
            fs.delete(dest, True)
            FU.copy(cfs, st.getPath(), cfs, dest, False, conf)
    fs.delete(old, True)
    return {"files_before": files_before,
            "files_after": _count_files(posts),
            "bucket_col": bucket_col}


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst", max_iter: int = 10,
                         on_nonconverged: str = "warn") -> DataFrame:
    """Min-label connected components over an undirected edge list —
    the generic form of ``lsh_dedup``'s label propagation, for cluster-
    level dedup over arbitrary pair sources (``knn_graph`` edges,
    ``lsh_candidate_pairs``, ``embedding_neardup_pairs``).

    The execution strategy is SCALE-ADAPTIVE (r17; conf
    ``spark.dask_geopandas_spark.cc.starNodeThreshold``, default
    5,000,000 nodes — the node count is read off the init probe job,
    so the dispatch costs nothing):

    * **At or below the threshold** (every bench-scale graph): the
      r15/r16 label-propagation loop — neighbor-min aggregation over
      the fixed edge list plus one path-halving shortcut join per
      iteration.  Its per-iteration joins are against NODE-sized
      label tables, which broadcast precisely while the node count is
      small — the condition the threshold encodes; O(log diameter)
      iterations (the frontier roughly doubles via halving).
    * **Above it**: one ALTERNATING-STAR round pair per iteration
      (Kiveris et al., "Connected Components in MapReduce and
      Beyond").  Large-star connects each node's strictly-larger
      neighbors to the minimum of its closed neighborhood; small-star
      connects the smaller neighbors (and the node) to that minimum.
      The loop state is the EDGE SET itself, which CONTRACTS toward
      the star forest — duplicate-heavy near-dup graphs (LSH /
      embedding cliques) collapse from O(k²) to O(k) edges after the
      first pair — so per-round shuffle volume SHRINKS where the
      propagation loop re-shuffles the full original edge list every
      iteration once the label table outgrows a broadcast (guide
      §2.3).  O(log diameter) pairs on chains.

    Both strategies converge to the identical min-label fixpoint
    (strategy-equivalence pytest); the threshold only picks the
    cheaper execution.  ``max_iter`` bounds iterations (propagation)
    or round pairs (star) — both O(log diameter) budgets.

    An early stop exits as soon as an iteration changes nothing, via
    one narrow aggregate probe that doubles as the job materializing
    the iterate: labels are monotone non-increasing under both
    strategies (for the star rounds, L(u) = min(u, min out-nbrs)
    strictly decreases somewhere per pair while unconverged — the
    boundary-edge argument in both orientations), so for numeric ids
    an exact decimal sum is a SOUND fixpoint witness; non-numeric ids
    fall back to a two-aggregate probabilistic probe (xxhash64 state
    sum PLUS row count — two independent observables, the
    `_propagate_min` convention hardened per the r16 ADVICE).

    Every iterate is plan-barriered (lazy localCheckpoint): the
    self-referential plan otherwise DOUBLES per iteration and chokes
    the planner long before the data does.  Superseded iterates'
    checkpoint blocks are freed by Spark's ContextCleaner once this
    function drops their references.  On a real cluster with executor
    loss to survive, set a checkpoint dir and
    ``spark.dask_geopandas_spark.reliableCheckpoint=true`` (see
    barrier.py).

    Returns (node, component) with component = the component's min
    node id (for a sufficient ``max_iter``).

    Convergence is verified, not assumed: when ``max_iter`` runs out
    with the last iteration still changing labels, the result may
    split one true component into several — ``on_nonconverged`` picks
    the response: ``'warn'`` (default, ``RuntimeWarning``),
    ``'raise'`` (``RuntimeError``), or ``'ignore'``."""
    if on_nonconverged not in ("warn", "raise", "ignore"):
        raise ValueError(
            f"on_nonconverged must be warn|raise|ignore, got "
            f"{on_nonconverged!r}")

    spark = edges.sparkSession
    sym0 = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
            .union(edges.select(F.col(dst).alias("a"),
                                F.col(src).alias("b"))))
    e = sym0.transform(plan_barrier)  # consumed every iteration

    numeric = dict(e.dtypes)["a"] in (
        "tinyint", "smallint", "int", "bigint")

    def _state_of(lt, node_col, comp_col):
        """(monotone label state, row count) in ONE narrow
        map-side-combined aggregation — the count is a free second
        observable (and the init call's count is the node count the
        strategy dispatch reads)."""
        if numeric:
            s = F.sum(F.col(comp_col).cast("decimal(38,0)")
                      - F.col(node_col).cast("decimal(38,0)"))
        else:
            # hash sum + count: two independent observables shrink
            # the non-numeric false-fixpoint surface (r16 ADVICE)
            s = F.sum(F.xxhash64(node_col, comp_col)
                      .cast("decimal(30,0)"))
        return tuple(lt.agg(s.alias("_s"),
                            F.count("*").alias("_n")).head())

    # init: labels = identity over the FIXED node universe
    # (self-loop-only nodes included); this probe job materializes
    # the checkpoints AND returns the node count for the dispatch
    labels = (e.select(F.col("a").alias("node")).distinct()
              .withColumn("component", F.col("node"))
              .transform(plan_barrier))
    st = _state_of(labels, "node", "component")
    n_nodes = int(st[1] or 0)
    threshold = int(spark.conf.get(
        "spark.dask_geopandas_spark.cc.starNodeThreshold", "5000000"))

    changed = False
    if n_nodes <= threshold:
        # ---- propagation + path halving (broadcast regime) --------
        for _ in range(max_iter):
            nbr = (e.join(labels, on=F.col("b") == F.col("node"))
                   .groupBy("a").agg(F.min("component").alias("_nl")))
            nxt = (labels.join(nbr, on=F.col("node") == F.col("a"),
                               how="left")
                   .select("node",
                           F.least(F.col("component"),
                                   F.coalesce(F.col("_nl"),
                                              F.col("component")))
                           .alias("component"))
                   .transform(plan_barrier))
            # path halving: component <- its component's component;
            # every label is a node id present in the table, so the
            # shortcut lookup always lands
            lk = nxt.select(F.col("node").alias("_ln"),
                            F.col("component").alias("_lc"))
            nxt = (nxt.join(lk, on=F.col("component") == F.col("_ln"),
                            how="left")
                   .select("node",
                           F.least(F.col("component"),
                                   F.coalesce(F.col("_lc"),
                                              F.col("component")))
                           .alias("component"))
                   .transform(plan_barrier))
            nst = _state_of(nxt, "node", "component")
            changed = nst != st
            st = nst
            labels = nxt
            if not changed:
                break
        out = labels
    else:
        # ---- alternating large-star / small-star (contracting
        # edge-set regime) ------------------------------------------
        def _labels(ed):
            """(src, min out-neighbor): the probe's observable, and
            at star convergence the answer."""
            return ed.groupBy(F.col("a").alias("src")).agg(
                F.min("b").alias("component"))

        # the node universe rides the already-checkpointed labels
        # frame; the star state is the deduped self-loop-free edges
        nodes = labels.select("node")
        e = (e.filter(F.col("a") != F.col("b")).distinct()
             .transform(plan_barrier))
        lab = _labels(e).transform(plan_barrier)
        st = _state_of(lab, "src", "component")
        for it in range(max_iter):
            # large-star: m = min of the closed symmetric
            # neighborhood; larger neighbors re-attach to m.  The min
            # table is node-sized (joins broadcast while small, key-
            # shuffle the CONTRACTING edge set otherwise).  The
            # INITIAL state is already symmetric by construction, so
            # only later rounds (edges oriented big->small by
            # small-star) re-add the reverse orientation.
            sym = e if it == 0 else e.union(
                e.select(F.col("b").alias("a"), F.col("a").alias("b")))
            mins = (sym.groupBy("a")
                    .agg(F.least(F.col("a"), F.min("b")).alias("_m")))
            e = (sym.join(mins, "a")
                 .filter(F.col("b") > F.col("a"))
                 .select(F.col("b").alias("a"), F.col("_m").alias("b"))
                 .distinct()
                 .transform(plan_barrier))
            # small-star: edges now point strictly big->small; each
            # node's smaller neighbors re-attach to its minimum, and
            # the node keeps exactly its minimum edge (= the min
            # table itself)
            mins = e.groupBy("a").agg(F.min("b").alias("_m"))
            e = (e.join(mins, "a")
                 .filter(F.col("b") != F.col("_m"))
                 .select(F.col("b").alias("a"), F.col("_m").alias("b"))
                 .union(mins.select("a", F.col("_m").alias("b")))
                 .distinct()
                 .transform(plan_barrier))
            lab = _labels(e).transform(plan_barrier)
            nst = _state_of(lab, "src", "component")
            changed = nst != st
            st = nst
            if not changed:
                break
        # nodes without an out-edge in the star forest are the
        # component minima (and self-loop-only nodes): they label
        # themselves.  max_iter=0 never entered the loop: return the
        # IDENTITY labels (the propagation branch's max_iter=0
        # behavior), not the raw min-neighbor table
        if max_iter <= 0:
            out = labels
        else:
            out = (nodes.join(lab, nodes["node"] == lab["src"], "left")
                   .select("node",
                           F.coalesce(F.col("component"),
                                      F.col("node"))
                           .alias("component")))
    if changed:
        msg = (f"connected_components: max_iter={max_iter} exhausted with "
               "labels still changing — components may be split; raise "
               "max_iter above log2(graph diameter) with headroom")
        if on_nonconverged == "raise":
            raise RuntimeError(msg)
        if on_nonconverged == "warn":
            import warnings

            warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return out


def cluster_dedup(df: DataFrame, edges: DataFrame, id_col: str = "doc_id",
                  src: str = "id_a", dst: str = "id_b",
                  max_iter: int = 10,
                  on_nonconverged: str = "warn") -> DataFrame:
    """Cluster-level dedup end-to-end: connected components over a
    near-duplicate edge list (``lsh_candidate_pairs`` / ``knn_graph`` /
    ``embedding_neardup_pairs`` output), keep each component's
    minimum-id row as the canonical representative, and pass through
    every row that appears in no edge.  Returns ``df`` filtered to the
    survivors — the one-call form of the edges→labels→keep-min
    assembly the corpus_curation example sketches.

    Distributed shape: the label table is edge-node-sized (≪ corpus
    when duplicates are rare); the keep decision is ONE left-anti join
    of the corpus against the dropped-node list (``node !=
    component`` ⇔ a smaller id exists in the same cluster), so the
    corpus shuffles once on the id and nothing corpus-sized ever sits
    in driver memory."""
    labels = connected_components(edges, src=src, dst=dst,
                                  max_iter=max_iter,
                                  on_nonconverged=on_nonconverged)
    drop = (labels.filter(F.col("node") != F.col("component"))
            .select(F.col("node").alias(id_col)))
    return df.join(drop, on=id_col, how="left_anti")


def _doc_lines(df: DataFrame, text_col: str, other_cols: list,
               normalize: bool, min_chars: int,
               sep: str = "\n") -> DataFrame:
    """Shared explode stage of the line-granularity dedups: one row
    per (doc, unit) with its position and a normalized key — NULL for
    units shorter than ``min_chars`` after trimming, which excludes
    them from counting AND from every key-equality join/window.
    ``sep`` picks the granularity (line by default, paragraph with
    a blank-line separator)."""
    import re as _re

    lines = df.select(
        *other_cols,
        F.posexplode(F.split(F.col(text_col), _re.escape(sep)))
        .alias("_pos", "_line"))
    key = (F.lower(F.trim(F.col("_line"))) if normalize
           else F.col("_line"))
    return lines.withColumn(
        "_k", F.when(F.length(F.trim(F.col("_line"))) >= int(min_chars),
                     key))


def _reassemble(marked: DataFrame, other_cols: list, text_col: str,
                count_col: str, out_cols: list,
                sep: str = "\n") -> DataFrame:
    """Shared regroup stage: original-order reassembly of the
    non-dropped units plus a dropped-unit count, one aggregation."""
    kept_struct = F.when(F.col("_dup").isNull(),
                         F.struct(F.col("_pos"), F.col("_line")))
    out = (marked.groupBy(*other_cols).agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(kept_struct)),
                        lambda s: s["_line"]), sep).alias(text_col),
        F.sum(F.when(F.col("_dup").isNotNull(), 1).otherwise(0))
        .cast("long").alias(count_col)))
    return out.select(*out_cols, count_col)


def line_dedup(df: DataFrame, max_occurrences: int = 1,
               text_col: str = "text", id_col: str = "doc_id",
               normalize: bool = True, min_chars: int = 1,
               count_col: str = "n_dropped",
               sep: str = "\n") -> DataFrame:
    """Line-level corpus dedup (the CCNet/RefinedWeb boilerplate
    stage): drop every occurrence of any line whose NORMALIZED form
    appears more than ``max_occurrences`` times across the whole
    corpus — cookie banners, nav bars, license footers — then
    reassemble each document in original line order.  Returns ``df``
    with ``text_col`` rewritten and a ``count_col`` of dropped lines
    per document (0 for untouched docs; a doc whose every line is
    boilerplate comes back with empty text, not silently vanished).

    ``normalize=True`` keys lines on ``lower(trim(line))`` (the CCNet
    convention); lines shorter than ``min_chars`` after trimming —
    empty lines, lone punctuation — are NEVER dropped, so paragraph
    structure survives even though blank lines repeat corpus-wide.
    ``sep`` picks the unit: the default ``"\\n"`` dedups lines,
    ``"\\n\\n"`` dedups PARAGRAPHS — the CCNet paper's actual
    granularity — with the same machinery.

    Distributed shape, all native SQL: one ``posexplode`` (no data
    ever concatenates driver-side), one partial+final hash aggregation
    over the line key for the corpus-wide counts (map-side combine
    absorbs the boilerplate skew — a line occurring a billion times
    contributes one partial count per map task, never a billion-row
    reduce key), one join against the over-limit key list (typically
    tiny → AQE broadcasts it), and one per-document aggregation whose
    ``array_sort`` on (pos, line) structs restores original order.
    The only corpus-wide shuffles are the count aggregation and the
    final doc_id regroup."""
    if max_occurrences < 1:
        raise ValueError(
            f"max_occurrences must be >= 1, got {max_occurrences}")
    other_cols = [c for c in df.columns if c != text_col]
    lines = _doc_lines(df, text_col, other_cols, normalize, min_chars,
                       sep)
    over = (lines.filter(F.col("_k").isNotNull())
            .groupBy("_k").agg(F.count("*").alias("_n"))
            .filter(F.col("_n") > int(max_occurrences))
            .select("_k", F.lit(True).alias("_dup")))
    marked = lines.join(over, on="_k", how="left")
    return _reassemble(marked, other_cols, text_col, count_col,
                       list(df.columns), sep)


def dedup_lines_within_doc(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id",
                           normalize: bool = True, min_chars: int = 1,
                           count_col: str = "n_dropped",
                           sep: str = "\n") -> DataFrame:
    """Intra-document repeated-line removal — the TRANSFORM behind the
    Gopher/MassiveText duplicate-line-fraction signal: within each
    document keep only the FIRST occurrence of every normalized line
    (keyword-stuffed listings, chat-log echoes, templated repeats),
    preserving original order; short/blank lines are never dropped.
    Corpus-wide repetition is `line_dedup`'s job — this one never
    looks across documents.

    Distributed shape, all native SQL: the first-occurrence window is
    keyed on ``(doc, line-key)`` — bounded by a single document's
    lines, so no corpus-level key can hotspot — and the reassembly is
    the same ordered regroup as `line_dedup`.  Both shuffles are on
    the document id (AQE coalesces the tiny key window into the
    regroup's partitioning at runtime)."""
    other_cols = [c for c in df.columns if c != text_col]
    lines = _doc_lines(df, text_col, other_cols, normalize, min_chars,
                       sep)
    w = Window.partitionBy(F.col(id_col), F.col("_k")) \
        .orderBy(F.asc("_pos"))
    marked = lines.withColumn(
        "_dup", F.when(F.col("_k").isNotNull()
                       & (F.row_number().over(w) > 1), F.lit(True)))
    return _reassemble(marked, other_cols, text_col, count_col,
                       list(df.columns), sep)


def duplicated_spans(df: DataFrame, k: int = 8,
                     min_occurrences: int = 2,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Exact duplicated-SPAN detection — the substring-dedup family
    (Lee et al. 2022's suffix-array stage) in its Spark-distributable
    form: every ``k``-token window whose exact token sequence appears
    ``min_occurrences``+ times corpus-wide is a duplicated gram, and
    overlapping/adjacent duplicated grams within a document merge into
    MAXIMAL spans.  Returns one row per span: ``(id_col, span_start,
    span_tokens, n_dup_grams)`` with ``span_start`` the 1-based token
    offset — feed it to a span-removal rewrite or use the span/doc
    length ratio as a filter signal.

    A true suffix array finds arbitrary-length duplicates; fixing the
    window at ``k`` tokens finds every duplicate of length >= k (as a
    run of >= 1 duplicated grams) with two shuffles and no global
    sort: corpus-wide gram-hash counts (partial aggregation absorbs
    hot boilerplate grams), a semi-join back, and a per-document
    island window (doc-bounded).  False positives require a 60-bit
    gram-hash collision.

    All native SQL: the gram list is one ``transform`` over token
    positions (no explode until the gram table), and span merging is
    the classic gaps-and-islands window — new island when the next
    duplicated position starts more than ``k`` tokens after the
    previous (beyond overlap-or-adjacency)."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if min_occurrences < 2:
        raise ValueError(
            f"min_occurrences must be >= 2, got {min_occurrences}")
    toks = let(tokens(F.col(text_col)),
               lambda t: F.filter(t, lambda x: x != F.lit("")))
    grams = let(toks, lambda t: F.when(
        F.size(t) >= k,
        F.transform(F.sequence(F.lit(1), F.size(t) - (k - 1)),
                    lambda i: F.array_join(F.slice(t, i, k), " ")))
        .otherwise(F.array().cast("array<string>")))
    g = (df.select(F.col(id_col),
                   F.posexplode(grams).alias("_p0", "_gram"))
         .select(F.col(id_col), (F.col("_p0") + 1).alias("_pos"),
                 portable_hash(F.col("_gram")).alias("_h")))
    dup = (g.groupBy("_h").agg(F.count("*").alias("_n"))
           .filter(F.col("_n") >= int(min_occurrences)).select("_h"))
    hits = g.join(dup, on="_h", how="left_semi")
    w = Window.partitionBy(id_col).orderBy(F.asc("_pos"))
    isl = (hits
           .withColumn("_prev", F.lag("_pos").over(w))
           .withColumn("_new", F.when(
               F.col("_prev").isNull()
               | (F.col("_pos") - F.col("_prev") > k), 1).otherwise(0))
           .withColumn("_isl", F.sum("_new").over(
               w.rowsBetween(Window.unboundedPreceding, 0))))
    return (isl.groupBy(id_col, "_isl")
            .agg(F.min("_pos").alias("span_start"),
                 (F.max("_pos") - F.min("_pos") + k).alias("span_tokens"),
                 F.count("*").alias("n_dup_grams"))
            .select(id_col, "span_start",
                    F.col("span_tokens").cast("long"),
                    F.col("n_dup_grams").cast("long")))


def remove_duplicated_spans(df: DataFrame, k: int = 8,
                            min_occurrences: int = 2,
                            text_col: str = "text",
                            id_col: str = "doc_id") -> DataFrame:
    """Substring-dedup REWRITE — the removal stage of the Lee et al.
    2022 ExactSubstr recipe on top of :func:`duplicated_spans`: every
    token position covered by a duplicated span is cut from every
    document (ALL occurrences go, the published
    deduplicate-text-datasets semantics — a span duplicated N times
    disappears N times; no global keep-first ordering exists at corpus
    scale and the tool's authors make the same call).  Every input
    column is preserved in order, ``text_col`` rewritten in place,
    plus a trailing ``n_removed_tokens`` — the line_dedup convention,
    so pipeline metadata (source, language, scores) rides through.

    The rewrite happens in TOKEN space (the detector's tokenizer):
    a doc touched by a span comes back as its kept tokens joined by
    single spaces — lowercased, punctuation-split.  Docs with NO
    duplicated span keep their original ``text_col`` byte-for-byte
    (the common case pays nothing).

    Distributed shape: the span list rides one doc-keyed equi-join
    (spans are a tiny fraction of corpus rows; AQE broadcasts when
    small), per-doc spans fold into ONE array column, and the cut is
    a single native index-lambda ``filter`` — no explode, no window,
    no UDF on the rewrite side; the detection cost is exactly
    :func:`duplicated_spans`' two shuffles."""
    spans = duplicated_spans(df, k=k, min_occurrences=min_occurrences,
                             text_col=text_col, id_col=id_col)
    return _cut_spans(df, spans, text_col, id_col)


def _cut_spans(df: DataFrame, spans: DataFrame, text_col: str,
               id_col: str) -> DataFrame:
    """Shared span-removal tail: fold a (id, span_start, span_tokens)
    table into one per-doc array, cut covered token positions with a
    native index-lambda filter, preserve every other column, pass
    span-free docs through byte-for-byte.  `remove_duplicated_spans`
    and `decontaminate_spans` both end here."""
    sp = spans.groupBy(id_col).agg(
        F.collect_list(F.struct(
            F.col("span_start").alias("s"),
            (F.col("span_start") + F.col("span_tokens") - 1).alias("e"))
        ).alias("_spans"))
    toks = let(tokens(F.col(text_col)),
               lambda t: F.filter(t, lambda x: x != F.lit("")))
    kept = F.filter(
        F.col("_toks"),
        lambda x, i: ~F.exists(
            F.col("_spans"),
            lambda s: (i + 1 >= s["s"]) & (i + 1 <= s["e"])))
    out_cols = []
    for c in df.columns:
        if c == text_col:
            out_cols.append(
                F.when(F.col("_spans").isNull(), F.col(text_col))
                .otherwise(F.array_join(kept, " ")).alias(text_col))
        else:
            out_cols.append(F.col(c))
    out_cols.append(
        F.when(F.col("_spans").isNull(), F.lit(0))
        .otherwise(F.size("_toks") - F.size(kept))
        .cast("long").alias("n_removed_tokens"))
    return (df.join(sp, on=id_col, how="left")
            .withColumn("_toks", toks)
            .select(*out_cols))


def contaminated_spans(train: DataFrame, benchmark: DataFrame, k: int = 8,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Maximal spans of ``train`` documents whose every ``k``-token
    window also appears in ``benchmark`` — the detection half of
    span-level decontamination.  Same shape as `duplicated_spans`
    except the "hit" predicate is membership in the benchmark's gram
    set (distinct, broadcast — benchmarks are small by definition)
    instead of a corpus-count threshold.  Returns
    (id_col, span_start, span_tokens, n_dup_grams)."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")

    def grams_of(frame, idc):
        toks = let(tokens(F.col(text_col)),
                   lambda t: F.filter(t, lambda x: x != F.lit("")))
        grams = let(toks, lambda t: F.when(
            F.size(t) >= k,
            F.transform(F.sequence(F.lit(1), F.size(t) - (k - 1)),
                        lambda i: F.array_join(F.slice(t, i, k), " ")))
            .otherwise(F.array().cast("array<string>")))
        return (frame.select(F.col(idc),
                             F.posexplode(grams).alias("_p0", "_gram"))
                .select(F.col(idc), (F.col("_p0") + 1).alias("_pos"),
                        portable_hash(F.col("_gram")).alias("_h")))

    bench = grams_of(benchmark, id_col).select("_h").distinct()
    hits = grams_of(train, id_col).join(F.broadcast(bench), on="_h",
                                        how="left_semi")
    w = Window.partitionBy(id_col).orderBy(F.asc("_pos"))
    isl = (hits
           .withColumn("_prev", F.lag("_pos").over(w))
           .withColumn("_new", F.when(
               F.col("_prev").isNull()
               | (F.col("_pos") - F.col("_prev") > k), 1).otherwise(0))
           .withColumn("_isl", F.sum("_new").over(
               w.rowsBetween(Window.unboundedPreceding, 0))))
    return (isl.groupBy(id_col, "_isl")
            .agg(F.min("_pos").alias("span_start"),
                 (F.max("_pos") - F.min("_pos") + k).alias("span_tokens"),
                 F.count("*").alias("n_dup_grams"))
            .select(id_col, "span_start",
                    F.col("span_tokens").cast("long"),
                    F.col("n_dup_grams").cast("long")))


def decontaminate_spans(train: DataFrame, benchmark: DataFrame,
                        k: int = 8, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """SURGICAL decontamination: cut only the benchmark-overlapping
    spans out of training documents instead of dropping whole docs
    (`decontaminate`'s policy) — the FLAN-style sequence-removal
    recipe, preserving the rest of an otherwise-good document.  Every
    input column is preserved, ``text_col`` rewritten in token space,
    plus ``n_removed_tokens`` (0 and byte-identical text for untouched
    docs).  Cost: one corpus gram pass + a broadcast semi-join against
    the benchmark gram set + the shared span-cut join."""
    spans = contaminated_spans(train, benchmark, k=k,
                               text_col=text_col, id_col=id_col)
    return _cut_spans(train, spans, text_col, id_col)


# ---------------------------------------------------------------------------
# Bloom-filter seen-sets: the crawl-frontier / cross-crawl membership
# structure (Heritrix's already-seen URL set; CCNet-style "dedup this
# month's crawl against last month's" without re-scanning it).
# ---------------------------------------------------------------------------

def bloom_positions(col: Column, num_bits: int = 1 << 20,
                    num_hashes: int = 4) -> Column:
    """The ``num_hashes`` Bloom bit positions of a value, as an array
    column: position i = `seeded_bucket`(col, i, num_bits), so every
    position is independently uniform and the DuckDB oracle
    reproduces it bit-for-bit.  Shared by build and probe; a
    build/probe parameter mismatch silently probes a different
    filter, so callers pass the same (num_bits, num_hashes) to
    both."""
    return F.array(*[seeded_bucket(col, i, num_bits)
                     for i in range(int(num_hashes))])


def build_bloom(df: DataFrame, col: str = "url",
                num_bits: int = 1 << 20,
                num_hashes: int = 4) -> DataFrame:
    """Build a Bloom filter over a column as a SPARSE position set:
    one ``pos`` row per DISTINCT set bit (≤ min(num_hashes·n,
    num_bits) rows regardless of input size — the fixed-capacity
    model shape every broadcast path here relies on).  NULLs are
    skipped (a NULL key is never "seen").

    Sparse rows instead of packed words keep the probe side pure
    equi-join arithmetic (no bigint bit twiddling to keep portable
    across engines) and cost 8 bytes per SET bit: at the classic 1%
    false-positive sizing (~9.6 bits/key, ~44% of them set) that is
    ~4.2 bytes/key after distinct — a 100M-key filter broadcasts at
    ~420 MB worth of longs, and beyond that scale the probe flips to
    a shuffled equi-join on ``pos`` (pass ``broadcast=False`` to
    :func:`bloom_contains`) with the SAME stored filter.

    Distributed shape: one projection + explode + DISTINCT — a single
    map-side-combined shuffle on the position key; the input is never
    collected."""
    return (df.filter(F.col(col).isNotNull())
            .select(F.explode(bloom_positions(
                F.col(col), num_bits, num_hashes)).alias("pos"))
            .distinct())


def bloom_contains(df: DataFrame, col: str, bloom: DataFrame,
                   num_bits: int = 1 << 20, num_hashes: int = 4,
                   flag_col: str = "maybe_seen",
                   broadcast: bool = True) -> DataFrame:
    """Probe a Bloom filter built by :func:`build_bloom`: adds boolean
    ``flag_col`` — True iff ALL ``num_hashes`` positions of the value
    are present (the standard Bloom contract: false positives at the
    sized rate, NEVER false negatives; NULL keys probe False).

    Broadcast path (default): ``num_hashes`` broadcast LEFT joins, one
    per position column — the corpus side never shuffles and never
    explodes, so the probe composes with scan-stage pushdowns.  For
    filters past broadcast size, ``broadcast=False`` explodes the
    probe keys and equi-joins on ``pos`` (one corpus-keyed shuffle,
    arbitrarily large filters)."""
    k = int(num_hashes)
    pos = bloom_positions(F.col(col), num_bits, k)
    # a filter frame can carry duplicate positions (write_bloom
    # appends don't dedup across batches); the broadcast equi-joins
    # would then MULTIPLY matching probe rows — dedup here
    bloom = bloom.select("pos").distinct()
    if broadcast:
        out = df.withColumn("_bp", pos)
        flag = F.col(col).isNotNull()
        for i in range(k):
            b = F.broadcast(bloom.select(
                F.col("pos").alias(f"_seen{i}")))
            out = out.join(
                b, F.element_at(F.col("_bp"), i + 1) == F.col(f"_seen{i}"),
                "left")
            flag = flag & F.col(f"_seen{i}").isNotNull()
        return (out.withColumn(flag_col, flag)
                .drop("_bp", *[f"_seen{i}" for i in range(k)]))
    probe = (df.select(F.col(col).alias("_k")).distinct()
             .select("_k", F.posexplode(
                 bloom_positions(F.col("_k"), num_bits, k))
                 .alias("_i", "pos")))
    hits = (probe.join(bloom, "pos", "left_semi")
            .groupBy("_k").agg(F.count("*").alias("_nhit"))
            .filter(F.col("_nhit") == k)
            .select("_k", F.lit(True).alias(flag_col)))
    return (df.join(hits, df[col] == hits["_k"], "left")
            .withColumn(flag_col,
                        F.coalesce(F.col(flag_col), F.lit(False)))
            .drop("_k"))


def dedup_against_bloom(df: DataFrame, col: str, bloom: DataFrame,
                        num_bits: int = 1 << 20,
                        num_hashes: int = 4,
                        broadcast: bool = True) -> DataFrame:
    """Drop rows whose key is (probably) already in the filter — the
    cross-crawl gate: keeps exactly the rows :func:`bloom_contains`
    flags False.  False positives drop NEW keys at the sized rate
    (the accepted Bloom trade: at 10 bits/key that is ~1% of novel
    URLs skipped, zero duplicates re-ingested); exact incremental
    dedup with no loss is `write_exact_index`/`dedup_exact_against_index`."""
    flagged = bloom_contains(df, col, bloom, num_bits, num_hashes,
                             flag_col="_bloom_seen",
                             broadcast=broadcast)
    return flagged.filter(~F.col("_bloom_seen")).drop("_bloom_seen")


def write_bloom(df: DataFrame, path: str, col: str = "url",
                num_bits: int = 1 << 20, num_hashes: int = 4,
                append: bool = False) -> None:
    """Persist a Bloom filter: the sparse position set as parquet
    plus a ``_bloom.json`` sidecar pinning (num_bits, num_hashes) —
    the parameters ARE the filter's identity, so the stored form
    carries them instead of trusting call sites to repeat them
    (`load_ivf_centroids`'s sidecar convention).  ``append=True``
    adds new keys' positions to an existing filter (position-set
    union IS Bloom insertion — duplicates are absorbed by the probe's
    equi-join, so appends are idempotent and crash-safe the same way
    the HLL register appends are); the stored parameters are
    validated and cannot change."""
    import json

    from ..sources.fs import resolve_fs

    base = path.rstrip("/")
    if append:
        stored_bits, stored_hashes = _bloom_params(base)
        if (stored_bits, stored_hashes) != (int(num_bits),
                                            int(num_hashes)):
            raise ValueError(
                f"stored bloom at {base!r} has (num_bits, num_hashes)"
                f"=({stored_bits}, {stored_hashes}); append requested "
                f"({num_bits}, {num_hashes}) — parameters are the "
                "filter's identity and cannot change")
    build_bloom(df, col, num_bits, num_hashes).write \
        .mode("append" if append else "overwrite") \
        .parquet(base + "/positions")
    if not append:
        fsys, p = resolve_fs(base + "/_bloom.json")
        with fsys.open_output_stream(p) as out:
            out.write(json.dumps({
                "num_bits": int(num_bits),
                "num_hashes": int(num_hashes)}).encode())


def _bloom_params(base: str) -> tuple[int, int]:
    import json

    from pyarrow import fs as pafs

    from ..sources.fs import resolve_fs

    fsys, p = resolve_fs(base.rstrip("/") + "/_bloom.json")
    info = fsys.get_file_info(p)
    if info.type == pafs.FileType.NotFound:
        raise ValueError(f"no _bloom.json sidecar at {base!r} — not "
                         "a write_bloom dataset")
    with fsys.open_input_stream(p) as f:
        meta = json.loads(f.read().decode())
    return int(meta["num_bits"]), int(meta["num_hashes"])


def bloom_contains_stored(df: DataFrame, col: str, path: str,
                          flag_col: str = "maybe_seen",
                          broadcast: bool = True) -> DataFrame:
    """Probe a `write_bloom` dataset: parameters load from the
    sidecar (no way to probe with mismatched sizing), positions read
    from parquet, then `bloom_contains`."""
    spark = df.sparkSession
    base = path.rstrip("/")
    num_bits, num_hashes = _bloom_params(base)
    bloom = spark.read.parquet(base + "/positions")
    return bloom_contains(df, col, bloom, num_bits, num_hashes,
                          flag_col, broadcast)


def semantic_contamination(corpus: DataFrame, benchmark: DataFrame,
                           id_col: str = "vec_id",
                           bench_id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           bench_vec_col: str | None = None,
                           threshold: float = 0.9, n_bits: int = 32,
                           bands: int = 4, nnz: int = 8,
                           seed: int = 42, dim: int | None = None,
                           broadcast: bool = True) -> DataFrame:
    """SEMANTIC decontamination — the embedding complement of
    `contamination_report`: exact k-shingle matching misses
    PARAPHRASED benchmark leakage, so this flags training vectors
    within cosine ``threshold`` of any benchmark vector, via the
    module's seeded sign-LSH applied CROSS-FRAME (both sides banded
    with the SAME deterministic hyperplanes, so agreeing bands mean
    likely-high cosine).  Returns (``id_col``, ``bench_id``, cos)
    for every candidate pair at cos >= threshold.

    100-TB shape (``broadcast=True``, the benchmark-sized default):
    the benchmark's band frame AND its vectors broadcast, so the
    corpus is never shuffled — candidates come from a broadcast hash
    join on (band, signature), and the exact-cosine rejoin
    broadcasts the (candidate × benchmark-vector) frame back onto
    the corpus scan.  ``broadcast=False`` falls back to shuffled
    equi-joins for benchmark sets past broadcast size.  Recall is
    the standard LSH tradeoff (see `embedding_neardup_pairs`);
    misses need more/narrower bands."""
    bvec = bench_vec_col or vec_col
    if dim is None:
        row = corpus.select(F.size(F.col(vec_col))).first()
        if row is None:  # empty corpus: nothing can be contaminated
            return (corpus.select(F.col(id_col)).limit(0)
                    .crossJoin(benchmark.select(
                        F.col(bench_id_col).alias("bench_id"))
                        .limit(0))
                    .withColumn("cos", F.lit(0.0)))
        dim = row[0]
    planes = signlsh_planes(dim, n_bits, nnz, seed)
    width = n_bits // bands

    def banded(df, idc, vc, out_id):
        bits = [F.expr(signlsh_bit_sql(
            p, lambda i: f"element_at({vc}, {i})")) for p in planes]
        keys = [F.struct(F.lit(b).alias("band"),
                         F.concat(*bits[b * width:(b + 1) * width])
                         .alias("bsig"))
                for b in range(bands)]
        return df.select(F.col(idc).alias(out_id),
                         F.explode(F.array(*keys)).alias("bk"))

    bb = banded(benchmark, bench_id_col, bvec, "bench_id")
    if broadcast:
        bb = F.broadcast(bb)
    cand = (banded(corpus, id_col, vec_col, "_cid")
            .join(bb, "bk")
            .select("_cid", "bench_id").distinct())
    bv = benchmark.select(F.col(bench_id_col).alias("bench_id"),
                          F.col(bvec).alias("_bv"))
    if broadcast:
        bv = F.broadcast(bv)
    # candv is bounded by the CANDIDATE count, not the benchmark: on
    # a heavily contaminated corpus it can grow corpus-like — pass
    # broadcast=False there (every broadcast below then degrades to a
    # shuffled equi-join)
    candv = cand.join(bv, "bench_id")
    if broadcast:
        candv = F.broadcast(candv)
    cv = corpus.select(F.col(id_col).alias("_cid"),
                       F.col(vec_col).alias("_cv"))
    from .similarity import cosine

    return (cv.join(candv, "_cid")
            .select(F.col("_cid").alias(id_col), "bench_id",
                    cosine(F.col("_cv"), F.col("_bv")).alias("cos"))
            .filter(F.col("cos") >= threshold))


def semantic_decontaminate(corpus: DataFrame, benchmark: DataFrame,
                           **kwargs) -> DataFrame:
    """Drop corpus rows semantically contaminated by the benchmark:
    `semantic_contamination` then a left-anti join on the flagged
    ids.  Keyword arguments pass through.  The flagged set is bounded
    by the CORPUS (every contaminated row contributes an id), so it
    only broadcasts under the same ``broadcast=True`` assumption as
    the rest of the pipeline — contamination is benchmark-scale rare;
    pass ``broadcast=False`` for heavily contaminated corpora and the
    anti-join shuffles instead."""
    id_col = kwargs.get("id_col", "vec_id")
    flagged = (semantic_contamination(corpus, benchmark, **kwargs)
               .select(F.col(id_col)).distinct())
    if kwargs.get("broadcast", True):
        flagged = F.broadcast(flagged)
    return corpus.join(flagged, id_col, "left_anti")


def soft_dedup_weights(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", mode: str = "exact",
                       weight_col: str = "dedup_weight",
                       num_hashes: int = 8, bands: int = 4,
                       k: int = 3,
                       materialize: str = "none") -> DataFrame:
    """SoftDeDup — down-WEIGHT duplicates instead of dropping them
    (the published alternative to hard dedup: keep every copy but
    give a cluster of n near-identical documents total sampling mass
    1, so `sampling.weighted_sample` / `temperature_mix` see the
    deduplicated distribution while rare formatting variants survive).
    Adds ``weight_col`` = round(1/|cluster|, 12).

    ``mode='exact'``: clusters are identical texts (md5 key) — one
    group count + one equi-join back, both on the text hash (spill-
    safe; a window count would buffer a mega-cluster's rows in one
    task).  NULL texts weigh 1.0 (each NULL is its own document).
    ``mode='near'``: clusters come from `lsh_dedup`'s (id, rep_id)
    mapping under the given MinHash parameters; weight = 1/|rep
    cluster|, rows the mapping misses (NULL/empty texts) weigh 1.0."""
    if mode == "exact":
        key = F.md5(F.col(text_col))
        counts = (df.groupBy(key.alias("_h"))
                  .agg(F.count("*").alias("_n")))
        out = df.join(counts, key == counts["_h"], "left")
        return (out.withColumn(
            weight_col,
            F.round(F.when(F.col("_h").isNotNull(),
                           F.lit(1.0) / F.col("_n"))
                    .otherwise(F.lit(1.0)), 12))
            .drop("_h", "_n"))
    if mode != "near":
        raise ValueError(f"mode must be 'exact' or 'near', got "
                         f"{mode!r}")
    m = lsh_dedup(df, text_col=text_col, id_col=id_col,
                  num_hashes=num_hashes, bands=bands, k=k,
                  materialize=materialize)
    cs = m.groupBy("rep_id").agg(F.count("*").alias("_n"))
    w = (m.join(cs, "rep_id")
         .select(F.col(id_col),
                 F.round(F.lit(1.0) / F.col("_n"), 12)
                 .alias(weight_col)))
    return (df.join(w, id_col, "left")
            .withColumn(weight_col,
                        F.coalesce(F.col(weight_col), F.lit(1.0))))
