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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import tokens


def portable_hash(col: Column) -> Column:
    """60-bit deterministic hash identical in Spark and DuckDB:
    first 15 hex chars of md5, as bigint."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


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
    O(n^2) when composed further.  Pipelines should stage tokens first
    (see `hashed_shingle_table`)."""
    return shingles_of_tokens(tokens(text), k)


def _seed_const(s: int) -> int:
    """Fixed 60-bit per-seed constant (md5 of 'seed<s>'), reproducible in
    the DuckDB oracle."""
    import hashlib

    return int(hashlib.md5(f"seed{s}".encode()).hexdigest()[:15], 16)


def hashed_shingle_table(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """(id, _shh: array<long>) — portable hash of each k-shingle.

    The TOKEN stage is persisted, not just projected: chained selects are
    merged by Catalyst's CollapseProject *before* caching, which would
    inline the regex split into every per-element lambda access (quadratic
    blowup, measured ~50x at sf0.01).  With the token array materialized,
    downstream plans substitute the InMemoryRelation and every
    element_at() is O(1).  The hashed output is persisted too so the
    md5-per-shingle pass runs once, not once per MinHash seed.  At 100 TB
    both stages are parquet checkpoints instead of caches."""
    toks = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks")).persist()
    hashed = toks.select(
        F.col(id_col),
        F.transform(shingles_of_tokens(F.col("_toks"), k),
                    lambda s: portable_hash(s)).alias("_shh"),
    )
    return hashed.persist()


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", num_hashes: int = 8,
                       k: int = 3) -> DataFrame:
    """MinHash signature: shingles hashed once (md5-based portable hash),
    then seed variants derived by XOR with fixed constants — one md5 pass
    total instead of one per seed."""
    hashed = hashed_shingle_table(df, text_col, id_col, k)
    cols = [
        F.array_min(
            F.transform(F.col("_shh"), lambda h: h.bitwiseXOR(F.lit(_seed_const(s))))
        ).alias(f"mh{s}")
        for s in range(num_hashes)
    ]
    return hashed.select(F.col(id_col), *cols)


def lsh_candidate_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", num_hashes: int = 8,
                        bands: int = 4, k: int = 3) -> DataFrame:
    """LSH banding: docs sharing any band of the MinHash signature become
    candidate near-dup pairs.  Output: (id_a, id_b) with id_a < id_b.

    Plan shape at scale: signatures (narrow) → explode to (band_key, id)
    → self equi-join on band_key → distinct pairs.  The join is a plain
    shuffled hash join on a high-cardinality key."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, num_hashes, k).persist()
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh{i}").cast("string")
                 for i in range(b * rows_per_band, (b + 1) * rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"),
                     F.md5(F.concat_ws("|", *parts)).alias("bh"))
        )
    banded = sig.select(F.col(id_col), F.explode(F.array(*band_cols)).alias("bk"))
    a = banded.select(F.col(id_col).alias("id_a"), F.col("bk"))
    b_ = banded.select(F.col(id_col).alias("id_b"), F.col("bk"))
    return (
        a.join(b_, on="bk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def ngram_jaccard_pairs(df: DataFrame, pairs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 3,
                        threshold: float = 0.0) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs: broadcast-join
    shingle sets onto the (small) candidate pair list."""
    toks = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks")).persist()
    sh = toks.select(
        F.col(id_col), F.array_distinct(shingles_of_tokens(F.col("_toks"), k)).alias("sh")
    )
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
    packed into a ``bits``-wide integer.  Pure SQL (aggregate over the
    token array with a packed running sum per bit)."""
    toks = F.array_distinct(tokens(text))
    hashed = F.transform(toks, lambda t: portable_hash(t))
    parts = []
    for b in range(bits):
        votes = F.aggregate(
            hashed,
            F.lit(0).cast("long"),
            lambda acc, h: acc + F.when(h.bitwiseAND(F.lit(1 << b)) != 0, 1).otherwise(-1),
        )
        parts.append(F.when(votes > 0, F.lit(1 << b)).otherwise(0).cast("long"))
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out


def embedding_neardup_pairs(df: DataFrame, id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            threshold: float = 0.95,
                            bucket_dims: int = 4) -> DataFrame:
    """Embedding cosine near-dup via sign-LSH bucketing: vectors agreeing
    on the signs of their first ``bucket_dims`` dimensions land in one
    bucket; pairs are compared only within buckets (equi-join, shuffle-
    partitionable), then filtered on exact cosine similarity.

    Note sign-LSH can miss pairs straddling a sign boundary — standard
    recall/cost tradeoff; raise bucket_dims for cost, lower for recall."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (DoubleType, LongType, StructField,
                                   StructType)

    sign_key = F.concat_ws(
        "",
        *[F.when(F.element_at(F.col(vec_col), i + 1) >= 0, "1").otherwise("0")
          for i in range(bucket_dims)],
    )
    v = df.select(F.col(id_col), F.col(vec_col), sign_key.alias("bucket"))
    id_type = dict(df.dtypes).get(id_col, "bigint")
    out_schema = StructType([
        StructField("id_a", LongType() if "int" in id_type else df.schema[id_col].dataType),
        StructField("id_b", LongType() if "int" in id_type else df.schema[id_col].dataType),
        StructField("cos", DoubleType()),
    ])

    def bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        # all-pairs cosine inside one bucket as a single BLAS matmul —
        # the quadratic inner loop stays vectorized instead of running
        # per pair through interpreted array expressions
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        M = np.asarray([np.asarray(v_, dtype=np.float64)
                        for v_ in pdf[vec_col].to_numpy()[order]])
        norms = np.linalg.norm(M, axis=1)
        norms[norms == 0] = 1.0
        Mn = M / norms[:, None]
        sim = Mn @ Mn.T
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = sim[iu, ju] >= threshold
        return pd.DataFrame({
            "id_a": ids[iu[keep]],
            "id_b": ids[ju[keep]],
            "cos": sim[iu[keep], ju[keep]],
        })

    return v.groupBy("bucket").applyInPandas(bucket_pairs, out_schema)
