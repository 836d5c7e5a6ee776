"""Byte-pair-encoding tokenizer TRAINING and ENCODING as DataFrame
operators — the tokenizer stage of an LLM data pipeline (Sennrich et
al. 2016; the GPT-2/SentencePiece recipe).  `textstats.token_count`
estimates with whitespace; this module learns real subword merges and
counts real BPE tokens.

Design for 100 TB — the published BPE-at-scale shape:
- ONE corpus pass builds the distinct-word count table (a map-side-
  combined aggregation); every training iteration thereafter touches
  only that vocabulary-sized frame, never the corpus again.
- Each merge step is one pair-count aggregation (shuffle keyed on the
  pair, bounded by Σ word lengths over the VOCABULARY) + a 1-row
  TakeOrdered + a broadcast join applying the merge; the word frame is
  ``localCheckpoint``-materialized per step so the plan does not
  deepen with ``num_merges``.
- No Python in the loop: the merge APPLY is a native string
  ``replace``.  Symbol strings wrap every symbol in its own spaces
  (double-space separators): ``'low' -> ' l  o  w  </w> '``.  A merge
  (l, r) is then ``replace(s, ' l  r ', ' lr ')`` — and because each
  replacement carries its own boundary spaces, string replace's
  left-to-right NON-OVERLAPPING scan reproduces greedy BPE exactly
  (``'aaaa'`` + merge (a,a) -> ``'aa aa'``), identically in Spark and
  DuckDB, so the SQL oracle unrolls the whole training trajectory.
  The naive single-space form breaks here: the shared separator space
  is consumed by the first match and adjacent occurrences stop
  matching.

No counterpart in the reference (a geospatial engine).  Pair counts
are integers — the trajectory is exact, no quantization needed
(contrast `graph.pagerank`'s 12-decimal rounds).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import tokens

END_OF_WORD = "</w>"


def sym_string(word: Column) -> Column:
    """A word as its initial BPE symbol string: every character plus
    the ``</w>`` terminal, each wrapped in its own spaces —
    ``'ab' -> ' a  b  </w> '``.  Char split is a ``substr`` per
    position inside ``transform`` — O(len²) byte seeks, fine for
    WORDS (this is never applied to document-length strings; the
    `lang_id_model` lesson)."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: word.substr(i, F.lit(1)))
    return F.concat(F.lit(" "), F.array_join(chars, "  "),
                    F.lit(f"  {END_OF_WORD} "))


def _symbols(s: Column) -> Column:
    """Symbol array of a symbol string (split on the double-space
    separator after trimming the boundary spaces)."""
    return F.split(F.trim(s), "  ")


def train_bpe(df: DataFrame, text_col: str = "text",
              num_merges: int = 16) -> DataFrame:
    """Learn ``num_merges`` BPE merges from a corpus.  Returns the
    ordered merge table: (rank, left, right, merged, pair_count) —
    rank 1 is the first merge learned.  May return FEWER rows than
    requested when the vocabulary exhausts (every word collapsed to
    one symbol); never errors on small corpora.

    Words come from the module tokenizer (`textstats.tokens` —
    lowercased, punctuation boundaries); ties in pair frequency break
    on (left, right) ascending, so the trajectory is a pure function
    of the corpus and the oracle can replay it.

    Nothing is collected: the winning pair of each step stays a 1-row
    DataFrame broadcast into the merge apply, and the final table is
    their union."""
    wc = (df.select(F.explode(
              F.filter(tokens(F.col(text_col)),
                       lambda x: x != F.lit(""))).alias("word"))
          .groupBy("word").agg(F.count("*").alias("cnt")))
    w = (wc.select(sym_string(F.col("word")).alias("s"), "cnt")
         .localCheckpoint())
    bests = []
    for rank in range(1, int(num_merges) + 1):
        syms = _symbols(F.col("s"))
        # guard: a fully-collapsed word (one symbol) has no pairs —
        # and Spark's sequence(1, 0) would DESCEND, not empty
        pairs = F.when(
            F.size(syms) > 1,
            F.transform(
                F.sequence(F.lit(1), F.size(syms) - 1),
                lambda j: F.struct(
                    F.element_at(syms, j).alias("left"),
                    F.element_at(syms, (j + F.lit(1)).cast("int"))
                    .alias("right")))
        ).otherwise(F.array().cast(
            "array<struct<left:string,right:string>>"))
        best = (w.select("cnt", F.explode(pairs).alias("p"))
                .groupBy(F.col("p.left").alias("left"),
                         F.col("p.right").alias("right"))
                .agg(F.sum("cnt").alias("pair_count"))
                .orderBy(F.col("pair_count").desc(), "left", "right")
                .limit(1)
                .select(F.lit(rank).alias("rank"), "left", "right",
                        F.concat("left", "right").alias("merged"),
                        "pair_count")
                .localCheckpoint())
        bests.append(best)
        # apply the merge: left join on a dummy key so an EXHAUSTED
        # pair frame (empty best) leaves words untouched instead of
        # annihilating them through a cross join
        b = F.broadcast(best.select(
            F.lit(1).alias("_one"),
            F.concat(F.lit(" "), "left", F.lit("  "), "right",
                     F.lit(" ")).alias("_pat"),
            F.concat(F.lit(" "), "merged", F.lit(" ")).alias("_rep")))
        w = (w.withColumn("_one", F.lit(1))
             .join(b, "_one", "left")
             .select(F.when(F.col("_pat").isNotNull(),
                            F.replace(F.col("s"), F.col("_pat"),
                                      F.col("_rep")))
                     .otherwise(F.col("s")).alias("s"), "cnt")
             .localCheckpoint())
    if not bests:  # num_merges=0: an empty merge table, not a crash
        return df.sparkSession.createDataFrame(
            [], "rank int, left string, right string, merged string, "
                "pair_count long")
    out = bests[0]
    for b in bests[1:]:
        out = out.unionAll(b)
    return out


def bpe_encode(df: DataFrame, merges: DataFrame,
               text_col: str = "text",
               token_col: str = "bpe_tokens") -> DataFrame:
    """Tokenize a corpus with a trained merge table: adds ``token_col``
    (array<string> of subword tokens, each word terminated by the
    ``</w>``-bearing final symbol).  NULL / token-less texts encode to
    an empty array.

    The merge table is COLLECTED once (bounded by ``num_merges`` rows
    — the fixed-size-model broadcast convention of `classifier_score`
    / `dsir_logweights`) and compiled into a chain of native
    ``replace`` calls per word: encoding is pure codegen in the scan
    stage, no UDF, no join, no shuffle."""
    rows = sorted(merges.select("rank", "left", "right", "merged")
                  .collect(), key=lambda r: r["rank"])

    def encode_word(wrd):
        s = sym_string(wrd)
        for r in rows:
            s = F.replace(
                s, F.lit(f" {r['left']}  {r['right']} "),
                F.lit(f" {r['merged']} "))
        return _symbols(s)

    toks = F.filter(tokens(F.col(text_col)), lambda x: x != F.lit(""))
    return df.withColumn(
        token_col,
        F.coalesce(F.flatten(F.transform(toks, encode_word)),
                   F.array().cast("array<string>")))


def bpe_token_count(df: DataFrame, merges: DataFrame,
                    text_col: str = "text",
                    count_col: str = "n_bpe_tokens") -> DataFrame:
    """Real-tokenizer token counts per document (the number that
    drives shard packing and mixture budgets): ``bpe_encode`` then
    array size, still zero-shuffle."""
    enc = bpe_encode(df, merges, text_col=text_col, token_col="_bpe")
    return (enc.withColumn(count_col,
                           F.size(F.col("_bpe")).cast("long"))
            .drop("_bpe"))
