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


MERGE_SCHEMA = ("rank int, left string, right string, merged string, "
                "pair_count long")


def _classic_bpe(word_counts: list[tuple[str, int]],
                 num_merges: int) -> list[tuple]:
    """Classic greedy BPE over a (word, count) table in plain Python —
    the driver-side trainer behind ``train_bpe(collect_vocab=True)``.
    Same trajectory as the distributed loop: pair counts are exact
    integers, ties break on (left, right) ascending."""
    vocab = [(list(w) + [END_OF_WORD], c) for w, c in word_counts]
    merges = []
    for rank in range(1, int(num_merges) + 1):
        pc: dict = {}
        for syms, cnt in vocab:
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + cnt
        if not pc:
            break
        (left, right), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, left, right, left + right, cnt))
        nxt = []
        for syms, c in vocab:
            out, i = [], 0
            while i < len(syms):
                if (i < len(syms) - 1 and syms[i] == left
                        and syms[i + 1] == right):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt.append((out, c))
        vocab = nxt
    return merges


def train_bpe(df: DataFrame, text_col: str = "text",
              num_merges: int = 16,
              collect_vocab: bool = False) -> DataFrame:
    """Learn ``num_merges`` BPE merges from a corpus.  Returns the
    ordered merge table: (rank, left, right, merged, pair_count) —
    rank 1 is the first merge learned.  May return FEWER rows than
    requested when the vocabulary exhausts (every word collapsed to
    one symbol); never errors on small corpora.

    Words come from the module tokenizer (`textstats.tokens` —
    lowercased, punctuation boundaries); ties in pair frequency break
    on (left, right) ascending, so the trajectory is a pure function
    of the corpus and the oracle can replay it.

    **Scale note — pick the mode by vocabulary size, not corpus
    size.**  Either way the corpus is touched ONCE (the word-count
    aggregation, map-side combined); what differs is where the merge
    loop runs:

    - ``collect_vocab=False`` (default): each merge is one Spark job
      over the vocabulary frame.  Exact and fully distributed, but
      32k merges = 32k sequential jobs — minutes of pure scheduling
      overhead regardless of data size.  Right for small/test models.
    - ``collect_vocab=True``: the word-count table — small BY
      CONSTRUCTION (distinct words, not documents; real corpora top
      out at tens of millions of types) — is collected and the merge
      loop runs driver-side in Python (:func:`_classic_bpe`),
      identical trajectory.  This is the honest 100-TB shape: one
      distributed pass to count words, one node to learn merges —
      exactly how production BPE trainers consume precomputed counts.
    """
    wc = (df.select(F.explode(
              F.filter(tokens(F.col(text_col)),
                       lambda x: x != F.lit(""))).alias("word"))
          .groupBy("word").agg(F.count("*").alias("cnt")))
    if collect_vocab:
        counts = [(r["word"], r["cnt"]) for r in wc.collect()]
        return df.sparkSession.createDataFrame(
            _classic_bpe(counts, num_merges), MERGE_SCHEMA)
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
        return df.sparkSession.createDataFrame([], MERGE_SCHEMA)
    out = bests[0]
    for b in bests[1:]:
        out = out.unionAll(b)
    return out


def bpe_encode_words(words: DataFrame, merges: DataFrame,
                     word_col: str = "word",
                     token_col: str = "bpe_tokens",
                     chunk_size: int = 128) -> DataFrame:
    """Encode a WORD frame (one word per row) with a trained merge
    table of ANY size: adds ``token_col`` (array<string> of subword
    symbols).  The replace chain is applied in chunks of
    ``chunk_size`` merges with a ``localCheckpoint`` barrier between
    chunks, so the Catalyst expression tree is never deeper than
    ``chunk_size`` replaces — a 32k-merge vocabulary runs as ~250
    shallow map-only passes over the word frame instead of one 32k-
    deep expression that exceeds the JVM's 64 KB codegen method limit
    and the optimizer's plan-stringification budget (both hit and
    documented in this repo at far smaller depths).  Zero shuffles:
    every pass is a projection.

    Apply this to a VOCABULARY frame (distinct words), not a corpus:
    the passes are then vocabulary-sized no matter the corpus
    (:func:`bpe_encode`'s dictionary path does exactly that)."""
    rows = sorted(merges.select("rank", "left", "right", "merged")
                  .collect(), key=lambda r: r["rank"])
    w = words.withColumn("_s", sym_string(F.col(word_col)))
    step = max(1, int(chunk_size))
    for lo in range(0, len(rows), step):
        s = F.col("_s")
        for r in rows[lo:lo + step]:
            s = F.replace(
                s, F.lit(f" {r['left']}  {r['right']} "),
                F.lit(f" {r['merged']} "))
        w = w.withColumn("_s", s).localCheckpoint()
    return w.withColumn(token_col, _symbols(F.col("_s"))).drop("_s")


def bpe_encode(df: DataFrame, merges: DataFrame,
               text_col: str = "text",
               token_col: str = "bpe_tokens",
               compile_threshold: int = 512,
               chunk_size: int = 128,
               broadcast_vocab: bool = False) -> DataFrame:
    """Tokenize a corpus with a trained merge table: adds ``token_col``
    (array<string> of subword tokens, each word terminated by the
    ``</w>``-bearing final symbol).  NULL / token-less texts encode to
    an empty array.  The merge table is COLLECTED once (bounded by
    ``num_merges`` rows — the fixed-size-model broadcast convention of
    `classifier_score` / `dsir_logweights`).  Two physical paths by
    table size:

    - ``<= compile_threshold`` merges: the chain compiles into nested
      native ``replace`` calls per word — pure codegen in the scan
      stage, no UDF, no join, no shuffle.  The right shape for small
      models, and it composes with scan pushdowns.
    - larger tables (a real tokenizer's 32k-100k merges): the
      DICTIONARY path.  The corpus's distinct-word vocabulary is
      encoded once via :func:`bpe_encode_words` (chunked, plan depth
      bounded at ``chunk_size``), then tokens join back: distinct
      texts -> posexplode words -> equi-join the (word, tokens)
      dictionary -> reassemble per text in word order -> one join
      back to the corpus on md5(text).  Corpus cost is two
      text-keyed shuffles + one word-keyed join (AQE splits the
      stopword skew; ``broadcast_vocab=True`` broadcasts the
      dictionary instead when it is known small) — and duplicate
      texts encode once.  Both paths produce IDENTICAL output; the
      threshold only picks the plan."""
    rows = sorted(merges.select("rank", "left", "right", "merged")
                  .collect(), key=lambda r: r["rank"])
    toks = F.filter(tokens(F.col(text_col)), lambda x: x != F.lit(""))

    if len(rows) <= int(compile_threshold):
        def encode_word(wrd):
            s = sym_string(wrd)
            for r in rows:
                s = F.replace(
                    s, F.lit(f" {r['left']}  {r['right']} "),
                    F.lit(f" {r['merged']} "))
            return _symbols(s)

        return df.withColumn(
            token_col,
            F.coalesce(F.flatten(F.transform(toks, encode_word)),
                       F.array().cast("array<string>")))

    mtab = df.sparkSession.createDataFrame(
        [(r["rank"], r["left"], r["right"], r["merged"], 0)
         for r in rows], MERGE_SCHEMA)
    texts = (df.select(F.col(text_col).alias("_t"))
             .filter(F.col("_t").isNotNull()).distinct()
             .select(F.md5(F.col("_t")).alias("_h"),
                     F.filter(tokens(F.col("_t")),
                              lambda x: x != F.lit("")).alias("_ws")))
    vocab = bpe_encode_words(
        texts.select(F.explode("_ws").alias("word")).distinct(),
        mtab, word_col="word", token_col="_wt", chunk_size=chunk_size)
    if broadcast_vocab:
        vocab = F.broadcast(vocab)
    per_text = (texts.select("_h", F.posexplode("_ws")
                             .alias("_pos", "word"))
                .join(vocab, "word")
                .groupBy("_h")
                .agg(F.flatten(F.array_sort(F.collect_list(
                    F.struct("_pos", "_wt"))).getField("_wt"))
                    .alias("_tt")))
    out = (df.join(per_text,
                   F.md5(F.col(text_col)) == per_text["_h"], "left")
           .drop("_h"))
    return out.withColumn(
        token_col, F.coalesce(F.col("_tt"),
                              F.array().cast("array<string>"))) \
        .drop("_tt")


def bpe_token_count(df: DataFrame, merges: DataFrame,
                    text_col: str = "text",
                    count_col: str = "n_bpe_tokens",
                    **encode_opts) -> DataFrame:
    """Real-tokenizer token counts per document (the number that
    drives shard packing and mixture budgets): ``bpe_encode`` then
    array size — zero-shuffle on the compiled path; ``encode_opts``
    (compile_threshold / chunk_size / broadcast_vocab) pass through
    to :func:`bpe_encode` for real-vocabulary models."""
    enc = bpe_encode(df, merges, text_col=text_col, token_col="_bpe",
                     **encode_opts)
    return (enc.withColumn(count_col,
                           F.size(F.col("_bpe")).cast("long"))
            .drop("_bpe"))
