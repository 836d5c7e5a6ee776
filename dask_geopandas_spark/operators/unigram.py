"""Unigram-LM (SentencePiece-style) tokenizer TRAINING and ENCODING
as DataFrame operators — the tokenizer family's second member (Kudo
2018; the T5/LLaMA recipe) next to `bpe.train_bpe`.  Where BPE builds
tokens bottom-up by merging pairs, the unigram model starts from a
large seeded piece inventory and fits piece probabilities by EM,
segmenting each word with Viterbi under the current model.

Deterministic spec (the SQL oracle replays every step):

- **Seed**: every substring (length <= ``max_piece_len``) of the
  distinct-word vocabulary, weighted by occurrence x word count;
  ``logp = round(ln(cnt) - ln(total), 12)``.
- **Hard-EM** per step: E = Viterbi-segment each distinct word under
  the current model (DP scores quantize ``round(score + logp, 12)``
  per extension; ties prefer the SMALLER start — the longest-match
  convention); M = piece counts from the Viterbi paths weighted by
  word count.  Multi-char pieces off every path drop (hard EM);
  single-char pieces NEVER drop and floor at count 1 (the
  character-coverage guarantee, SentencePiece's
  ``character_coverage=1.0``).
- **Prune**: multi-char pieces ranked ``(count desc, piece asc)``,
  top ``vocab_size - n_chars`` kept (the count-ranked simplification
  of SentencePiece's loss-based prune — deterministic and
  oracle-replayable), then one renormalization.

Design for 100 TB — the `bpe.train_bpe` shape:
- ONE corpus pass builds the distinct-word count table; every later
  step touches only vocabulary-sized frames.
- The E-step is two model-sized operations: substring candidates
  equi-join the BROADCAST piece table, then the Viterbi DP runs as a
  single pure-codegen projection (`F.aggregate` over word positions —
  no UDF, no shuffle, no driver loop over rows).
- Encoding a corpus uses the dictionary path: distinct words are
  segmented once and token arrays join back on word + md5(text)
  (`bpe.bpe_encode`'s plan), so duplicate texts encode once.

No counterpart in the reference (a geospatial engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from ..barrier import plan_barrier

from .textstats import tokens

UNK = "<unk>"

#: Viterbi scores live in (-inf, 0]; anything at or below this level
#: can only be the unreachable-prefix sentinel (-1e18 plus at most
#: ``max_word_len`` logp additions, each > -1e3 for any real model).
_UNREACHABLE = -1e17

MODEL_SCHEMA = "piece string, cnt long, logp double"


def _substring_candidates(word, max_piece_len: int):
    """array<struct<j0:int, i:int, piece:string>> of every substring
    of ``word`` with length <= ``max_piece_len``: ``j0`` is the
    0-based start, ``i`` the exclusive end — the DP edge (j0 -> i)."""
    n = F.length(word)
    return F.flatten(F.transform(
        F.sequence(F.lit(1), n),  # 1-based start position
        lambda j: F.transform(
            F.sequence(F.lit(1),
                       F.least(F.lit(int(max_piece_len)), n - j + 1)),
            lambda ln: F.struct(
                (j - 1).cast("int").alias("j0"),
                (j - 1 + ln).cast("int").alias("i"),
                word.substr(j, ln).alias("piece")))))


def viterbi_segment_words(words: DataFrame, model: DataFrame,
                          word_col: str = "word",
                          piece_col: str = "unigram_pieces",
                          max_piece_len: int | None = None,
                          unk_token: str = UNK,
                          max_dp_len: int = 256) -> DataFrame:
    """Segment a WORD frame (one distinct word per row) under a
    unigram model (piece, logp): adds ``piece_col``
    (array<string>).  Words the model cannot cover (a character never
    seen in training) segment to ``[unk_token]``, as do words longer
    than ``max_dp_len`` — the DP accumulator grows O(len²) per row,
    so an unbounded no-separator mega-token (binary junk in web text)
    must not drive a quadratic codegen loop; SentencePiece caps its
    input length the same way.

    The DP: ``best[0] = 0``; ``best[i] = max over candidate pieces
    w[j:i] of round(best[j] + logp, 12)``, ties preferring the
    smaller ``j`` (longest match).  Runs as one `F.aggregate`
    projection per row — whole-stage codegen, no UDF; candidates come
    from one LEFT equi-join against the BROADCAST model (model-sized
    by the fixed-size-model convention) straight into the per-word
    ``collect_list`` aggregation: non-word columns ride through the
    group as ``first(...)`` (sound — one distinct word per row is the
    input contract), so the r16 shape's second word-keyed shuffle
    (joining the candidate lists back onto ``words``) is gone
    entirely (guide §2.4: two operations keyed the same way share one
    exchange)."""
    if max_piece_len is None:
        max_piece_len = int(model.agg(
            F.max(F.length("piece"))).head()[0] or 1)
    full = (words.filter(F.col(word_col).isNotNull()
                         & (F.length(word_col) >= 1)))
    over = full.filter(F.length(word_col) > int(max_dp_len)) \
        .withColumn(piece_col, F.array(F.lit(unk_token)))
    w = full.filter(F.length(word_col) <= int(max_dp_len))
    others = [c for c in w.columns if c != word_col]
    mdl = F.broadcast(model.select(F.col("piece").alias("_mp"),
                                   F.col("logp").alias("_logp")))
    # every length>=1 word has >=1 substring candidate, so the explode
    # drops no words; the LEFT model join keeps never-seen grams as
    # NULL rows the when() below excludes from the candidate list (an
    # all-unmatched word collects an EMPTY list -> the DP is
    # unreachable -> [unk], exactly the r16 missing-row path)
    out = (w.select(word_col, *others,
                    F.explode(_substring_candidates(
                        F.col(word_col), max_piece_len)).alias("_c"))
           .join(mdl, F.col("_c.piece") == F.col("_mp"), "left")
           .groupBy(word_col)
           .agg(*[F.first(c).alias(c) for c in others],
                F.collect_list(
                    F.when(F.col("_mp").isNotNull(), F.struct(
                        F.col("_c.j0").alias("j0"),
                        F.col("_c.i").alias("i"),
                        F.col("_logp").alias("logp"))))
                .alias("_cands"))
           .select(*w.columns, "_cands"))

    word = F.col(word_col)
    n = F.length(word)
    cl = F.col("_cands")
    # forward DP: acc[i+1] = (best score to cover w[0:i], backpointer)
    dp_init = F.array(F.struct(F.lit(0.0).alias("score"),
                               F.lit(-1).alias("bp")))

    def _dp_step(acc, i):
        ci = F.filter(cl, lambda c: c["i"] == i)
        b0 = F.struct(F.lit(-1e18).alias("score"),
                      F.lit(-1).alias("bp"))

        def _pick(b, c):
            sc = F.round(F.element_at(acc, c["j0"] + 1)["score"]
                         + c["logp"], 12)
            return (F.when((sc > b["score"])
                           | ((sc == b["score"]) & (c["j0"] < b["bp"])),
                           F.struct(sc.alias("score"),
                                    c["j0"].alias("bp")))
                    .otherwise(b))

        return F.concat(acc, F.array(F.aggregate(ci, b0, _pick)))

    bps = F.aggregate(F.sequence(F.lit(1), n), dp_init, _dp_step)

    # backtrack: at most n hops from pos=n down the backpointers
    bt_init = F.struct(n.cast("int").alias("pos"),
                       F.array().cast("array<string>").alias("parts"))

    def _bt_step(st, _):
        j = F.element_at(bps, st["pos"] + 1)["bp"]
        piece = word.substr(j + 1, st["pos"] - j)
        return (F.when(st["pos"] <= 0, st)
                .otherwise(F.struct(
                    j.alias("pos"),
                    F.concat(F.array(piece), st["parts"])
                    .alias("parts"))))

    parts = F.aggregate(F.sequence(F.lit(1), n), bt_init,
                        _bt_step)["parts"]
    reachable = (cl.isNotNull()
                 & (F.element_at(bps, n + 1)["score"]
                    > F.lit(_UNREACHABLE)))
    return (out.withColumn(
        piece_col,
        F.when(reachable, parts)
        .otherwise(F.array(F.lit(unk_token)))).drop("_cands")
        .unionByName(over))


def _renormalized(counted: DataFrame) -> DataFrame:
    """(piece, cnt) -> (piece, cnt, logp) with
    ``logp = round(ln(cnt) - ln(Σcnt), 12)``."""
    total = counted.agg(F.sum("cnt").cast("long").alias("_tot"))
    return (counted.crossJoin(F.broadcast(total))
            .select("piece", F.col("cnt").cast("long").alias("cnt"),
                    F.round(F.log(F.col("cnt").cast("double"))
                            - F.log(F.col("_tot").cast("double")),
                            12).alias("logp")))


def _word_counts(df: DataFrame, text_col: str,
                 max_word_len: int) -> DataFrame:
    """(word, cnt) over the corpus — the ONE corpus pass.  Words
    longer than ``max_word_len`` are skipped for TRAINING (the
    SentencePiece convention of skipping over-long sentences; encoding
    still handles any length)."""
    return (df.select(F.explode(
                F.filter(tokens(F.col(text_col)),
                         lambda x: x != F.lit(""))).alias("word"))
            .filter(F.length("word") <= int(max_word_len))
            .groupBy("word").agg(F.count("*").alias("cnt")))


def unigram_train(df: DataFrame, text_col: str = "text",
                  vocab_size: int = 64, em_steps: int = 2,
                  max_piece_len: int = 4,
                  max_word_len: int = 16,
                  word_counts: DataFrame | None = None) -> DataFrame:
    """Train a unigram-LM tokenizer: returns the model frame
    (piece, cnt, logp) — at most ``vocab_size`` pieces unless the
    corpus charset alone exceeds it (characters are never pruned:
    full coverage beats the size target, SentencePiece's own
    resolution).  ``em_steps=0`` returns the pruned, renormalized
    seed model.  The trajectory is a pure function of the corpus —
    every probability quantizes to 12 decimals and every tie breaks
    lexicographically — so the DuckDB oracle replays it bit-exactly
    (the `bpe.train_bpe` convention).

    ``word_counts``: optional precomputed (word, cnt) table over the
    SAME token split (``_word_counts`` minus its length filter) — the
    caller's chance to share the one corpus pass with other consumers
    (a max-word-length guard, a sibling trainer); the ``max_word_len``
    filter applies on top, so the trajectory is identical (the filter
    commutes with the per-word grouping)."""
    if word_counts is not None:
        wc = word_counts.filter(
            F.length("word") <= int(max_word_len))
    else:
        wc = _word_counts(df, text_col, max_word_len)
    wc = wc.transform(plan_barrier)
    seed = (wc.select(F.explode(_substring_candidates(
                F.col("word"), max_piece_len)).alias("_c"), "cnt")
            .groupBy(F.col("_c.piece").alias("piece"))
            .agg(F.sum("cnt").alias("cnt")))
    model = _renormalized(seed).transform(plan_barrier)
    for _ in range(int(em_steps)):
        seg = viterbi_segment_words(
            wc, model, word_col="word", piece_col="_pieces",
            max_piece_len=max_piece_len)
        vc = (seg.select(F.explode("_pieces").alias("piece"), "cnt")
              .groupBy("piece").agg(F.sum("cnt").alias("cnt")))
        # hard EM: multi-char pieces off every Viterbi path drop;
        # single chars keep full coverage with a count floor of 1
        chars = model.filter(F.length("piece") == 1).select("piece")
        counted = (vc.filter(F.length("piece") > 1)
                   .unionByName(
                       chars.join(vc, "piece", "left")
                       .select("piece",
                               F.greatest(F.coalesce(F.col("cnt"),
                                                     F.lit(0)),
                                          F.lit(1)).cast("long")
                               .alias("cnt"))))
        model = _renormalized(counted).transform(plan_barrier)
    # count-ranked prune to vocab_size (chars always kept), renorm
    n_chars = model.filter(F.length("piece") == 1).count()
    keep_multi = max(0, int(vocab_size) - n_chars)
    wnd = Window.orderBy(F.col("cnt").desc(), F.col("piece").asc())
    multi = (model.filter(F.length("piece") > 1)
             .withColumn("_r", F.row_number().over(wnd))
             .filter(F.col("_r") <= keep_multi).drop("_r"))
    kept = (model.filter(F.length("piece") == 1)
            .unionByName(multi).select("piece", "cnt"))
    return _renormalized(kept)


def unigram_encode(df: DataFrame, model: DataFrame,
                   text_col: str = "text",
                   token_col: str = "unigram_tokens",
                   max_piece_len: int | None = None,
                   broadcast_vocab: bool = False) -> DataFrame:
    """Tokenize a corpus with a trained unigram model: adds
    ``token_col`` (array<string>; NULL / token-less texts encode to
    an empty array; words with never-seen characters contribute one
    ``<unk>``).  The dictionary path throughout: the corpus's
    distinct words segment ONCE (Viterbi, pure codegen), token arrays
    reassemble per text in word order and join back on md5(text) —
    two text-keyed shuffles + one word-keyed join no matter the
    corpus size (`bpe.bpe_encode`'s plan; ``broadcast_vocab=True``
    broadcasts the word dictionary when it is known small)."""
    texts = (df.select(F.col(text_col).alias("_t"))
             .filter(F.col("_t").isNotNull()).distinct()
             .select(F.md5(F.col("_t")).alias("_h"),
                     F.filter(tokens(F.col("_t")),
                              lambda x: x != F.lit("")).alias("_ws")))
    vocab = viterbi_segment_words(
        texts.select(F.explode("_ws").alias("word")).distinct(),
        model, word_col="word", piece_col="_wt",
        max_piece_len=max_piece_len)
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


def unigram_token_count(df: DataFrame, model: DataFrame,
                        text_col: str = "text",
                        count_col: str = "n_unigram_tokens",
                        **encode_opts) -> DataFrame:
    """Real-tokenizer token counts per document under a unigram
    model: `unigram_encode` then array size (`bpe.bpe_token_count`'s
    counterpart)."""
    enc = unigram_encode(df, model, text_col=text_col,
                         token_col="_ug", **encode_opts)
    return (enc.withColumn(count_col,
                           F.size(F.col("_ug")).cast("long"))
            .drop("_ug"))
