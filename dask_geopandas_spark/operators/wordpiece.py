"""WordPiece tokenizer TRAINING and ENCODING as DataFrame operators —
the tokenizer family's third member (Schuster & Nakajima 2012; the
BERT recipe) next to `bpe.train_bpe` (count-scored merges) and
`unigram.unigram_train` (EM-fitted pieces).  WordPiece trains like
BPE but picks the pair maximizing the LIKELIHOOD score
``count(pair) / (count(left) · count(right))`` — merging units that
co-occur more than their parts predict — and encodes at runtime with
greedy LONGEST-MATCH against the final vocabulary (word-internal
pieces carry the ``##`` continuation prefix; a word the vocabulary
cannot cover becomes ``[UNK]`` whole, the BERT convention).

Deterministic spec (the SQL oracle replays every step): scores
quantize ``round(cp / (cl · cr), 12)`` (each count cast to double
first), ties break ``(left, right)`` ascending; greedy matching takes
the longest vocabulary piece at each position.  No ``</w>`` terminal
— WordPiece marks continuations, not ends.

Design for 100 TB — the `bpe.train_bpe` shape: ONE corpus pass builds
the word-count table; each merge step is ONE job — two
vocabulary-sized aggregations (pair counts + symbol counts) + a 1-row
TakeOrdered whose winner applies as a literal native replace (r16
optimization round), the word frame lazily `localCheckpoint`-truncated.
Encoding uses the dictionary path: distinct words greedy-scan ONCE
(a pure-codegen `F.aggregate`, candidates from one BROADCAST-vocab
join), token arrays join back on md5(text).

No counterpart in the reference (a geospatial engine).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from ..barrier import plan_barrier

from .textstats import tokens

UNK = "[UNK]"

WP_MERGE_SCHEMA = ("rank int, left string, right string, "
                   "merged string, pair_count long, score double")


def _sym_plain(word: Column) -> Column:
    """A word as its initial symbol string WITHOUT a terminal marker:
    ``'ab' -> ' a  b '`` (the `bpe.sym_string` double-space encoding,
    minus ``</w>`` — WordPiece marks continuations, not ends)."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: word.substr(i, F.lit(1)))
    return F.concat(F.lit(" "), F.array_join(chars, "  "), F.lit(" "))


def _classic_wordpiece(word_counts: list[tuple[str, int]],
                       num_merges: int) -> list[tuple]:
    """Greedy likelihood-scored WordPiece over a (word, count) table
    in plain Python — the driver-side trainer behind
    ``train_wordpiece(collect_vocab=True)``; identical trajectory to
    the distributed loop (pinned by pytest)."""
    vocab = [(list(w), c) for w, c in word_counts]
    merges = []
    for rank in range(1, int(num_merges) + 1):
        pc: dict = {}
        sc: dict = {}
        for syms, cnt in vocab:
            for s in syms:
                sc[s] = sc.get(s, 0) + cnt
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + cnt
        if not pc:
            break
        scored = {k: round(float(v) / (float(sc[k[0]])
                                       * float(sc[k[1]])), 12)
                  for k, v in pc.items()}
        (left, right), score = min(
            scored.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, left, right, left + right,
                       pc[(left, right)], score))
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


def train_wordpiece(df: DataFrame, text_col: str = "text",
                    num_merges: int = 16,
                    collect_vocab: bool = False,
                    word_counts: DataFrame | None = None) -> DataFrame:
    """Learn ``num_merges`` WordPiece merges: the ordered table
    (rank, left, right, merged, pair_count, score).  Mechanics are
    `bpe.train_bpe`'s (one corpus pass, vocabulary-sized steps,
    native-replace apply, ``collect_vocab=True`` for the driver-side
    loop over the collected word-count table) — only the SELECTION
    differs: ``score = round(cp/(cl·cr), 12)`` max, ties (left, right)
    ascending.

    ``word_counts``: optional precomputed (word, cnt) table over the
    same token split — shares the one corpus pass with other
    consumers (a max-word-length guard); trajectory identical."""
    merges, _ = _train_wordpiece_steps(df, text_col, num_merges,
                                       collect_vocab, word_counts)
    return merges


def _train_wordpiece_steps(df: DataFrame, text_col: str,
                           num_merges: int, collect_vocab: bool,
                           word_counts: DataFrame | None
                           ) -> tuple[DataFrame, DataFrame | None]:
    """`train_wordpiece`'s body, additionally returning the FINAL
    merged symbol frame (s, cnt) — the state `wordpiece_vocab` would
    otherwise recompute by replaying the merge chain over a second
    distinct-word pass (``None`` on the ``collect_vocab`` path, which
    never builds a distributed symbol frame)."""
    if word_counts is not None:
        wc = word_counts
    else:
        wc = (df.select(F.explode(
                  F.filter(tokens(F.col(text_col)),
                           lambda x: x != F.lit(""))).alias("word"))
              .groupBy("word").agg(F.count("*").alias("cnt")))
    if collect_vocab:
        counts = [(r["word"], r["cnt"]) for r in wc.collect()]
        return df.sparkSession.createDataFrame(
            _classic_wordpiece(counts, num_merges), WP_MERGE_SCHEMA), None
    w = (wc.select(_sym_plain(F.col("word")).alias("s"), "cnt")
         .transform(plan_barrier))
    rows = []
    syms_of = lambda c: F.split(F.trim(c), "  ")  # noqa: E731
    for rank in range(1, int(num_merges) + 1):
        syms = syms_of(F.col("s"))
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
        pc = (w.select("cnt", F.explode(pairs).alias("p"))
              .groupBy(F.col("p.left").alias("left"),
                       F.col("p.right").alias("right"))
              .agg(F.sum("cnt").alias("pair_count")))
        sc = (w.select("cnt", F.explode(syms).alias("sym"))
              .groupBy("sym").agg(F.sum("cnt").alias("_sc")))
        sl = sc.select(F.col("sym").alias("left"),
                       F.col("_sc").alias("_cl"))
        sr = sc.select(F.col("sym").alias("right"),
                       F.col("_sc").alias("_cr"))
        best = (pc.join(F.broadcast(sl), "left")
                .join(F.broadcast(sr), "right")
                .withColumn("score", F.round(
                    F.col("pair_count").cast("double")
                    / (F.col("_cl").cast("double")
                       * F.col("_cr").cast("double")), 12))
                .orderBy(F.col("score").desc(), "left", "right")
                .limit(1)
                .select(F.lit(rank).alias("rank"), "left", "right",
                        F.concat("left", "right").alias("merged"),
                        "pair_count", "score")
                .head())
        if best is None:
            # pairs exhausted: w can never change again, so every
            # later step is empty too (the `bpe._distributed_merges`
            # r16 shape — fewer rows, identical trajectory)
            break
        rows.append((rank, best["left"], best["right"],
                     best["merged"], best["pair_count"],
                     best["score"]))
        pat = f" {best['left']}  {best['right']} "
        rep = f" {best['merged']} "
        w = (w.select(F.replace(F.col("s"), F.lit(pat),
                                F.lit(rep)).alias("s"), "cnt")
             .transform(plan_barrier))
    return df.sparkSession.createDataFrame(rows, WP_MERGE_SCHEMA), w


def _vocab_from_symbols(words: DataFrame) -> DataFrame:
    """The induced-vocabulary projection shared by `wordpiece_vocab`
    and `train_wordpiece_and_vocab`: word-initial symbols enter
    as-is, word-internal ones with the ``##`` continuation prefix."""
    syms = F.split(F.trim(F.col("_s")), "  ")
    return (words.select(F.posexplode(syms).alias("_i", "_sym"))
            .select(F.when(F.col("_i") == 0, F.col("_sym"))
                    .otherwise(F.concat(F.lit("##"), F.col("_sym")))
                    .alias("piece"))
            .distinct())


def train_wordpiece_and_vocab(df: DataFrame, text_col: str = "text",
                              num_merges: int = 16,
                              word_counts: DataFrame | None = None
                              ) -> tuple[DataFrame, DataFrame]:
    """`train_wordpiece` + the runtime vocabulary its merge table
    induces on the SAME corpus, sharing one corpus pass and one
    merge-application chain (r16 optimization round): the trainer's
    final symbol frame IS the state `wordpiece_vocab` reconstructs by
    replaying the merges over a second distinct-word pass — same
    distinct words (the word-count grouping), same ordered replaces —
    so vocab induction here costs one posexplode + distinct over the
    already-checkpointed frame instead of a second corpus pass + the
    full replay chain.  Returns ``(merges, vocab)``; both equal their
    separately-computed counterparts row-for-row (pinned by pytest
    and the wordpiece_tokens oracle)."""
    merges, w = _train_wordpiece_steps(df, text_col, num_merges,
                                       False, word_counts)
    return merges, _vocab_from_symbols(w.select(F.col("s").alias("_s")))


def wordpiece_vocab(df: DataFrame, merges: DataFrame,
                    text_col: str = "text",
                    chunk_size: int = 128) -> DataFrame:
    """The runtime vocabulary a trained merge table induces on a
    corpus: apply the merge chain to every distinct word (the
    `bpe.bpe_encode_words` chunked-replace machinery), then each
    word-INITIAL symbol enters as-is and each word-internal one with
    the ``##`` continuation prefix.  Returns a (piece) frame — the
    input `wordpiece_encode` matches greedily against."""
    rows = sorted(merges.select("rank", "left", "right", "merged")
                  .collect(), key=lambda r: r["rank"])
    words = (df.select(F.explode(
                 F.filter(tokens(F.col(text_col)),
                          lambda x: x != F.lit(""))).alias("word"))
             .distinct()
             .withColumn("_s", _sym_plain(F.col("word"))))
    step = max(1, int(chunk_size))
    for lo in range(0, len(rows), step):
        s = F.col("_s")
        for r in rows[lo:lo + step]:
            s = F.replace(
                s, F.lit(f" {r['left']}  {r['right']} "),
                F.lit(f" {r['merged']} "))
        words = words.withColumn("_s", s).transform(plan_barrier)
    return _vocab_from_symbols(words)


def greedy_match_words(words: DataFrame, vocab: DataFrame,
                       word_col: str = "word",
                       piece_col: str = "wp_tokens",
                       unk_token: str = UNK,
                       max_scan_len: int = 256,
                       max_piece_len: int | None = None) -> DataFrame:
    """Greedy longest-match WordPiece segmentation of a WORD frame
    (the BERT runtime algorithm): at each position take the LONGEST
    vocabulary piece (continuations matched with their ``##`` form);
    any position with no match turns the WHOLE word into
    ``[unk_token]``, as does a word longer than ``max_scan_len`` —
    the scan state grows O(len²) per row, so a no-separator
    mega-token must not drive a quadratic codegen loop (BERT's
    tokenizer has the same ``max_input_chars_per_word`` cap, default
    100, mapping long words to [UNK]).  One pure-codegen
    `F.aggregate` scan per row; candidates from one equi-join
    against the BROADCAST vocabulary.

    ``max_piece_len``: any UPPER BOUND on the longest vocabulary
    piece (``##`` form included) skips the ``max(length(piece))``
    aggregation job — over-length substring candidates simply never
    match the vocabulary join, so the segmentation is identical for
    any bound >= the true maximum (a caller holding the driver-side
    merge table knows ``max(3, len(merged)+2)`` for free)."""
    if max_piece_len is not None:
        maxlen = int(max_piece_len)
    else:
        maxlen = int(vocab.agg(F.max(F.length("piece"))).head()[0] or 1)
    full = (words.filter(F.col(word_col).isNotNull()
                         & (F.length(word_col) >= 1)))
    over = full.filter(F.length(word_col) > int(max_scan_len)) \
        .withColumn(piece_col, F.array(F.lit(unk_token)))
    w = full.filter(F.length(word_col) <= int(max_scan_len))
    word = F.col(word_col)
    n = F.length(word)
    subs = F.flatten(F.transform(
        F.sequence(F.lit(1), n),
        lambda j: F.transform(
            F.sequence(F.lit(1), F.least(F.lit(maxlen), n - j + 1)),
            lambda ln: F.struct(
                (j - 1).cast("int").alias("j0"),
                (j - 1 + ln).cast("int").alias("i"),
                F.when(j == 1, word.substr(j, ln))
                .otherwise(F.concat(F.lit("##"), word.substr(j, ln)))
                .alias("piece")))))
    mdl = F.broadcast(vocab.select(F.col("piece").alias("_vp")))
    cands = (w.select(word_col, F.explode(subs).alias("_c"))
             .join(mdl, F.col("_c.piece") == F.col("_vp"))
             .groupBy(word_col)
             .agg(F.collect_list(F.struct(
                 F.col("_c.j0").alias("j0"),
                 F.col("_c.i").alias("i"))).alias("_cands")))
    out = w.join(cands, word_col, "left")
    cl = F.col("_cands")

    init = F.struct(F.lit(0).cast("int").alias("pos"),
                    F.array().cast("array<string>").alias("parts"))

    def _step(st, _):
        ci = F.filter(cl, lambda c: c["j0"] == st["pos"])
        best = F.aggregate(ci, F.lit(-1),
                           lambda b, c: F.greatest(b, c["i"]))
        piece = (F.when(st["pos"] == 0, word.substr(F.lit(1), best))
                 .otherwise(F.concat(
                     F.lit("##"),
                     word.substr(st["pos"] + 1, best - st["pos"]))))
        return (F.when((st["pos"] < 0) | (st["pos"] >= n), st)
                .when(best < 0,
                      F.struct(F.lit(-1).cast("int").alias("pos"),
                               st["parts"].alias("parts")))
                .otherwise(F.struct(
                    best.cast("int").alias("pos"),
                    F.concat(st["parts"], F.array(piece))
                    .alias("parts"))))

    scanned = F.aggregate(F.sequence(F.lit(1), n), init, _step)
    ok = cl.isNotNull() & (scanned["pos"] == n)
    return (out.withColumn(
        piece_col,
        F.when(ok, scanned["parts"])
        .otherwise(F.array(F.lit(unk_token)))).drop("_cands")
        .unionByName(over))


def wordpiece_encode(df: DataFrame, vocab: DataFrame,
                     text_col: str = "text",
                     token_col: str = "wp_tokens",
                     unk_token: str = UNK,
                     broadcast_vocab: bool = False,
                     max_piece_len: int | None = None) -> DataFrame:
    """Tokenize a corpus against a WordPiece vocabulary: adds
    ``token_col`` (array<string>, ``##``-prefixed continuations,
    un-coverable words as ``[UNK]``; NULL / token-less texts to an
    empty array).  Dictionary path throughout (`bpe.bpe_encode`'s
    plan): distinct words greedy-scan once, token arrays reassemble
    per text in word order and join back on md5(text)."""
    texts = (df.select(F.col(text_col).alias("_t"))
             .filter(F.col("_t").isNotNull()).distinct()
             .select(F.md5(F.col("_t")).alias("_h"),
                     F.filter(tokens(F.col("_t")),
                              lambda x: x != F.lit("")).alias("_ws")))
    wdict = greedy_match_words(
        texts.select(F.explode("_ws").alias("word")).distinct(),
        vocab, word_col="word", piece_col="_wt", unk_token=unk_token,
        max_piece_len=max_piece_len)
    if broadcast_vocab:
        wdict = F.broadcast(wdict)
    per_text = (texts.select("_h", F.posexplode("_ws")
                             .alias("_pos", "word"))
                .join(wdict, "word")
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


def wordpiece_token_count(df: DataFrame, vocab: DataFrame,
                          text_col: str = "text",
                          count_col: str = "n_wp_tokens",
                          **encode_opts) -> DataFrame:
    """Real-tokenizer token counts per document under a WordPiece
    vocabulary (`bpe.bpe_token_count`'s counterpart)."""
    enc = wordpiece_encode(df, vocab, text_col=text_col,
                           token_col="_wp", **encode_opts)
    return (enc.withColumn(count_col,
                           F.size(F.col("_wp")).cast("long"))
            .drop("_wp"))
