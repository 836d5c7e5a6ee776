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
  pair, bounded by Σ word lengths over the VOCABULARY) whose 1-row
  TakeOrdered winner comes back to the driver and applies as a
  LITERAL string replace (r16 optimization round — one job per step,
  no broadcast join); the word frame is lazily
  ``localCheckpoint``-truncated per step so the plan does not deepen
  with ``num_merges``.
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
from ..barrier import plan_barrier

from .textstats import tokens

END_OF_WORD = "</w>"


def sym_string(word: Column,
               terminal: str | None = END_OF_WORD) -> Column:
    """A word as its initial BPE symbol string: every character plus
    the ``</w>`` terminal, each wrapped in its own spaces —
    ``'ab' -> ' a  b  </w> '``.  ``terminal=None`` (the byte-level
    GPT-2 convention — no end-of-word marker, spaces live inside the
    pre-tokens) emits ``' a  b '``.  Char split is a ``substr`` per
    position inside ``transform`` — O(len²) byte seeks, fine for
    WORDS (this is never applied to document-length strings; the
    `lang_id_model` lesson)."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: word.substr(i, F.lit(1)))
    tail = F.lit(f"  {terminal} ") if terminal else F.lit(" ")
    return F.concat(F.lit(" "), F.array_join(chars, "  "), tail)


def _symbols(s: Column) -> Column:
    """Symbol array of a symbol string (split on the double-space
    separator after trimming the boundary spaces)."""
    return F.split(F.trim(s), "  ")


MERGE_SCHEMA = ("rank int, left string, right string, merged string, "
                "pair_count long")


def _classic_bpe(word_counts: list[tuple[str, int]],
                 num_merges: int,
                 terminal: str | None = END_OF_WORD) -> list[tuple]:
    """Classic greedy BPE over a (word, count) table in plain Python —
    the driver-side trainer behind ``train_bpe(collect_vocab=True)``.
    Same trajectory as the distributed loop: pair counts are exact
    integers, ties break on (left, right) ascending.
    ``terminal=None``: the byte-level (GPT-2) convention, no
    end-of-word symbol."""
    vocab = [(list(w) + ([terminal] if terminal else []), c)
             for w, c in word_counts]
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
         .transform(plan_barrier))
    return _distributed_merges(df.sparkSession, w, num_merges)


def _distributed_merges(spark, w: DataFrame,
                        num_merges: int) -> DataFrame:
    """The distributed greedy merge loop over an initialized
    (s, cnt) symbol-string frame — shared by the classic (</w>) and
    byte-level (no terminal) trainers; see `train_bpe` for the
    per-step shape.

    r16 optimization-round shape: each step is ONE job — the
    pair-count aggregation's winning row comes back via ``head()``
    (1 row, the `train_centroids` driver-scalar convention) and the
    merge applies as a LITERAL string replace, so the former
    per-step broadcast-join + its dedicated checkpoint job are gone;
    the vocabulary frame stays lazily checkpointed (plan truncated,
    materialization rides the next step's aggregation job).  The
    merge table itself is driver-built (num_merges rows) — a local
    relation, so downstream ``merges.collect()`` in the encode paths
    costs no job at all.  Trajectory identical: same aggregation,
    same (pair_count desc, left, right) tie-break."""
    rows = []
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
                .head())
        if best is None:
            # pairs exhausted (every word one symbol): w can never
            # change again, so every later step is empty too — the
            # same FEWER-rows table the join-based loop produced
            break
        rows.append((rank, best["left"], best["right"],
                     best["merged"], best["pair_count"]))
        # apply the merge as a literal replace (the winning pair is
        # a driver scalar now — no broadcast join needed)
        pat = f" {best['left']}  {best['right']} "
        rep = f" {best['merged']} "
        w = (w.select(F.replace(F.col("s"), F.lit(pat),
                                F.lit(rep)).alias("s"), "cnt")
             .transform(plan_barrier))
    return spark.createDataFrame(rows, MERGE_SCHEMA)


def bpe_encode_words(words: DataFrame, merges: DataFrame,
                     word_col: str = "word",
                     token_col: str = "bpe_tokens",
                     chunk_size: int = 128,
                     terminal: str | None = END_OF_WORD) -> DataFrame:
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
    w = words.withColumn("_s", sym_string(F.col(word_col), terminal))
    step = max(1, int(chunk_size))
    for lo in range(0, len(rows), step):
        s = F.col("_s")
        for r in rows[lo:lo + step]:
            s = F.replace(
                s, F.lit(f" {r['left']}  {r['right']} "),
                F.lit(f" {r['merged']} "))
        w = w.withColumn("_s", s).transform(plan_barrier)
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


# ---------------------------------------------------------------------------
# Byte-level (GPT-2 / tiktoken-style) pre-tokenization — r15
# ---------------------------------------------------------------------------

#: GPT-2-style pre-split with the LEADING SPACE attached to each
#: letter/digit/symbol run (no lookarounds — portable between Java
#: regex and RE2/DuckDB; the published GPT-2 pattern's trailing
#: `\s+(?!\S)` branch needs a lookahead, so trailing whitespace runs
#: here match the plain whitespace-run branch instead — a documented,
#: portable deviation that changes nothing on single-space text).
#: Unlike `BPE_ISH_PATTERN`, the symbol class does NOT exclude the
#: apostrophe: an apostrophe that is not a contraction suffix joins
#: the symbol run, so EVERY byte of the input is covered (the
#: byte-level contract — no [UNK], nothing dropped).  The whitespace
#: class is spelled EXPLICITLY ([ \t\n\x0B\f\r]) rather than as \s:
#: Java regex counts \x0B as \s but RE2/DuckDB does not, so a bare \s
#: would segment \x0B-adjacent text differently engine-vs-oracle
#: (r15 advice; the textstats `_WS` convention).
BYTE_PRESPLIT_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+"
    r"| ?[^A-Za-z0-9 \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+")


def gpt2_byte_map() -> list[str]:
    """The GPT-2 ``bytes_to_unicode`` bijection as a 256-entry list
    (index = byte value): printable/latin-1 bytes map to themselves,
    the rest to codepoints 256+n in discovery order — every byte gets
    a VISIBLE single character, so byte-level symbol strings survive
    the space-separated merge machinery unchanged (no raw control
    bytes or spaces inside symbols).  Published recipe (GPT-2
    encoder.py / tiktoken)."""
    bs = list(range(ord("!"), ord("~") + 1)) + \
        list(range(0xA1, 0xAC + 1)) + list(range(0xAE, 0xFF + 1))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    out = [""] * 256
    for b, c in zip(bs, cs):
        out[b] = chr(c)
    return out


def byte_pretokens(text: Column,
                   max_piece_len: int = 256) -> Column:
    """GPT-2-style byte-level pre-tokens of a text column:
    ``array<string>`` where each element is one regex pre-split piece
    (leading space attached) with its UTF-8 bytes mapped through the
    `gpt2_byte_map` bijection — the exact "words" a byte-level BPE
    trains on and encodes over.  Every byte of the input is covered
    (byte-level never needs [UNK]).

    Pieces longer than ``max_piece_len`` BYTES split into fixed-size
    chunks — the mega-run cap (a no-separator megabyte line would
    otherwise drive the O(len²) `sym_string` scan; the
    unigram/wordpiece `max_dp_len` convention, except splitting
    preserves full coverage where [UNK] would lose it).

    Pure codegen, zero Python: regexp_extract_all → hex(encode(.)) →
    per-byte array lookup against the 256-literal map → chunk.  The
    identical expression exists in DuckDB (hex / ('0x'||..)::INT /
    list literal), so oracles replay it verbatim."""
    m = gpt2_byte_map()
    amap = F.array(*[F.lit(c) for c in m])
    cap = int(max_piece_len)

    def _map_piece(p):
        h = F.hex(F.encode(p, "UTF-8"))
        slow = F.array_join(F.transform(
            F.sequence(F.lit(1), (F.length(h) / 2).cast("int")),
            lambda j: F.element_at(
                amap,
                (F.conv(h.substr(j * 2 - 1, F.lit(2)), 16, 10)
                 .cast("int") + 1))), "")
        # printable-ASCII fast path (the overwhelming majority of
        # pieces in real corpora): bytes 0x21-0x7E are fixed points
        # of the bijection and only the space byte moves, so one
        # native translate replaces the whole per-byte hex walk —
        # byte-identical to the slow path, ~2x on English text.
        # \A..\z anchors, NOT ^..$: Java's $ matches before a
        # trailing newline, which would send '\n' pieces down the
        # fast path unmapped
        mapped = F.when(p.rlike(r"\A[ -~]*\z"),
                        F.translate(p, " ", m[0x20])) \
            .otherwise(slow)
        return F.transform(
            F.sequence(F.lit(0),
                       F.floor((F.length(mapped) - 1) / cap)
                       .cast("int")),
            lambda i: mapped.substr(i * cap + 1, F.lit(cap)))

    pieces = F.regexp_extract_all(text, F.lit(BYTE_PRESPLIT_PATTERN),
                                  F.lit(0))
    return F.flatten(F.transform(pieces, _map_piece))


def train_bpe_bytes(df: DataFrame, text_col: str = "text",
                    num_merges: int = 16,
                    collect_vocab: bool = False,
                    max_piece_len: int = 256) -> DataFrame:
    """Byte-level BPE training — the GPT-2/tiktoken variant modern
    LLMs actually ship, completing the tokenizer family: "words" are
    `byte_pretokens` pieces (leading space inside the token, every
    byte representable), there is NO ``</w>`` terminal, and the merge
    loop is `train_bpe`'s machinery unchanged (one corpus pass for
    the word-count table; each merge one vocabulary-sized
    aggregation — or the collected `_classic_bpe` trajectory for
    real vocab sizes).  Same merge table schema; ties break on
    (left, right) ascending so the oracle replays the trajectory."""
    wc = (df.select(F.explode(
              byte_pretokens(F.col(text_col), max_piece_len))
              .alias("word"))
          .groupBy("word").agg(F.count("*").alias("cnt")))
    if collect_vocab:
        counts = [(r["word"], r["cnt"]) for r in wc.collect()]
        return df.sparkSession.createDataFrame(
            _classic_bpe(counts, num_merges, terminal=None),
            MERGE_SCHEMA)
    w = (wc.select(sym_string(F.col("word"), None).alias("s"), "cnt")
         .transform(plan_barrier))
    return _distributed_merges(df.sparkSession, w, num_merges)


def bpe_encode_bytes(df: DataFrame, merges: DataFrame,
                     text_col: str = "text",
                     token_col: str = "bpe_tokens",
                     compile_threshold: int = 512,
                     chunk_size: int = 128,
                     broadcast_vocab: bool = False,
                     max_piece_len: int = 256) -> DataFrame:
    """Byte-level BPE encoding: adds ``token_col`` (array<string> of
    byte-mapped subword tokens; NULL texts to an empty array).
    `bpe_encode`'s two physical paths, byte-level:

    - ``<= compile_threshold`` merges: the terminal-free replace
      chain compiles inline over each `byte_pretokens` piece — pure
      codegen in the scan stage, NO join, NO shuffle (the right
      shape for small models, and what the registered query runs).
    - larger tables: the DICTIONARY path — distinct byte-pre-tokens
      encode once through the chunked replace chain, token arrays
      reassemble per text in piece order and join back on
      md5(text); duplicate texts encode once, corpus cost is two
      text-keyed shuffles + one word-keyed join.

    Both paths produce IDENTICAL output; the threshold only picks
    the plan."""
    srows = sorted(merges.select("rank", "left", "right",
                                 "merged").collect(),
                   key=lambda r: r["rank"])

    if len(srows) <= int(compile_threshold):
        def encode_piece(p):
            s = sym_string(p, None)
            for r in srows:
                s = F.replace(
                    s, F.lit(f" {r['left']}  {r['right']} "),
                    F.lit(f" {r['merged']} "))
            return _symbols(s)

        return df.withColumn(
            token_col,
            F.coalesce(
                F.flatten(F.transform(
                    byte_pretokens(F.col(text_col), max_piece_len),
                    encode_piece)),
                F.array().cast("array<string>")))

    rows = [(r["rank"], r["left"], r["right"], r["merged"], 0)
            for r in srows]
    mtab = df.sparkSession.createDataFrame(rows, MERGE_SCHEMA)
    texts = (df.select(F.col(text_col).alias("_t"))
             .filter(F.col("_t").isNotNull()).distinct()
             .select(F.md5(F.col("_t")).alias("_h"),
                     byte_pretokens(F.col("_t"), max_piece_len)
                     .alias("_ws")))
    vocab = bpe_encode_words(
        texts.select(F.explode("_ws").alias("word")).distinct(),
        mtab, word_col="word", token_col="_wt",
        chunk_size=chunk_size, terminal=None)
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


def bpe_byte_token_count(df: DataFrame, merges: DataFrame,
                         text_col: str = "text",
                         count_col: str = "n_bpe_tokens",
                         **encode_opts) -> DataFrame:
    """Per-document byte-level BPE token counts
    (`bpe_token_count`'s byte-level counterpart)."""
    enc = bpe_encode_bytes(df, merges, text_col=text_col,
                           token_col="_bpe", **encode_opts)
    return (enc.withColumn(count_col,
                           F.size(F.col("_bpe")).cast("long"))
            .drop("_bpe"))


def tokenizer_datacard(df: DataFrame, counts: DataFrame,
                       group_cols=("source", "lang"),
                       text_col: str = "text",
                       id_col: str = "doc_id",
                       count_col: str = "n_bpe_tokens") -> DataFrame:
    """Tokenizer data-card metrics per corpus slice — the published
    numbers tokenizer reports compare (XLM-R's per-language fertility
    table, the GPT-4 report's bytes-per-token compression): given ANY
    per-document token-count frame ``counts`` (`bpe_token_count`,
    `bpe_byte_token_count`, `unigram_token_count`,
    `wordpiece_token_count` — the operator is tokenizer-agnostic),
    aggregate per ``group_cols``:

    - ``n_docs``, ``total_bytes`` (UTF-8 octets), ``total_tokens``,
      ``total_words`` (whitespace words, the fertility denominator)
    - ``bytes_per_token`` = total_bytes / total_tokens (compression;
      higher = cheaper corpus in tokens)
    - ``fertility`` = total_tokens / total_words (subword splits per
      word; 1.0 = every word one token)

    All sums are exact integers; the two ratios divide once at the
    end and round to 6 (engine-portable — the `corpus_stats`
    convention).  Zero-token / zero-word groups return NULL ratios
    rather than dividing by zero.  Distributed shape: one inner join
    on ``id_col`` (both sides corpus-keyed — co-partitioned by the
    join) + one map-side-combined aggregation keyed on the group
    columns; no corpus-sized state past the join."""
    from .textstats import _WS

    gcols = list(group_cols)
    t = F.col(text_col)
    words = F.when(
        t.isNotNull(),
        F.size(F.filter(F.split(t, _WS + "+"),
                        lambda x: x != F.lit("")))).otherwise(F.lit(0))
    joined = (df.select(id_col, *gcols,
                        F.coalesce(F.octet_length(t), F.lit(0))
                        .cast("long").alias("_bytes"),
                        words.cast("long").alias("_words"))
              .join(counts.select(id_col,
                                  F.col(count_col).alias("_toks")),
                    id_col))
    agg = (joined.groupBy(*gcols)
           .agg(F.count("*").cast("long").alias("n_docs"),
                F.sum("_bytes").cast("long").alias("total_bytes"),
                F.sum("_toks").cast("long").alias("total_tokens"),
                F.sum("_words").cast("long").alias("total_words")))
    return (agg
            .withColumn(
                "bytes_per_token",
                F.when(F.col("total_tokens") > 0,
                       F.round(F.col("total_bytes")
                               / F.col("total_tokens"), 6)))
            .withColumn(
                "fertility",
                F.when(F.col("total_words") > 0,
                       F.round(F.col("total_tokens")
                               / F.col("total_words"), 6))))
