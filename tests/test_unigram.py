"""Unigram-LM tokenizer (operators/unigram.py) vs a plain-Python
replica of the full deterministic trajectory: seed substring counts,
hard-EM with quantized Viterbi (round(score + logp, 12), ties prefer
the smaller start), character-coverage floor, count-ranked prune,
renormalization.  The replica is the spec; the operators must match
it value-for-value (the `bpe._classic_bpe` testing pattern)."""

import math
import re

import pytest


def _words(text):
    return [w for w in re.split(r"[^a-z0-9']+", text.lower().strip())
            if w]


def _renorm(counts):
    tot = sum(counts.values())
    return {p: round(math.log(c) - math.log(tot), 12)
            for p, c in counts.items()}


def _viterbi(word, logp, max_piece_len):
    n = len(word)
    best = [0.0] + [-1e18] * n
    bp = [-1] * (n + 1)
    for i in range(1, n + 1):
        for j in range(max(0, i - max_piece_len), i):
            piece = word[j:i]
            if piece not in logp:
                continue
            sc = round(best[j] + logp[piece], 12)
            if sc > best[i] or (sc == best[i] and j < bp[i]):
                best[i], bp[i] = sc, j
    if best[n] <= -1e17:
        return None
    parts, pos = [], n
    while pos > 0:
        parts.insert(0, word[bp[pos]:pos])
        pos = bp[pos]
    return parts


def _brute_train(texts, vocab_size, em_steps, max_piece_len,
                 max_word_len=16):
    wc = {}
    for t in texts:
        if t is None:
            continue
        for w in _words(t):
            if len(w) <= max_word_len:
                wc[w] = wc.get(w, 0) + 1
    counts = {}
    for w, c in wc.items():
        for j in range(len(w)):
            for ln in range(1, min(max_piece_len, len(w) - j) + 1):
                counts[w[j:j + ln]] = counts.get(w[j:j + ln], 0) + c
    model = counts
    for _ in range(em_steps):
        logp = _renorm(model)
        vc = {}
        for w, c in wc.items():
            for p in _viterbi(w, logp, max_piece_len):
                vc[p] = vc.get(p, 0) + c
        nxt = {p: c for p, c in vc.items() if len(p) > 1}
        for p in model:
            if len(p) == 1:
                nxt[p] = max(vc.get(p, 0), 1)
        model = nxt
    chars = {p: c for p, c in model.items() if len(p) == 1}
    multi = sorted(((p, c) for p, c in model.items() if len(p) > 1),
                   key=lambda pc: (-pc[1], pc[0]))
    keep = dict(chars)
    keep.update(dict(multi[:max(0, vocab_size - len(chars))]))
    logp = _renorm(keep)
    return {p: (keep[p], logp[p]) for p in keep}


CORPUS = ["the cat sat on the mat", "the cats sat still",
          "a mat on a cat", "onomatopoeia at the attic",
          "the the the cat", None, "", "  ", "CAT mat THE"]


class TestUnigramTrain:
    def _spark_model(self, spark, **kw):
        from dask_geopandas_spark.operators.unigram import \
            unigram_train

        df = spark.createDataFrame([(t,) for t in CORPUS],
                                   "text string")
        return {r["piece"]: (r["cnt"], r["logp"])
                for r in unigram_train(df, **kw).collect()}

    @pytest.mark.parametrize("em_steps", [0, 1, 2, 3])
    def test_matches_brute_trajectory(self, spark, em_steps):
        got = self._spark_model(spark, vocab_size=20,
                                em_steps=em_steps, max_piece_len=3)
        want = _brute_train(CORPUS, 20, em_steps, 3)
        assert got == want

    def test_charset_never_pruned(self, spark):
        # vocab_size below the charset: every char still present
        got = self._spark_model(spark, vocab_size=2, em_steps=1,
                                max_piece_len=3)
        chars = {c for t in CORPUS if t for w in _words(t) for c in w}
        assert set(got) == chars == \
            set(_brute_train(CORPUS, 2, 1, 3))

    def test_max_word_len_skips_long_words(self, spark):
        texts = ["short words only", "uncharacteristically long"]
        from dask_geopandas_spark.operators.unigram import \
            unigram_train

        df = spark.createDataFrame([(t,) for t in texts],
                                   "text string")
        got = {r["piece"]: (r["cnt"], r["logp"]) for r in
               unigram_train(df, vocab_size=30, em_steps=1,
                             max_piece_len=4,
                             max_word_len=6).collect()}
        assert got == _brute_train(texts, 30, 1, 4, max_word_len=6)
        assert "u" not in got  # only in the skipped long words

    def test_empty_corpus(self, spark):
        from dask_geopandas_spark.operators.unigram import \
            unigram_train

        df = spark.createDataFrame([(None,), ("",)], "text string")
        assert unigram_train(df, vocab_size=8).count() == 0


class TestUnigramPlans:
    def test_viterbi_is_pure_codegen_with_broadcast_model(self, spark):
        """The E-step/encode plan contract: NO Python stages anywhere
        (the DP is an F.aggregate projection) and the model side of
        the candidate join BROADCASTS (fixed-size-model convention)."""
        from dask_geopandas_spark.operators.unigram import (
            unigram_train, viterbi_segment_words)

        df = spark.createDataFrame([(t,) for t in CORPUS],
                                   "text string")
        model = unigram_train(df, vocab_size=16, em_steps=0,
                              max_piece_len=3)
        words = spark.createDataFrame([("cat",), ("mat",)],
                                      "word string")
        seg = viterbi_segment_words(words, model, max_piece_len=3)
        plan = seg._jdf.queryExecution().executedPlan().toString()
        for bad in ("BatchEvalPython", "ArrowEvalPython",
                    "MapInPandas", "FlatMapGroupsInPandas"):
            assert bad not in plan, bad
        assert "BroadcastHashJoin" in plan, plan


class TestUnigramEncode:
    def test_encode_matches_brute_viterbi(self, spark):
        from dask_geopandas_spark.operators.unigram import (
            unigram_encode, unigram_token_count, unigram_train)

        df = spark.createDataFrame([(t,) for t in CORPUS],
                                   "text string")
        model = unigram_train(df, vocab_size=16, em_steps=2,
                              max_piece_len=3)
        brute = _brute_train(CORPUS, 16, 2, 3)
        logp = {p: lp for p, (c, lp) in brute.items()}
        got = {r["text"]: r["toks"] for r in
               unigram_encode(df, model, token_col="toks").collect()}
        for t in CORPUS:
            want = ([] if t is None else
                    [p for w in _words(t)
                     for p in _viterbi(w, logp, 3)])
            assert got[t] == want, t
        cnt = {r["text"]: r["n_unigram_tokens"] for r in
               unigram_token_count(df, model).collect()}
        assert cnt == {t: len(v) for t, v in got.items()}

    def test_unseen_character_encodes_unk(self, spark):
        from dask_geopandas_spark.operators.unigram import (
            unigram_encode, unigram_train)

        train = spark.createDataFrame([("aa ab ba",)], "text string")
        model = unigram_train(train, vocab_size=6, em_steps=1,
                              max_piece_len=2)
        probe = spark.createDataFrame(
            [("ab xx axa ba",)], "text string")
        row = unigram_encode(probe, model, token_col="toks").head()
        # 'xx' and 'axa' contain the never-seen 'x' -> one <unk> each
        assert row["toks"] == ["ab", "<unk>", "<unk>", "ba"]

    def test_mega_token_caps_to_unk(self, spark):
        """A no-separator mega-token must not drive the O(len²) DP —
        over max_dp_len it maps to [<unk>] (the SentencePiece input
        cap), under it it segments normally."""
        from dask_geopandas_spark.operators.unigram import (
            unigram_train, viterbi_segment_words)

        train = spark.createDataFrame([("aa ab ba",)], "text string")
        model = unigram_train(train, vocab_size=6, em_steps=1,
                              max_piece_len=2)
        words = spark.createDataFrame(
            [("a" * 300,), ("abab",)], "word string")
        got = {r["word"]: r["p"] for r in viterbi_segment_words(
            words, model, piece_col="p",
            max_piece_len=2).collect()}
        assert got["a" * 300] == ["<unk>"]
        assert got["abab"] and got["abab"] != ["<unk>"]
        # a higher cap segments the long word normally
        got2 = viterbi_segment_words(
            spark.createDataFrame([("a" * 300,)], "word string"),
            model, piece_col="p", max_piece_len=2,
            max_dp_len=400).head()["p"]
        assert "".join(got2) == "a" * 300

    def test_broadcast_vocab_path_identical(self, spark):
        from dask_geopandas_spark.operators.unigram import (
            unigram_encode, unigram_train)

        df = spark.createDataFrame([(t,) for t in CORPUS],
                                   "text string")
        model = unigram_train(df, vocab_size=16, em_steps=1,
                              max_piece_len=3)
        a = {r["text"]: r["t1"] for r in
             unigram_encode(df, model, token_col="t1").collect()}
        b = {r["text"]: r["t1"] for r in
             unigram_encode(df, model, token_col="t1",
                            broadcast_vocab=True).collect()}
        assert a == b

    def test_encode_handles_words_longer_than_train_cap(self, spark):
        """Training skips words over max_word_len; ENCODING still
        segments them (chars are covered) — no length limit."""
        from dask_geopandas_spark.operators.unigram import (
            unigram_encode, unigram_train)

        train = spark.createDataFrame(
            [("cat con cat nat con",)], "text string")
        model = unigram_train(train, vocab_size=10, em_steps=1,
                              max_piece_len=3, max_word_len=3)
        probe = spark.createDataFrame([("catconcatnatcon cat",)],
                                      "text string")
        row = unigram_encode(probe, model, token_col="toks").head()
        brute = _brute_train(["cat con cat nat con"], 10, 1, 3,
                             max_word_len=3)
        logp = {p: lp for p, (c, lp) in brute.items()}
        want = (_viterbi("catconcatnatcon", logp, 3)
                + _viterbi("cat", logp, 3))
        assert row["toks"] == want and len(want) > 4


class TestUnigramSharedPass:
    """r16 optimization round: ``word_counts=`` (the shared corpus
    pass — the entry guard rides the trainer's word table) must give
    the identical model: the max_word_len filter commutes with the
    per-word grouping."""

    def test_word_counts_param_identical(self, spark):
        from pyspark.sql import functions as F

        from dask_geopandas_spark.operators.textstats import tokens
        from dask_geopandas_spark.operators.unigram import \
            unigram_train

        df = spark.createDataFrame([(t,) for t in CORPUS],
                                   "text string")
        wc = (df.select(F.explode(F.filter(
                  tokens(F.col("text")), lambda x: x != F.lit("")))
                  .alias("word"))
              .groupBy("word").agg(F.count("*").alias("cnt")))
        a = sorted(map(tuple,
                       unigram_train(df, vocab_size=16, em_steps=2,
                                     max_piece_len=3,
                                     max_word_len=4).collect()))
        b = sorted(map(tuple,
                       unigram_train(df, vocab_size=16, em_steps=2,
                                     max_piece_len=3, max_word_len=4,
                                     word_counts=wc).collect()))
        assert a == b and len(a) > 0
