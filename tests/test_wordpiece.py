"""WordPiece tokenizer (operators/wordpiece.py) vs plain-Python
replicas: the likelihood-scored merge trajectory (score =
round(cp/(cl·cr), 12), ties (left, right) ascending) and the greedy
longest-match runtime encoder with ## continuations and whole-word
[UNK] — the `bpe._classic_bpe` testing pattern."""

import re

import pytest

from dask_geopandas_spark.operators.wordpiece import (
    UNK, _classic_wordpiece, greedy_match_words, train_wordpiece,
    wordpiece_encode, wordpiece_token_count, wordpiece_vocab)


def _words(text):
    return [w for w in re.split(r"[^a-z0-9']+", text.lower().strip())
            if w]


def _brute_vocab(texts, merges):
    """Apply a merge list to the distinct words, collect pieces with
    ## continuations."""
    seen = set()
    for t in texts:
        if t is None:
            continue
        for w in set(_words(t)):
            syms = list(w)
            for _, left, right, merged, _, _ in merges:
                out, i = [], 0
                while i < len(syms):
                    if (i < len(syms) - 1 and syms[i] == left
                            and syms[i + 1] == right):
                        out.append(merged)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            for i, s in enumerate(syms):
                seen.add(s if i == 0 else "##" + s)
    return seen


def _brute_greedy(word, vocab):
    parts, pos = [], 0
    while pos < len(word):
        best = None
        for end in range(len(word), pos, -1):
            cand = (word[pos:end] if pos == 0
                    else "##" + word[pos:end])
            if cand in vocab:
                best = (end, cand)
                break
        if best is None:
            return [UNK]
        pos, piece = best
        parts.append(piece)
    return parts


CORPUS = ["the cat sat on the mat", "the cats sat still",
          "a mat on a cat", "mats and cats and hats",
          None, "", "THE CAT"]


class TestWordpieceTrain:
    def test_distributed_matches_classic(self, spark):
        df = spark.createDataFrame([(t,) for t in CORPUS],
                                   "text string")
        for k in (0, 1, 5, 9):
            dist = sorted(map(tuple,
                              train_wordpiece(df, num_merges=k)
                              .collect()))
            wc = {}
            for t in CORPUS:
                if t:
                    for w in _words(t):
                        wc[w] = wc.get(w, 0) + 1
            classic = sorted(_classic_wordpiece(list(wc.items()), k))
            assert dist == classic, k

    def test_likelihood_beats_raw_count(self, spark):
        # 'q' always precedes 'u' -> cp/(cl*cr) = 1/cu maximal even
        # though the pair count is tiny next to 'aa'
        texts = ["aa aa aa aa qu", "aa aa qu"]
        df = spark.createDataFrame([(t,) for t in texts],
                                   "text string")
        first = train_wordpiece(df, num_merges=1).head()
        assert (first["left"], first["right"]) == ("q", "u")

    def test_exhaustion_stops_early(self, spark):
        df = spark.createDataFrame([("ab ab",)], "text string")
        got = train_wordpiece(df, num_merges=10).collect()
        assert len(got) == 1  # one merge collapses every word


class TestWordpiecePlans:
    def test_greedy_scan_is_pure_codegen_with_broadcast_vocab(
            self, spark):
        """Plan contract: the greedy scan has NO Python stages (an
        F.aggregate projection) and the vocabulary side of the
        candidate join BROADCASTS."""
        vocab = spark.createDataFrame(
            [("ab",), ("a",), ("b",), ("##b",)], "piece string")
        words = spark.createDataFrame([("ab",), ("ba",)],
                                      "word string")
        seg = greedy_match_words(words, vocab)
        plan = seg._jdf.queryExecution().executedPlan().toString()
        for bad in ("BatchEvalPython", "ArrowEvalPython",
                    "MapInPandas", "FlatMapGroupsInPandas"):
            assert bad not in plan, bad
        assert "BroadcastHashJoin" in plan, plan


class TestWordpieceEncode:
    def _fixture(self, spark):
        df = spark.createDataFrame([(t,) for t in CORPUS],
                                   "text string")
        merges = sorted(map(tuple,
                            train_wordpiece(df, num_merges=6)
                            .collect()))
        vocab = wordpiece_vocab(
            df, train_wordpiece(df, num_merges=6))
        bvocab = _brute_vocab(CORPUS, merges)
        return df, vocab, bvocab

    def test_vocab_matches_brute(self, spark):
        _, vocab, bvocab = self._fixture(spark)
        assert {r["piece"] for r in vocab.collect()} == bvocab

    def test_encode_matches_brute_greedy(self, spark):
        df, vocab, bvocab = self._fixture(spark)
        got = {r["text"]: r["wp_tokens"] for r in
               wordpiece_encode(df, vocab).collect()}
        for t in CORPUS:
            want = ([] if t is None else
                    [p for w in _words(t)
                     for p in _brute_greedy(w, bvocab)])
            assert got[t] == want, t
        cnt = {r["text"]: r["n_wp_tokens"] for r in
               wordpiece_token_count(df, vocab).collect()}
        assert cnt == {t: len(v) for t, v in got.items()}

    def test_uncoverable_word_is_whole_unk(self, spark):
        df, vocab, bvocab = self._fixture(spark)
        probe = spark.createDataFrame(
            [("cat zebra the catz",)], "text string")
        row = wordpiece_encode(probe, vocab).head()
        want = [p for w in ["cat", "zebra", "the", "catz"]
                for p in _brute_greedy(w, bvocab)]
        assert row["wp_tokens"] == want
        assert UNK in row["wp_tokens"]

    def test_greedy_longest_not_merge_order(self, spark):
        """Greedy longest-match can differ from replaying merges —
        the documented BERT runtime semantics: vocabulary {ab, bc,
        ##c, a, b, c, ##b, ##bc} on 'abc' takes 'ab' + '##c'."""
        vocab = spark.createDataFrame(
            [("ab",), ("bc",), ("a",), ("b",), ("c",), ("##b",),
             ("##c",), ("##bc",)], "piece string")
        words = spark.createDataFrame([("abc",), ("bbc",)],
                                      "word string")
        got = {r["word"]: r["wp_tokens"] for r in
               greedy_match_words(words, vocab).collect()}
        assert got["abc"] == ["ab", "##c"]
        assert got["bbc"] == ["b", "##bc"]

    def test_mega_token_caps_to_unk(self, spark):
        """Over max_scan_len a word maps to [UNK] without entering
        the O(len²) scan — BERT's max_input_chars_per_word."""
        vocab = spark.createDataFrame([("a",), ("##a",)],
                                      "piece string")
        words = spark.createDataFrame([("a" * 300,), ("aa",)],
                                      "word string")
        got = {r["word"]: r["wp_tokens"] for r in
               greedy_match_words(words, vocab).collect()}
        assert got["a" * 300] == [UNK]
        assert got["aa"] == ["a", "##a"]
        high = greedy_match_words(
            spark.createDataFrame([("a" * 300,)], "word string"),
            vocab, max_scan_len=400).head()["wp_tokens"]
        assert high == ["a"] + ["##a"] * 299

    def test_broadcast_path_identical(self, spark):
        df, vocab, _ = self._fixture(spark)
        a = {r["text"]: r["wp_tokens"] for r in
             wordpiece_encode(df, vocab).collect()}
        b = {r["text"]: r["wp_tokens"] for r in
             wordpiece_encode(df, vocab,
                              broadcast_vocab=True).collect()}
        assert a == b


class TestWordpieceSharedPass:
    """r16 optimization round: the shared word-count pass
    (``word_counts=``), the fused trainer+vocab
    (`train_wordpiece_and_vocab`), and the driver-side
    ``max_piece_len`` bound must each be row-identical to the
    separate-pass paths they replace."""

    def _df(self, spark):
        return spark.createDataFrame([(t,) for t in CORPUS],
                                     "text string")

    def _wc(self, df):
        from pyspark.sql import functions as F

        from dask_geopandas_spark.operators.textstats import tokens

        return (df.select(F.explode(F.filter(
                    tokens(F.col("text")), lambda x: x != F.lit("")))
                    .alias("word"))
                .groupBy("word").agg(F.count("*").alias("cnt")))

    def test_word_counts_param_identical(self, spark):
        df = self._df(spark)
        a = sorted(map(tuple,
                       train_wordpiece(df, num_merges=6).collect()))
        b = sorted(map(tuple,
                       train_wordpiece(df, num_merges=6,
                                       word_counts=self._wc(df))
                       .collect()))
        assert a == b and len(a) == 6

    def test_train_and_vocab_matches_replay(self, spark):
        from dask_geopandas_spark.operators.wordpiece import \
            train_wordpiece_and_vocab

        df = self._df(spark)
        merges, vocab = train_wordpiece_and_vocab(df, num_merges=6)
        assert sorted(map(tuple, merges.collect())) == sorted(
            map(tuple, train_wordpiece(df, num_merges=6).collect()))
        replay = wordpiece_vocab(df, merges)
        assert (sorted(r["piece"] for r in vocab.collect())
                == sorted(r["piece"] for r in replay.collect()))

    def test_max_piece_len_bound_identical(self, spark):
        df = self._df(spark)
        merges = train_wordpiece(df, num_merges=6)
        vocab = wordpiece_vocab(df, merges)
        maxp = max([3] + [len(r["merged"]) + 2
                          for r in merges.collect()])
        a = {r["text"]: r["wp_tokens"]
             for r in wordpiece_encode(df, vocab).collect()}
        b = {r["text"]: r["wp_tokens"]
             for r in wordpiece_encode(df, vocab,
                                       max_piece_len=maxp).collect()}
        assert a == b
