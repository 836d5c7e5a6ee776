"""Text-analysis operators for LLM training-data pipelines (beyond the
reference's surface — BASELINE.json north star).

All hot-path logic is native Spark SQL expressions (JVM-side, codegen) —
no Python UDFs: tokenization via split/regexp, stopword hits via
higher-order array functions, hashes via md5.  Every function returns a
Column so callers compose them into select/filter; each has an exact
DuckDB-SQL twin (the driver's correctness oracle) because only portable
primitives (md5, regexp, array ops) are used.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from ..barrier import plan_barrier

# small deterministic stopword sets per language for the lang-id heuristic
STOPWORDS = {
    "en": ["the", "and", "is", "of", "to", "in", "that", "it", "with", "for"],
    "fr": ["le", "la", "les", "de", "et", "est", "un", "une", "que", "pour"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "mit", "nicht", "von"],
    "es": ["el", "la", "los", "de", "y", "es", "un", "una", "que", "por"],
}


def tokens(text: Column) -> Column:
    """Lowercased word tokens (whitespace + punctuation boundaries)."""
    return F.split(F.lower(F.trim(text)), r"[^a-z0-9']+")


def token_count(text: Column) -> Column:
    """Whitespace token count (cheap proxy for BPE token counts)."""
    return F.size(F.split(F.trim(text), r"\s+"))


def char_count(text: Column) -> Column:
    return F.length(text)


# GPT-2-style pre-tokenizer classes (no lookarounds — portable between
# Java regex and RE2): contraction suffixes, letter runs, digit runs,
# other-symbol runs
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s']+"


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count via the BPE pre-tokenizer regex — a far
    better LLM-token estimate than whitespace splitting (splits
    punctuation and digit runs off words)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0))


def alpha_ratio(text: Column) -> Column:
    """Fraction of alphanumeric characters — quality-score component."""
    return (
        F.length(F.regexp_replace(text, r"[^A-Za-z0-9]", ""))
        / F.greatest(F.length(text), F.lit(1))
    )


def punct_ratio(text: Column) -> Column:
    return (
        F.length(F.regexp_replace(text, r"[^.,;:!?'\"()-]", ""))
        / F.greatest(F.length(text), F.lit(1))
    )


# explicit ASCII whitespace class instead of \s: Java regex (Spark)
# and RE2 (the DuckDB oracle) disagree on \s's membership (\x0B), an
# explicit class is identical in both
_WS = "[ \\t\\n\\x0B\\f\\r]"
_CTRL = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"
# smart quotes / dashes / non-breaking space → ASCII
_PUNCT_FROM = "’‘“”–— "
_PUNCT_TO = "''\"\"-- "
# URL run for clean_text(remove_urls=True): stops at ASCII whitespace
# AND Unicode spaces (NBSP, ogham, Zs block, line/para sep, narrow
# NBSP, math space, ideographic space) — identical class in the
# DuckDB oracle via \x{...} escapes (same codepoints, RE2 syntax)
_URL_RUN = ("https?://[^ \\t\\n\\x0B\\f\\r\\u00A0\\u1680"
            "\\u2000-\\u200A\\u2028\\u2029\\u202F\\u205F\\u3000]+")


def clean_text(text: Column, lowercase: bool = False,
               collapse_whitespace: bool = True,
               strip_control: bool = True,
               normalize_punct: bool = True,
               remove_urls: bool = False) -> Column:
    """C4/CCNet-style text normalization as ONE pure-codegen column
    expression — the cleanup pass that precedes every hash-keyed
    operator here (exact/MinHash dedup, shingles, quality signals),
    where stray control bytes or smart quotes would otherwise split
    hash groups that are the same text to a human:

    * ``strip_control``      — drop C0/DEL control bytes (keep \\t \\n \\r
      for the whitespace pass);
    * ``remove_urls``        — drop ``http(s)://…`` runs (the C4 rule);
    * ``normalize_punct``    — smart quotes / en-em dashes / NBSP → ASCII
      (one codepoint-wise ``translate``);
    * ``collapse_whitespace``— any whitespace run → one space + trim;
    * ``lowercase``          — last, after all class-sensitive regexes.

    Every step is a native regexp/translate/lower — no UDF, and the
    identical regexes run in the DuckDB oracle (explicit ASCII classes
    sidestep Java-vs-RE2 ``\\s`` differences)."""
    c = text
    if strip_control:
        c = F.regexp_replace(c, _CTRL, "")
    if remove_urls:
        # terminate URLs on Unicode whitespace too (NBSP, Zs runs,
        # line/para separators) — remove_urls runs BEFORE the NBSP →
        # space translate, so an ASCII-only class would swallow an
        # NBSP-separated word following the URL
        c = F.regexp_replace(c, _URL_RUN, "")
    if normalize_punct:
        c = F.translate(c, _PUNCT_FROM, _PUNCT_TO)
    if collapse_whitespace:
        c = F.trim(F.regexp_replace(c, _WS + "+", " "))
    if lowercase:
        c = F.lower(c)
    return c


# Tracking parameters stripped by default: the UNAMBIGUOUS set — every
# one is a pure click-attribution token no server uses to select
# content (utm_* is matched as a prefix family).  `ref`/`ref_src` are
# deliberately NOT here: `ref` selects different content on many real
# sites (?ref=<branch> on forges, ?ref=<section> on news sites), so
# stripping it would merge genuinely distinct URLs and silently drop
# distinct documents — pass tracking_params=(..., "ref", "ref_src") to
# opt in for corpora where it is known to be referral-only.
DEFAULT_TRACKING_PARAMS = ("fbclid", "gclid", "msclkid", "mc_eid",
                           "igshid")


def _tracking_re(params) -> str:
    """Anchored alternation over the tracking-parameter list (matched
    on the LOWERCASED param; the (=.*)? arm catches valueless flags).
    Literal names only — escaped, so the list can't inject regex; the
    utm_ prefix family is always included.  Identical RE2/Java-regex
    semantics: anchored alternation of literals."""
    import re as _re

    alts = "".join("|" + _re.escape(str(p).lower()) for p in params)
    return f"^(utm_[a-z0-9_]*{alts})(=.*)?$"


def canonicalize_url(url: Column, strip_www: bool = True,
                     tracking_params=DEFAULT_TRACKING_PARAMS) -> Column:
    """Canonical form of an absolute http(s) URL as ONE pure-codegen
    expression — the identity crawl pipelines dedup on BEFORE any text
    comparison (the same page is fetched as http/https, with/without
    www, with rotating utm_* tags, in any query-param order):

    * fragment dropped (``#...`` never reaches the server);
    * scheme and host lowercased; userinfo stripped; default ports
      (``:80`` http, ``:443`` https) stripped; leading ``www.``
      stripped (``strip_www=False`` keeps it);
    * tracking parameters removed (utm_* plus ``tracking_params``,
      default `DEFAULT_TRACKING_PARAMS` — matched case-insensitively;
      extend the list per-corpus, e.g. with ``ref``/``ref_src`` where
      those are known referral-only), remaining parameters SORTED so
      param order is canonical;
    * a bare ``/`` path drops (``http://x.com/`` == ``http://x.com``);
      deeper paths keep their exact form (case and trailing slashes in
      real paths are significant).

    Non-http(s) inputs (mailto:, relative paths, garbage) pass through
    with only trim + fragment removal — canonicalizing what we can't
    parse would merge distinct keys.  Every step is a native
    regexp/split/filter/sort — no UDF, and the identical chain runs in
    the DuckDB oracle."""
    u = F.regexp_replace(F.trim(url), "#.*$", "")
    scheme = F.lower(F.regexp_extract(
        u, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_replace(
        F.regexp_extract(u, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1),
        "^[^@]*@", ""))
    host = (F.when(scheme == "http", F.regexp_replace(host, ":80$", ""))
            .when(scheme == "https",
                  F.regexp_replace(host, ":443$", ""))
            .otherwise(host))
    if strip_www:
        host = F.regexp_replace(host, "^www\\.", "")
    tail = F.regexp_replace(
        u, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "")
    path = F.regexp_extract(tail, "^([^?]*)", 1)
    path = F.when(path == "/", F.lit("")).otherwise(path)
    track_re = _tracking_re(tracking_params)
    kept = F.array_join(F.array_sort(F.filter(
        F.split(F.regexp_extract(tail, "\\?(.*)$", 1), "&"),
        lambda p: (p != "") & ~F.lower(p).rlike(track_re))), "&")
    canon = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(kept == "", F.lit(""))
        .otherwise(F.concat(F.lit("?"), kept)))
    return F.when(scheme.isin("http", "https"), canon).otherwise(u)


def url_dedup(df, url_col: str = "url", id_col: str = "doc_id",
              strip_www: bool = True,
              tracking_params=DEFAULT_TRACKING_PARAMS):
    """Keep one row per canonical URL: the minimum id (deterministic
    keeper) — `exact_dedup`'s contract at URL granularity, the stage a
    crawl pipeline runs before any text-level dedup (it removes refetch
    duplicates without touching document bytes).  Returns
    (canonical_url, keeper_id, dup_count); one hash aggregation, the
    canonicalization runs inside the scan stage."""
    return (df.select(
                canonicalize_url(F.col(url_col), strip_www=strip_www,
                                 tracking_params=tracking_params)
                .alias("canonical_url"),
                F.col(id_col))
            .groupBy("canonical_url")
            .agg(F.min(id_col).alias("keeper_id"),
                 F.count("*").alias("dup_count")))


def let(value: Column, body) -> Column:
    """Let-binding for SQL expressions: evaluate ``value`` ONCE and bind
    it as the lambda variable of ``body`` via a single-element
    ``transform``.  Higher-order functions evaluate their input array
    once and hand the lambda the bound element, so ``body`` may
    reference it any number of times without re-evaluating ``value`` —
    the Catalyst-safe alternative to staging intermediates through
    persist/checkpoint barriers (CollapseProject would otherwise inline
    ``value``'s tree into every reference).  Shared by textstats and
    dedup (single definition)."""
    return F.element_at(F.transform(F.array(value), body), 1)


_let = let  # internal alias


def _hits(toks: Column, lang: str) -> Column:
    arr = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def stopword_hits(text: Column, lang: str) -> Column:
    return _hits(tokens(text), lang)


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    # let-bound tokens: one regex pass for both the hit count and the size
    return _let(
        tokens(text),
        lambda t: _hits(t, lang) / F.greatest(F.size(t), F.lit(1)),
    )


def quality_score(text: Column) -> Column:
    """Deterministic quality heuristic in [0,1]: length band + alpha ratio
    + English stopword ratio (the standard Gopher/C4-style signals
    expressed as one arithmetic formula)."""
    n_tok = F.size(F.split(F.trim(text), r"\s+"))
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    return F.round(
        0.4 * len_score + 0.4 * alpha_ratio(text)
        + 0.2 * F.least(stopword_ratio(text, "en") * 5.0, F.lit(1.0)),
        6,
    )


def lang_id(text: Column) -> Column:
    """Heuristic language ID: argmax of per-language stopword hits with
    deterministic tie-break order en > fr > de > es > und.  Tokens are
    let-bound: one regex pass feeds all four languages' hit counts."""

    def _argmax(toks: Column) -> Column:
        hits = {lang: _hits(toks, lang) for lang in STOPWORDS}
        best = F.greatest(*hits.values())
        out = F.lit("und")
        # build reversed so earlier langs win ties via later when() override
        for lang in reversed(list(STOPWORDS)):
            out = F.when((hits[lang] > 0) & (hits[lang] == best),
                         F.lit(lang)).otherwise(out)
        return out

    return _let(tokens(text), _argmax)


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.
    Equal fingerprints ⇒ near-identical documents (normalization-invariant
    exact dup detection)."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.md5(norm)


def repetition_signals(text: Column) -> Column:
    """Gopher-style repetition/boilerplate quality rules (Rae et al.
    2021 "Scaling Language Models", public) as ONE native expression:
    struct<n_lines, dup_line_frac, bullet_line_frac, dup_word_frac,
    mean_word_len, alpha_word_frac, symbol_word_ratio>.

    Lines and tokens are each let-bound so one split pass per row feeds
    every signal (the CollapseProject countermeasure used throughout
    this module); everything stays in whole-stage codegen — the rules
    run as a straight projection over the corpus scan at any scale."""

    def _build(lines: Column, toks: Column) -> Column:
        n_lines = F.size(lines)
        n_words = F.size(toks)
        dup_line = F.when(
            n_lines > 0,
            1.0 - F.size(F.array_distinct(lines)) / n_lines.cast("double"),
        ).otherwise(F.lit(0.0))
        bullet = F.when(
            n_lines > 0,
            F.size(F.filter(lines, lambda l: l.rlike(r"^\s*[-*•]")))
            / n_lines.cast("double"),
        ).otherwise(F.lit(0.0))
        dup_word = F.when(
            n_words > 0,
            1.0 - F.size(F.array_distinct(toks)) / n_words.cast("double"),
        ).otherwise(F.lit(0.0))
        mean_len = F.when(
            n_words > 0,
            F.aggregate(toks, F.lit(0).cast("long"),
                        lambda acc, t: acc + F.length(t))
            / n_words.cast("double"),
        ).otherwise(F.lit(0.0))
        alpha_word = F.when(
            n_words > 0,
            F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
            / n_words.cast("double"),
        ).otherwise(F.lit(0.0))
        # '#' and '...' occurrences per word (replace-based counting is
        # engine-portable, unlike regex count functions)
        hashes = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
        dots = (F.length(text)
                - F.length(F.replace(text, F.lit("..."), F.lit("")))) / 3
        symbol = (hashes + dots) / F.greatest(n_words, F.lit(1)).cast("double")
        return F.struct(
            n_lines.alias("n_lines"),
            F.round(dup_line, 6).alias("dup_line_frac"),
            F.round(bullet, 6).alias("bullet_line_frac"),
            F.round(dup_word, 6).alias("dup_word_frac"),
            F.round(mean_len, 6).alias("mean_word_len"),
            F.round(alpha_word, 6).alias("alpha_word_frac"),
            F.round(symbol, 6).alias("symbol_word_ratio"),
        )

    return let(
        F.split(text, "\n"),
        lambda lines: let(tokens(text), lambda toks: _build(lines, toks)),
    )


def top_ngram_fraction(df, text_col: str = "text", id_col: str = "doc_id",
                       n: int = 2):
    """(id, top_gram, top_frac): fraction of the document's non-space
    characters covered by its most frequent word n-gram — the Gopher
    repetition filter for boilerplate detection.

    Distributed shape: explode n-grams → per-(doc, gram) count (hash
    aggregation with map-side partials) → per-doc top-1 window
    (tie-break: lexicographically smallest gram, so results are
    deterministic and oracle-reproducible).  Both shuffles key on the
    doc id (high cardinality), so the plan is skew-safe and linear in
    corpus size — never a cross join or per-doc collect."""
    from pyspark.sql import Window

    from .dedup import shingles_of_tokens

    chars = F.length(F.regexp_replace(F.col(text_col), r"\s", ""))
    grams = df.select(
        F.col(id_col), chars.alias("_chars"),
        F.explode(let(tokens(F.col(text_col)),
                      lambda t: shingles_of_tokens(t, n))).alias("gram"),
    )
    cnts = grams.groupBy(id_col, "_chars", "gram").count()
    w = Window.partitionBy(id_col).orderBy(F.desc("count"), F.asc("gram"))
    return (
        cnts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col(id_col),
            F.col("gram").alias("top_gram"),
            F.round(
                F.col("count") * F.length(F.replace(F.col("gram"), F.lit(" "),
                                                    F.lit("")))
                / F.greatest(F.col("_chars"), F.lit(1)).cast("double"),
                6).alias("top_frac"),
        )
    )


# ----------------------------------------------------------------------
# PII scrubbing (training-data hygiene)
# ----------------------------------------------------------------------

# deterministic, engine-portable regexes (no lookaround: RE2/DuckDB and
# Java regex must agree) — the standard first-pass scrub set
PII_PATTERNS = {
    "email": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    "phone": r"\+?[0-9][0-9()\-\s]{7,}[0-9]",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
}


def redact_pii(text: Column, kinds: tuple = ("email", "phone", "ipv4", "ssn"),
               token: str = "[PII]") -> Column:
    """Replace every PII match with ``token`` — chained native
    regexp_replace calls, whole-stage codegen, no UDF.  First-pass
    hygiene only (regex recall has limits); kinds apply in the given
    order, so earlier replacements can mask later patterns by design."""
    out = text
    for kind in kinds:
        out = F.regexp_replace(out, PII_PATTERNS[kind], token)
    return out


def pii_counts(text: Column) -> Column:
    """struct<email,phone,ipv4,ssn> match counts per document (native
    regexp_count) — audit signal driving filter/redact decisions."""
    return F.struct(*[
        F.regexp_count(text, F.lit(pat)).alias(kind)
        for kind, pat in PII_PATTERNS.items()
    ])


def vocab_topk(df, text_col: str = "text", top_k: int = 100):
    """Corpus-wide vocabulary: the ``top_k`` most frequent tokens with
    counts and corpus rank (tokenizer-vocab seeding, stopword mining).

    Distributed shape: explode tokens → hash aggregation on the token
    (map-side partial combine absorbs the Zipf skew: hot tokens
    pre-reduce per task before the shuffle) → global top-k via
    orderBy+limit, which Spark executes as TakeOrderedAndProject
    (per-partition partial top-k, then a k-row merge on one task —
    never a single-partition window over the full vocabulary).  The
    rank column is a window over the k surviving rows only.
    Tie-break: lexicographic, so results are deterministic."""
    from pyspark.sql import Window

    counts = (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token").agg(F.count("*").alias("n"))
    )
    topk = counts.orderBy(F.desc("n"), F.asc("token")).limit(top_k)
    w = Window.orderBy(F.desc("n"), F.asc("token"))  # k rows only
    return (
        topk.withColumn("rank", F.row_number().over(w))
        .select("rank", "token", "n")
    )


def _salted_count_join(big, counts, key: str, n_salt: int = 8,
                       how: str = "inner"):
    """Shuffled join of a Zipf-skewed fact table against a 1-row-per-key
    count table without a hot reduce partition: the count side
    replicates across ``n_salt`` salt values (vocabulary-sized × n_salt
    — still tiny next to the fact side), the fact side hashes its whole
    row into one, so a token holding half the corpus spreads over
    ``n_salt`` tasks instead of melting one.  Join result is identical
    to ``big.join(counts, on=key, how=how)``; this removes the reliance
    on AQE's runtime skew-join split (which nothing guarantees is
    enabled in a caller's session).  ``n_salt=1`` degrades to the plain
    join.  ``how='left'`` keeps misses as NULLs (valid because the salt
    replicates EVERY count row into every salt bucket, so a fact row's
    single bucket sees the full key set — a miss there is a true miss;
    backoff cascades rely on this, r15 advice dedupe of the former
    private ``_lj`` copy)."""
    if n_salt <= 1:
        return big.join(counts, on=key, how=how)
    b = big.withColumn(
        "_ts", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]),
                      F.lit(n_salt)).cast("int"))
    c = counts.withColumn(
        "_ts", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))))
    return b.join(c, on=[key, "_ts"], how=how).drop("_ts")


def tfidf_top_terms(df, text_col: str = "text", id_col: str = "doc_id",
                    k: int = 5, n_salt: int = 8):
    """Per-document top-``k`` terms by smoothed TF-IDF
    (``tf · (ln((N+1)/(df+1)) + 1)``, the sklearn convention — a
    published formula, keyword extraction / relevance-weighting staple).

    Distributed shape: one token explode → hash-agg to (doc, term, tf)
    (map-side combine absorbs Zipf skew) → hash-agg to (term, df) → a
    SALTED shuffled join back on the term (the document-frequency table
    is vocabulary-sized — NOT broadcast at 100 TB; the salt bounds the
    hot-token reduce partition, see ``_salted_count_join``) → the 1-row
    corpus count rides in via a broadcast cross join (the
    dissolve.py:173 pattern) → per-doc top-k window over the doc's
    distinct terms only.
    Scores are rounded to 6 decimals BEFORE ranking so a 1-ulp ``ln``
    difference between engines cannot flip a rank (the cosine-oracle
    precedent); ties break lexicographically."""
    from pyspark.sql import Window

    toks = (df.select(F.col(id_col), F.explode(
                tokens(F.col(text_col))).alias("term"))
            .filter(F.col("term") != ""))
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    ndocs = df.agg(F.count("*").alias("n_docs"))
    scored = (
        _salted_count_join(tf, dfreq, "term", n_salt)
        .crossJoin(F.broadcast(ndocs))
        .withColumn("tfidf", F.round(
            F.col("tf") * (F.log((F.col("n_docs") + F.lit(1.0))
                                 / (F.col("df") + F.lit(1.0)))
                           + F.lit(1.0)), 6))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(id_col, "term", "tfidf", "rank"))


def _bm25_doc_pass(df, text_col: str, id_col: str, term_filter=None):
    """The BM25 corpus pass: ONE tokenizer evaluation per row.

    Emits (id, ``_qs``) where ``_qs`` is an array of (dl, term)
    structs — element 1 is a sentinel with ``term`` NULL that carries
    the document length for the corpus-stats aggregate, the rest are
    the tokens the scorer explodes (optionally pre-filtered by
    ``term_filter``), each carrying ``dl`` alongside.  The whole array
    builds inside one ``let()`` so the regex split evaluates ONCE per
    row however many consumers the sentinel and elements have (the
    module's let() discipline — CollapseProject would otherwise inline
    the split into every reference)."""
    def body(t):
        kept = F.filter(t, term_filter) if term_filter is not None else t
        return F.concat(
            F.array(F.struct(F.size(t).alias("dl"),
                             F.lit(None).cast("string").alias("term"))),
            F.transform(kept, lambda q: F.struct(F.size(t).alias("dl"),
                                                 q.alias("term"))))

    return df.select(
        F.col(id_col),
        let(F.filter(tokens(F.col(text_col)), lambda x: x != F.lit("")),
            body).alias("_qs"))


def _bm25_stats(qs):
    return qs.agg(
        F.count("*").alias("n_docs"),
        F.avg(F.element_at(F.col("_qs"), 1)["dl"]).alias("avgdl"))


def _bm25_tf_base(qs, id_col: str):
    return (qs.select(F.col(id_col), F.explode("_qs").alias("_e"))
            .filter(F.col("_e.term").isNotNull())
            .select(F.col(id_col), F.col("_e.dl").alias("dl"),
                    F.col("_e.term").alias("term")))


def bm25_topk(df, query_terms: list, k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              text_col: str = "text", id_col: str = "doc_id"):
    """Top-``k`` documents for a bag of ``query_terms`` by Okapi BM25
    (Robertson et al., the published ranking function) — the classic
    lexical-retrieval scorer, e.g. for mining pretraining documents
    related to a benchmark.

    ``idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)`` (Lucene's
    non-negative variant); ``score = Σ_t idf·tf·(k1+1)/(tf + k1·(1−b
    + b·dl/avgdl))``.  Distributed shape: the corpus pass tokenizes
    each row ONCE (``_bm25_doc_pass`` — one let-bound regex split
    feeding both the document length and the explode) and explodes
    only tokens IN the query set (a narrow pre-filter), per-doc tf is
    one hash agg, per-term df is a second agg over that (query-sized
    output, broadcast back), and N/avgdl ride in as a broadcast 1-row
    aggregate; the final top-k is orderBy+limit, which Spark executes
    as TakeOrderedAndProject (per-partition partial top-k — no global
    sort).  Scores round to 6 decimals before ranking; ties break by
    ascending doc id."""
    from pyspark.sql import Window

    terms = sorted({str(t).lower() for t in query_terms})
    if not terms:
        raise ValueError("query_terms must be non-empty")
    tl = F.array(*[F.lit(t) for t in terms])
    qs = _bm25_doc_pass(df, text_col, id_col,
                        term_filter=lambda t: F.array_contains(tl, t))
    stats = _bm25_stats(qs)
    tf = (_bm25_tf_base(qs, id_col)
          .groupBy(id_col, "dl", "term").agg(F.count("*").alias("tf")))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    return _bm25_score_topk(tf, dfreq, stats, k, k1, b, id_col)


def _bm25_score_topk(tf, dfreq, stats, k, k1, b, id_col):
    """Shared BM25 scoring tail: (doc, dl, term, tf) × broadcast df ×
    broadcast 1-row stats → rounded per-doc sums → TakeOrdered top-k.
    The in-memory and stored-index paths both end here, so their
    arithmetic is identical by construction."""
    from pyspark.sql import Window

    part = (
        tf.join(F.broadcast(dfreq), on="term")
        .crossJoin(F.broadcast(stats))
        .withColumn("_s", (
            F.log((F.col("n_docs") - F.col("df") + F.lit(0.5))
                  / (F.col("df") + F.lit(0.5)) + F.lit(1.0))
            * F.col("tf") * F.lit(k1 + 1.0)
            / (F.col("tf") + F.lit(k1) * (F.lit(1.0 - b)
               + F.lit(b) * F.col("dl") / F.col("avgdl")))))
    )
    scored = (part.groupBy(id_col)
              .agg(F.round(F.sum("_s"), 6).alias("score")))
    topk = scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc(id_col))  # k rows only
    return (topk.withColumn("rank", F.row_number().over(w))
            .select(id_col, "score", "rank"))


#: stored stats schema (sum_dl NULL on legacy pre-sum_dl indexes);
#: used for explicit-schema reads that skip footer inference
_STATS_SCHEMA = "n_docs long, avgdl double, sum_dl long, n_buckets int"


def _write_stats_file(stats_dir: str, n_docs: int, avgdl: float,
                      sum_dl, n_buckets: int) -> None:
    """Write the 1-row stats dataset driver-side (pyarrow — no Spark
    job): same schema and values as the r16 Spark write (n_docs long,
    avgdl double, [sum_dl long,] n_buckets int; ``sum_dl=None``
    reproduces the legacy no-sum_dl layout).  The directory is
    replaced wholesale, matching overwrite-mode semantics.  Uses the
    shared driver-side writer (`sources.fs.write_one_row_parquet`) —
    see there for the scheme-less-path filesystem caveat."""
    import pyarrow as pa

    from ..sources.fs import write_one_row_parquet

    cols = {"n_docs": pa.array([int(n_docs)], pa.int64()),
            "avgdl": pa.array([float(avgdl)], pa.float64())}
    if sum_dl is not None:
        cols["sum_dl"] = pa.array([int(sum_dl)], pa.int64())
    cols["n_buckets"] = pa.array([int(n_buckets)], pa.int32())
    write_one_row_parquet(stats_dir, cols,
                          filename="part-00000-stats.parquet")


def write_text_index(df, path: str, n_buckets: int = 64,
                     text_col: str = "text", id_col: str = "doc_id",
                     append: bool = False,
                     commit_marker: str | None = None):
    """Persist an inverted BM25 index hive-partitioned by term-hash
    bucket — the lexical twin of `write_ivf_index`'s vector-DB layout
    on plain parquet: ``postings/`` holds one (doc, dl, term, tf) row
    per distinct doc-term pair, partitioned by
    ``pmod(hash(term), n_buckets)`` so a stored query reads ONLY its
    terms' buckets (static partition pruning — 100 TB of postings,
    n_query_terms/n_buckets of it scanned); ``stats/`` holds the
    1-row corpus aggregate (n_docs, avgdl, n_buckets).

    Per-term document frequency is NOT stored: it is recomputed at
    query time from the pruned postings (all of a term's postings
    live in one bucket, so the pruned read sees every one), keeping
    the index incrementally appendable without a df-merge step.

    The build tokenizes the corpus ONCE (the postings pass).  The
    stats row needs no second tokenize pass: ``n_docs`` is a
    column-pruned COUNT of ``df`` (every row emits exactly one
    postings-pass row, termless or not), and ``sum_dl`` — Σ_doc dl —
    equals Σ tf over the postings (dl = Σ_term tf(doc, term) for any
    doc with ≥ 1 token; termless and NULL-text docs contribute 0 to
    both sides).  A single-shot build reads Σ tf back off the
    just-written postings (an index-sized, tf-column-pruned scan, no
    cache cost); an append takes it from the BATCH-sized lazily
    checkpointed tf frame instead (a read-back would rescan the whole
    accumulated index every batch).

    ``append=True`` adds a NEW batch of documents to an existing
    index without touching its postings (the per-term bucketing makes
    that sound: df recomputes at query time from the union): postings
    append under the existing index's bucket count, and the 1-row
    stats merge as count-weighted means.  The caller guarantees the
    appended ``id_col`` values are disjoint from the stored ones —
    re-appending a document double-counts it, exactly like inserting
    it twice into any inverted index.

    An append is two writes (postings, then stats) and cannot be
    atomic on plain parquet; a ``_append_in_progress`` marker brackets
    them so a crash mid-append is DETECTABLE instead of silently
    skewing every later BM25 score: the stored readers refuse an index
    whose marker is still present (rebuild, or re-run the identical
    append — postings double-append is NOT idempotent, so the safe
    recovery is a rebuild).

    Stats carry ``sum_dl`` (the EXACT long token-count sum) alongside
    the derived ``avgdl``: appends merge by integer addition, so an
    index built in N appended batches has BIT-IDENTICAL stats to the
    single-shot build (a count-weighted mean of doubles would drift by
    ulps).  Legacy stats without ``sum_dl`` still append via the
    weighted-mean fallback.

    ``commit_marker``: path of a zero-byte file created after the
    stats write but BEFORE the in-progress marker is removed — a
    caller-visible commit record (the streaming indexer's per-batch
    exactly-once token) that can never exist alongside a torn
    append."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    from ..sources.fs import resolve_fs
    from .dedup import portable_hash

    base = path.rstrip("/")
    spark = df.sparkSession
    marker = None
    if append:
        _check_index_consistent(base)
        # explicit schema (r17): no footer-inference job — ~0.5 s of
        # pure action floor per append at any scale; a legacy
        # pre-sum_dl index reads sum_dl as NULL, which the merge
        # branch below already treats as "absent"
        prev = spark.read.schema(_STATS_SCHEMA) \
            .parquet(base + "/stats").head()
        n_buckets = int(prev["n_buckets"])
        fsys, mpath = resolve_fs(base + "/_append_in_progress")
        with fsys.open_output_stream(mpath) as out:
            out.write(b"append started; absence of this file means the "
                      b"postings/stats pair is consistent\n")
        marker = (fsys, mpath)
    qs = _bm25_doc_pass(df, text_col, id_col)
    tf = (_bm25_tf_base(qs, id_col)
          .groupBy(id_col, "dl", "term").agg(F.count("*").alias("tf"))
          .withColumn("term_bucket",
                      F.pmod(portable_hash(F.col("term")),
                             F.lit(int(n_buckets))).cast("int")))
    if append:
        # batch-sized (the postings being appended); the write job
        # below materializes it, the sum_dl aggregate reuses it —
        # the one-tokenize-pass stats derivation (see docstring)
        tf = tf.transform(plan_barrier)
    else:
        # drop the whole postings tree first (r16 ADVICE): under
        # spark.sql.sources.partitionOverwriteMode=dynamic an
        # overwrite leaves stale term_bucket partitions from a
        # previous larger index, and the sum_dl read-back below would
        # silently count them
        from pyarrow import fs as pafs

        fsys, ppath = resolve_fs(base + "/postings")
        try:
            if fsys.get_file_info(ppath).type != pafs.FileType.NotFound:
                fsys.delete_dir(ppath)
        except FileNotFoundError:
            pass
    tf.write.mode("append" if append else "overwrite") \
        .partitionBy("term_bucket").parquet(base + "/postings")
    # stats WITHOUT a second corpus tokenize pass: n_docs = plain
    # count (exact — the doc pass is a select, it drops no rows);
    # sum_dl = Σ tf (exact — see docstring equivalence)
    if append:
        n1 = int(df.count())
        s1 = int(tf.agg(F.coalesce(F.sum("tf"), F.lit(0))
                        .cast("long").alias("_s")).head()["_s"])
        n0 = int(prev["n_docs"])
        s0 = (int(prev["sum_dl"])
              if "sum_dl" in prev.asDict() and prev["sum_dl"] is not None
              else None)
        n_total = n0 + n1
        if s0 is not None:
            # exact integer merge: identical stats to a single-shot
            # build over the union (avg = exact_sum / count, the same
            # IEEE division Spark's avg performs)
            s_total = s0 + s1
            avg = (float(s_total) / n_total) if n_total else 0.0
        else:
            # legacy index without sum_dl: count-weighted double mean
            s_total = None
            avg = ((float(prev["avgdl"]) * n0
                    + (float(s1) / n1 if n1 else 0.0) * n1)
                   / float(n_total)) if n_total else 0.0
        n_docs = n_total
    else:
        # sum_dl read back off the just-written postings (tf-column-
        # pruned, index-sized); avgdl = exact_sum / count, the same
        # long->double IEEE division the merge path performs.
        # Explicit subset schema: no footer-inference job, and a
        # fully termless corpus (zero postings part files) reads as
        # an empty relation instead of failing inference
        n_docs = int(df.count())
        s_total = int(spark.read.schema("tf long")
                      .parquet(base + "/postings")
                      .agg(F.coalesce(F.sum("tf"), F.lit(0))
                           .cast("long").alias("_s")).head()["_s"])
        avg = (float(s_total) / n_docs) if n_docs > 0 else 0.0
    # the 1-row stats file is written DRIVER-SIDE (r17): a Spark
    # parquet write of a 1-row local relation is a full job + commit
    # (~0.5-1.5 s of pure action floor per build/append, at any data
    # size); the values are already driver scalars
    _write_stats_file(base + "/stats", n_docs, avg, s_total,
                      int(n_buckets))
    if commit_marker:
        cfs, cpath = resolve_fs(commit_marker)
        with cfs.open_output_stream(cpath) as out:
            out.write(b"committed\n")
    if marker is not None:
        marker[0].delete_file(marker[1])


def _check_index_consistent(base: str) -> None:
    """Raise if a previous ``write_text_index(append=True)`` died
    between its postings append and its stats rewrite (marker file
    still present) — scoring against the half-updated pair silently
    skews every BM25 result."""
    from pyarrow import fs as pafs

    from ..sources.fs import resolve_fs

    fsys, mpath = resolve_fs(base.rstrip("/") + "/_append_in_progress")
    try:
        info = fsys.get_file_info(mpath)
    except Exception:
        return
    if info.type != pafs.FileType.NotFound:
        raise RuntimeError(
            f"text index at {base!r} was left inconsistent by a failed "
            "append (_append_in_progress marker present): its postings "
            "and stats disagree — rebuild the index with append=False")


def _text_deletes(spark, base: str, id_col: str):
    """The tombstone frame of a stored text index — one (id, dl) row
    per deleted document, deduped — or None when nothing was ever
    deleted."""
    from pyarrow import fs as pafs

    from ..sources.fs import resolve_fs

    # an fs error here must PROPAGATE: answering "no tombstones" on a
    # transient failure would resurface deleted documents silently
    # (contrast _check_index_consistent, where a failed probe only
    # skips a guard)
    fsys, mpath = resolve_fs(base.rstrip("/") + "/deletes")
    if fsys.get_file_info(mpath).type == pafs.FileType.NotFound:
        return None
    return (spark.read.parquet(base.rstrip("/") + "/deletes")
            .groupBy(id_col).agg(F.min("dl").alias("dl")))


def _stored_sum_dl(stats):
    """The index's exact integer token total: ``sum_dl`` where the
    index stores it, else reconstructed as round(avgdl·n_docs) —
    exact while the true sum stays under ~10^15 (double error < 0.5;
    legacy pre-sum_dl indexes only)."""
    return (F.col("sum_dl") if "sum_dl" in stats.columns
            else F.round(F.col("avgdl") * F.col("n_docs"), 0)
            .cast("long"))


def _apply_text_deletes(spark, base: str, tf, stats, id_col: str):
    """Fold tombstones into a stored-index query: anti-join the
    pruned postings (broadcast — a tombstone set is tiny next to an
    index) and correct (n_docs, avgdl) EXACTLY: the tombstones'
    integer dl-sum subtracts from the stored integer token total,
    and the quotient over the surviving count is bit-identical to an
    avg computed over the surviving corpus — which is what the
    oracle computes.  Returns (tf, stats) unchanged when no deletes
    exist."""
    tomb = _text_deletes(spark, base, id_col)
    st = stats.select("n_docs", "avgdl")
    if tomb is None:
        return tf, st
    tf = tf.join(F.broadcast(tomb.select(id_col)), id_col,
                 "left_anti")
    d = tomb.agg(F.count("*").alias("_nd"),
                 F.coalesce(F.sum("dl"), F.lit(0)).alias("_dls"))
    st = (stats.crossJoin(F.broadcast(d))
          .select(
              (F.col("n_docs") - F.col("_nd")).alias("n_docs"),
              ((_stored_sum_dl(stats) - F.col("_dls"))
               .cast("double")
               / (F.col("n_docs") - F.col("_nd"))).alias("avgdl")))
    return tf, st


def delete_documents(spark, path: str, ids,
                     id_col: str = "doc_id") -> int:
    """LOGICAL deletion from a stored text index — the
    right-to-be-forgotten path every long-lived training-data index
    eventually needs: tombstone the ids under ``<index>/deletes``
    (one (id, dl) row each; dl recovered from the doc's own postings
    so the stats correction is exact) and every stored query
    (`bm25_topk_stored` / `bm25_batch_topk_stored`) anti-joins them
    and re-derives df/n_docs/avgdl as if the docs were never
    indexed.  ``ids`` is a DataFrame with ``id_col`` or a plain
    id list.  Already-tombstoned ids are skipped (idempotent);
    returns the number of NEWLY tombstoned ids.

    Cost: one postings scan per delete BATCH (to recover dl) — batch
    deletes, don't loop.  Contract: pass ids that are actually in
    the index; a never-indexed id would still decrement the
    document count (only token-bearing docs are verifiable).
    `apply_deletes` folds tombstones in physically."""
    base = path.rstrip("/")
    _check_index_consistent(base)
    if isinstance(ids, (list, tuple, set)):
        ids_df = spark.createDataFrame(
            [(int(i),) for i in sorted(ids)], f"{id_col} long")
    else:
        ids_df = ids.select(F.col(id_col).cast("long").alias(id_col))
    ids_df = ids_df.distinct()
    prior = _text_deletes(spark, base, id_col)
    if prior is not None:
        ids_df = ids_df.join(prior.select(id_col), id_col,
                             "left_anti")
    dl = (spark.read.parquet(base + "/postings")
          .select(id_col, "dl")
          .join(F.broadcast(ids_df), id_col, "left_semi")
          .groupBy(id_col).agg(F.min("dl").alias("dl")))
    tomb = (ids_df.join(dl, id_col, "left")
            .select(id_col,
                    F.coalesce("dl", F.lit(0)).cast("long")
                    .alias("dl"))
            .localCheckpoint())
    n = tomb.count()
    if n:
        tomb.write.mode("append").parquet(base + "/deletes")
    return n


def apply_deletes(spark, path: str, id_col: str = "doc_id") -> int:
    """PHYSICAL deletion: rewrite postings minus the tombstoned docs
    (preserving the term-bucket hive layout), fold the correction
    into ``stats``, drop the tombstone dir.  Guarded by the same
    ``_append_in_progress`` marker as appends — a crash mid-rewrite
    leaves the marker and every stored reader refuses (rebuild),
    never a silently half-deleted index.  Run between query batches
    (the swap is two renames, not atomic for concurrent readers).
    Returns the number of tombstones applied (0 = no-op)."""
    base = path.rstrip("/")
    _check_index_consistent(base)
    tomb = _text_deletes(spark, base, id_col)
    if tomb is None:
        return 0
    tomb = tomb.localCheckpoint()
    n = tomb.count()
    prev = spark.read.schema(_STATS_SCHEMA) \
        .parquet(base + "/stats").head()
    if n >= int(prev["n_docs"]):
        # an emptied index cannot be rewritten in place (an empty
        # partitioned postings dir has no inferable schema) — and
        # "delete everything" is a rebuild, not a maintenance pass
        raise ValueError(
            f"apply_deletes would empty the index at {base!r} "
            f"({n} tombstones >= every stored doc) — drop and "
            "rebuild it instead")
    jvm = spark._jvm
    HP = jvm.org.apache.hadoop.fs.Path
    fs = HP(base).getFileSystem(spark._jsc.hadoopConfiguration())
    fs.create(HP(base + "/_append_in_progress"), True).close()
    (spark.read.parquet(base + "/postings")
     .join(F.broadcast(tomb.select(id_col)), id_col, "left_anti")
     .write.partitionBy("term_bucket").mode("overwrite")
     .parquet(base + "/postings_new"))
    # stats correction computed driver-side (r17): one narrow agg
    # over the checkpointed tombstones replaces the r16 crossJoin +
    # 1-row Spark write (a broadcast job plus a write job of pure
    # action floor); arithmetic replicates the r16 expressions
    # exactly (HALF_UP legacy reconstruction, double division)
    drow = tomb.agg(F.count("*").alias("_nd"),
                    F.coalesce(F.sum("dl"), F.lit(0)).alias("_dls")) \
        .head()
    nd_, dls = int(drow["_nd"]), int(drow["_dls"])
    legacy = prev["sum_dl"] is None
    if legacy:
        # _stored_sum_dl's reconstruction: round(avgdl*n_docs, 0)
        # HALF_UP on the exact double product, as Spark's round does
        from decimal import ROUND_HALF_UP, Decimal

        sum0 = int(Decimal(float(prev["avgdl"]) * int(prev["n_docs"]))
                   .quantize(Decimal(1), rounding=ROUND_HALF_UP))
    else:
        sum0 = int(prev["sum_dl"])
    new_n = int(prev["n_docs"]) - nd_
    new_sum = sum0 - dls
    _write_stats_file(base + "/stats_new", new_n,
                      float(new_sum) / new_n,
                      None if legacy else new_sum,
                      int(prev["n_buckets"]))
    fs.delete(HP(base + "/postings"), True)
    fs.rename(HP(base + "/postings_new"), HP(base + "/postings"))
    fs.delete(HP(base + "/stats"), True)
    fs.rename(HP(base + "/stats_new"), HP(base + "/stats"))
    fs.delete(HP(base + "/deletes"), True)
    fs.delete(HP(base + "/_append_in_progress"), False)
    return n


def bm25_topk_stored(spark, path: str, query_terms: list, k: int = 10,
                     k1: float = 1.2, b: float = 0.75,
                     id_col: str = "doc_id"):
    """Top-``k`` by Okapi BM25 over a `write_text_index` dataset
    WITHOUT touching the corpus: the query's term buckets (the same
    60-bit md5 hash, computed driver-side) become a static
    ``term_bucket IN (...)`` partition filter on the postings scan —
    the skipped buckets never enter the file index — and ``term IN``
    prunes row groups inside them; df/tf come from the pruned read and
    the scoring tail is `bm25_topk`'s own (`_bm25_score_topk`), so the
    result contract matches the in-memory path exactly."""
    import hashlib

    terms = sorted({str(t).lower() for t in query_terms})
    if not terms:
        raise ValueError("query_terms must be non-empty")
    base = path.rstrip("/")
    _check_index_consistent(base)
    stats = spark.read.parquet(base + "/stats")
    n_buckets = stats.head()["n_buckets"]
    buckets = sorted({
        int(hashlib.md5(t.encode("utf-8")).hexdigest()[:15], 16)
        % int(n_buckets) for t in terms})
    tf = (spark.read.parquet(base + "/postings")
          .filter(F.col("term_bucket").isin(buckets))
          .filter(F.col("term").isin(terms))
          .select(id_col, "dl", "term", "tf"))
    # tombstoned docs (delete_documents) drop out and df/stats
    # re-derive as if they were never indexed
    tf, st = _apply_text_deletes(spark, base, tf, stats, id_col)
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    return _bm25_score_topk(tf, dfreq, st, k, k1, b, id_col)


def corpus_stats(df, text_col: str = "text", group_col=None,
                 short_tokens: int = 20, long_tokens: int = 1000,
                 percentiles: list[float] | None = None,
                 percentile_k: int = 2048, percentile_bits: int = 20):
    """One-pass data-card statistics — the summary table every corpus
    release publishes (docs, bytes, tokens, exact-dup rate, length
    mix), per ``group_col`` (source, lang, shard, ...) or corpus-wide.

    Every statistic is a SINGLE hash-aggregation over one scan — no
    sort, no window, no exact percentile (which would buffer a
    group's values in memory).  Length PERCENTILES come from the
    mergeable q-digest instead: ``percentiles=[0.5, 0.9, 0.99]`` adds
    ``p50_tokens``/``p90_tokens``/``p99_tokens`` columns computed by
    `sketches.qd_sketch` over the token counts — one extra histogram
    pass, rank error <= percentile_bits/percentile_k of a group's
    docs, and the digest machinery is the same that scales to 100 TB
    (the default path stays byte-identical when ``percentiles`` is
    None).  The distinct-text count is exact (``count_distinct`` over
    the md5 — one expand, the price of an exact dup rate; swap in
    ``approx_count_distinct`` for a one-pass sketch when 2% error is
    acceptable — not used here because the driver oracle demands
    exactness).

    Returns one row per group: n_docs, n_null_text, n_chars,
    n_tokens, distinct_texts, dup_frac (round 6), avg_tokens
    (round 4), max_tokens, short_frac / long_frac (round 6)
    [+ p{N}_tokens per requested percentile]."""
    toks = F.when(F.col(text_col).isNotNull(),
                  token_count(F.col(text_col)))
    nonnull = F.count(F.col(text_col))
    distinct = F.count_distinct(F.md5(F.col(text_col)))
    aggs = [
        F.count("*").alias("n_docs"),
        (F.count("*") - nonnull).cast("long").alias("n_null_text"),
        F.coalesce(F.sum(F.length(F.col(text_col))), F.lit(0))
        .cast("long").alias("n_chars"),
        F.coalesce(F.sum(toks), F.lit(0)).cast("long")
        .alias("n_tokens"),
        distinct.cast("long").alias("distinct_texts"),
        F.round(F.when(nonnull > 0,
                       1.0 - distinct / nonnull).otherwise(0.0), 6)
        .alias("dup_frac"),
        F.round(F.coalesce(F.avg(toks), F.lit(0.0)), 4)
        .alias("avg_tokens"),
        F.coalesce(F.max(toks), F.lit(0)).cast("long")
        .alias("max_tokens"),
        F.round(F.coalesce(
            F.avg((toks < int(short_tokens)).cast("double")),
            F.lit(0.0)), 6).alias("short_frac"),
        F.round(F.coalesce(
            F.avg((toks > int(long_tokens)).cast("double")),
            F.lit(0.0)), 6).alias("long_frac"),
    ]
    stats = (df.agg(*aggs) if group_col is None
             else df.groupBy(group_col).agg(*aggs))
    if not percentiles:
        return stats
    from .sketches import qd_quantiles, qd_sketch

    keys = [group_col] if group_col is not None else []
    vals = (df.filter(F.col(text_col).isNotNull())
            .select(*keys, token_count(F.col(text_col)).alias("_nt")))
    sk = qd_sketch(vals, "_nt", k=percentile_k, bits=percentile_bits,
                   by=keys or None)
    qd = qd_quantiles(sk, list(percentiles), bits=percentile_bits,
                      by=keys or None)
    # name via a rounded :g repr: str(0.29 * 100) is
    # '28.999999999999996' in IEEE754 — p29_tokens, not FP noise
    piv = qd.groupBy(*keys).agg(*[
        F.max(F.when(F.col("q") == F.lit(float(q)),
                     F.col("quantile")))
        .alias(f"p{round(float(q) * 100, 6):g}_tokens"
               .replace(".", "_"))
        for q in percentiles])
    if keys:
        return stats.join(piv, keys, "left")
    return stats.crossJoin(F.broadcast(piv))


def _dsir_grams(df, text_col: str, id_col=None):
    """(id?, gram) rows: lowercased word unigrams + space-joined word
    bigrams — the hashed-ngram feature set of DSIR (Xie et al. 2023).
    One tokenizer pass; sub-2-token docs contribute unigrams only."""
    from .dedup import shingles_of_tokens

    toks = let(tokens(F.col(text_col)),
               lambda t: F.filter(t, lambda x: x != F.lit("")))
    grams = let(toks, lambda t: F.concat(
        t, F.when(F.size(t) >= 2,
                  shingles_of_tokens(t, 2)).otherwise(
            F.array().cast("array<string>"))))
    cols = ([F.col(id_col)] if id_col else []) \
        + [F.explode(grams).alias("gram")]
    return df.select(*cols)


def _dsir_bucket_logprobs(grams, n_buckets: int, alpha: float,
                          name: str):
    """Hashed-ngram bag model as ONE bounded table: (bucket,
    ln((c_b + alpha) / (N + alpha * n_buckets))) over n_buckets rows —
    fixed size regardless of corpus size, which is DSIR's engineering
    point: the model broadcasts, the corpus never shuffles."""
    from .dedup import portable_hash

    counts = (grams
              .select(F.pmod(portable_hash(F.col("gram")),
                             F.lit(int(n_buckets))).alias("bucket"))
              .groupBy("bucket").agg(F.count("*").alias("c")))
    # COALESCE: an EMPTY corpus (no grams at all) must degrade to the
    # uniform smoothing model p_b = 1/n_buckets, not NULL-poison every
    # downstream log (sum over zero rows is NULL, not 0)
    total = counts.agg(F.coalesce(F.sum("c"), F.lit(0)).alias("n"))
    return (counts.crossJoin(F.broadcast(total))
            .select("bucket", F.log(
                (F.col("c") + F.lit(float(alpha)))
                / (F.col("n") + F.lit(float(alpha) * n_buckets)))
                .alias(name)),
            total)


def dsir_logweights(df, target, text_col: str = "text",
                    id_col: str = "doc_id",
                    target_text_col: str | None = None,
                    n_buckets: int = 10000, alpha: float = 1.0):
    """DSIR importance weights (Xie et al., NeurIPS 2023 — Data
    Selection via Importance Resampling): score each RAW document by
    the log-likelihood ratio of its hashed n-gram features under a
    bag-of-ngrams model of the TARGET corpus vs one of the raw corpus
    itself — the published recipe for shifting a crawl toward a
    high-quality target distribution (Wikipedia, books, benchmark
    domains) without training a model.  Compose with
    `operators/sampling.weighted_sample(weight_col=exp(logweight))`
    or a top-fraction filter for the selection step.

    Features: unigrams + word bigrams hashed into ``n_buckets`` via
    the module's portable 60-bit md5 hash.  Models:
    ``p_b = (c_target(b) + alpha) / (N_target + alpha * n_buckets)``
    and ``q_b`` likewise over the raw corpus; a document scores
    ``sum over gram occurrences of ln(p_b) - ln(q_b)``.

    Distributed shape — the reason hashed DSIR works at 100 TB: both
    models are FIXED-SIZE tables (``n_buckets`` rows) no matter the
    corpus size, built by one map-side-combined count each, and ride
    into the scoring pass as BROADCASTS; the corpus itself is
    tokenized twice (count pass + scoring pass, the price of q being
    corpus-trained) but NEVER shuffles — the only corpus-keyed
    exchange is the per-doc aggregation of the scoring pass.  Buckets
    unseen in a model take the smoothing floor (their ln rides in via
    the broadcast join's COALESCE against the floor literal).

    Returns (id, n_grams, logweight, avg_logratio): ``logweight``
    rounds to 5 and ``avg_logratio`` to 6 decimals (cross-engine
    summation order); token-less docs drop out (no features — no
    weight)."""
    tgt_col = target_text_col or text_col
    p_tbl, p_tot = _dsir_bucket_logprobs(
        _dsir_grams(target, tgt_col), n_buckets, alpha, "_lp")
    q_tbl, q_tot = _dsir_bucket_logprobs(
        _dsir_grams(df, text_col), n_buckets, alpha, "_lq")
    from .dedup import portable_hash

    scored = (_dsir_grams(df, text_col, id_col=id_col)
              .select(F.col(id_col),
                      F.pmod(portable_hash(F.col("gram")),
                             F.lit(int(n_buckets))).alias("bucket")))
    # smoothing floors for buckets absent from a model's count table:
    # ln(alpha / (N + alpha * n_buckets)) — N rides in as a 1-row
    # broadcast on each side
    floor_p = F.log(F.lit(float(alpha))
                    / (F.col("_np") + F.lit(float(alpha) * n_buckets)))
    floor_q = F.log(F.lit(float(alpha))
                    / (F.col("_nq") + F.lit(float(alpha) * n_buckets)))
    out = (scored
           .join(F.broadcast(p_tbl), on="bucket", how="left")
           .join(F.broadcast(q_tbl), on="bucket", how="left")
           .crossJoin(F.broadcast(p_tot.select(F.col("n").alias("_np"))))
           .crossJoin(F.broadcast(q_tot.select(F.col("n").alias("_nq"))))
           .withColumn("_lr", F.coalesce(F.col("_lp"), floor_p)
                       - F.coalesce(F.col("_lq"), floor_q)))
    return (out.groupBy(id_col)
            .agg(F.count("*").alias("n_grams"),
                 F.round(F.sum("_lr"), 5).alias("logweight"),
                 F.round(F.avg("_lr"), 6).alias("avg_logratio")))


def ngram_logprob(df, text_col: str = "text", id_col: str = "doc_id",
                  alpha: float = 0.1, n_salt: int = 8):
    """Per-document mean bigram log-probability under an add-alpha
    smoothed bigram model trained on the corpus itself — the
    CCNet/Gopher-style LM-quality signal without an external LM:
    documents whose word transitions are corpus-unusual (boilerplate,
    mangled encodings, keyword stuffing) score low and become filter
    candidates.

    ``P(w2|w1) = (c(w1 w2) + α) / (c(w1) + α·V)`` with corpus bigram/
    unigram counts and vocabulary size V; a document scores the mean
    ``ln P`` over its bigrams (documents under two tokens drop out).

    Distributed shape: ONE tokenizer pass feeds both the count tables
    and the per-doc bigram list; bigram and unigram counts are two
    hash aggregations; the scoring joins on the bigram/unigram keys
    are SALTED shuffled joins (the count tables are vocabulary-sized —
    never broadcast at corpus scale; the salt bounds the hot-token
    reduce partition, see ``_salted_count_join``) while V and nothing
    else rides in as a broadcast 1-row aggregate.  The mean rounds to
    6 decimals (the per-doc ln summation order differs between
    engines)."""
    from .dedup import shingles_of_tokens

    a = float(alpha)
    toks = df.select(
        F.col(id_col),
        let(tokens(F.col(text_col)),
            lambda t: F.filter(t, lambda x: x != F.lit(""))).alias("_t"))
    big = (toks.filter(F.size("_t") >= 2)
           .select(F.col(id_col),
                   F.explode(shingles_of_tokens(F.col("_t"), 2))
                   .alias("gram")))
    uni = toks.select(F.col(id_col), F.explode("_t").alias("w"))
    cb = big.groupBy("gram").agg(F.count("*").alias("cb"))
    cu = uni.groupBy("w").agg(F.count("*").alias("cu"))
    vocab = cu.agg(F.count("*").alias("v"))
    scored = (
        _salted_count_join(big, cb, "gram", n_salt)
        .withColumn("w", F.split(F.col("gram"), " ").getItem(0))
        .transform(lambda d: _salted_count_join(d, cu, "w", n_salt))
        .crossJoin(F.broadcast(vocab))
        .withColumn("_lp", F.log(
            (F.col("cb") + F.lit(a))
            / (F.col("cu") + F.lit(a) * F.col("v"))))
    )
    return (scored.groupBy(id_col)
            .agg(F.count("*").alias("n_bigrams"),
                 F.round(F.avg("_lp"), 6).alias("avg_logprob")))


def kn_perplexity(df, text_col: str = "text", id_col: str = "doc_id",
                  discount: float = 0.75, n_salt: int = 8):
    """Per-document perplexity under an interpolated Kneser-Ney
    trigram LM trained on the corpus itself (Kneser & Ney 1995; Chen
    & Goodman 1999) — the CCNet/KenLM-class quality gate that every
    published crawl pipeline ships, upgrading the add-alpha bigram
    `ngram_logprob`: KN's lower orders use CONTINUATION counts (in
    how many distinct contexts does a word appear), so boilerplate
    that repeats one context a million times no longer looks fluent.

    Fixed-discount interpolated KN with lower-order counts derived
    from the trigram type table (the standard implementation
    convention):

      P(w3|w1w2) = max(c3-D,0)/c2 + (D·N1+(w1w2·)/c2) · P(w3|w2)
      P(w3|w2)   = max(N1+(·w2w3)-D,0)/N1+(·w2·)
                   + (D·N1+(w2·)/N1+(·w2·)) · P(w3)
      P(w3)      = max(N1+(·w3)-D,0)/N1+(··)
                   + (D·|{w:N1+(·w)>0}|/N1+(··)) · (1/V)

    Self-trained scoring means every scored trigram occurs in the
    corpus, so no zero-count context branch exists (c2 ≥ 1,
    N1+(·w2·) ≥ 1 always).  P quantizes to 12 decimals before ln
    (the pagerank convention); a document scores the mean ln P over
    its trigrams rounded to 6 (cross-engine summation order), and
    ``perplexity = round(exp(-avg_logprob), 6)`` derives from the
    ROUNDED mean so both engines exponentiate the identical double.
    Documents under three tokens drop out.

    Distributed shape (100 TB): one tokenizer pass; every model
    table is a hash aggregation over TRIGRAM TYPES (bounded by
    distinct trigrams, never corpus occurrences — map-side combine
    absorbs the Zipf mass); the model-internal joins are
    type-table-sized; the only corpus-scale join is the scoring
    join, SALTED like `ngram_logprob`'s (the probability table is
    type-sized — never broadcast at scale); V and the three global
    denominators ride in as 1-row broadcasts.  No Python stages
    anywhere — the whole model is codegen aggregation arithmetic.

    Returns (id, n_trigrams, avg_logprob, perplexity)."""
    from .dedup import shingles_of_tokens

    d = float(discount)
    toks = df.select(
        F.col(id_col),
        let(tokens(F.col(text_col)),
            lambda t: F.filter(t, lambda x: x != F.lit(""))).alias("_t"))
    tri = (toks.filter(F.size("_t") >= 3)
           .select(F.col(id_col),
                   F.explode(shingles_of_tokens(F.col("_t"), 3))
                   .alias("gram")))
    # localCheckpoint: FIVE downstream aggregations/joins derive from
    # the trigram type table — materializing it keeps the corpus
    # tokenize+count pass at ONE (plus the scoring pass), instead of
    # re-deriving the corpus scan per consumer
    t3 = (tri.groupBy("gram").agg(F.count("*").alias("c3"))
          .withColumn("w1", F.split("gram", " ").getItem(0))
          .withColumn("w2", F.split("gram", " ").getItem(1))
          .withColumn("w3", F.split("gram", " ").getItem(2))
          .transform(plan_barrier))
    # trigram-context table: c2 = Σ c3, N1+(w1w2·) = type rows
    ctx2 = t3.groupBy("w1", "w2").agg(
        F.sum("c3").alias("c2"), F.count("*").alias("n1fw"))
    # middle order: N1+(·w2w3) = distinct w1 per (w2,w3) type row
    cont2 = t3.groupBy("w2", "w3").agg(F.count("*").alias("cc2"))
    # N1+(·w2·) = distinct (w1,w3) per w2; N1+(w2·) = distinct w3
    ctx1 = (t3.groupBy("w2")
            .agg(F.count("*").alias("m2"),
                 F.count_distinct("w3").alias("n1mid")))
    # unigram continuation: N1+(·w3) = distinct w2 preceding w3
    cont1 = cont2.groupBy("w3").agg(F.count("*").alias("cc1"))
    n1pp = cont2.agg(F.count("*").alias("_n1pp"))   # N1+(··)
    nuni = cont1.agg(F.count("*").alias("_nuni"))   # |{w: N1+(·w)>0}|
    vocab = (toks.select(F.explode("_t").alias("w")).distinct()
             .agg(F.count("*").alias("_v")))
    dd = F.lit(d)
    model = (t3
             .join(ctx2, ["w1", "w2"])
             .join(cont2, ["w2", "w3"])
             .join(ctx1, "w2")
             .join(cont1, "w3")
             .crossJoin(F.broadcast(n1pp))
             .crossJoin(F.broadcast(nuni))
             .crossJoin(F.broadcast(vocab))
             .withColumn("_p1", (F.greatest(F.col("cc1") - dd,
                                            F.lit(0.0))
                                 / F.col("_n1pp"))
                         + (((dd * F.col("_nuni")) / F.col("_n1pp"))
                            * (F.lit(1.0) / F.col("_v"))))
             .withColumn("_p2", (F.greatest(F.col("cc2") - dd,
                                            F.lit(0.0))
                                 / F.col("m2"))
                         + (((dd * F.col("n1mid")) / F.col("m2"))
                            * F.col("_p1")))
             .withColumn("_p3", (F.greatest(F.col("c3") - dd,
                                            F.lit(0.0))
                                 / F.col("c2"))
                         + (((dd * F.col("n1fw")) / F.col("c2"))
                            * F.col("_p2")))
             .select("gram",
                     F.log(F.round(F.col("_p3"), 12)).alias("_lp")))
    scored = _salted_count_join(tri, model, "gram", n_salt)
    return (scored.groupBy(id_col)
            .agg(F.count("*").alias("n_trigrams"),
                 F.round(F.avg("_lp"), 6).alias("avg_logprob"))
            .withColumn("perplexity",
                        F.round(F.exp(-F.col("avg_logprob")), 6)))


def c4_clean(df, text_col: str = "text", id_col: str = "doc_id",
             min_words: int = 5, min_lines: int = 3,
             clean_col: str = "text_clean"):
    """The C4 line-level cleaning stage (Raffel et al. 2020, §2.2 —
    the published rules behind the Colossal Clean Crawled Corpus),
    SURGICAL like `span_removal`: lines survive only if they end in a
    terminal punctuation mark (period / exclamation / question mark /
    end quotation), carry at least ``min_words`` words, and do not
    mention "javascript"; the page-level ``keep`` flag additionally
    requires no "lorem ipsum", no curly brace (the code heuristic),
    and at least ``min_lines`` surviving lines (the paper's
    three-sentence floor, applied at line granularity).  Compose with
    `badword_hits` for the paper's blocklist rule — already a
    separate operator.

    Returns (id, clean_col, n_lines_kept, n_lines_dropped, keep).

    One pure-codegen projection over the corpus scan — lines are
    let-bound so the split happens once per row; no shuffle, no
    Python, trivially 100-TB (the `repetition_signals` shape)."""
    text = F.col(text_col)
    lines = F.split(text, "\n")

    def _keep_line(li):
        # _WS, not \s: Java counts \x0B as \s, RE2/DuckDB does not
        toks = F.filter(F.split(F.trim(li), _WS + "+"),
                        lambda x: x != F.lit(""))
        # \z, not $: Java's $ matches before a trailing newline
        # (the byte-BPE fast-path lesson)
        return (F.rtrim(li).rlike('[.!?"”]\\z')
                & (F.size(toks) >= int(min_words))
                & ~F.lower(li).contains("javascript"))

    def _build(ls):
        kept = F.filter(ls, _keep_line)
        n_kept = F.size(kept)
        page_ok = (~F.lower(text).contains("lorem ipsum")
                   & ~text.contains("{")
                   & (n_kept >= int(min_lines)))
        return F.struct(
            F.array_join(kept, "\n").alias("_clean"),
            n_kept.cast("long").alias("_nk"),
            (F.size(ls) - n_kept).cast("long").alias("_nd"),
            page_ok.alias("_keep"))

    out = df.select(F.col(id_col),
                    let(F.when(text.isNotNull(), lines)
                        .otherwise(F.array().cast("array<string>")),
                        _build).alias("_c4"))
    return out.select(id_col,
                      F.col("_c4._clean").alias(clean_col),
                      F.col("_c4._nk").alias("n_lines_kept"),
                      F.col("_c4._nd").alias("n_lines_dropped"),
                      F.col("_c4._keep").alias("keep"))


def stupid_backoff_perplexity(df, target=None, text_col: str = "text",
                              id_col: str = "doc_id",
                              target_text_col: str | None = None,
                              alpha: float = 0.4, n_salt: int = 8):
    """Per-document perplexity under a STUPID BACKOFF trigram model
    (Brants et al., EMNLP 2007 "Large Language Models in Machine
    Translation" — the scheme Google built precisely for serving
    n-gram scores from a DISTRIBUTED count store, which is why it
    fits this engine): relative frequencies with a fixed ``alpha``
    multiplier per backoff level, no discounting, no normalization —
    and therefore OOV-SAFE, so unlike the self-trained
    `kn_perplexity` it supports an external ``target`` corpus (the
    CCNet shape: score the crawl under a clean-corpus model):

      S(w3|w1w2) = c3/c2                 when the trigram is seen
                 = α · S(w3|w2)          otherwise
      S(w3|w2)   = c2(w2w3)/c1(w2)       when the bigram is seen
                 = α · S(w3)             otherwise
      S(w3)      = c1(w3)/N              when the word is seen
                 = α/V                   otherwise (uniform OOV floor
                                         over the model vocabulary)

    Counts are raw occurrence counts from the model corpus
    (``target``; defaults to ``df`` itself).  S quantizes to 12
    decimals before ln; per-doc mean ln rounds to 6; perplexity
    derives from the ROUNDED mean (`kn_perplexity`'s conventions).
    Documents under three tokens drop out.

    Distributed shape: the model is three count aggregations over
    the model corpus (trigram-, bigram-, unigram-TYPE-sized, map-
    side combined) + two 1-row globals; scoring LEFT-joins the doc
    trigram stream against the three tables — all SALTED
    (`_salted_count_join`) — and folds the coalesce cascade in pure
    codegen.  Nothing broadcasts but the 1-row globals; no Python
    anywhere.

    Returns (id, n_trigrams, avg_logprob, perplexity)."""
    from .dedup import shingles_of_tokens

    a = float(alpha)
    model_df = target if target is not None else df
    mcol = target_text_col or text_col

    def _toks(frame, col):
        return frame.select(
            let(tokens(F.col(col)),
                lambda t: F.filter(t, lambda x: x != F.lit("")))
            .alias("_t"))

    mt = _toks(model_df, mcol)
    uni = mt.select(F.explode("_t").alias("w"))
    c1 = uni.groupBy("w").agg(F.count("*").alias("c1"))
    c2 = (mt.filter(F.size("_t") >= 2)
          .select(F.explode(shingles_of_tokens(F.col("_t"), 2))
                  .alias("g2"))
          .groupBy("g2").agg(F.count("*").alias("c2")))
    c3 = (mt.filter(F.size("_t") >= 3)
          .select(F.explode(shingles_of_tokens(F.col("_t"), 3))
                  .alias("g3"))
          .groupBy("g3").agg(F.count("*").alias("c3")))
    # greatest(.., 1): an EMPTY model corpus must degrade to the
    # uniform floor, not an ANSI divide-by-zero
    nv = uni.agg(F.greatest(F.count("*"), F.lit(1)).alias("_n"),
                 F.greatest(F.count_distinct("w"), F.lit(1))
                 .alias("_v"))

    tri = (df.select(
        F.col(id_col),
        let(tokens(F.col(text_col)),
            lambda t: F.filter(t, lambda x: x != F.lit("")))
        .alias("_t"))
        .filter(F.size("_t") >= 3)
        .select(F.col(id_col),
                F.explode(shingles_of_tokens(F.col("_t"), 3))
                .alias("g3")))
    parts = F.split("g3", " ")
    scored = (tri
              .withColumn("g2", F.concat_ws(
                  " ", parts.getItem(1), parts.getItem(2)))
              .withColumn("ctx2", F.concat_ws(
                  " ", parts.getItem(0), parts.getItem(1)))
              .withColumn("w", parts.getItem(2)))
    # five salted LEFT joins against the count tables (the context
    # denominators reuse c2/c1 under renamed keys) — misses must
    # survive as NULLs for the backoff cascade, hence how='left'
    # (r15 advice: one skew-join implementation, not two)
    def _lj(frame, tbl, key):
        return _salted_count_join(frame, tbl, key,
                                  n_salt=int(n_salt), how="left")

    scored = scored.withColumn("w2mid", parts.getItem(1))
    scored = _lj(scored, c3, "g3")
    scored = _lj(scored, c2.select(F.col("g2"),
                                   F.col("c2").alias("c2n")), "g2")
    scored = _lj(scored, c2.select(F.col("g2").alias("ctx2"),
                                   F.col("c2").alias("c2d")), "ctx2")
    scored = _lj(scored, c1.select(F.col("w"),
                                   F.col("c1").alias("c1n")), "w")
    # unigram count of the MIDDLE word (bigram context denominator)
    scored = _lj(scored, c1.select(F.col("w").alias("w2mid"),
                                   F.col("c1").alias("c1d")),
                 "w2mid")
    scored = scored.crossJoin(F.broadcast(nv))
    s1 = (F.when(F.col("c1n").isNotNull(),
                 F.col("c1n") / F.col("_n"))
          .otherwise(F.lit(a) / F.col("_v")))
    s2 = (F.when(F.col("c2n").isNotNull() & F.col("c1d").isNotNull(),
                 F.col("c2n") / F.col("c1d"))
          .otherwise(F.lit(a) * s1))
    s3 = (F.when(F.col("c3").isNotNull() & F.col("c2d").isNotNull(),
                 F.col("c3") / F.col("c2d"))
          .otherwise(F.lit(a) * s2))
    out = scored.withColumn("_lp", F.log(F.round(s3, 12)))
    return (out.groupBy(id_col)
            .agg(F.count("*").alias("n_trigrams"),
                 F.round(F.avg("_lp"), 6).alias("avg_logprob"))
            .withColumn("perplexity",
                        F.round(F.exp(-F.col("avg_logprob")), 6)))


def ccnet_buckets(df, text_col: str = "text", id_col: str = "doc_id",
                  lang_col: str = "lang",
                  cuts: tuple = ((1, 3), (2, 3)),
                  discount: float = 0.75, n_salt: int = 8,
                  scored=None):
    """CCNet's head/middle/tail quality split (Wenzek et al. 2020):
    rank documents by LM perplexity WITHIN EACH LANGUAGE and cut at
    fractional ranks — the published crawl-curation stage that feeds
    "head" (cleanest third) into pretraining mixes.  Perplexity comes
    from the corpus-self-trained `kn_perplexity` by default (CCNet
    uses a Wikipedia-trained KenLM); pass ``scored`` — any
    (id, perplexity) frame, e.g. `stupid_backoff_perplexity(df,
    target=wiki)` — to bucket under an EXTERNAL target model, the
    paper's actual shape.

    Bucket math is INTEGER-exact (engine-portable by construction):
    with per-(lang, perplexity) counts, a document's strict rank is
    the cumulative count of smaller perplexities; the bucket test
    ``rank / (n-1) < a/b`` evaluates as ``rank * b < a * (n-1)`` —
    no float division anywhere.  Ties share a rank and therefore a
    bucket; a single-document language is ``head``; documents under
    three tokens have no perplexity and drop out (the
    `kn_perplexity` contract).

    Distributed shape (100 TB): the rank window runs over the
    (lang, perplexity) COUNT table — a hub language contributes its
    |distinct perplexity values| to one window partition, never its
    document count (the `core_numbers` histogram convention) — and
    buckets join back on (lang, perplexity).  Returns
    (id, lang, perplexity, bucket)."""
    from pyspark.sql import Window

    (a1, b1), (a2, b2) = (tuple(map(int, cuts[0])),
                          tuple(map(int, cuts[1])))
    # localCheckpoint: the scored frame feeds BOTH the rank count
    # table and the final bucket join — materializing it runs the KN
    # model + scoring pipeline once instead of twice
    if scored is None:
        scored = kn_perplexity(df.select(F.col(id_col),
                                         F.col(text_col)),
                               text_col=text_col, id_col=id_col,
                               discount=discount, n_salt=n_salt)
    scored = (scored.select(id_col, "perplexity")
              .join(df.select(F.col(id_col),
                              F.col(lang_col).alias("lang")), id_col)
              .transform(plan_barrier))
    cnt = (scored.groupBy("lang", "perplexity")
           .agg(F.count("*").alias("_c")))
    w = (Window.partitionBy("lang").orderBy(F.asc("perplexity"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wn = Window.partitionBy("lang")
    ranked = (cnt.withColumn("_cum", F.sum("_c").over(w))
              .withColumn("_n", F.sum("_c").over(wn))
              .withColumn("_rank", F.col("_cum") - F.col("_c")))
    bucket = (F.when(F.col("_n") <= 1, F.lit("head"))
              .when(F.col("_rank") * b1 < a1 * (F.col("_n") - 1),
                    F.lit("head"))
              .when(F.col("_rank") * b2 < a2 * (F.col("_n") - 1),
                    F.lit("middle"))
              .otherwise(F.lit("tail")))
    btab = ranked.select("lang", "perplexity",
                         bucket.alias("bucket"))
    return scored.join(btab, ["lang", "perplexity"]) \
        .select(id_col, "lang", "perplexity", "bucket")


def bm25_batch_topk(df, queries, k: int = 10, k1: float = 1.2,
                    b: float = 0.75, text_col: str = "text",
                    id_col: str = "doc_id", query_id_col: str = "query_id",
                    query_col: str = "query"):
    """Top-``k`` documents PER QUERY for a whole table of queries —
    batch lexical retrieval (mining pretraining docs for many
    benchmark prompts at once) with the same Okapi BM25 scoring as
    :func:`bm25_topk`.

    Distributed shape: the query table tokenizes into (query_id, term)
    pairs and broadcasts twice — once as a DISTINCT term filter the
    corpus explode prunes against (corpus rows ever materialize only
    tokens some query wants), once as the scoring join fan-out; df
    counts aggregate over the term-filtered explode (query-vocabulary-
    sized, broadcast); corpus stats ride in as a 1-row aggregate; the
    per-query rank is a window over each query's candidate docs only.
    The corpus is scanned ONCE for the whole query batch, and each
    corpus row is regex-tokenized ONCE (``_bm25_doc_pass``)."""
    from pyspark.sql import Window

    qt = (queries.select(F.col(query_id_col),
                         F.explode(tokens(F.col(query_col))).alias("term"))
          .filter(F.col("term") != "").distinct())
    terms = qt.select("term").distinct()
    qs = _bm25_doc_pass(df, text_col, id_col)
    stats = _bm25_stats(qs)
    tf = (_bm25_tf_base(qs, id_col)
          .join(F.broadcast(terms), on="term")
          .groupBy(id_col, "dl", "term").agg(F.count("*").alias("tf")))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    part = (
        tf.join(F.broadcast(qt), on="term")
        .join(F.broadcast(dfreq), on="term")
        .crossJoin(F.broadcast(stats))
        .withColumn("_s", (
            F.log((F.col("n_docs") - F.col("df") + F.lit(0.5))
                  / (F.col("df") + F.lit(0.5)) + F.lit(1.0))
            * F.col("tf") * F.lit(k1 + 1.0)
            / (F.col("tf") + F.lit(k1) * (F.lit(1.0 - b)
               + F.lit(b) * F.col("dl") / F.col("avgdl")))))
    )
    scored = (part.groupBy(query_id_col, id_col)
              .agg(F.round(F.sum("_s"), 6).alias("score")))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"),
                                                 F.asc(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(query_id_col, id_col, "score", "rank"))


def classifier_score(df, weights: list | None = None,
                     text_col: str = "text",
                     score_col: str = "quality_score",
                     bias: float = 0.0,
                     weights_df=None, dim: int | None = None,
                     literal_max: int = 65536):
    """fastText/DCLM-style LINEAR quality classifier at corpus scale:
    ``score = bias + mean over tokens of weights[h(token) mod dim]`` —
    the hashed-bag-of-words form every published model-based quality
    filter (DCLM, FineWeb-Edu) reduces to at inference time once the
    learned embedding collapses into per-bucket weights.  Train the
    weights elsewhere; this op is the 100-TB scoring pass.

    Distributed shape, small models (dim ≤ ``literal_max``): purely
    ROW-WISE native SQL — the weight vector rides into the plan as ONE
    literal array, each token md5-hashes to a bucket (`portable_hash`,
    the same 60-bit hash every sampler and dedup key here uses), and a
    left-associated fold sums weights in token order, so the DuckDB
    oracle's `list_reduce` reproduces the double arithmetic
    bit-for-bit.  No shuffle, no UDF, no state: scoring is exactly one
    scan, and the filter that usually follows (`score >= t`) pushes
    down with it.

    Large models (real fastText-style quality models hash to ~2M
    buckets — a plan literal that size explodes Catalyst): pass
    ``weights_df`` (columns ``bucket``, ``weight``; plus ``dim``, the
    modulus — buckets absent from the table weigh 0.0), or pass a
    ``weights`` list longer than ``literal_max`` and it converts
    automatically.  This path tokenizes each DISTINCT text once
    (posexplode), BROADCAST-joins the weights table (model tables are
    MBs against a 100-TB corpus), refolds per text in token order —
    the identical left-associated double sum, pos-sorted, so literal
    and join paths agree bit-for-bit — and rejoins scores to the
    corpus by text hash.  Two corpus-keyed shuffles (distinct +
    rejoin) buy O(1) plan size at any model dimension; duplicate texts
    score once.

    Scores round to 9 decimals (the module's oracle convention);
    token-less and NULL documents score ``bias``."""
    from .dedup import portable_hash

    if (weights is None) == (weights_df is None):
        raise ValueError(
            "pass exactly one of weights (list) or weights_df")
    if weights is not None and len(weights) > int(literal_max):
        spark = df.sparkSession
        dim = len(weights)
        weights_df = spark.createDataFrame(
            [(int(b), float(w)) for b, w in enumerate(weights)],
            "bucket long, weight double")
        weights = None
    if weights_df is not None:
        if dim is None or int(dim) < 1:
            raise ValueError("weights_df needs dim (the hash modulus)")
        return _classifier_score_join(df, weights_df, int(dim), text_col,
                                      score_col, float(bias))

    dim = len(weights)
    if dim < 1:
        raise ValueError("weights must be non-empty")
    # one typed Literal (numpy path), not len(weights) Literal leaves
    # — F.lit(<python list>) would desugar back to per-element form
    import numpy as np

    warr = F.lit(np.array([float(w) for w in weights],
                          dtype="float64"))

    def w_of(t):
        return F.element_at(
            warr, (F.pmod(portable_hash(t), F.lit(dim)) + 1).cast("int"))

    score = let(
        F.filter(tokens(F.col(text_col)), lambda x: x != F.lit("")),
        lambda ts: F.round(
            F.when(F.size(ts) > 0,
                   F.lit(float(bias))
                   + F.aggregate(ts, F.lit(0.0),
                                 lambda acc, t: acc + w_of(t))
                   / F.size(ts))
            .otherwise(F.lit(float(bias))), 9))
    return df.withColumn(score_col, score)


def _classifier_score_join(df, weights_df, dim: int, text_col: str,
                           score_col: str, bias: float):
    """Broadcast-join weights path of :func:`classifier_score` (see
    its docstring for the shape).  Bit-exact vs the literal path: the
    per-text fold runs over weights sorted by token POSITION — the
    same token-order left-associated double adds — and missing buckets
    coalesce to 0.0 (a full weights list has every bucket, so the two
    paths see identical addend sequences)."""
    helpers = {"_cs_key", "_cs_pos", "_cs_tok", "_cs_b", "_cs_w",
               "_cs_sum", "_cs_n", "_cs_text"}
    clash = helpers & set(df.columns)
    if clash:
        raise ValueError(
            f"classifier_score reserves internal column names "
            f"{sorted(clash)} on the weights_df path; rename those "
            "columns first")
    bad = {"bucket", "weight"} - set(weights_df.columns)
    if bad:
        raise ValueError(
            f"weights_df must have columns ('bucket', 'weight'); "
            f"missing {sorted(bad)}")
    from .dedup import portable_hash

    if score_col in df.columns:
        df = df.drop(score_col)
    texts = (df.select(F.col(text_col).alias("_cs_text"))
             .where(F.col("_cs_text").isNotNull()).distinct())
    toks = texts.select(
        F.md5(F.col("_cs_text")).alias("_cs_key"),
        F.posexplode(F.filter(tokens(F.col("_cs_text")),
                              lambda x: x != F.lit("")))
        .alias("_cs_pos", "_cs_tok"))
    wt = weights_df.select(
        F.col("bucket").cast("long").alias("_cs_b"),
        F.col("weight").cast("double").alias("_cs_w"))
    j = (toks.withColumn(
            "_cs_b", F.pmod(portable_hash(F.col("_cs_tok")),
                            F.lit(int(dim))))
         .join(F.broadcast(wt), on="_cs_b", how="left")
         .withColumn("_cs_w", F.coalesce(F.col("_cs_w"), F.lit(0.0))))
    per = j.groupBy("_cs_key").agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(
                    F.struct(F.col("_cs_pos"), F.col("_cs_w")))),
                lambda s: s["_cs_w"]),
            F.lit(0.0), lambda a, x: a + x).alias("_cs_sum"),
        F.count(F.lit(1)).alias("_cs_n"))
    scores = per.select(
        "_cs_key",
        F.round(F.lit(bias) + F.col("_cs_sum") / F.col("_cs_n"), 9)
        .alias(score_col))
    return (df.withColumn("_cs_key", F.md5(F.col(text_col)))
            .join(scores, on="_cs_key", how="left")
            .withColumn(score_col,
                        F.coalesce(F.col(score_col),
                                   F.round(F.lit(bias), 9)))
            .drop("_cs_key"))


def bm25_batch_topk_stored(spark, path: str, queries, k: int = 10,
                           k1: float = 1.2, b: float = 0.75,
                           id_col: str = "doc_id",
                           query_id_col: str = "query_id",
                           query_col: str = "query"):
    """Batch BM25 over a `write_text_index` dataset: top-``k`` docs
    per query WITHOUT a corpus scan.  The batch's distinct term set
    collects driver-side (query-vocabulary-sized — benchmark prompt
    batches, not corpora) to become the static ``term_bucket IN``
    partition filter plus the ``term IN`` row-group prune; df comes
    from the pruned postings; scoring and the per-query rank window
    are `bm25_batch_topk`'s own expressions, so stored == in-memory
    row-for-row."""
    import hashlib

    from pyspark.sql import Window

    qt = (queries.select(F.col(query_id_col),
                         F.explode(tokens(F.col(query_col))).alias("term"))
          .filter(F.col("term") != "").distinct())
    terms = sorted({r["term"] for r in qt.select("term").distinct()
                    .collect()})
    if not terms:
        raise ValueError("queries produced no terms")
    base = path.rstrip("/")
    _check_index_consistent(base)
    stats = spark.read.parquet(base + "/stats")
    n_buckets = stats.head()["n_buckets"]
    buckets = sorted({
        int(hashlib.md5(t.encode("utf-8")).hexdigest()[:15], 16)
        % int(n_buckets) for t in terms})
    tf = (spark.read.parquet(base + "/postings")
          .filter(F.col("term_bucket").isin(buckets))
          .filter(F.col("term").isin(terms))
          .select(id_col, "dl", "term", "tf"))
    # tombstoned docs (delete_documents) drop out and df/stats
    # re-derive as if they were never indexed
    tf, st = _apply_text_deletes(spark, base, tf, stats, id_col)
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    part = (
        tf.join(F.broadcast(qt), on="term")
        .join(F.broadcast(dfreq), on="term")
        .crossJoin(F.broadcast(st))
        .withColumn("_s", (
            F.log((F.col("n_docs") - F.col("df") + F.lit(0.5))
                  / (F.col("df") + F.lit(0.5)) + F.lit(1.0))
            * F.col("tf") * F.lit(k1 + 1.0)
            / (F.col("tf") + F.lit(k1) * (F.lit(1.0 - b)
               + F.lit(b) * F.col("dl") / F.col("avgdl")))))
    )
    scored = (part.groupBy(query_id_col, id_col)
              .agg(F.round(F.sum("_s"), 6).alias("score")))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"),
                                                 F.asc(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(query_id_col, id_col, "score", "rank"))


def blocklist_hits(text: Column, terms: list) -> Column:
    """Count of token occurrences that appear in ``terms`` — the C4
    badword stage's signal (the published recipe drops any page
    containing a blocklisted word; the count form also supports
    threshold policies).  Token-boundary exact matches on the module's
    lowercasing tokenizer — ``class`` never matches ``classic``.
    Pure codegen: one tokenize + a literal-array membership filter."""
    if not terms:
        raise ValueError("terms must be non-empty")
    bl = F.array(*[F.lit(str(t).lower()) for t in sorted(set(terms))])
    return F.size(F.filter(
        let(tokens(text), lambda t: F.filter(t, lambda x: x != F.lit(""))),
        lambda tk: F.array_contains(bl, tk)))


def blocklist_filter(df, terms: list, max_hits: int = 0,
                     text_col: str = "text"):
    """Drop rows with more than ``max_hits`` blocklisted-token
    occurrences (``max_hits=0`` = the C4 policy: any hit drops the
    page).  One narrow row-wise filter evaluated inside the scan
    stage — no shuffle, no UDF (a higher-order-function predicate
    stays in whole-stage codegen; it is not a parquet PushedFilter,
    which only takes simple column comparisons)."""
    return df.filter(
        blocklist_hits(F.col(text_col), terms) <= int(max_hits))


def code_signals(text: Column) -> Column:
    """Code-file quality signals as one struct — the published
    The Stack / SantaCoder file filters (drop when max line length
    > 1000, mean line length > 100, or alphanumeric fraction < 0.25),
    plus the longest whitespace-token length (minified-bundle /
    data-blob tell): struct<n_lines, max_line_len, avg_line_len,
    alnum_frac, longest_token_len>.  All native string/array
    expressions over one pass; ratios round to 6 (the oracle
    convention)."""
    lines = F.split(text, "\n")
    lens = F.transform(lines, lambda l: F.length(l))
    n_lines = F.size(lines)
    toks = F.filter(F.split(F.trim(text), r"\s+"),
                    lambda x: x != F.lit(""))
    alnum = F.length(F.regexp_replace(text, r"[^0-9A-Za-z]", ""))
    return F.struct(
        n_lines.cast("long").alias("n_lines"),
        F.array_max(lens).cast("long").alias("max_line_len"),
        F.round(F.aggregate(lens, F.lit(0.0),
                            lambda a, x: a + x.cast("double"))
                / F.greatest(n_lines, F.lit(1)).cast("double"), 6)
        .alias("avg_line_len"),
        F.round(alnum.cast("double")
                / F.greatest(F.length(text), F.lit(1)).cast("double"), 6)
        .alias("alnum_frac"),
        F.coalesce(
            F.array_max(F.transform(toks, lambda t: F.length(t))),
            F.lit(0)).cast("long").alias("longest_token_len"))


# ---------------------------------------------------------------------------
# Many-language identification: hashed char-ngram naive Bayes
# ---------------------------------------------------------------------------
# The published-pipeline langid stage (CCNet / fastText lid.176) is a
# linear model over hashed character n-grams.  `train_lang_model`
# builds the same family of model natively — per-language add-alpha
# bucket log-probabilities over hashed char n-grams, a FIXED-SIZE
# table (n_langs x n_buckets rows) no matter the corpus size, the
# DSIR engineering trick (see dsir_logweights) applied to
# classification — and `lang_id_model` scores documents with one
# tokenizer pass, one broadcast join against the pivoted model, and
# one per-doc aggregation: the corpus never shuffles except that
# final agg, and nothing is a Python UDF.
#
# `LANG_SEED` ships a small built-in 25-language training corpus
# (original sentences written for this module; apostrophe-free so SQL
# replicas can embed them verbatim) so the identifier works out of
# the box:  `lang_id_model(docs, train_lang_model(seed_lang_corpus(
# spark)))`.  For production quality, train on a real labeled corpus
# (Wikipedia per-language dumps) with n_buckets ~ 2**16 — the model
# stays broadcast-sized (100 langs x 65536 buckets ~ 100 MB of
# (lang, bucket, logp) rows, prunable by keeping only buckets whose
# logp differs from the smoothing floor).

LANG_SEED: dict[str, tuple[str, ...]] = {
    "ar": ("الثعلب البني السريع يقفز فوق الكلب الكسول",
           "تستخدم هذه الجمل لتدريب نموذج اللغة",
           "في الصباح نشرب القهوة ونقرأ الاخبار في البيت",
           "الماء والخبز على الطاولة في المطبخ"),
    "cs": ("rychlá hnědá liška skáče přes líného psa",
           "tyto věty slouží k trénování jazykového modelu",
           "ráno pijeme kávu a čteme noviny doma u stolu",
           "voda a chléb jsou na stole v kuchyni"),
    "da": ("den hurtige brune ræv springer over den dovne hund",
           "disse sætninger bruges til at træne sprogmodellen",
           "om morgenen drikker vi kaffe og læser avisen derhjemme",
           "vandet og brødet står på bordet i køkkenet"),
    "de": ("der schnelle braune fuchs springt über den faulen hund",
           "diese sätze sind für das training der sprachen gedacht",
           "am morgen trinken wir kaffee und lesen die zeitung zu hause",
           "das wasser und das brot stehen auf dem tisch in der küche"),
    "en": ("the quick brown fox jumps over the lazy dog",
           "these sentences are used to train the language model",
           "in the morning we drink coffee and read the newspaper at home",
           "the water and the bread are on the table in the kitchen"),
    "es": ("el rápido zorro marrón salta sobre el perro perezoso",
           "estas frases sirven para entrenar el modelo de idiomas",
           "por la mañana bebemos café y leemos el periódico en casa",
           "el agua y el pan están sobre la mesa de la cocina"),
    "fi": ("nopea ruskea kettu hyppää laiskan koiran yli",
           "näitä lauseita käytetään kielimallin opettamiseen",
           "aamulla juomme kahvia ja luemme sanomalehteä kotona",
           "vesi ja leipä ovat pöydällä keittiössä"),
    "fr": ("le renard brun rapide saute par dessus le chien paresseux",
           "ces phrases servent à entraîner le modèle de langues",
           "le matin nous buvons du café et lisons le journal à la maison",
           "le pain et le fromage sont sur la table de la cuisine"),
    "hi": ("तेज भूरी लोमड़ी आलसी कुत्ते के ऊपर कूदती है",
           "इन वाक्यों का उपयोग भाषा मॉडल को सिखाने के लिए होता है",
           "सुबह हम घर पर चाय पीते हैं और अखबार पढ़ते हैं",
           "पानी और रोटी रसोई की मेज पर रखी है"),
    "hu": ("a gyors barna róka átugrik a lusta kutya felett",
           "ezeket a mondatokat a nyelvi modell tanítására használjuk",
           "reggel kávét iszunk és újságot olvasunk otthon",
           "a víz és a kenyér az asztalon van a konyhában"),
    "id": ("rubah coklat yang cepat melompati anjing yang malas",
           "kalimat ini digunakan untuk melatih model bahasa",
           "di pagi hari kami minum kopi dan membaca koran di rumah",
           "air dan roti ada di atas meja di dapur"),
    "it": ("la veloce volpe marrone salta sopra il cane pigro",
           "queste frasi servono per addestrare il modello delle lingue",
           "la mattina beviamo il caffè e leggiamo il giornale a casa",
           "il pane e il formaggio sono sul tavolo della cucina"),
    "ja": ("素早い茶色の狐はのろまな犬を飛び越える",
           "これらの文は言語モデルの学習に使われます",
           "朝は家でコーヒーを飲みながら新聞を読みます",
           "水とパンは台所のテーブルの上にあります",
           "彼らは学校で数学と歴史を勉強します",
           "駅はここから遠くないので歩いて行きましょう"),
    "ko": ("빠른 갈색 여우가 게으른 개를 뛰어넘는다",
           "이 문장들은 언어 모델을 학습시키는 데 사용된다",
           "아침에는 집에서 커피를 마시며 신문을 읽는다",
           "물과 빵은 부엌 식탁 위에 있다",
           "그들은 학교에서 수학과 역사를 공부한다",
           "역은 여기서 멀지 않으니 걸어서 가자"),
    "nl": ("de snelle bruine vos springt over de luie hond",
           "deze zinnen zijn bedoeld om het taalmodel te trainen",
           "in de ochtend drinken we koffie en lezen we de krant thuis",
           "het water en het brood staan op de tafel in de keuken"),
    "no": ("den raske brune reven hopper over den late hunden",
           "disse setningene brukes til å trene språkmodellen",
           "om morgenen drikker vi kaffe og leser avisen hjemme",
           "vannet og brødet står på bordet på kjøkkenet"),
    "pl": ("szybki brązowy lis przeskakuje nad leniwym psem",
           "te zdania służą do trenowania modelu językowego",
           "rano pijemy kawę i czytamy gazetę w domu",
           "woda i chleb leżą na stole w kuchni",
           "oni uczą się matematyki i historii w szkole",
           "dworzec kolejowy jest niedaleko stąd więc idziemy pieszo"),
    "pt": ("a rápida raposa marrom salta sobre o cão preguiçoso",
           "estas frases servem para treinar o modelo de línguas",
           "de manhã bebemos café e lemos o jornal em casa",
           "a água e o pão estão sobre a mesa da cozinha"),
    "ro": ("vulpea maro rapidă sare peste câinele leneș",
           "aceste propoziții sunt folosite pentru antrenarea modelului",
           "dimineața bem cafea și citim ziarul acasă",
           "apa și pâinea sunt pe masa din bucătărie"),
    "ru": ("быстрая коричневая лиса прыгает через ленивую собаку",
           "эти предложения используются для обучения языковой модели",
           "утром мы пьем кофе и читаем газету дома",
           "вода и хлеб лежат на столе в кухне"),
    "sv": ("den snabba bruna räven hoppar över den lata hunden",
           "dessa meningar används för att träna språkmodellen",
           "på morgonen dricker vi kaffe och läser tidningen hemma",
           "vattnet och brödet står på bordet i köket"),
    "tr": ("hızlı kahverengi tilki tembel köpeğin üzerinden atlar",
           "bu cümleler dil modelini eğitmek için kullanılır",
           "sabahları evde kahve içer ve gazete okuruz",
           "su ve ekmek mutfaktaki masanın üzerinde duruyor"),
    "uk": ("швидка коричнева лисиця стрибає через ледачого собаку",
           "ці речення використовуються для навчання мовної моделі",
           "вранці ми готуємо каву і читаємо газету вдома",
           "вода і хліб лежать на столі в кухні"),
    "vi": ("con cáo nâu nhanh nhẹn nhảy qua con chó lười biếng",
           "những câu này được dùng để huấn luyện mô hình ngôn ngữ",
           "buổi sáng chúng tôi uống cà phê và đọc báo ở nhà",
           "nước và bánh mì ở trên bàn trong bếp"),
    "zh": ("敏捷的棕色狐狸跳过了懒惰的狗",
           "这些句子用于训练语言模型",
           "早上我们在家里喝咖啡和看报纸",
           "水和面包放在厨房的桌子上",
           "他们在学校学习数学和历史",
           "火车站离这里不远我们走路去"),
}


def seed_lang_corpus(spark):
    """The built-in 25-language labeled corpus as a (lang, text)
    DataFrame — two original sentences per language (see LANG_SEED).
    Deterministic row order (lang asc, sentence index)."""
    rows = [(lang, s) for lang in sorted(LANG_SEED)
            for s in LANG_SEED[lang]]
    return spark.createDataFrame(rows, "lang string, text string")


def char_ngrams(text: Column, n=(1, 2, 3)) -> Column:
    """Character n-grams of space-padded, lowercased,
    whitespace-collapsed text as a native array column — the fastText
    langid feature set.  ``n`` is an order or tuple of orders; mixed
    orders (the default) let single characters carry script identity
    (CJK / Cyrillic / Arabic) while trigrams carry morphology.  One
    let-bound normalization pass feeds every order; NULL and
    effectively-empty texts yield NULL (and so drop out of downstream
    explodes).  Pure codegen."""
    orders = (n,) if isinstance(n, int) else tuple(n)
    norm = F.concat(
        F.lit(" "),
        F.nullif(F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")),
                 F.lit("")),
        F.lit(" "))

    def _gram_at(c: Column, k: int):
        # single-arg lambda factory: a `lambda i, k=k` would have
        # arity 2 and Spark would bind the second param to the array
        # INDEX, silently corrupting every gram.  Grams concatenate
        # O(1) element_at lookups on the char array — a substr(i, k)
        # on the string would re-seek from offset 0 every position
        # (UTF8String positions are byte-scans), turning a document
        # into O(len^2) work
        return lambda i: F.concat(
            *[F.element_at(c, i + j) if j else F.element_at(c, i)
              for j in range(k)])

    def _build(c: Column) -> Column:
        parts = []
        for k in orders:
            if k == 1:
                parts.append(c)
                continue
            parts.append(F.when(
                F.size(c) >= k,
                F.transform(
                    F.sequence(F.lit(1), F.size(c) - (k - 1)),
                    _gram_at(c, k))
            ).otherwise(F.array().cast("array<string>")))
        return F.concat(*parts) if len(parts) > 1 else parts[0]

    # split to a char array ONCE (native StringSplit), then build all
    # orders from it
    return let(norm, lambda t: let(F.split(t, ""), _build))


def train_lang_model(df, text_col: str = "text",
                     lang_col: str = "lang", n_buckets: int = 65536,
                     n=(1, 2, 3), alpha: float = 0.5):
    """Train a hashed char-ngram naive-Bayes language model from a
    labeled (text, lang) corpus.  Returns ONE storable DataFrame of
    (lang, bucket, logp), SPARSE — only buckets actually observed for
    a language carry a row (the fixed-size trick that keeps a
    100-language 2**16-bucket model broadcastable without a dense
    n_langs x n_buckets grid):

    - bucket >= 0 rows: ``ln((c_b + alpha) / (N_lang + alpha *
      n_buckets))`` for OBSERVED (lang, bucket) pairs;
    - bucket == -1 rows: class log-priors
      ``ln(n_docs_lang / n_docs_total)``;
    - bucket == -2 rows: each language's smoothing FLOOR
      ``ln(alpha / (N_lang + alpha * n_buckets))`` — what scoring
      substitutes for absent buckets;
    - one bucket == -3 row (lang '*'): ``n_buckets`` itself, so a
      stored model is self-describing.

    Distributed shape: char n-grams hash into ``n_buckets`` via the
    module's portable 60-bit md5 hash (``portable_hash`` — DuckDB/
    Spark replicable); the count aggregation is map-side combined and
    its output is bounded by n_langs x n_buckets regardless of corpus
    size, so the model always broadcasts.  Persist the result with
    plain ``write.parquet`` to reuse across jobs."""
    from .dedup import portable_hash

    B = int(n_buckets)
    a = float(alpha)
    buck = df.select(
        F.col(lang_col).alias("lang"),
        F.explode(char_ngrams(F.col(text_col), n)).alias("gram")
    ).select("lang", F.pmod(portable_hash(F.col("gram")),
                            F.lit(B)).alias("bucket"))
    totals = buck.groupBy("lang").agg(F.count("*").alias("_n"))
    langs = df.groupBy(F.col(lang_col).alias("lang")).agg(
        F.count("*").alias("_d"))
    ndocs = langs.agg(F.coalesce(F.sum("_d"), F.lit(0)).alias("_nd"))
    # totals is n_langs rows — always broadcast; a language whose
    # texts are all empty still gets floor/prior rows (N coalesces
    # to 0 -> the uniform ln(alpha / (alpha * n_buckets)) model)
    denom = (F.coalesce(F.col("_n"), F.lit(0)) + F.lit(a * B))
    model = (buck.groupBy("lang", "bucket")
             .agg(F.count("*").alias("_c"))
             .join(F.broadcast(totals), "lang", "left")
             .select("lang", "bucket",
                     F.log((F.col("_c") + F.lit(a)) / denom)
                     .alias("logp")))
    floors = (langs.join(F.broadcast(totals), "lang", "left")
              .select("lang", F.lit(-2).cast("long").alias("bucket"),
                      F.log(F.lit(a) / denom).alias("logp")))
    priors = (langs.crossJoin(F.broadcast(ndocs))
              .select("lang", F.lit(-1).cast("long").alias("bucket"),
                      F.log(F.col("_d") / F.col("_nd")).alias("logp")))
    meta = df.sparkSession.createDataFrame(
        [("*", -3, float(B))], "lang string, bucket long, logp double")
    return model.unionByName(floors).unionByName(priors) \
        .unionByName(meta)


def _py_char_ngrams(text: str | None, n=(1, 2, 3)) -> list:
    """Driver-side replica of `char_ngrams` for an in-memory corpus
    (`train_lang_model_local`): same normalization (lowercase,
    whitespace-collapse, trim, space-pad), same per-order gram
    construction over the code-point array.  Equality with the Spark
    expression is pinned by a pytest (test_pipeline_ops)."""
    import re

    orders = (n,) if isinstance(n, int) else tuple(n)
    # mirror the Spark expression EXACTLY: Java regex \s is the ASCII
    # class (Python's is Unicode-wide), and Spark trim strips spaces
    # only — a NO-BREAK SPACE must survive both, as it does there
    t = re.sub(r"[ \t\n\x0B\f\r]+", " ",
               (text or "").lower()).strip(" ")
    if not t:
        return []  # the nullif -> NULL path: no grams
    c = list(" " + t + " ")
    out: list = []
    for k in orders:
        if k == 1:
            out.extend(c)
        elif len(c) >= k:
            out.extend("".join(c[i:i + k])
                       for i in range(len(c) - k + 1))
    return out


def train_lang_model_local(spark, corpus: dict, n_buckets: int = 65536,
                           n=(1, 2, 3), alpha: float = 0.5):
    """`train_lang_model` for a DRIVER-RESIDENT corpus (e.g. the
    built-in `LANG_SEED`): gram extraction and counting run in plain
    Python — the corpus is constant code data, so spending distributed
    jobs (explode + two groupBys + three unions, re-evaluated by every
    consumer of the returned plan) on it is pure scheduling overhead
    (guide §5: the driver should do no *data* work; a few hundred
    fixed sentences are not data).  The log-probability arithmetic
    still runs through the IDENTICAL Spark expressions over the
    exact integer counts, so the returned frame is bit-identical to
    ``train_lang_model(seed_lang_corpus(spark))`` — pinned by a
    pytest.  Returns the same (lang, bucket, logp) model contract."""
    import hashlib
    from collections import Counter

    B = int(n_buckets)
    a = float(alpha)
    bucket_counts: Counter = Counter()
    totals: Counter = Counter()
    docs: Counter = Counter()
    for lang in corpus:
        for text in corpus[lang]:
            docs[lang] += 1
            for g in _py_char_ngrams(text, n):
                # portable_hash: first 15 hex chars of md5 as bigint
                b = int(hashlib.md5(g.encode("utf-8"))
                        .hexdigest()[:15], 16) % B
                bucket_counts[(lang, b)] += 1
                totals[lang] += 1
    nd = sum(docs.values())
    counted = spark.createDataFrame(
        [(lang, b, c, totals[lang])
         for (lang, b), c in sorted(bucket_counts.items())],
        "lang string, bucket long, _c long, _n long")
    langrows = spark.createDataFrame(
        [(lang, docs[lang], nd, totals[lang]) for lang in sorted(docs)],
        "lang string, _d long, _nd long, _n long")
    # the same expressions as train_lang_model over the same integer
    # inputs -> bit-identical doubles
    denom = (F.coalesce(F.col("_n"), F.lit(0)) + F.lit(a * B))
    model = counted.select(
        "lang", "bucket",
        F.log((F.col("_c") + F.lit(a)) / denom).alias("logp"))
    floors = langrows.select(
        "lang", F.lit(-2).cast("long").alias("bucket"),
        F.log(F.lit(a) / denom).alias("logp"))
    priors = langrows.select(
        "lang", F.lit(-1).cast("long").alias("bucket"),
        F.log(F.col("_d") / F.col("_nd")).alias("logp"))
    meta = spark.createDataFrame(
        [("*", -3, float(B))], "lang string, bucket long, logp double")
    return model.unionByName(floors).unionByName(priors) \
        .unionByName(meta)


def lang_id_model(df, model, text_col: str = "text",
                  id_col: str = "doc_id", n=(1, 2, 3)):
    """Model-based language ID: score every document against a
    `train_lang_model` table and return
    (id, pred_lang, n_grams, score, margin) — argmax language, its
    rounded log-score (prior + sum of bucket log-likelihoods over
    gram OCCURRENCES), and the gap to the runner-up.  Ties break to
    the alphabetically-first language; documents with no char n-grams
    (NULL / effectively-empty text) drop out.

    Distributed shape — the corpus NEVER shuffles except the final
    per-doc aggregation: the sparse model pivots to one (bucket,
    lp_<lang>...) row per OBSERVED bucket (<= n_buckets rows — always
    broadcast), gram rows LEFT-broadcast-join it (absent buckets take
    each language's stored smoothing floor via COALESCE), and one
    map-side-combined groupBy computes every language's sum in a
    single pass.  Scores round to 6 decimals BEFORE the argmax so
    the decision is reproducible across engines (SQL-oracle
    replicable end to end).  The model scan is driver-collected only
    for its fixed-size negative-bucket rows: priors, floors, and
    n_buckets."""
    from .dedup import portable_hash

    # ONE pass over the model for all driver-side metadata: priors
    # (bucket -1), per-lang floors (-2), n_buckets (-3); collect_list
    # skips the NULLs the when() leaves on observed-bucket rows
    neg = model.agg(
        F.collect_list(F.when(F.col("bucket") < 0,
                              F.struct("lang", "bucket", "logp")))
        .alias("_m")).first()["_m"]
    priors = {r["lang"]: float(r["logp"]) for r in neg
              if r["bucket"] == -1}
    floors = {r["lang"]: float(r["logp"]) for r in neg
              if r["bucket"] == -2}
    brow = [r for r in neg if r["bucket"] == -3]
    if not priors or not floors or not brow:
        raise ValueError("model lacks prior/floor/n_buckets rows — "
                         "was it built by train_lang_model?")
    langs = sorted(priors)
    B = int(brow[0]["logp"])
    piv = (model.filter(F.col("bucket") >= 0)
           .groupBy("bucket").pivot("lang", langs)
           .agg(F.first("logp")))
    bucketed = df.select(
        F.col(id_col),
        F.explode(char_ngrams(F.col(text_col), n)).alias("gram")
    ).select(id_col, F.pmod(portable_hash(F.col("gram")),
                            F.lit(B)).alias("bucket"))
    sums = (bucketed.join(F.broadcast(piv), "bucket", "left")
            .groupBy(id_col)
            .agg(F.count("*").alias("n_grams"),
                 *[F.sum(F.coalesce(F.col(lang),
                                    F.lit(floors[lang])))
                   .alias(f"_s_{lang}") for lang in langs]))
    scores = {lang: F.round(F.col(f"_s_{lang}")
                            + F.lit(priors[lang]), 6)
              for lang in langs}
    arr = F.array(*[scores[lang] for lang in langs])
    best = F.array_max(arr)
    pred = F.when(scores[langs[0]] == best, F.lit(langs[0]))
    for lang in langs[1:]:
        pred = pred.when(scores[lang] == best, F.lit(lang))
    if len(langs) > 1:
        margin = F.round(
            best - F.element_at(F.sort_array(arr, asc=False), 2), 6)
    else:
        margin = F.lit(0.0)
    return sums.select(
        F.col(id_col), pred.alias("pred_lang"), F.col("n_grams"),
        best.alias("score"), margin.alias("margin"))


# ---------------------------------------------------------------------------
# URL scope / robots.txt filtering — the crawl-curation gate C4 applies
# before any text processing (robots-disallowed pages never enter the
# corpus)
# ---------------------------------------------------------------------------

def url_in_scope(url: Column, allow_prefixes=None,
                 deny_patterns=None) -> Column:
    """Boolean scope predicate over a URL column, pure codegen: when
    ``allow_prefixes`` is given the URL must start with one of them;
    any ``deny_patterns`` regex match (Java syntax, unanchored — the
    caller anchors) excludes.  Compose with `canonicalize_url` first
    so prefix checks see the canonical form.  A NULL url is never in
    scope."""
    cond = url.isNotNull()
    if allow_prefixes:
        cond = cond & F.exists(
            F.array(*[F.lit(p) for p in allow_prefixes]),
            lambda p: url.startswith(p))
    if deny_patterns:
        cond = cond & ~url.rlike("|".join(
            f"(?:{p})" for p in deny_patterns))
    return cond


def parse_robots(df, host_col: str = "host",
                 robots_col: str = "robots_txt",
                 user_agent: str = "*"):
    """Parse robots.txt documents into per-host path rules:
    (host, prefix, allow) — the input to `robots_filter`.

    RFC 9309 group semantics: a group is one-or-more consecutive
    ``User-agent`` lines followed by rule lines (until the next
    group); of the groups matching ``user_agent`` (exact match,
    case-insensitive) or ``*``, the MOST SPECIFIC class wins per host
    (an exact-agent group makes the host's ``*`` groups inert).
    Comments (#) strip; an empty ``Disallow:`` contributes no rule
    (its spec meaning — allow everything — is the default); rules
    whose path carries the extended wildcards ``*``/``$`` are DROPPED
    (this is the original-spec literal-prefix subset, what published
    crawl pipelines implement; a dropped wildcard rule fails open —
    lines never misparse as literal prefixes).

    Distributed shape: one posexplode over lines, two host-keyed
    windows (group-start flag -> running group id), one group
    aggregation for agent sets, one broadcast-sized join back — every
    stage keys on host, nothing is quadratic in file count."""
    from pyspark.sql import Window

    ln = F.trim(F.regexp_replace(F.regexp_replace(
        F.col("_ln"), "\r", ""), "#.*$", ""))
    lines = (df.select(F.col(host_col).alias("host"),
                       F.posexplode(F.split(F.col(robots_col), "\n"))
                       .alias("_i", "_ln"))
             .select("host", "_i", ln.alias("_t")))
    kind = (F.when(F.col("_t").rlike(r"(?i)^user-agent\s*:"),
                   F.lit("ua"))
            .when(F.col("_t").rlike(r"(?i)^disallow\s*:"),
                  F.lit("deny"))
            .when(F.col("_t").rlike(r"(?i)^allow\s*:"), F.lit("allow")))
    value = F.trim(F.regexp_extract(F.col("_t"), r":(.*)$", 1))
    typed = lines.select("host", "_i", kind.alias("_k"),
                         value.alias("_v")).filter(
        F.col("_k").isNotNull())
    w = Window.partitionBy("host").orderBy("_i")
    is_ua = (F.col("_k") == "ua").cast("int")
    gstart = ((F.col("_k") == "ua")
              & (F.coalesce(F.lag(is_ua).over(w), F.lit(0)) == 0))
    grouped = typed.withColumn(
        "_g", F.sum(gstart.cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding,
                          Window.currentRow)))
    # each row learns its group's agent set through a window (host
    # partitioning already clusters (host, _g) — no extra Exchange,
    # and no join back), then the host's best matching rank through a
    # second host window: one shuffle for the whole parse
    agents = F.collect_set(
        F.when(F.col("_k") == "ua", F.lower(F.col("_v")))).over(
        Window.partitionBy("host", "_g"))
    rank = (F.when(F.array_contains(F.col("_as"),
                                    user_agent.lower()), 2)
            .when(F.array_contains(F.col("_as"), "*"), 1))
    ranked = (grouped.withColumn("_as", agents)
              .withColumn("_r", rank)
              .withColumn("_best",
                          F.max("_r").over(Window.partitionBy("host"))))
    return (ranked.filter(
        F.col("_k").isin("deny", "allow") & (F.col("_v") != "")
        & ~F.col("_v").rlike(r"[*$]")
        & F.col("_r").isNotNull() & (F.col("_r") == F.col("_best")))
        .select("host", F.col("_v").alias("prefix"),
                (F.col("_k") == "allow").alias("allow")))


def robots_filter(df, rules, url_col: str = "url",
                  keep_unmatched: bool = True):
    """Drop rows whose URL a `parse_robots` rule set disallows — the
    C4 robots gate.  Longest-match decides per URL (RFC 9309): among
    the host's rules whose prefix starts the URL's path+query, the
    longest wins; on a length tie ``Allow`` wins; no matching rule
    (or ``keep_unmatched`` hosts with no robots at all) keeps the
    row.  ``keep_unmatched=False`` drops URLs whose host has NO ROW
    in ``rules`` — note a robots.txt whose matched group yields zero
    literal rules (e.g. just ``Disallow:``) is indistinguishable
    there from a missing robots.txt; join your fetched-hosts list
    separately if crawl discipline needs that distinction.

    Distributed shape: rules aggregate to ONE array row per host
    (bounded by robots-file size) and broadcast; the corpus takes a
    single broadcast hash join on the url's host plus a per-row
    higher-order-function match — no row multiplication, no second
    shuffle."""
    rtab = rules.groupBy(F.col("host").alias("_rh")).agg(
        F.collect_list(F.struct(F.col("prefix"), F.col("allow")))
        .alias("_rules"))
    u = F.col(url_col)
    host = F.lower(F.regexp_extract(
        u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#]+)", 1))
    pathq = F.regexp_replace(
        F.regexp_replace(u, "#.*$", ""),
        r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "")
    pathq = F.when(pathq == "", F.lit("/")).otherwise(pathq)
    out = (df.withColumn("_pathq", pathq)
           .join(F.broadcast(rtab), host == F.col("_rh"), "left"))
    hits = F.filter(F.col("_rules"),
                    lambda r: F.col("_pathq").startswith(r["prefix"]))
    # struct max: longest prefix first, Allow beating Disallow on a
    # length tie (1 > 0)
    verdict = F.array_max(F.transform(
        hits, lambda r: F.struct(F.length(r["prefix"]).alias("l"),
                                 r["allow"].cast("int").alias("a"))))
    keep = (F.col("_rules").isNull() | verdict.isNull()
            | (verdict["a"] == 1))
    if not keep_unmatched:
        keep = keep & F.col("_rules").isNotNull()
    return out.filter(keep).drop("_pathq", "_rh", "_rules")


def train_text_classifier(df, label_col: str = "label",
                          text_col: str = "text",
                          n_buckets: int = 4096, iters: int = 1,
                          lr: float = 1.0, l2: float = 0.0,
                          cache: bool = True):
    """Train the hashed bag-of-words LOGISTIC-REGRESSION quality
    classifier — the published model-based filter training stage
    (GPT-3 / LLaMA "reference-vs-crawl", DCLM, FineWeb-Edu all train
    this family) — natively, by full-batch gradient descent expressed
    as DataFrame aggregations.  The feature map is EXACTLY
    `classifier_score`'s (module `tokens` -> portable md5 bucket mod
    ``n_buckets``, per-doc MEAN), so the result feeds straight into
    the 100-TB scoring pass:

        model = train_text_classifier(labeled, n_buckets=B)
        bias = model.filter("bucket = -1").head()["weight"]
        scored = classifier_score(corpus,
                                  weights_df=model.filter("bucket >= 0"),
                                  dim=B, bias=bias)

    Returns ONE storable frame (bucket, weight): bucket >= 0 rows are
    the learned sparse weights, bucket == -1 the bias, bucket == -2
    ``n_buckets`` (self-describing, cf. `train_lang_model`).

    Math: ``p_d = sigmoid(bias + sum_b w_b * c_db / n_d)``,
    full-batch update ``w -= lr * (mean_d (p_d - y_d) * frac_db
    + l2 * w)``, ``bias -= lr * mean_d (p_d - y_d)``.  Weights and
    bias QUANTIZE to 12 decimals after every update so the whole
    trajectory is reproducible across engines (an iters=1 run from
    the zero model is a single closed-form aggregate — p_d = 0.5 —
    which is what the SQL oracle replicates).  NULL-text and
    token-less docs carry no features and drop from the batch.

    Distributed shape: the feature frame (doc, bucket, frac) builds
    once (cached by default — persist externally for many iterations
    at corpus scale) and each iteration is two map-side-combined
    aggregations (per-doc dot product, per-bucket gradient) around a
    BROADCAST of the current fixed-size model — the corpus never
    joins anything bigger than n_buckets rows, and iteration depth
    only chains bounded-size plans."""
    from pyspark.sql import Window

    from .dedup import portable_hash

    B = int(n_buckets)
    step = float(lr)
    lam = float(l2)
    spark = df.sparkSession
    base = (df.select(F.col(label_col).cast("double").alias("_y"),
                      F.col(text_col).alias("_t"))
            .where(F.col("_t").isNotNull())
            .withColumn("_id", F.monotonically_increasing_id()))
    feats = (base.select(
        "_id", "_y",
        F.explode(F.filter(tokens(F.col("_t")),
                           lambda x: x != F.lit(""))).alias("_tok"))
        .select("_id", "_y",
                F.pmod(portable_hash(F.col("_tok")), F.lit(B))
                .alias("bucket"))
        .groupBy("_id", "_y", "bucket").agg(F.count("*").alias("_c"))
        .withColumn("_frac",
                    F.col("_c") / F.sum("_c").over(
                        Window.partitionBy("_id")))
        .select("_id", "_y", "bucket", "_frac"))
    if cache:
        feats = feats.cache()
    nd = feats.agg(F.count_distinct("_id").alias("_n"))
    weights = spark.createDataFrame([], "bucket long, weight double")
    bias_df = spark.createDataFrame([(0.0,)], "_bias double")
    for _ in range(int(iters)):
        scored = (feats.join(F.broadcast(weights), "bucket", "left")
                  .groupBy("_id", "_y")
                  .agg(F.sum(F.col("_frac")
                             * F.coalesce(F.col("weight"), F.lit(0.0)))
                       .alias("_dot"))
                  .crossJoin(F.broadcast(bias_df)))
        resid = scored.select(
            "_id",
            (F.lit(1.0) / (F.lit(1.0)
                           + F.exp(-(F.col("_dot") + F.col("_bias"))))
             - F.col("_y")).alias("_r"))
        grads = (feats.join(resid, "_id")
                 .groupBy("bucket")
                 .agg(F.sum(F.col("_r") * F.col("_frac")).alias("_g"))
                 .crossJoin(F.broadcast(nd)))
        weights = (grads.join(F.broadcast(weights), "bucket", "left")
                   .select(
                       "bucket",
                       F.round(
                           F.coalesce(F.col("weight"), F.lit(0.0))
                           - F.lit(step)
                           * (F.col("_g") / F.col("_n")
                              + F.lit(lam)
                              * F.coalesce(F.col("weight"),
                                           F.lit(0.0))), 12)
                       .alias("weight")))
        bias_df = (resid.crossJoin(F.broadcast(bias_df))
                   .agg(F.round(F.first("_bias")
                                - F.lit(step) * F.avg("_r"), 12)
                        .alias("_bias")))
        # truncate the per-iteration lineage: weights_k feeds TWO
        # places in iteration k+1, so an un-checkpointed chain
        # doubles the plan every step (the connected-components
        # localCheckpoint pattern, dedup.py) — both frames are
        # n_buckets-row small
        weights = weights.transform(plan_barrier)
        bias_df = bias_df.transform(plan_barrier)
    meta = spark.createDataFrame([(-2, float(B))],
                                 "bucket long, weight double")
    return (weights.unionByName(
        bias_df.select(F.lit(-1).cast("long").alias("bucket"),
                       F.col("_bias").alias("weight")))
        .unionByName(meta))


def rrf_fuse(rankings: list, k: int = 10, c: int = 60,
             query_col: str = "query_id", doc_col: str = "doc_id",
             rank_col: str = "rank",
             score_col: str = "rrf_score"):
    """Reciprocal rank fusion (Cormack, Clarke & Büttcher, SIGIR
    2009) — the standard hybrid-retrieval combiner: given N ranked
    result frames (lexical BM25, dense ANN, ...), score every
    (query, doc) as ``Σ over rankings where it appears of
    1/(c + rank)`` and re-rank.  RRF needs no score calibration
    between systems (it reads only RANKS), which is why it is the
    default fusion in production hybrid search.

    Engine-portable by construction: ranks are integers, the sum is a
    fixed left-associated chain over the rankings IN THE ORDER GIVEN
    (coalesce 0 for absent entries), rounded to 12 decimals; final
    ties break on ``doc_col`` ascending.

    Distributed shape: inputs are top-k frames (queries × k rows —
    tiny by construction at any corpus size), merged by N-1
    full-outer equi-joins on (query, doc) and one window; the
    corpus-scale work happened inside the rankings."""
    from pyspark.sql import Window

    if not rankings:
        raise ValueError("rrf_fuse: need at least one ranking")
    base = None
    for i, r in enumerate(rankings):
        ri = r.select(F.col(query_col), F.col(doc_col),
                      F.col(rank_col).cast("long").alias(f"_r{i}"))
        base = ri if base is None else base.join(
            ri, [query_col, doc_col], "full_outer")
    score = F.lit(0.0)
    for i in range(len(rankings)):
        score = score + F.coalesce(
            F.lit(1.0) / (F.lit(float(c)) + F.col(f"_r{i}")),
            F.lit(0.0))
    w = Window.partitionBy(query_col).orderBy(F.desc(score_col),
                                              F.asc(doc_col))
    return (base.select(query_col, doc_col,
                        F.round(score, 12).alias(score_col))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= int(k)))


def collocations(df, text_col: str = "text", top_k: int = 20,
                 min_count: int = 2):
    """PMI collocation mining (Church & Hanks 1990) — the classic
    "which word pairs belong together" pass data cards and tokenizer
    diagnostics report (a corpus whose top collocations are
    boilerplate fragments is templated): adjacent-token bigrams
    scored by pointwise mutual information over the corpus unigram /
    bigram distributions,
    ``pmi = round(ln(c_ab·N_u² / (N_b·c_a·c_b)), 12)``, returned as
    the (pmi desc, w1, w2) top-``top_k`` rows with counts.
    ``min_count`` drops hapax bigrams (raw PMI famously promotes
    them).  All counts are exact integers and the score one quantized
    ln, so the SQL oracle replays it bit-exactly.

    Distributed shape: one tokenizer pass feeding BOTH count
    aggregations (map-side combined), unigram counts join the bigram
    frame keyed on each word (broadcast-sized after min_count at any
    top_k that matters — but implemented as plain equi-joins so no
    size assumption), totals are two 1-row broadcasts, and the final
    top-k is a TakeOrdered, never a global sort."""
    if int(top_k) < 1:
        raise ValueError("top_k must be >= 1")
    base = (df.filter(F.col(text_col).isNotNull())
            .select(F.filter(tokens(F.col(text_col)),
                             lambda x: x != F.lit(""))
                    .alias("_tf")).cache())
    uni = (base.select(F.explode("_tf").alias("_w"))
           .groupBy("_w").agg(F.count("*").alias("_cu")))
    bi = (base.select(F.explode(F.when(
              F.size("_tf") >= 2,
              F.transform(
                  F.sequence(F.lit(0), F.size("_tf") - 2),
                  lambda i: F.struct(
                      F.element_at("_tf", i + 1).alias("w1"),
                      F.element_at("_tf", (i + F.lit(2)).cast("int"))
                      .alias("w2"))))
              .otherwise(F.array().cast(
                  "array<struct<w1:string,w2:string>>"))).alias("_b"))
          .groupBy(F.col("_b.w1").alias("w1"),
                   F.col("_b.w2").alias("w2"))
          .agg(F.count("*").alias("pair_count"))
          .filter(F.col("pair_count") >= int(min_count)))
    nu = uni.agg(F.sum("_cu").alias("_nu"))
    nb = bi.agg(F.coalesce(F.sum("pair_count"), F.lit(0))
                .alias("_nb"))
    u1 = uni.select(F.col("_w").alias("w1"), F.col("_cu").alias("_c1"))
    u2 = uni.select(F.col("_w").alias("w2"), F.col("_cu").alias("_c2"))
    scored = (bi.join(u1, "w1").join(u2, "w2")
              .crossJoin(F.broadcast(nu)).crossJoin(F.broadcast(nb))
              .select("w1", "w2",
                      F.col("pair_count").cast("long")
                      .alias("pair_count"),
                      F.round(F.log(
                          (F.col("pair_count").cast("double")
                           * F.col("_nu").cast("double")
                           * F.col("_nu").cast("double"))
                          / (F.col("_nb").cast("double")
                             * F.col("_c1").cast("double")
                             * F.col("_c2").cast("double"))), 12)
                      .alias("pmi")))
    return (scored.orderBy(F.col("pmi").desc(), "w1", "w2")
            .limit(int(top_k)))


def textrank_keywords(df, text_col: str = "text", window: int = 2,
                      top_k: int = 20, iters: int = 10,
                      damping: float = 0.85):
    """TextRank keyword extraction (Mihalcea & Tarau 2004) — corpus
    keywords as PageRank over the word CO-OCCURRENCE graph (an
    undirected edge between tokens within ``window`` positions),
    composing `graph.pagerank` unchanged: the whole trajectory is
    that operator's quantized supersteps, so the SQL oracle is the
    pagerank unroll over the derived graph.  Returns the
    (textrank desc, word asc) top-``top_k`` rows.

    Distributed shape: one tokenizer pass + a position×offset
    explode (bounded by ``window``·tokens), one symmetrize+distinct,
    then pagerank's node-sized supersteps; the final top-k is a
    TakeOrdered.  The graph is VOCABULARY-sized (distinct word
    pairs), not corpus-sized."""
    from .graph import pagerank

    if int(window) < 1:
        raise ValueError("window must be >= 1")
    tf = F.filter(tokens(F.col(text_col)), lambda x: x != F.lit(""))
    base = (df.filter(F.col(text_col).isNotNull())
            .select(tf.alias("_tf")))
    pairs = F.when(
        F.size("_tf") >= 2,
        F.flatten(F.transform(
            F.sequence(F.lit(1), F.size("_tf") - 1),
            lambda j: F.transform(
                F.sequence(F.lit(1),
                           F.least(F.lit(int(window)),
                                   F.size("_tf") - j)),
                lambda d: F.struct(
                    F.element_at("_tf", j.cast("int")).alias("a"),
                    F.element_at("_tf", (j + d).cast("int"))
                    .alias("b"))))),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    co = (base.select(F.explode(pairs).alias("_p"))
          .filter(F.col("_p.a") != F.col("_p.b")))
    e = (co.select(F.col("_p.a").alias("src"),
                   F.col("_p.b").alias("dst"))
         .unionAll(co.select(F.col("_p.b").alias("src"),
                             F.col("_p.a").alias("dst"))))
    pr = pagerank(e, iters=iters, damping=damping, dedup_edges=True)
    return (pr.orderBy(F.col("pagerank").desc(), "node")
            .limit(int(top_k))
            .select(F.col("node").alias("word"),
                    F.col("pagerank").alias("textrank")))


def ngram_diversity(df, n: int = 2, text_col: str = "text",
                    by=None, ratio_col: str = "distinct_frac"):
    """Distinct-n diversity (Li et al. 2016's distinct-n, a standard
    generated-data and data-card metric): distinct n-grams over total
    n-gram occurrences, per ``by`` group or corpus-wide — near-0
    means templated/repetitive text, near-1 means every n-gram
    appears once.  Returns (``by``..., n_ngrams, distinct_ngrams,
    ``ratio_col`` rounded to 12).

    One tokenizer pass (`let`-bound — inlined token access would be
    O(len²)), one explode, one aggregation; the exact distinct count
    is one expand, the same price `corpus_stats` pays for an exact
    dup rate.  Docs with fewer than ``n`` tokens contribute nothing;
    groups with zero n-grams are absent."""
    n = int(n)
    if n < 1:
        raise ValueError("n must be >= 1")
    keys = list(by or [])

    def grams_of(tf):
        return F.when(
            F.size(tf) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(tf) - n),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(tf, i + j + 1)
                           for j in range(n)])),
        ).otherwise(F.array().cast("array<string>"))

    grams = let(F.filter(tokens(F.col(text_col)),
                         lambda x: x != F.lit("")), grams_of)
    ex = (df.filter(F.col(text_col).isNotNull())
          .select(*keys, F.explode(grams).alias("_g")))
    return (ex.groupBy(*keys)
            .agg(F.count("*").alias("n_ngrams"),
                 F.count_distinct(F.col("_g"))
                 .alias("distinct_ngrams"))
            .withColumn(ratio_col,
                        F.round(F.col("distinct_ngrams")
                                / F.col("n_ngrams"), 12)))
