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
