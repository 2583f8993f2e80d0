"""Text-analysis expressions for LLM-data-pipeline workloads: token
counting, quality scoring, language ID, fingerprinting (BASELINE.json
north-star extensions; absent from the reference — SURVEY.md §2.7).

Everything here is a JVM-side Column expression (split/regexp/higher-
order array functions) — no Python UDFs, so the hot path stays inside
whole-stage codegen at 100 TB. Each helper has a textually-parallel SQL
twin used by the DuckDB oracles in plans/textops.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# small, deliberately-crude per-language stopword sets for the n-gram/
# stopword language-ID heuristic (a real system would plug fastText or
# CLD3 in via pandas_udf; the heuristic keeps the operator oracle-checkable)
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr": ("le", "les", "des", "et", "est", "une", "que", "pas"),
    "es": ("el", "los", "las", "y", "es", "una", "que", "por"),
}


def canon_lower(text: Column) -> Column:
    """PORTABLE casefold: engine ``lower()`` plus two normalizations
    that pin the only cross-engine divergences in Unicode lowercasing
    (round-9 text-edge probe). Java (Spark) applies the full,
    context-sensitive case mapping: a word-final 'Σ' becomes U+03C2 (ς)
    and 'İ' (U+0130) becomes "i" + combining-dot U+0307; DuckDB's
    utf8proc applies the simple mapping: always U+03C3 (σ), always a
    bare "i". The canon folds both outputs to one form — ς -> σ and
    "i" + U+0307 -> "i" — so fingerprints, terms, and dedup groups
    agree bit-for-bit on Greek/Turkish text. Idempotent, ASCII rows
    untouched, and identical when applied after EITHER engine's
    lower(). SQL twin: catalog's canon_lower_sql / the inline
    replace(translate(lower(..)..)..) form in the oracles."""
    return F.replace(
        F.translate(F.lower(text), "ς", "σ"),
        F.lit("i̇"),
        F.lit("i"),
    )


def tokens(text: Column) -> Column:
    """Whitespace tokenization; empty text -> empty array."""
    return F.when(F.trim(text) == "", F.array().cast("array<string>")).otherwise(
        F.split(F.trim(text), r"\s+")
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("bigint")


def norm_tokens(text: Column) -> Column:
    """Normalized tokens == ``split(normalize(text), ' ')``: casefolded
    maximal non-whitespace runs, never containing an empty token
    (round-9 text-edge pin; the old fused split-on-\\s+ form emitted a
    phantom EMPTY first token for leading-TAB text, because the
    space-only trim keeps the tab — RAW tokens (tokens()/_TOKENS/the
    UDTF) deliberately keep that Java-split semantics). Implemented as
    ONE regex split plus array_remove instead of the two-pass
    collapse-then-split: \\s+ splitting yields '' only at the array
    edges (the + quantifier forbids interior empties) and canon_lower
    never creates or destroys whitespace, so removing '' gives exactly
    the two-pass result for half the regex scanning — the oracles
    state the two-pass string_split(normalized, ' ') form."""
    return F.when(F.trim(text) == "", F.array().cast("array<string>")).otherwise(
        F.array_remove(F.split(canon_lower(F.trim(text)), r"\s+"), "")
    )


def stopword_hits(text: Column, words: tuple[str, ...]) -> Column:
    """Number of tokens (with multiplicity) in the stopword set."""
    wordset = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(wordset, t))).cast(
        "bigint"
    )


def alpha_ratio(text: Column) -> Column:
    """Fraction of characters that are ASCII letters."""
    n_alpha = F.length(F.regexp_replace(text, "[^a-zA-Z]", ""))
    return n_alpha.cast("double") / F.greatest(F.length(text), F.lit(1)).cast("double")


def avg_token_len(text: Column) -> Column:
    n_solid = F.length(F.regexp_replace(text, r"\s+", ""))
    return n_solid.cast("double") / F.greatest(token_count(text), F.lit(1)).cast(
        "double"
    )


def stopword_ratio(text: Column, words: tuple[str, ...] | None = None) -> Column:
    hits = stopword_hits(text, words or LANG_STOPWORDS["en"])
    return hits.cast("double") / F.greatest(token_count(text), F.lit(1)).cast("double")


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: stopword density + reasonable
    word length + alphabetic purity (weights arbitrary but fixed)."""
    return (
        F.lit(0.4) * stopword_ratio(text)
        + F.lit(0.3) * F.least(avg_token_len(text) / F.lit(10.0), F.lit(1.0))
        + F.lit(0.3) * alpha_ratio(text)
    )


def lang_scores(text: Column) -> dict[str, Column]:
    return {lang: stopword_hits(text, words) for lang, words in LANG_STOPWORDS.items()}


def lang_id(text: Column) -> Column:
    """Argmax of per-language stopword hits; ties broken in the fixed
    order en > de > fr > es; all-zero -> 'unknown'."""
    s = lang_scores(text)
    best = F.greatest(*s.values())
    expr = F.when(best == 0, F.lit("unknown"))
    for lang in ("en", "de", "fr", "es"):
        expr = expr.when(s[lang] == best, F.lit(lang))
    return expr.otherwise(F.lit("unknown"))


def normalize(text: Column) -> Column:
    """Canonical form for fingerprinting: portable-casefolded
    (canon_lower), collapsed whitespace."""
    return canon_lower(F.trim(F.regexp_replace(text, r"\s+", " ")))


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text
    (the exact-dedup key; rolling/MinHash fingerprints live in
    operators/dedup.py)."""
    return F.md5(normalize(text))
