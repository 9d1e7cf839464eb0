"""Text-analysis column expressions (extension surface, SURVEY.md §7 phase 4).

All built-in-function compositions — no Python UDFs — so they codegen
and scale linearly with input. Cross-engine determinism: hashing is
md5-based (both Spark and DuckDB expose md5), truncated to 60 bits so
it fits a signed int64 in either engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny per-language stopword lists for the n-gram/stopword language-ID
#: heuristic. Deliberately deterministic and documentation-grade — a
#: real deployment would swap in fastText/CLD3 via a pandas UDF.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "a"),
    "es": ("el", "la", "de", "que", "y", "en", "un"),
    "fr": ("le", "la", "de", "et", "les", "des", "un"),
    "de": ("der", "die", "und", "das", "ist", "ein", "nicht"),
    "zh": ("的", "是", "了", "在", "我", "有", "和"),
}


def normalize_text(col: Column | str) -> Column:
    """Lowercase, collapse whitespace, trim — the canonical dedup key."""
    col = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def tokenize(col: Column | str) -> Column:
    """Whitespace tokenization → array<string>; empty text → empty array."""
    col = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(col)
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(col: Column | str) -> Column:
    return F.size(tokenize(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish token count: words + digit runs + punctuation marks,
    the cheap regex proxy for a BPE tokenizer's token count."""
    col = F.col(col) if isinstance(col, str) else col
    pieces = F.regexp_extract_all(col, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)
    return F.size(pieces)


def word_shingles(tokens: Column, n: int = 3) -> Column:
    """n-word shingles from a token array → array<string>.

    Built with ``transform`` over an index sequence + ``slice`` — pure
    Catalyst expressions, no explode needed until the caller wants one
    row per shingle. Texts shorter than ``n`` words yield a single
    shingle of the whole text so they still participate in dedup.
    """
    count = F.greatest(F.size(tokens) - F.lit(n - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(1), count),
        lambda i: F.array_join(F.slice(tokens, i, n), " "),
    )


def md5_long(col: Column | str, seed: int | None = None) -> Column:
    """60-bit deterministic hash: first 15 hex chars of md5 → bigint.

    Matches DuckDB's ``('0x' || substr(md5(s), 1, 15))::BIGINT`` exactly,
    which is what makes MinHash signatures oracle-checkable. ``seed``
    prepends a salt, giving a family of independent hash functions for
    MinHash permutations.
    """
    col = F.col(col) if isinstance(col, str) else col
    salted = col if seed is None else F.concat(F.lit(f"{seed}|"), col)
    hex15 = F.substring(F.md5(F.encode(salted, "UTF-8")), 1, 15)
    return F.conv(hex15, 16, 10).cast("bigint")


def md5_long_sql(expr: str, seed: int | None = None) -> str:
    """DuckDB twin of :func:`md5_long` for oracle SQL."""
    salted = expr if seed is None else f"('{seed}|' || {expr})"
    return f"CAST(('0x' || substr(md5({salted}), 1, 15)) AS BIGINT)"


def punct_ratio(col: Column | str) -> Column:
    """Fraction of non-space characters that are punctuation/symbols."""
    col = F.col(col) if isinstance(col, str) else col
    nonspace = F.length(F.regexp_replace(col, r"\s", ""))
    punct = F.length(F.regexp_replace(col, r"[A-Za-z0-9\s]", ""))
    return F.when(nonspace > 0, punct / nonspace).otherwise(F.lit(0.0))


def stopword_hits(tokens: Column, lang: str) -> Column:
    """How many tokens are stopwords of ``lang``."""
    stops = F.array(*[F.lit(s) for s in LANG_STOPWORDS[lang]])
    return F.size(F.filter(tokens, lambda t: F.array_contains(stops, t)))


def langid_scores(tokens: Column) -> Column:
    """map<lang,int> of stopword hits — the language-ID evidence vector."""
    return F.map_from_arrays(
        F.array(*[F.lit(lang) for lang in LANG_STOPWORDS]),
        F.array(*[stopword_hits(tokens, lang) for lang in LANG_STOPWORDS]),
    )


SIMHASH_BITS = 32


def simhash_votes(token_hash: Column, n_bits: int = SIMHASH_BITS) -> list[Column]:
    """Per-bit ±1 vote expressions for one token's hash.

    Summed per document (map-side combinable aggregate), the sign of
    each bit's vote total becomes that bit of the SimHash fingerprint.
    """
    return [
        F.when(F.shiftright(token_hash, b).bitwiseAND(F.lit(1)) == 1, 1)
        .otherwise(-1)
        for b in range(n_bits)
    ]


def simhash_from_votes(vote_cols: list[Column]) -> Column:
    """Fold per-bit vote totals into the n-bit SimHash bigint."""
    total = F.lit(0).cast("bigint")
    for b, v in enumerate(vote_cols):
        total = total + F.when(v > 0, F.lit(1 << b)).otherwise(F.lit(0)).cast("bigint")
    return total


def rolling_fingerprint(col: Column | str) -> Column:
    """Whole-document fingerprint: 60-bit md5 of the normalized text.

    The oracle-checkable stand-in for a rolling/Rabin hash — position
    in the pipeline and downstream usage (bucket joins on fingerprint)
    are identical; only the hash family differs.
    """
    return md5_long(normalize_text(col))
