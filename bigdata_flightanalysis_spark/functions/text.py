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


def fold_case(col: Column) -> Column:
    """Cross-engine-safe lowercase — the ONE İ/ς-pinned fold.

    Two unicode case foldings are pinned explicitly because Java and
    DuckDB lowercase them differently (measured): Turkish dotted
    İ (U+0130) — Java yields i+COMBINING DOT, DuckDB plain i — is
    pre-folded to plain i, and Greek final sigma ς (Java applies the
    contextual rule, DuckDB does not) is post-folded to σ, the
    standard search-engine normalization. Without these, a Turkish or
    Greek doc's fingerprint diverges between the engine and its
    oracle (and a token like 'İN' would stopword-match 'in' on one
    engine only)."""
    return F.translate(F.lower(F.translate(col, "İ", "i")), "ς", "σ")


def sql_fold_case(expr: str) -> str:
    """DuckDB twin of :func:`fold_case` for oracle SQL fragments."""
    return f"replace(lower(replace({expr}, 'İ', 'i')), 'ς', 'σ')"


def normalize_text(col: Column | str) -> Column:
    """Lowercase (İ/ς-pinned — see :func:`fold_case`), collapse
    whitespace, trim — the canonical dedup key."""
    col = F.col(col) if isinstance(col, str) else col
    lowered = fold_case(col)
    # whitespace class spelled out: Java \s includes \x0B, RE2 (DuckDB)
    # \s does not — shorthand classes diverge across the two engines,
    # so every cross-engine regex uses the same explicit class
    return F.trim(F.regexp_replace(lowered, r"[ \t\n\x0B\f\r]+", " "))


#: Version tag of the tokenization scheme, stamped into every on-disk
#: artifact whose layout is a function of how text splits into terms
#: (the BM25 index meta, the MinHash band-store meta): mixing
#: tokenizer versions silently mis-scores/mis-buckets, so the stamps
#: turn it into a named rebuild error. Bump when tokenize's output
#: changes for ANY input. v2 (r16): boundary empty tokens filtered.
TOKENIZER_TAG = "ws_split_filter_v2"


def tokenize(col: Column | str) -> Column:
    """Whitespace tokenization → array<string>; empty or
    whitespace-only text → empty array; NULL → NULL.

    Empty strings are FILTERED, not trimmed away: ``trim`` strips
    only spaces (0x20) while the split class covers
    tab/newline/\\x0B/\\f/\\r, so ``'doc text\\n'`` used to tokenize
    to a phantom third ``''`` token — shifting token counts, TTR and
    shingle sets, and giving trailing-newline near-duplicates
    (ubiquitous in crawls) divergent MinHash signatures (r16 review;
    the DuckDB twin ``SQL_TOKENS`` shared the bug, so parity never
    caught it)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.split(col, r"[ \t\n\x0B\f\r]+"), lambda t: t != F.lit("")
    )


def token_count(col: Column | str) -> Column:
    return F.size(tokenize(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish token count: words + digit runs + punctuation marks,
    the cheap regex proxy for a BPE tokenizer's token count."""
    col = F.col(col) if isinstance(col, str) else col
    pieces = F.regexp_extract_all(
        col, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0B\f\r]"), 0
    )
    return F.size(pieces)


def word_shingles(tokens: Column, n: int = 3) -> Column:
    """n-word shingles from a token array → array<string>.

    Linear construction: zip the token array with its 1..n-1 shifted
    copies, truncate to the shingle count, join each struct — O(tokens)
    total. (The obvious ``transform(sequence, i -> slice(tokens, i, n))``
    re-slices the array per shingle → O(tokens²); measured 2.3× slower
    at sf0.1.) Texts shorter than ``n`` words yield a single shingle of
    the whole text (``concat_ws`` skips the nulls arrays_zip pads with)
    so they still participate in dedup.
    """
    size = F.size(tokens)
    # each zip input is aliased to its index: arrays_zip names struct
    # fields after NAMED input columns (passing F.col("tokens") would
    # otherwise make the field "tokens", breaking the x[str(i)] access
    # below, which only worked for unnamed expressions)
    shifted = [tokens.alias("0")] + [
        F.slice(tokens, k + 1, F.greatest(size - k, F.lit(0))).alias(str(k))
        for k in range(1, n)
    ]
    zipped = F.slice(
        F.arrays_zip(*shifted), 1, F.greatest(size - (n - 1), F.lit(1))
    )
    return F.transform(
        zipped, lambda x: F.concat_ws(" ", *[x[str(i)] for i in range(n)])
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


# DuckDB twins of tokenize / normalize_text / md5_long(normalize_text)
# over a column literally named `text` — the ONE definition every
# oracle that claims fingerprint/token compatibility with the dedup
# store must import (r16 review: corpus_card carried a hand-copied
# duplicate of the İ/ς case-folding fragment that the next pin added
# here would silently have missed).
#
# Empty tokens are FILTERED like the Spark side (boundary whitespace
# keeps split's empty strings; trim only strips 0x20 — see tokenize):
# blank and whitespace-only docs yield [], NULL yields NULL, and no
# phantom '' token ever enters a count/shingle/stopword expression.
# Parenthesized so call sites can slice/index it directly.
SQL_TOKENS = (
    "(list_filter(string_split_regex(text, '[ \\t\\n\\x0B\\f\\r]+'),"
    " t -> t <> ''))"
)
# same İ/ς case-folding pins as normalize_text
SQL_NORM_TEXT = (
    "trim(regexp_replace(replace(lower(replace(text, 'İ', 'i')), 'ς', 'σ'),"
    " '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))"
)
SQL_FINGERPRINT = md5_long_sql(SQL_NORM_TEXT)


def punct_ratio(col: Column | str) -> Column:
    """Fraction of non-space characters that are punctuation/symbols.

    Unicode letter/number/mark classes (\\p{L}\\p{N}\\p{M} — same
    single-letter general categories in Java and RE2), not
    [A-Za-z0-9]: the ASCII class counted every CJK/Cyrillic/accented
    character as "punctuation", so any punct_ratio quality threshold
    flagged ALL non-ASCII-language docs as garbage (r16 review; the
    module ships zh stopword lists, so non-English text is
    in-model)."""
    col = F.col(col) if isinstance(col, str) else col
    nonspace = F.length(F.regexp_replace(col, r"[ \t\n\x0B\f\r]", ""))
    punct = F.length(
        F.regexp_replace(col, r"[\p{L}\p{N}\p{M} \t\n\x0B\f\r]", "")
    )
    return F.when(nonspace > 0, punct / nonspace).otherwise(F.lit(0.0))


def stopword_hits(
    tokens: Column,
    lang: str | None = None,
    *,
    words: tuple[str, ...] | None = None,
) -> Column:
    """How many tokens are stopwords of ``lang`` (LANG_STOPWORDS) or
    of an explicit ``words`` list — ONE definition of the
    filter/array_contains counting expression (r16 review: the
    stopword-ratio query inlined a verbatim copy against its own word
    table)."""
    if (lang is None) == (words is None):
        raise ValueError("pass exactly one of lang or words")
    ws = LANG_STOPWORDS[lang] if lang is not None else words
    stops = F.array(*[F.lit(s) for s in ws])
    # case-folded match (İ/ς-pinned, same fold as normalize_text):
    # the lists are lowercase-only, and callers pass tokens from RAW
    # text, so sentence-initial 'The'/'Der'/'El' — the most frequent
    # position for stopwords — never counted, skewing the language-ID
    # argmax toward the alphabetical tie-break (r16 review)
    return F.size(
        F.filter(tokens, lambda t: F.array_contains(stops, fold_case(t)))
    )


def langid_scores(tokens: Column) -> Column:
    """map<lang,int> of stopword hits — the language-ID evidence vector."""
    return F.map_from_arrays(
        F.array(*[F.lit(lang) for lang in LANG_STOPWORDS]),
        F.array(*[stopword_hits(tokens, lang) for lang in LANG_STOPWORDS]),
    )


# ---------------------------------------------------------------------------
# MinHash permutation family: ONE md5 per shingle, then cheap affine
# permutations of the 60-bit base hash. 16 salted-md5 evaluations per
# shingle measured 4-8× slower at sf0.1 — the md5 dominates, not the
# min-aggregate. The affine form splits the base into 30-bit halves so
# every product stays < 2^60 and the sum < 2^62: no int64 overflow in
# either engine (Spark ANSI mode and DuckDB both error on overflow).
# ---------------------------------------------------------------------------

_MINHASH_MASK = (1 << 60) - 1
_LO_MASK = (1 << 30) - 1


def _perm_constants(n_perm: int, seed: int = 42) -> list[tuple[int, int, int]]:
    import numpy as np

    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_perm):
        a_hi = int(rng.integers(1, 1 << 30)) | 1  # odd multipliers
        a_lo = int(rng.integers(1, 1 << 30)) | 1
        c = int(rng.integers(0, 1 << 30))
        out.append((a_hi, a_lo, c))
    return out


def minhash_perm(base: Column, const: tuple[int, int, int]) -> Column:
    """Affine 60-bit permutation of a base hash (Spark side)."""
    a_hi, a_lo, c = const
    hi = F.shiftright(base, 30)
    lo = base.bitwiseAND(F.lit(_LO_MASK))
    return (F.lit(a_hi) * hi + F.lit(a_lo) * lo + F.lit(c)).bitwiseAND(
        F.lit(_MINHASH_MASK)
    )


def minhash_perm_sql(base: str, const: tuple[int, int, int]) -> str:
    """DuckDB twin of :func:`minhash_perm`."""
    a_hi, a_lo, c = const
    return (
        f"(({a_hi} * ({base} >> 30) + {a_lo} * ({base} & {_LO_MASK}) + {c})"
        f" & {_MINHASH_MASK})"
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
