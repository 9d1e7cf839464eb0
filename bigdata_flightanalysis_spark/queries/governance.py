"""Data-governance operators for a training-data pipeline: PII
redaction and URL/domain analysis over the documents corpus.

Both are standard pre-training stages (mask emails/phones/IDs before
the corpus leaves the pipeline; profile the domain mixture of crawled
text). The synthetic testdata corpus contains no organic PII or URLs,
so each query first ENRICHES the text with deterministic,
doc_id-derived instances — the identical construction on the Spark and
DuckDB sides — and then runs the real pattern machinery over it. The
redaction/extraction operators themselves are corpus-agnostic: on a
real crawl the enrichment step is simply dropped.

Determinism notes:
- patterns use only constructs with identical semantics in Java regex
  (Spark) and RE2 (DuckDB): character classes, bounded repetition —
  no lookaround, no backreferences;
- DuckDB ``regexp_replace`` is first-match-only by default; the
  oracles pass the ``'g'`` flag to match Spark's replace-all;
- counts come from ``regexp_count`` (Spark) vs
  ``len(regexp_extract_all(...))`` (DuckDB) — same value, and summed
  as BIGINT on both sides.

Scale posture: everything here is a narrow per-row projection plus one
aggregation — no joins, no Python, fully inside whole-stage codegen.
At 100 TB the regexp evaluation is embarrassingly parallel and the
only shuffle is the final small groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_flightanalysis_spark.functions.text import (
    SQL_FINGERPRINT,
    SQL_TOKENS,
)
from bigdata_flightanalysis_spark.queries.catalog import register
from bigdata_flightanalysis_spark.sources.readers import read_table

# Patterns (Java-regex / RE2 common subset).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{1,6}"
ID_RE = r"SSN-[0-9]+"
URL_RE = r"https?://[A-Za-z0-9.-]+(/[A-Za-z0-9./_-]*)?"
DOMAIN_RE = r"https?://([A-Za-z0-9.-]+)"

# Deterministic PII enrichment — MUST stay textually identical between
# the Spark expression below and the SQL fragment in the oracles.
_PII_SUFFIX_SQL = (
    "' contact user' || CAST(doc_id AS VARCHAR) || '@mail-' || source"
    " || '.org phone +1-555-' || CAST(doc_id % 10000 AS VARCHAR)"
    " || ' id SSN-' || CAST((doc_id * 7919) % 1000000 AS VARCHAR)"
)
_URL_SUFFIX_SQL = (
    "' see https://www.' || source || '.example.com/p/'"
    " || CAST(doc_id AS VARCHAR) || ' and http://cdn'"
    " || CAST(doc_id % 7 AS VARCHAR) || '.assets-' || lang || '.net/x.js'"
)


def _pii_enriched(docs: DataFrame) -> DataFrame:
    suffix = F.concat(
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail-"),
        F.col("source"),
        F.lit(".org phone +1-555-"),
        (F.col("doc_id") % 10000).cast("string"),
        F.lit(" id SSN-"),
        ((F.col("doc_id") * 7919) % 1000000).cast("string"),
    )
    return docs.withColumn("enriched", F.concat(F.col("text"), suffix))


@register(
    "doc_pii_redaction",
    oracle=f"""
        WITH enriched AS (
            SELECT doc_id, lang, text || {_PII_SUFFIX_SQL} AS enriched
            FROM documents
        ), redacted AS (
            SELECT lang,
                   len(regexp_extract_all(enriched, '{EMAIL_RE}')) AS n_email,
                   len(regexp_extract_all(enriched, '{PHONE_RE}')) AS n_phone,
                   len(regexp_extract_all(enriched, '{ID_RE}')) AS n_id,
                   regexp_replace(
                       regexp_replace(
                           regexp_replace(enriched, '{EMAIL_RE}', '<EMAIL>', 'g'),
                           '{PHONE_RE}', '<PHONE>', 'g'),
                       '{ID_RE}', '<ID>', 'g') AS red
            FROM enriched
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_email) AS BIGINT) AS emails_masked,
               CAST(SUM(n_phone) AS BIGINT) AS phones_masked,
               CAST(SUM(n_id) AS BIGINT) AS ids_masked,
               CAST(SUM(length(red)) AS BIGINT) AS redacted_chars
        FROM redacted
        GROUP BY lang
        ORDER BY lang
    """,
    description="PII redaction (email/phone/national-ID masking) with "
    "per-language audit counts — the pre-release governance pass of a "
    "training-data pipeline. Chained regexp_replace + regexp_count, "
    "all codegen'd built-ins; the corpus is enriched with "
    "deterministic doc_id-derived PII because the synthetic testdata "
    "contains none organically.",
    tags=("text", "governance", "pii"),
)
def doc_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _pii_enriched(read_table(spark, sf_dir, "documents"))
    e = F.col("enriched")
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(e, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ),
        ID_RE,
        "<ID>",
    )
    per_doc = docs.select(
        "lang",
        F.regexp_count(e, F.lit(EMAIL_RE)).alias("n_email"),
        F.regexp_count(e, F.lit(PHONE_RE)).alias("n_phone"),
        F.regexp_count(e, F.lit(ID_RE)).alias("n_id"),
        F.length(red).alias("red_len"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_email").cast("long").alias("emails_masked"),
            F.sum("n_phone").cast("long").alias("phones_masked"),
            F.sum("n_id").cast("long").alias("ids_masked"),
            F.sum("red_len").cast("long").alias("redacted_chars"),
        )
        .orderBy("lang")
    )


@register(
    "doc_url_domains",
    oracle=f"""
        WITH enriched AS (
            SELECT doc_id, text || {_URL_SUFFIX_SQL} AS enriched
            FROM documents
        ), domains AS (
            SELECT unnest(regexp_extract_all(enriched, '{DOMAIN_RE}', 1))
                       AS domain
            FROM enriched
        )
        SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_urls
        FROM domains
        GROUP BY domain
        ORDER BY n_urls DESC, domain
        LIMIT 15
    """,
    description="URL-domain mixture profile: extract every URL, reduce "
    "to its registered domain, top-15 histogram with a total-order "
    "tie-break — the crawl-mixture audit a pretraining pipeline runs "
    "before sampling weights. regexp_extract_all + explode + one "
    "aggregation; the explode multiplies rows by URL count (bounded "
    "per doc), the only shuffle is the domain groupBy.",
    tags=("text", "governance", "urls"),
)
def doc_url_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    suffix = F.concat(
        F.lit(" see https://www."),
        F.col("source"),
        F.lit(".example.com/p/"),
        F.col("doc_id").cast("string"),
        F.lit(" and http://cdn"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".assets-"),
        F.col("lang"),
        F.lit(".net/x.js"),
    )
    enriched = docs.select(F.concat(F.col("text"), suffix).alias("enriched"))
    domains = enriched.select(
        F.explode(
            F.regexp_extract_all(F.col("enriched"), F.lit(DOMAIN_RE), F.lit(1))
        ).alias("domain")
    )
    return (
        domains.groupBy("domain")
        .agg(F.count("*").alias("n_urls"))
        .orderBy(F.col("n_urls").desc(), "domain")
        .limit(15)
    )


@register(
    "corpus_card",
    oracle=f"""
        WITH t AS (
            SELECT lang, source, n_chars,
                   len({SQL_TOKENS}) AS n_tokens,
                   {SQL_FINGERPRINT} AS fp
            FROM documents
        ),
        -- percentile_disc, not a cume_dist CTE: the window form
        -- counted NULL n_tokens rows in its denominator while Spark's
        -- percentile_disc aggregate ignores NULLs — one NULL-text doc
        -- shifted the oracle's p50 a rank late (r16 review)
        p50 AS (
            SELECT percentile_disc(0.5) WITHIN GROUP (ORDER BY n_tokens)
                       AS v
            FROM t
        ),
        a AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                   CAST(SUM(n_chars) AS DOUBLE) AS total_chars,
                   CAST(SUM(n_tokens) AS DOUBLE) AS total_tokens,
                   CAST(COUNT(DISTINCT lang) AS DOUBLE) AS n_langs,
                   CAST(COUNT(DISTINCT source) AS DOUBLE) AS n_sources,
                   CAST(COUNT(DISTINCT fp) AS DOUBLE) AS n_fp,
                   CAST(SUM(CASE WHEN n_tokens < 20 THEN 1 ELSE 0 END)
                        AS DOUBLE) AS n_short
            FROM t
        )
        SELECT 'exact_dup_ratio' AS metric,
               1.0 - n_fp / NULLIF(n_docs, 0) AS value FROM a
        UNION ALL SELECT 'mean_doc_tokens',
               total_tokens / NULLIF(n_docs, 0) FROM a
        UNION ALL SELECT 'n_docs', n_docs FROM a
        UNION ALL SELECT 'n_langs', n_langs FROM a
        UNION ALL SELECT 'n_sources', n_sources FROM a
        UNION ALL SELECT 'p50_doc_tokens', CAST(v AS DOUBLE) FROM p50
        UNION ALL SELECT 'short_doc_ratio',
               n_short / NULLIF(n_docs, 0) FROM a
        UNION ALL SELECT 'total_chars', total_chars FROM a
        UNION ALL SELECT 'total_tokens', total_tokens FROM a
        ORDER BY metric
    """,
    description="Dataset card for the documents corpus — the one-stop "
    "summary a training run records before consuming a snapshot: doc/"
    "char/token volumes, language and source diversity, exact-dup "
    "ratio (via the same md5 fingerprint the dedup store keys on), "
    "short-doc ratio, and the DISCRETE median tokens-per-doc "
    "(percentile_disc — the engine-exact form the robust-stats twins "
    "pinned). Long (metric, value) format so the card is schema-stable "
    "as metrics are added. Shape: ONE corpus scan into one aggregate; "
    "the three exact distinct counts expand the aggregate 3x "
    "(dimension-bounded — lang/source/fingerprint), the documented "
    "exactness trade-off, with profile_table(approx=True)'s HLL path "
    "as the 100 TB swap.",
    tags=("governance", "text", "report", "card"),
)
def corpus_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_flightanalysis_spark.functions.text import (
        md5_long,
        normalize_text,
        tokenize,
    )

    docs = read_table(spark, sf_dir, "documents")
    t = docs.select(
        "lang",
        "source",
        "n_chars",
        F.size(tokenize("text")).cast("long").alias("n_tokens"),
        md5_long(normalize_text("text")).alias("fp"),
    )
    a = t.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum("n_chars").cast("double").alias("total_chars"),
        F.sum("n_tokens").cast("double").alias("total_tokens"),
        F.count_distinct("lang").cast("double").alias("n_langs"),
        F.count_distinct("source").cast("double").alias("n_sources"),
        F.count_distinct("fp").cast("double").alias("n_fp"),
        # when/otherwise mirrors the oracle's CASE ... ELSE 0: on an
        # all-NULL-text corpus the bare boolean cast sums NULL (SUM
        # skips every row) while the oracle sums 0 — short_doc_ratio
        # diverged NULL-vs-0.0 (r16 review)
        F.sum(F.when(F.col("n_tokens") < 20, 1).otherwise(0))
        .cast("double")
        .alias("n_short"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY n_tokens)")
        .cast("double")
        .alias("p50"),
    )
    # nullif guards: on an EMPTY corpus the ratio divisions would
    # THROW under Spark 4's default ANSI mode (and diverge NULL-vs-NaN
    # across engines without it) — both sides emit NULL instead.
    return a.select(
        F.expr(
            "stack(9, "
            "'exact_dup_ratio', 1.0 - n_fp / nullif(n_docs, 0), "
            "'mean_doc_tokens', total_tokens / nullif(n_docs, 0), "
            "'n_docs', n_docs, "
            "'n_langs', n_langs, "
            "'n_sources', n_sources, "
            "'p50_doc_tokens', p50, "
            "'short_doc_ratio', n_short / nullif(n_docs, 0), "
            "'total_chars', total_chars, "
            "'total_tokens', total_tokens"
            ") AS (metric, value)"
        )
    ).orderBy("metric")
