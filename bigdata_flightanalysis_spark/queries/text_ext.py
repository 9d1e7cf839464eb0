"""Training-data-pipeline text operators beyond the core dedup suite
(``queries/text.py``): corpus statistics a 100 TB pretraining pipeline
runs between dedup and sampling — repetition-based quality filtering,
global vocabulary statistics, domain mixture weighting, and per-doc
salient-term extraction.

Determinism notes:
- per-doc ratios are pure quotients of counts (IEEE-identical on both
  engines given identical expression trees);
- salient-term ranking deliberately avoids tf·idf's logarithm
  (transcendental functions are NOT bit-stable across engines) and
  ranks by the equivalent total order (tf DESC, df ASC, term ASC).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdata_flightanalysis_spark.functions.text import (
    stopword_hits,
    tokenize,
    word_shingles,
)
from bigdata_flightanalysis_spark.queries.catalog import register
from bigdata_flightanalysis_spark.queries.text import _SQL_TOKENS, _sql_shingles
from bigdata_flightanalysis_spark.sources.readers import read_table


@register(
    "doc_repetition_scores",
    oracle=f"""
        SELECT doc_id,
               CAST(len(bg) AS BIGINT) AS n_bigrams,
               CAST(len(list_distinct(bg)) AS BIGINT) AS n_distinct,
               CASE WHEN len(bg) > 0
                    THEN 1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg)
                    ELSE 0.0 END AS rep_ratio
        FROM (
            SELECT doc_id, {_sql_shingles(2)} AS bg FROM documents
        )
        ORDER BY doc_id
    """,
    description="Repeated-bigram quality score (Gopher/C4-style "
    "repetition filter): 1 − distinct/total word-bigrams per doc. "
    "Pure narrow transformation — zero shuffles except the "
    "presentation sort; the shingler is the linear arrays_zip form "
    "(see memory: O(n²) transform(sequence) variant is 2.3× slower).",
    tags=("text", "quality"),
)
def doc_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    bg = word_shingles(tokenize("text"), 2)
    return (
        docs.select("doc_id", bg.alias("bg"))
        .select(
            "doc_id",
            F.size("bg").cast("long").alias("n_bigrams"),
            F.size(F.array_distinct("bg")).cast("long").alias("n_distinct"),
            # blank doc → 0 bigrams: the bare division THROWS under
            # Spark 4 ANSI (DuckDB's float x/0 is NULL) — both engines
            # pin 0.0 explicitly
            F.when(
                F.size("bg") > 0,
                F.lit(1.0)
                - F.size(F.array_distinct("bg")).cast("double") / F.size("bg"),
            )
            .otherwise(F.lit(0.0))
            .alias("rep_ratio"),
        )
        .orderBy("doc_id")
    )


@register(
    "doc_ngram_topk",
    oracle=f"""
        SELECT ng, COUNT(*) AS n_occurrences,
               COUNT(DISTINCT doc_id) AS n_docs
        FROM (
            SELECT doc_id, unnest({_sql_shingles(3)}) AS ng FROM documents
        )
        GROUP BY ng
        ORDER BY n_occurrences DESC, ng
        LIMIT 20
    """,
    description="Global top-20 word 3-grams with occurrence and "
    "document frequency — the corpus-vocabulary sweep. Explode is "
    "a narrow op; ONE shuffle on the n-gram key with map-side "
    "partial aggregation, then TakeOrderedAndProject (never a full "
    "sort of the vocabulary).",
    tags=("text", "vocabulary", "topk"),
)
def doc_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    exploded = docs.select(
        "doc_id", F.explode(word_shingles(tokenize("text"), 3)).alias("ng")
    )
    return (
        exploded.groupBy("ng")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("ng").asc())
        .limit(20)
    )


@register(
    "doc_source_mixture_weights",
    oracle="""
        WITH per_source AS (
            SELECT source, COUNT(*) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS total_chars
            FROM documents
            GROUP BY source
        ),
        tot AS (
            SELECT CAST(SUM(n_docs) AS BIGINT) AS total_docs,
                   COUNT(*) AS n_sources
            FROM per_source
        )
        SELECT source, n_docs, total_chars,
               CAST(total_docs AS DOUBLE) / (n_sources * n_docs)
                   AS resample_weight
        FROM per_source, tot
        ORDER BY source
    """,
    description="Domain-mixture weighting: per-source corpus mass and "
    "the resampling weight that flattens the mixture to uniform "
    "(weight = uniform-share / actual-share). The corpus-level "
    "scalars come from the tiny per-source aggregate (one fact "
    "shuffle), broadcast back as a one-row cross join.",
    tags=("text", "sampling"),
)
def doc_source_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )
    tot = per_source.agg(
        F.sum("n_docs").alias("total_docs"),
        F.count("*").alias("n_sources"),
    )
    return (
        per_source.join(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "total_chars",
            (
                F.col("total_docs").cast("double")
                / (F.col("n_sources") * F.col("n_docs"))
            ).alias("resample_weight"),
        )
        .orderBy("source")
    )


@register(
    "doc_length_histogram",
    oracle="""
        SELECT lang,
               CAST(floor(n_chars / 100) AS BIGINT) AS len_bucket,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS bucket_chars
        FROM documents
        GROUP BY lang, len_bucket
        ORDER BY lang, len_bucket
    """,
    description="Per-language document-length histogram (100-char "
    "buckets) — the length-filter calibration sweep. Integer bucket "
    "arithmetic (no transcendental binning); single shuffle on the "
    "composite key with partial aggregation.",
    tags=("text", "quality"),
)
def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "lang",
            F.floor(F.col("n_chars") / 100).cast("long").alias("len_bucket"),
            "n_chars",
        )
        .groupBy("lang", "len_bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("bucket_chars"),
        )
        .orderBy("lang", "len_bucket")
    )


@register(
    "doc_salient_terms",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest({_SQL_TOKENS}) AS term FROM documents
        ),
        tf AS (
            SELECT doc_id, term, COUNT(*) AS tf
            FROM toks GROUP BY doc_id, term
        ),
        df AS (
            SELECT term, COUNT(DISTINCT doc_id) AS df
            FROM toks GROUP BY term
        )
        SELECT doc_id, term, tf, df, rk
        FROM (
            SELECT doc_id, term, tf, df,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY doc_id
                       ORDER BY tf DESC, df ASC, term ASC
                   ) AS INT) AS rk
            FROM tf JOIN df USING (term)
        )
        WHERE rk <= 3
        ORDER BY doc_id, rk
    """,
    description="Per-document salient terms (tf-idf shape): term "
    "frequency per doc joined with corpus document frequency, top-3 "
    "per doc. Ranks by the order tf·idf induces — (tf DESC, df ASC, "
    "term ASC) — WITHOUT computing a logarithm: transcendentals are "
    "not bit-stable across engines, the total order is. One explode, "
    "two aggregations, a shuffled join on the term key (vocabulary "
    "scales past broadcast range at corpus scale), and a "
    "WindowGroupLimit-prunable per-doc window.",
    tags=("text", "vocabulary", "window"),
)
def doc_salient_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE corpus scan and TWO hash exchanges (plan-asserted), where the
    # naive form pays four plus a second explode pass:
    # - explode once, repartition by term: term partitioning satisfies
    #   the (doc_id, term) tf groupBy's clustered distribution, the
    #   term-level df aggregate, AND the tf⋈df join — all shuffle-free
    #   on top of it;
    # - df (docs containing the term) = row count of the tf frame per
    #   term, so the corpus is never re-exploded;
    # - the per-doc window is the second (doc_id) exchange.
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(tokenize("text")).alias("term")
    ).repartition("term")
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    w = (
        Window.partitionBy("doc_id")
        .orderBy(F.col("tf").desc(), F.col("df").asc(), F.col("term").asc())
    )
    # shuffle_hash, not broadcast: both sides already share the term
    # partitioning (zero extra exchange), and a broadcast of df would
    # plan a SECOND scan+explode of the corpus for the build side
    # (exchange reuse only rescues it at runtime under AQE). At corpus
    # scale the vocabulary outgrows broadcast range anyway.
    return (
        tf.join(df.hint("shuffle_hash"), "term")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tf", "df", "rk")
        .orderBy("doc_id", "rk")
    )


_BP_N = 5  # shingle width for boilerplate detection
_BP_DOC_FREQ = 20  # a shingle in more docs than this is boilerplate


@register(
    "doc_boilerplate_density",
    oracle=f"""
        WITH sh AS (
            SELECT doc_id, unnest(list_distinct({_sql_shingles(_BP_N)})) AS s
            FROM documents
        ),
        freq AS (
            SELECT s FROM sh GROUP BY s HAVING COUNT(*) > {_BP_DOC_FREQ}
        )
        SELECT sh.doc_id,
               COUNT(*) AS n_shingles,
               CAST(SUM(CASE WHEN freq.s IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_boiler,
               CAST(SUM(CASE WHEN freq.s IS NOT NULL THEN 1 ELSE 0 END)
                    AS DOUBLE) / COUNT(*) AS boiler_frac
        FROM sh LEFT JOIN freq ON sh.s = freq.s
        GROUP BY sh.doc_id
        ORDER BY sh.doc_id
    """,
    description="Boilerplate density (C4-style cleanup signal): the "
    "fraction of a doc's distinct 5-gram shingles that occur in more "
    f"than {_BP_DOC_FREQ} documents corpus-wide — headers, footers, "
    "and licence blocks light up, prose stays near zero. One explode; "
    "the shingle-frequency aggregate and the membership join share "
    "the shingle-key partitioning (repartition + shuffle_hash, same "
    "single-corpus-shuffle shape as doc_salient_terms); per-doc "
    "re-aggregation is the second exchange.",
    tags=("text", "quality", "boilerplate"),
)
def doc_boilerplate_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(word_shingles(tokenize("text"), _BP_N))
        ).alias("s"),
    ).repartition("s")
    freq = (
        sh.groupBy("s")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > _BP_DOC_FREQ)
        .select("s", F.lit(1).alias("is_boiler"))
    )
    return (
        sh.join(freq.hint("shuffle_hash"), "s", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.coalesce(F.col("is_boiler"), F.lit(0)))
            .cast("long")
            .alias("n_boiler"),
            (
                F.sum(F.coalesce(F.col("is_boiler"), F.lit(0))).cast("double")
                / F.count("*")
            ).alias("boiler_frac"),
        )
        .orderBy("doc_id")
    )


@register(
    "doc_term_first_positions",
    oracle=f"""
        SELECT doc_id, t.x AS term, CAST(MIN(t.i) AS INT) AS first_pos,
               COUNT(*) AS occurrences
        FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       range(1, len({_SQL_TOKENS}) + 1),
                       i -> {{'i': i, 'x': {_SQL_TOKENS}[i]}})) AS t
            FROM documents
        )
        GROUP BY doc_id, term
        HAVING COUNT(*) >= 5
        ORDER BY doc_id, term
    """,
    description="Positional explode (posexplode): token with its "
    "1-based position, aggregated to first-occurrence offset and "
    "count per (doc, term) for frequent terms — position features "
    "feed lead-bias/dedup heuristics. Narrow explode + one composite-"
    "key shuffle.",
    tags=("text", "posexplode"),
)
def doc_term_first_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    pos = docs.select(
        "doc_id", F.posexplode(tokenize("text")).alias("pos", "term")
    )
    return (
        pos.groupBy("doc_id", "term")
        .agg(
            (F.min("pos") + 1).cast("int").alias("first_pos"),
            F.count("*").alias("occurrences"),
        )
        .filter(F.col("occurrences") >= 5)
        .orderBy("doc_id", "term")
    )


# Chunking contract: fixed window, fixed stride (overlap = size-stride).
CHUNK_SIZE = 256
CHUNK_STRIDE = 192
_CHUNK_OVERLAP = CHUNK_SIZE - CHUNK_STRIDE


@register(
    "doc_chunk_windows",
    oracle=f"""
        WITH chunks AS (
            SELECT doc_id,
                   CAST(s AS BIGINT) AS chunk_start,
                   substr(text, CAST(s AS INTEGER) + 1, {CHUNK_SIZE})
                       AS chunk_text
            FROM documents,
                 unnest(range(0,
                              GREATEST(CAST(n_chars AS BIGINT)
                                           - {_CHUNK_OVERLAP}, 1),
                              {CHUNK_STRIDE})) AS t(s)
        )
        SELECT doc_id,
               CAST(chunk_start / {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
               chunk_start,
               CAST(length(chunk_text) AS BIGINT) AS chunk_len,
               md5(chunk_text) AS chunk_md5
        FROM chunks
        ORDER BY doc_id, chunk_id
    """,
    description=f"Overlapping fixed-window chunking ({CHUNK_SIZE}-char "
    f"windows, {CHUNK_STRIDE}-char stride → {_CHUNK_OVERLAP}-char "
    "overlap) — the sequence-prep stage feeding embedding/RAG "
    "pipelines and fixed-context pretraining. sequence+explode keeps "
    "it a narrow per-row transformation (rows multiply by "
    "chunks-per-doc, no shuffle except the presentation sort); chunk "
    "content is verified compactly via md5. The trailing window is "
    "kept short rather than padded; a final partial window shorter "
    "than the overlap is absorbed into the previous chunk (start "
    "grid stops at n_chars - overlap).",
    tags=("text", "chunking", "rag"),
)
def doc_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    # DuckDB's range(0, N, step) is stop-EXCLUSIVE; Spark's sequence is
    # stop-INCLUSIVE, so the Spark stop is N-1 for the identical grid.
    stop = F.greatest(
        F.col("n_chars").cast("long") - _CHUNK_OVERLAP, F.lit(1).cast("long")
    )
    starts = F.sequence(
        F.lit(0).cast("long"), stop - 1, F.lit(CHUNK_STRIDE).cast("long")
    )
    chunks = docs.select(
        "doc_id",
        F.explode(starts).alias("chunk_start"),
        F.col("text"),
    ).select(
        "doc_id",
        (F.col("chunk_start") / CHUNK_STRIDE).cast("long").alias("chunk_id"),
        "chunk_start",
        F.expr(
            f"substring(text, cast(chunk_start as int) + 1, {CHUNK_SIZE})"
        ).alias("chunk_text"),
    )
    return chunks.select(
        "doc_id",
        "chunk_id",
        "chunk_start",
        F.length("chunk_text").cast("long").alias("chunk_len"),
        F.md5("chunk_text").alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_id")


@register(
    "doc_bigram_nll_quality",
    oracle=f"""
        WITH occ AS (
            SELECT doc_id, unnest({_sql_shingles(2)}) AS bg FROM documents
        ), cbg AS (
            SELECT bg, COUNT(*) AS c_ab FROM occ GROUP BY bg
        ), cctx AS (
            SELECT split_part(bg, ' ', 1) AS ctx, COUNT(*) AS c_a
            FROM occ GROUP BY ctx
        ), scored AS (
            SELECT o.doc_id,
                   -ln(CAST(c.c_ab AS DOUBLE) / x.c_a) AS nll
            FROM occ o
            JOIN cbg c ON o.bg = c.bg
            JOIN cctx x ON split_part(o.bg, ' ', 1) = x.ctx
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(floor(
                   CAST(SUM(CAST(nll AS DECIMAL(38,18))) AS DOUBLE)
                   / COUNT(*) * 1000000.0 + 0.5
               ) AS BIGINT) AS nll_micro
        FROM scored
        GROUP BY doc_id
        ORDER BY doc_id
    """,
    description="Perplexity-style quality score (the CCNet-family "
    "filter): per-doc mean negative log-likelihood under the corpus's "
    "own bigram MLE, P(w2|w1) = C(w1 w2)/C(w1 ·). Low nll ≈ fluent/"
    "repetitive text, high nll ≈ unusual token transitions — the "
    "cheap LM-based quality signal between heuristics and a real LM. "
    "Scale shape: the bigram/context count relations are vocab-sized "
    "equi-joins with partial aggregation (no broadcast assumption), "
    "and the per-doc mean accumulates in DECIMAL(38,18). The score is "
    "emitted MICRO-QUANTIZED (floor(mean·1e6 + 0.5) as BIGINT): ln() "
    "is not correctly rounded by IEEE, so raw doubles can differ in "
    "the last ulp across engines — at 1e-6 quanta a flip needs the "
    "true value within ~1e-16 of a boundary, which the oracle compare "
    "tolerates as never occurring (same doctrine as the module's "
    "no-transcendentals ranking note; docs with <2 tokens have no "
    "bigrams and drop out on both engines).",
    tags=("text", "quality", "lm"),
)
def doc_bigram_nll_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    occ = docs.select(
        "doc_id", F.explode(word_shingles(tokenize("text"), 2)).alias("bg")
    )
    cbg = occ.groupBy("bg").agg(F.count("*").alias("c_ab"))
    cctx = (
        occ.select(F.substring_index("bg", " ", 1).alias("ctx"))
        .groupBy("ctx")
        .agg(F.count("*").alias("c_a"))
    )
    scored = (
        occ.join(cbg, "bg")
        .join(cctx, F.substring_index(occ["bg"], " ", 1) == cctx["ctx"])
        .select(
            "doc_id",
            (-F.log(F.col("c_ab").cast("double") / F.col("c_a"))).alias("nll"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.floor(
                F.sum(F.col("nll").cast("decimal(38,18)")).cast("double")
                / F.count("*")
                * F.lit(1000000.0)
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("nll_micro"),
        )
        .orderBy("doc_id")
    )


# C4/CCNet-style normalization pipeline, stage by stage. Regex classes
# are spelled out explicitly (no \s, \p{...}) because Java regex
# (Spark) and RE2 (DuckDB) disagree on shorthand-class membership —
# e.g. Java \s includes \x0B, RE2's does not.
_CLEAN_MAX_CHARS = 300


@register(
    "doc_clean_normalize",
    oracle=f"""
        WITH cleaned AS (
            SELECT doc_id,
                   length(text) AS n_raw,
                   trim(regexp_replace(regexp_replace(regexp_replace(
                       text,
                       '<[^>]*>', ' ', 'g'),
                       '[\\x00-\\x08\\x0e-\\x1f\\x7f]', '', 'g'),
                       '[ \\t\\n\\r\\x0b\\x0c]+', ' ', 'g')) AS t
            FROM documents
        ),
        capped AS (
            SELECT doc_id, n_raw,
                   CASE WHEN length(t) > {_CLEAN_MAX_CHARS}
                        THEN substr(t, 1, {_CLEAN_MAX_CHARS})
                        ELSE t END AS t
            FROM cleaned
        )
        SELECT doc_id,
               CAST(n_raw AS BIGINT) AS n_raw,
               CAST(length(t) AS BIGINT) AS n_clean,
               md5(t) AS clean_md5
        FROM capped
        ORDER BY doc_id
    """,
    description="Text normalization pipeline (the cleaning pass every "
    "pretraining corpus runs before dedup/quality): strip markup tags, "
    "drop non-whitespace control characters, collapse whitespace runs "
    "to single spaces, trim, and hard-cap at "
    f"{_CLEAN_MAX_CHARS} chars — all as chained JVM-side regexp/substr "
    "built-ins (narrow, no shuffle, whole-stage codegen; a Python UDF "
    "here would put every corpus byte through the interpreter). The "
    "oracle re-runs the identical pipeline in DuckDB and compares "
    "md5(clean_text) — content-exact without hashing megabytes through "
    "the driver. Character classes are written out explicitly because "
    "Java regex and RE2 disagree on shorthand classes (Java \\s "
    "includes \\x0b).",
    tags=("text", "cleaning", "normalization"),
)
def doc_clean_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    t = F.regexp_replace(F.col("text"), "<[^>]*>", " ")
    t = F.regexp_replace(t, "[\\x00-\\x08\\x0e-\\x1f\\x7f]", "")
    t = F.regexp_replace(t, "[ \\t\\n\\r\\x0b\\x0c]+", " ")
    t = F.trim(t)
    t = F.when(
        F.length(t) > _CLEAN_MAX_CHARS, F.substring(t, 1, _CLEAN_MAX_CHARS)
    ).otherwise(t)
    return (
        docs.select(
            "doc_id",
            F.length("text").cast("bigint").alias("n_raw"),
            t.alias("t"),
        )
        .select(
            "doc_id",
            "n_raw",
            F.length("t").cast("bigint").alias("n_clean"),
            F.md5(F.col("t").cast("binary")).alias("clean_md5"),
        )
        .orderBy("doc_id")
    )


#: Tiny per-language function-word lists (the quality-filter signal is
#: the RATIO's distribution, not lexicographic completeness; real
#: deployments swap in full lists — the plan shape is identical).
_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "the", "a"),
    "es": ("el", "la", "de", "y", "the", "a"),
    "fr": ("le", "la", "de", "et", "the", "a"),
    "zh": ("the", "a"),
}


def _sql_stopword_case() -> str:
    # case-folded like stopword_hits (r16 review: sentence-initial
    # 'The'/'Der' never matched the lowercase lists)
    from bigdata_flightanalysis_spark.functions.text import sql_fold_case

    whens = " ".join(
        "WHEN lang = '{}' THEN len(list_filter({}, t -> {} IN ({})))".format(
            lg, _SQL_TOKENS, sql_fold_case("t"),
            ", ".join(f"'{w}'" for w in ws),
        )
        for lg, ws in sorted(_STOPWORDS.items())
    )
    return f"(CASE {whens} ELSE 0 END)"


@register(
    "doc_stopword_ratio",
    oracle=f"""
        SELECT doc_id, lang,
               CAST(len({{toks}}) AS BIGINT) AS n_tokens,
               CAST({_sql_stopword_case()} AS BIGINT) AS n_stopwords,
               CASE WHEN len({{toks}}) > 0
                    THEN CAST({_sql_stopword_case()} AS DOUBLE)
                         / len({{toks}})
                    ELSE 0.0 END AS stopword_ratio
        FROM documents
        ORDER BY doc_id
    """.replace("{toks}", _SQL_TOKENS),
    description="Language-aware stopword ratio (the Gopher/C4 quality "
    "signal the score suite was missing: human prose carries a stable "
    "function-word fraction, while boilerplate/gibberish doesn't): "
    "per doc, the fraction of tokens in its language's function-word "
    "list. UDF-free and JOIN-free — the per-language lists are tiny, "
    "so they inline as literal arrays inside one "
    "filter()/array_contains expression per language behind a lang "
    "CASE: pure whole-stage codegen, narrow, no shuffle, no broadcast "
    "needed (a 100k-word lexicon would switch to the broadcast-join "
    "form; the tiny-list form is the right plan below that).",
    tags=("text", "quality", "langid"),
)
def doc_stopword_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    toks = tokenize("text")
    counts = None
    for lg, ws in sorted(_STOPWORDS.items()):
        # the shared counting expression (functions.text) against THIS
        # query's ratio-tuned word table — one filter/contains
        # definition, two deliberate word lists (langid's evidence
        # lists live in LANG_STOPWORDS)
        n = stopword_hits(toks, words=ws)
        counts = (
            F.when(F.col("lang") == lg, n)
            if counts is None
            else counts.when(F.col("lang") == lg, n)
        )
    counts = counts.otherwise(F.lit(0))
    return docs.select(
        "doc_id",
        "lang",
        F.size(toks).cast("bigint").alias("n_tokens"),
        counts.cast("bigint").alias("n_stopwords"),
        F.when(
            F.size(toks) > 0,
            counts.cast("double") / F.size(toks),
        )
        .otherwise(F.lit(0.0))
        .alias("stopword_ratio"),
    ).orderBy("doc_id")
