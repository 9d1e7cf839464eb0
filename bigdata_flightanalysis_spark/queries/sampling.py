"""Deterministic sampling / splitting over ``documents`` — the
reproducibility layer of a training-data pipeline.

``df.sample()`` / ``randomSplit()`` are partition-order-dependent: the
same corpus re-partitioned differently yields a DIFFERENT split, which
silently leaks test docs into training on any re-run. The scale-safe
form is a pure hash of a stable key — every engine, every partition
layout, every rerun assigns the same doc to the same side. md5 is used
(not xxhash/crc) because both Spark and DuckDB expose identical md5
hex, so the oracle checks the assignment bit-for-bit.

Both queries are narrow (no shuffle, no join): the split predicate is
a per-row expression that pushes down to the scan at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_flightanalysis_spark.queries.catalog import register
from bigdata_flightanalysis_spark.sources.readers import read_table

# First two md5 hex chars of the key = a uniform bucket in [0, 256).
# '00'..'e5' → 230/256 ≈ 89.8% train; hex-string comparison is
# identical in both engines, no int conversion needed.
TRAIN_HEX_LT = "e6"


def hash_bucket_hex(key: Column | str, salt: str = "") -> Column:
    key_col = F.col(key) if isinstance(key, str) else key
    return F.substring(F.md5(F.concat(F.lit(salt), key_col.cast("string"))), 1, 2)


def _sql_bucket(key_expr: str, salt: str = "") -> str:
    salted = f"'{salt}' || CAST({key_expr} AS VARCHAR)" if salt else f"CAST({key_expr} AS VARCHAR)"
    return f"substr(md5({salted}), 1, 2)"


@register(
    "doc_train_test_split",
    oracle=f"""
        SELECT doc_id,
               {_sql_bucket("doc_id")} AS bucket,
               CASE WHEN {_sql_bucket("doc_id")} < '{TRAIN_HEX_LT}'
                    THEN 'train' ELSE 'test' END AS split
        FROM documents
        ORDER BY doc_id
    """,
    description="Deterministic ~90/10 train/test split by md5 bucket of "
    "doc_id — identical assignment regardless of partitioning, row "
    "order, cluster size, or rerun (df.randomSplit is none of those). "
    "Narrow per-row expression: no shuffle at any scale; the oracle "
    "verifies every single assignment.",
    tags=("sampling", "split", "documents"),
)
def doc_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    bucket = hash_bucket_hex("doc_id")
    return docs.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < TRAIN_HEX_LT, F.lit("train"))
        .otherwise(F.lit("test"))
        .alias("split"),
    ).orderBy("doc_id")


# Per-language sampling fractions (hex thresholds ≈ fraction × 256):
# oversample the rare languages, downsample English — the classic
# data-mixture rebalance.
STRATA_HEX = {"en": "40", "de": "c0", "fr": "c0"}  # ≈25%, 75%, 75%
DEFAULT_HEX = "80"  # ≈50% for any other language


@register(
    "doc_stratified_sample",
    oracle=f"""
        SELECT lang, COUNT(*) AS n_sampled,
               CAST(SUM(n_chars) AS BIGINT) AS sampled_chars
        FROM documents
        WHERE {_sql_bucket("doc_id", "strat:")} <
              CASE lang {" ".join(f"WHEN '{lg}' THEN '{hx}'" for lg, hx in STRATA_HEX.items())}
                   ELSE '{DEFAULT_HEX}' END
        GROUP BY lang
        ORDER BY lang
    """,
    description="Deterministic stratified sampling: per-language md5 "
    "fractions (sampleBy without its partition-order dependence), "
    "salted so the strata draw is independent of the train/test split "
    "draw. Filter is a pushed-down per-row predicate; the aggregate "
    "is the only shuffle.",
    tags=("sampling", "stratified", "documents"),
)
def doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    bucket = hash_bucket_hex("doc_id", salt="strat:")
    threshold = F.lit(DEFAULT_HEX)
    for lg, hx in reversed(STRATA_HEX.items()):
        threshold = F.when(F.col("lang") == lg, F.lit(hx)).otherwise(threshold)
    return (
        docs.filter(bucket < threshold)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum("n_chars").alias("sampled_chars"),
        )
        .orderBy("lang")
    )
