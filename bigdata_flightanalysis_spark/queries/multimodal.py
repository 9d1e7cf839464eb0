"""Multimodal-payload queries: the binary-column plumbing of
``operators.multimodal`` exercised end-to-end over driver testdata.

``documents.text`` is wrapped as an opaque binary payload (the ingest
shape is identical for image/audio bytes — only ``meta.mime``
differs), then features are extracted two ways: once with pure
expressions and once through the Arrow-batched ``mapInPandas``
operator. Both are bytes-deterministic, so both are oracle-checked —
the mapInPandas query proves the batch plumbing produces EXACTLY what
the SQL twin says it should.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_flightanalysis_spark.operators.multimodal import (
    extract_payload_features,
    text_as_payload,
)
from bigdata_flightanalysis_spark.queries.catalog import register
from bigdata_flightanalysis_spark.sources.readers import read_table

_SQL_MD5 = "md5(text)"
_SQL_FP = f"CAST(('0x' || substr({_SQL_MD5}, 1, 15)) AS BIGINT)"


@register(
    "multimodal_payload_stats",
    oracle=f"""
        SELECT doc_id AS asset_id,
               octet_length(encode(text)) AS byte_len,
               {_SQL_MD5} AS payload_md5
        FROM documents
        ORDER BY asset_id
    """,
    description="Binary-payload accounting with pure expressions: wrap "
    "text as an opaque payload (same ingest shape as image/audio "
    "bytes), then octet length + content md5 — all JVM-side, no "
    "Python. The sanity baseline for the mapInPandas path.",
    tags=("multimodal",),
)
def multimodal_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    assets = text_as_payload(docs, "doc_id", "text")
    return assets.select(
        "asset_id",
        F.octet_length("payload").cast("bigint").alias("byte_len"),
        F.md5("payload").alias("payload_md5"),
    ).orderBy("asset_id")


@register(
    "multimodal_feature_extract",
    oracle=f"""
        SELECT doc_id AS asset_id,
               octet_length(encode(text)) AS byte_len,
               {_SQL_MD5} AS payload_md5,
               {_SQL_FP} AS fingerprint
        FROM documents
        ORDER BY asset_id
    """,
    description="Arrow-batched mapInPandas feature extraction over "
    "binary payloads (operators.multimodal.extract_payload_features): "
    "bytes stream executor-side in columnar batches, features come "
    "back under an explicit schema. The features are bytes-"
    "deterministic, so the oracle verifies the whole UDF path bit-for-"
    "bit; a real image/audio codec drops into the same batch loop.",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    assets = text_as_payload(docs, "doc_id", "text")
    return extract_payload_features(assets).orderBy("asset_id")


@register(
    "multimodal_frame_sampling",
    oracle="""
        SELECT asset_id, n_frames,
               array_to_string(range(0, n_frames, 25), ',') AS frame_ids,
               CAST(len(range(0, n_frames, 25)) AS INT) AS n_sampled
        FROM (
            SELECT doc_id AS asset_id,
                   CAST(1 + n_chars % 500 AS INT) AS n_frames
            FROM documents
        )
        ORDER BY asset_id
    """,
    description="Video frame-sampling plan (every 25th frame): the "
    "sampled indices are computed as an array column from the typed "
    "meta alone — the DECODE of the selected frames is the only "
    "per-byte work, so a 10k-frame clip costs 400 decode calls, not "
    "10k. Synthetic n_frames derives deterministically from doc "
    "length (the testdata has no real video); the plan shape "
    "(sequence → explode into the batch decoder) is the real one.",
    tags=("multimodal", "video"),
)
def multimodal_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_flightanalysis_spark.operators.multimodal import (
        frame_sample_offsets,
    )

    docs = read_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("asset_id"),
        (1 + F.col("n_chars") % 500).cast("int").alias("n_frames"),
    )
    ids = frame_sample_offsets(F.col("n_frames"), 25)
    # frame_ids rendered as a CSV string: the differential harness
    # canonicalizes result columns with a pandas sort, which rejects
    # list-valued cells — scalar columns only in final schemas.
    return docs.select(
        "asset_id",
        "n_frames",
        F.array_join(ids.cast("array<string>"), ",").alias("frame_ids"),
        F.size(ids).alias("n_sampled"),
    ).orderBy("asset_id")
