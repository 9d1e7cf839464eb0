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

from bigdata_flightanalysis_spark.functions.text import md5_long_sql
from bigdata_flightanalysis_spark.operators.multimodal import (
    extract_payload_features,
    text_as_payload,
)
from bigdata_flightanalysis_spark.queries.catalog import register
from bigdata_flightanalysis_spark.sources.readers import read_table

_SQL_MD5 = "md5(text)"
# the shared 60-bit md5→BIGINT twin, not a hand copy: it must stay
# byte-compatible with extract_payload_features' int(d[:15], 16)
_SQL_FP = md5_long_sql("text")


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
               -- COALESCE pins the NULL contract to the Spark side's
               -- frame_sample_offsets: an unknown frame count plans
               -- ZERO decodes (''/0), while range(0, NULL, 25) is
               -- NULL/NULL (r16 review)
               COALESCE(array_to_string(range(0, n_frames, 25), ','), '')
                   AS frame_ids,
               CAST(COALESCE(len(range(0, n_frames, 25)), 0) AS INT)
                   AS n_sampled
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


@register(
    "multimodal_audio_stats",
    oracle="""
        SELECT doc_id AS asset_id,
               CAST(8000 + (doc_id % 4) * 4000 AS INT) AS sample_rate,
               CAST(1 + doc_id % 256 AS INT) AS n_frames,
               1 AS n_channels,
               CAST(list_sum(list_transform(
                   range(0, CAST(1 + doc_id % 256 AS INT)),
                   i -> (doc_id * 31 + i * 17) % 65536 - 32768
               )) AS BIGINT) AS sum_samples,
               CAST(list_min(list_transform(
                   range(0, CAST(1 + doc_id % 256 AS INT)),
                   i -> (doc_id * 31 + i * 17) % 65536 - 32768
               )) AS INT) AS min_sample,
               CAST(list_max(list_transform(
                   range(0, CAST(1 + doc_id % 256 AS INT)),
                   i -> (doc_id * 31 + i * 17) % 65536 - 32768
               )) AS INT) AS max_sample
        FROM documents
        ORDER BY asset_id
    """,
    description="Audio WAV codec roundtrip through the Arrow batch "
    "loop, oracle-checked end to end: per asset a deterministic 16-bit "
    "PCM waveform (sample_i = (id·31 + i·17) mod 2^16 − 2^15, "
    "1 + id mod 256 frames, rate 8000 + 4000·(id mod 4)) is ENCODED "
    "to RIFF/WAVE and DECODED back with the real stdlib codec inside "
    "ONE mapInPandas stage; the emitted stats (frame/channel counts, "
    "exact int64 sample sum, min/max) come from the decoded bytes, so "
    "the oracle — which recomputes the waveform arithmetically in SQL "
    "— verifies the whole encode→container→decode→Arrow path "
    "bit-for-bit. Stats are integers: no float drift possible. Scale "
    "shape: embarrassingly parallel, zero shuffles before the "
    "presentation sort; a real audio corpus swaps the synthesizer for "
    "the payload column, the codec loop is unchanged.",
    tags=("multimodal", "audio", "pandas-udf"),
)
def multimodal_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    schema = (
        "asset_id bigint, sample_rate int, n_frames int, n_channels int, "
        "sum_samples bigint, min_sample int, max_sample int"
    )

    def batches(it):
        import numpy as np
        import pandas as pd

        from bigdata_flightanalysis_spark.operators.codecs import (
            decode_wav,
            encode_wav,
        )

        for pdf in it:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 1 + did % 256
                i = np.arange(n, dtype=np.int64)
                wave_i = ((did * 31 + i * 17) % 65536 - 32768).astype(np.int16)
                sr = 8000 + (did % 4) * 4000
                payload = encode_wav(sr, wave_i)
                # stats from the DECODED container, not the synth input
                sr2, arr = decode_wav(payload)
                flat = arr.astype(np.int64)
                rows.append(
                    (
                        did,
                        sr2,
                        int(arr.shape[0]),
                        int(arr.shape[1]),
                        int(flat.sum()),
                        int(flat.min()),
                        int(flat.max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id",
                    "sample_rate",
                    "n_frames",
                    "n_channels",
                    "sum_samples",
                    "min_sample",
                    "max_sample",
                ],
            )

    return docs.mapInPandas(batches, schema).orderBy("asset_id")


@register(
    "multimodal_image_stats",
    oracle="""
        SELECT doc_id AS asset_id,
               CAST(4 + doc_id % 13 AS INT) AS height,
               CAST(4 + doc_id % 7 AS INT) AS width,
               3 AS n_channels,
               CAST(list_sum(list_transform(
                   range(0, CAST((4 + doc_id % 13) * (4 + doc_id % 7) * 3
                                 AS INT)),
                   i -> (doc_id * 7 + i * 13) % 256
               )) AS BIGINT) AS sum_pixels,
               CAST(list_max(list_transform(
                   range(0, CAST((4 + doc_id % 13) * (4 + doc_id % 7) * 3
                                 AS INT)),
                   i -> (doc_id * 7 + i * 13) % 256
               )) AS INT) AS max_pixel
        FROM documents
        ORDER BY asset_id
    """,
    description="Image PNG codec roundtrip through the Arrow batch "
    "loop, oracle-checked end to end — the image twin of "
    "multimodal_audio_stats: per asset a deterministic RGB image "
    "(pixel_i = (id·7 + i·13) mod 256 in row-major order, "
    "(4 + id mod 13) × (4 + id mod 7) px) is ENCODED to PNG (zlib, "
    "filter 0) and DECODED back with the pure-stdlib codec inside ONE "
    "mapInPandas stage; integer pixel stats come from the decoded "
    "array while the oracle recomputes the raster arithmetically in "
    "SQL, so the whole encode→compress→decode→Arrow path is verified "
    "bit-for-bit. Embarrassingly parallel, zero shuffles before the "
    "presentation sort.",
    tags=("multimodal", "image", "pandas-udf"),
)
def multimodal_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    schema = (
        "asset_id bigint, height int, width int, n_channels int, "
        "sum_pixels bigint, max_pixel int"
    )

    def batches(it):
        import numpy as np
        import pandas as pd

        from bigdata_flightanalysis_spark.operators.codecs import (
            decode_png,
            encode_png,
        )

        for pdf in it:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                h, w = 4 + did % 13, 4 + did % 7
                i = np.arange(h * w * 3, dtype=np.int64)
                raster = ((did * 7 + i * 13) % 256).astype(np.uint8)
                payload = encode_png(raster.reshape(h, w, 3))
                arr = decode_png(payload)  # stats from the DECODED bytes
                flat = arr.astype(np.int64)
                rows.append(
                    (
                        did,
                        int(arr.shape[0]),
                        int(arr.shape[1]),
                        int(arr.shape[2]),
                        int(flat.sum()),
                        int(flat.max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id",
                    "height",
                    "width",
                    "n_channels",
                    "sum_pixels",
                    "max_pixel",
                ],
            )

    return docs.mapInPandas(batches, schema).orderBy("asset_id")


@register(
    "multimodal_decode_quarantine",
    oracle="""
        SELECT doc_id AS asset_id,
               CASE WHEN doc_id % 3 = 0
                    THEN CAST(4 + doc_id % 7 AS INT) END AS width,
               CASE WHEN doc_id % 3 = 0
                    THEN CAST(4 + doc_id % 13 AS INT) END AS height,
               CASE WHEN doc_id % 3 = 0 THEN 3 END AS n_channels,
               CASE WHEN doc_id % 3 = 0 THEN
                   CAST(list_sum(list_transform(
                       range(0, CAST((4 + doc_id % 13) * (4 + doc_id % 7) * 3
                                     AS INT)),
                       i -> (doc_id * 7 + i * 13) % 256
                   )) AS DOUBLE)
                   / ((4 + doc_id % 13) * (4 + doc_id % 7) * 3)
               END AS mean_value,
               CASE WHEN doc_id % 3 <> 0 THEN 'ValueError' END AS error_kind
        FROM documents
        ORDER BY asset_id
    """,
    description="Corrupt-payload quarantine through the tolerant batch "
    "decoder (operators.multimodal.decode_media_stats): per asset the "
    "deterministic PNG of `multimodal_image_stats` is synthesized, "
    "then every 3rd payload is TRUNCATED mid-stream (doc_id%3=1) or "
    "BIT-FLIPPED in its zlib header (doc_id%3=2) before decoding with "
    "on_error='null'. Malformed payloads must come back as NULL-stat "
    "rows carrying error_kind='ValueError' — never an executor "
    "exception — while intact ones decode to exact stats; the oracle "
    "recomputes both sides arithmetically. This is the 100 TB ingest "
    "contract: a crawl's corrupt bytes are per-row data problems, "
    "quarantined like read_csv's permissive mode, not job failures.",
    tags=("multimodal", "image", "pandas-udf", "quality"),
)
def multimodal_decode_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_flightanalysis_spark.operators.multimodal import (
        decode_media_stats,
    )

    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    pay_schema = "asset_id bigint, payload binary"

    def corrupt(it):
        import numpy as np
        import pandas as pd

        from bigdata_flightanalysis_spark.operators.codecs import encode_png

        for pdf in it:
            ids, payloads = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                h, w = 4 + did % 13, 4 + did % 7
                i = np.arange(h * w * 3, dtype=np.int64)
                raster = ((did * 7 + i * 13) % 256).astype(np.uint8)
                payload = bytearray(encode_png(raster.reshape(h, w, 3)))
                mode = did % 3
                if mode == 1:
                    # mid-stream cut: always lands inside IHDR/IDAT for
                    # these sizes, so the chunk-length check trips
                    payload = payload[: len(payload) // 2]
                elif mode == 2:
                    # sig(8) + IHDR chunk(25) + IDAT len/tag(8) = 41:
                    # first zlib CMF byte — flipping it breaks the
                    # header check deterministically
                    payload[41] ^= 0xFF
                ids.append(did)
                payloads.append(bytes(payload))
            yield pd.DataFrame({"asset_id": ids, "payload": payloads})

    assets = docs.mapInPandas(corrupt, pay_schema)
    stats = decode_media_stats(assets, "image", on_error="null")
    return stats.select(
        "asset_id", "width", "height", "n_channels", "mean_value", "error_kind"
    ).orderBy("asset_id")
