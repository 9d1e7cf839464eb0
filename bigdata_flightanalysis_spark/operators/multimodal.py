"""Multimodal (image/audio/video) column handling for a training-data
pipeline: opaque ``binary`` payload columns with typed metadata, plus
Arrow-batched decode / feature-extract / frame-sample operators.

Design (the 100 TB posture):

- A payload is ALWAYS an opaque ``BinaryType`` column plus a typed
  ``meta`` struct — never a parsed object in the row. Decoding happens
  inside ``mapInPandas`` workers on Arrow record batches, so bytes move
  executor-side in columnar batches and never visit the driver.
- The actual codecs (PIL/libav/ffmpeg) are NOT in this container, so
  ``decode_*`` raise ``NotImplementedError`` unless ``fake=True``
  selects the deterministic fake decoder. Everything around the codec
  call — schema contract, batch iteration, partition behavior, output
  types — is real and tested; swapping the fake for a real codec is a
  one-line change inside the batch loop.
- Feature extraction is pure-bytes (length, md5-based fingerprint),
  so it runs for real AND is oracle-checkable in SQL.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata carried alongside every binary payload.
META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("payload_md5", T.StringType()),
        T.StructField("fingerprint", T.LongType()),
    ]
)


def text_as_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Wrap a text column as a binary payload + meta — the ingest shape
    every modality shares (an image ingest differs only in ``mime``)."""
    return df.select(
        F.col(id_col).cast("bigint").alias("asset_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, mime: str) -> dict:
    """Deterministic stand-in for a real codec: derives pseudo pixel /
    sample statistics from the payload bytes alone."""
    h = hashlib.md5(payload).digest()
    return {
        "mime": mime,
        "mean_value": sum(payload) / len(payload) if payload else 0.0,
        "checksum": int.from_bytes(h[:8], "big", signed=True),
    }


def decode_image(payload: bytes, mime: str, *, fake: bool = False) -> dict:
    """STUB — image decode (PIL/turbojpeg not in this container)."""
    if fake:
        return _fake_decode(payload, mime)
    raise NotImplementedError(
        "image codecs are not installed in this environment; "
        "pass fake=True for the deterministic test decoder"
    )


def decode_audio(payload: bytes, mime: str, *, fake: bool = False) -> dict:
    """STUB — audio decode (libsndfile/ffmpeg not in this container)."""
    if fake:
        return _fake_decode(payload, mime)
    raise NotImplementedError(
        "audio codecs are not installed in this environment; "
        "pass fake=True for the deterministic test decoder"
    )


def frame_sample_offsets(n_frames: Column, every: int) -> Column:
    """Frame-sampling plan for video payloads: indices 0, every, 2·every…
    computed as an array column (the decode of the selected frames then
    happens batch-side like decode_image)."""
    return F.sequence(
        F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every)
    )


def extract_payload_features(df: DataFrame) -> DataFrame:
    """Arrow-batched per-payload features via ``mapInPandas``.

    Pure-bytes features (length, md5 hex, 60-bit md5 fingerprint), so
    the operator is real — not a stub — and exactly reproducible in
    SQL for the oracle. The batch loop is where a real decoder slots
    in. Input needs columns (asset_id, payload); output schema is
    FEATURE_SCHEMA.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads: Sequence[bytes] = pdf["payload"]
            digests = [hashlib.md5(p).hexdigest() for p in payloads]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "byte_len": [len(p) for p in payloads],
                    "payload_md5": digests,
                    "fingerprint": [int(d[:15], 16) for d in digests],
                }
            )

    return df.select("asset_id", "payload").mapInPandas(batches, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                ]
            ),
        ),
    ]
)


def resize_images(
    df: DataFrame, target_w: int, target_h: int, *, fake: bool = False
) -> DataFrame:
    """Arrow-batched image resize via ``mapInPandas`` — the
    transform-in-place multimodal shape (decode → resample → re-encode
    per batch, payload AND typed meta rewritten together so they can
    never drift apart).

    The resample kernel is a STUB (no image libs in this container);
    ``fake=True`` swaps in a deterministic byte-decimation stand-in
    that preserves every Spark-side property a real kernel needs:
    batch iteration, binary-in/binary-out, meta rewrite, and an
    output-size contract (ceil(len·scale²)) the tests assert. Input
    needs (asset_id, payload, meta.mime, meta.width, meta.height).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_payload, out_meta = [], []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                w, h = meta.get("width"), meta.get("height")
                if not fake:
                    raise NotImplementedError(
                        "image codecs are not installed in this "
                        "environment; pass fake=True for the "
                        "deterministic test resampler"
                    )
                scale_num = target_w * target_h
                scale_den = max((w or target_w) * (h or target_h), 1)
                n = len(payload)
                keep = max(1, -(-n * scale_num // scale_den))  # ceil
                step = max(1, n // keep)
                out_payload.append(bytes(payload[::step][:keep]))
                out_meta.append(
                    {"mime": meta.get("mime"), "width": target_w,
                     "height": target_h}
                )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "payload": out_payload,
                    "meta": out_meta,
                }
            )

    return df.select("asset_id", "payload", "meta").mapInPandas(
        batches, RESIZED_SCHEMA
    )
