"""Multimodal (image/audio/video) column handling for a training-data
pipeline: opaque ``binary`` payload columns with typed metadata, plus
Arrow-batched decode / feature-extract / frame-sample operators.

Design (the 100 TB posture):

- A payload is ALWAYS an opaque ``BinaryType`` column plus a typed
  ``meta`` struct — never a parsed object in the row. Decoding happens
  inside ``mapInPandas`` workers on Arrow record batches, so bytes move
  executor-side in columnar batches and never visit the driver.
- ``decode_*`` / ``resize_images`` have a REAL codec path for the
  formats ``operators/codecs.py`` covers without external libs (PNG /
  PPM / PGM images, PCM WAV audio — the reference repo's own assets
  are exactly such PNGs, ``/root/reference/Images/*.png``), with PIL
  as an optional fallback for JPEG/WebP/… when importable. Formats
  outside that set raise ``NotImplementedError`` (the documented gap);
  ``fake=True`` still selects the deterministic fake kernel for
  payload-agnostic tests.
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

#: One stats schema for every modality (unused columns NULL per kind)
#: plus the quarantine column: ``error_kind`` is the exception class
#: name when the payload failed to decode, NULL when it decoded.
MEDIA_STATS_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("mean_value", T.DoubleType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("error_kind", T.StringType()),
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
    """Image decode → pixel statistics.

    Real path (default): ``codecs.decode_image_array`` — actual pixels
    for PNG/PPM/PGM (pure stdlib+numpy), PIL fallback when importable.
    Returns mime, width/height/channels from the DECODED array (not
    trusted metadata), mean pixel value, and an md5-derived checksum of
    the raw pixel buffer. ``fake=True`` keeps the payload-agnostic
    deterministic decoder for tests.
    """
    if fake:
        return _fake_decode(payload, mime)
    from bigdata_flightanalysis_spark.operators.codecs import decode_image_array

    _fmt, arr = decode_image_array(payload)
    h = hashlib.md5(arr.tobytes()).digest()
    return {
        "mime": mime,
        "width": int(arr.shape[1]),
        "height": int(arr.shape[0]),
        "channels": int(arr.shape[2]) if arr.ndim == 3 else 1,
        "mean_value": float(arr.mean()),
        "checksum": int.from_bytes(h[:8], "big", signed=True),
    }


def decode_audio(payload: bytes, mime: str, *, fake: bool = False) -> dict:
    """Audio decode → sample statistics.

    Real path (default): ``codecs.decode_wav`` — actual PCM samples for
    RIFF/WAVE via stdlib ``wave``. Other containers (mp3/ogg/flac)
    raise ``NotImplementedError`` (no libav in this environment).
    ``fake=True`` keeps the deterministic test decoder.
    """
    if fake:
        return _fake_decode(payload, mime)
    from bigdata_flightanalysis_spark.operators.codecs import (
        decode_wav,
        sniff_format,
    )

    if sniff_format(payload) != "wav":
        raise NotImplementedError(
            "audio container not supported by the built-in decoder "
            "(PCM WAV only; libav/ffmpeg not installed); pass "
            "fake=True for the deterministic test decoder"
        )
    sr, samples = decode_wav(payload)
    h = hashlib.md5(samples.tobytes()).digest()
    return {
        "mime": mime,
        "sample_rate": sr,
        "n_frames": int(samples.shape[0]),
        "n_channels": int(samples.shape[1]),
        "mean_value": float(samples.mean()),
        "checksum": int.from_bytes(h[:8], "big", signed=True),
    }


def frame_sample_offsets(n_frames: Column, every: int) -> Column:
    """Frame-sampling plan for video payloads: indices 0, every, 2·every…
    computed as an array column (the decode of the selected frames then
    happens batch-side like decode_image). A zero-frame (or NULL)
    payload yields an EMPTY plan — the old greatest() guard turned
    n_frames=0 into the one-offset plan [0], sending downstream decode
    after a frame that does not exist."""
    safe = F.sequence(
        F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every)
    )
    # slice-to-zero keeps the element type identical to the when-branch
    return F.when(n_frames > 0, safe).otherwise(F.slice(safe, 1, 0))


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
            # NULL payloads (e.g. text_as_payload of a NULL text) get
            # NULL features — hashlib.md5(None) would otherwise raise
            # an opaque executor-side TypeError and fail the job
            digests = [
                None if p is None else hashlib.md5(p).hexdigest()
                for p in payloads
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "byte_len": [
                        None if p is None else len(p) for p in payloads
                    ],
                    "payload_md5": digests,
                    "fingerprint": [
                        None if d is None else int(d[:15], 16)
                        for d in digests
                    ],
                }
            )

    return df.select("asset_id", "payload").mapInPandas(batches, FEATURE_SCHEMA)


def decode_media_stats(
    df: DataFrame,
    kind: str = "image",
    *,
    on_error: str = "null",
    fake: bool = False,
) -> DataFrame:
    """Arrow-batched decode → stats with QUARANTINE semantics — the
    ingest-hardened twin of the per-payload ``decode_image`` /
    ``decode_audio``.

    At corpus scale a crawl ALWAYS contains truncated, bit-flipped, or
    mislabeled payloads; one such byte string must not fail a
    1000-executor job. ``on_error='null'`` (default) catches the
    decode failure per row and emits NULL stats plus ``error_kind``
    (the exception class name) so downstream can
    ``WHERE error_kind IS NULL`` for the clean side and route the rest
    to a quarantine sink — the same permissive/quarantine pattern as
    ``sources.readers.read_csv``. ``on_error='raise'`` keeps strict
    fail-fast semantics for curated inputs. NULL payloads quarantine
    as ``error_kind='NullPayload'``.

    Input needs (asset_id, payload); output is MEDIA_STATS_SCHEMA.
    The decoders bound their own allocations (``codecs.decode_png``
    caps header-claimed dimensions and inflates bounded), so a
    malformed header cannot OOM an executor either.
    """
    if kind not in ("image", "audio"):
        raise ValueError(f"kind must be 'image' or 'audio', got {kind!r}")
    if on_error not in ("null", "raise"):
        raise ValueError(
            f"on_error must be 'null' or 'raise', got {on_error!r}"
        )
    mime = "image/*" if kind == "image" else "audio/*"
    decode = decode_image if kind == "image" else decode_audio

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in MEDIA_STATS_SCHEMA.fields]
        for pdf in it:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                stats = dict.fromkeys(cols)
                stats["asset_id"] = aid
                if payload is None:
                    stats["error_kind"] = "NullPayload"
                    rows.append(stats)
                    continue
                try:
                    d = decode(bytes(payload), mime, fake=fake)
                except Exception as exc:  # noqa: BLE001 — quarantine:
                    # ANY decode failure (ValueError, zlib/struct/wave
                    # errors, NotImplementedError for formats outside
                    # the built-in set) is a per-payload data problem,
                    # not a job problem
                    if on_error == "raise":
                        raise
                    stats["error_kind"] = type(exc).__name__
                    rows.append(stats)
                    continue
                for k, v in d.items():
                    if k in ("width", "height", "sample_rate", "n_frames"):
                        stats[k] = int(v)
                    elif k == "channels":
                        stats["n_channels"] = int(v)
                    elif k in ("mean_value", "checksum"):
                        stats[k] = v
                rows.append(stats)
            yield pd.DataFrame(rows, columns=cols)

    return df.select("asset_id", "payload").mapInPandas(
        batches, MEDIA_STATS_SCHEMA
    )


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

    Real path (default): decode (``codecs.decode_image_array``:
    PNG/PPM/PGM built-in, PIL fallback) → nearest-neighbor resample →
    re-encode in the SAME format; unsupported formats raise
    ``NotImplementedError`` executor-side. ``fake=True`` swaps in a
    deterministic byte-decimation stand-in with an output-size
    contract (ceil(len·scale²)) for payload-agnostic tests. Input
    needs (asset_id, payload, meta.mime, meta.width, meta.height).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not fake:
            from bigdata_flightanalysis_spark.operators.codecs import (
                decode_image_array,
                encode_image,
                resize_nearest,
            )
        for pdf in it:
            out_payload, out_meta = [], []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                w, h = meta.get("width"), meta.get("height")
                if not fake:
                    fmt, arr = decode_image_array(bytes(payload))
                    resized = resize_nearest(arr, target_w, target_h)
                    out_payload.append(encode_image(fmt, resized))
                    out_meta.append(
                        {"mime": meta.get("mime"), "width": target_w,
                         "height": target_h}
                    )
                    continue
                scale_num = target_w * target_h
                scale_den = max((w or target_w) * (h or target_h), 1)
                n = len(payload)
                keep = max(1, -(-n * scale_num // scale_den))  # ceil
                if keep <= n:
                    step = max(1, n // keep)
                    out_payload.append(bytes(payload[::step][:keep]))
                else:
                    # upscale: tile the payload to honor the
                    # ceil(len·scale²) size contract — decimation
                    # alone can never emit more than len(payload)
                    reps = -(-keep // max(n, 1))
                    out_payload.append((bytes(payload) * reps)[:keep])
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
