"""Unit tests for operators.multimodal: batch plumbing, stub gating,
deterministic fake decode, frame-sampling plan."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from bigdata_flightanalysis_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    decode_audio,
    decode_image,
    extract_payload_features,
    frame_sample_offsets,
    text_as_payload,
)


def test_payload_wrap_schema(spark):
    df = spark.createDataFrame([(1, "hello")], "id bigint, txt string")
    out = text_as_payload(df, "id", "txt")
    assert [f.name for f in out.schema.fields] == ["asset_id", "payload", "meta"]
    row = out.collect()[0]
    assert bytes(row["payload"]) == b"hello"
    assert row["meta"]["mime"] == "text/plain"


def test_extract_features_matches_hashlib(spark):
    df = spark.createDataFrame(
        [(1, "abc"), (2, ""), (3, "héllo wörld")], "id bigint, txt string"
    )
    feats = {
        r["asset_id"]: r
        for r in extract_payload_features(
            text_as_payload(df, "id", "txt")
        ).collect()
    }
    for i, txt in [(1, "abc"), (2, ""), (3, "héllo wörld")]:
        raw = txt.encode("utf-8")
        d = hashlib.md5(raw).hexdigest()
        assert feats[i]["byte_len"] == len(raw)
        assert feats[i]["payload_md5"] == d
        assert feats[i]["fingerprint"] == int(d[:15], 16)
    assert extract_payload_features(text_as_payload(df, "id", "txt")).schema == (
        FEATURE_SCHEMA
    )


def test_extract_features_many_partitions(spark):
    """Batch iteration must be per-partition-safe, including empty ones."""
    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(100)], "id bigint, txt string"
    ).repartition(16)
    out = extract_payload_features(text_as_payload(df, "id", "txt"))
    assert out.count() == 100
    assert out.select(F.countDistinct("payload_md5")).collect()[0][0] == 100


def test_decode_stubs_gate(spark):
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG", "image/png")
    with pytest.raises(NotImplementedError):
        decode_audio(b"RIFF", "audio/wav")
    a = decode_image(b"\x89PNG", "image/png", fake=True)
    b = decode_image(b"\x89PNG", "image/png", fake=True)
    assert a == b  # deterministic
    assert a["checksum"] != decode_image(b"JFIF", "image/jpeg", fake=True)["checksum"]


def test_frame_sample_offsets(spark):
    df = spark.createDataFrame([(10,), (1,), (0,), (None,)], "n_frames int")
    rows = df.select(
        frame_sample_offsets(F.col("n_frames"), every=4).alias("offs")
    ).collect()
    assert rows[0]["offs"] == [0, 4, 8]
    assert rows[1]["offs"] == [0]
    # zero/NULL frames → EMPTY plan (r14 review: the old guard emitted
    # [0], sending downstream decode after a frame that doesn't exist);
    # matches the oracle's range(0, n_frames, every) semantics
    assert rows[2]["offs"] == []
    assert rows[3]["offs"] == []


def test_resize_images_rewrites_payload_and_meta_together(spark):
    from bigdata_flightanalysis_spark.operators.multimodal import (
        resize_images,
        text_as_payload,
    )
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assets = text_as_payload(docs.limit(40), "doc_id", "text").select(
        "asset_id",
        "payload",
        F.struct(
            F.lit("image/png").alias("mime"),
            F.lit(64).cast("int").alias("width"),
            F.lit(64).cast("int").alias("height"),
        ).alias("meta"),
    )
    out = resize_images(assets, 32, 32, fake=True)
    rows = out.collect()
    assert len(rows) == 40
    originals = {r["asset_id"]: r["payload"] for r in assets.collect()}
    for r in rows:
        assert r["meta"]["width"] == 32 and r["meta"]["height"] == 32
        n = len(originals[r["asset_id"]])
        expected = max(1, -(-n * (32 * 32) // (64 * 64)))  # ceil(n/4)
        assert len(r["payload"]) <= n
        assert abs(len(r["payload"]) - expected) <= 1  # size contract
    # deterministic: same input → same bytes
    again = {r["asset_id"]: r["payload"] for r in resize_images(
        assets, 32, 32, fake=True).collect()}
    assert {r["asset_id"]: r["payload"] for r in rows} == again


def test_resize_images_real_codec_path_raises(spark):
    from bigdata_flightanalysis_spark.operators.multimodal import (
        resize_images,
        text_as_payload,
    )
    from pyspark.sql import functions as F
    import pytest as _pytest

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assets = text_as_payload(docs.limit(2), "doc_id", "text").select(
        "asset_id",
        "payload",
        F.struct(
            F.lit("image/png").alias("mime"),
            F.lit(8).cast("int").alias("width"),
            F.lit(8).cast("int").alias("height"),
        ).alias("meta"),
    )
    # a text payload labelled image/png is not decodable by any codec:
    # the real path must surface the documented gap, not mis-decode
    with _pytest.raises(Exception, match="(?i)needs PIL"):
        resize_images(assets, 4, 4).collect()


def test_payload_features_null_payload_yields_null_features(spark):
    """A NULL payload must produce NULL features, not an executor-side
    TypeError from hashlib.md5(None) (r14 review)."""
    from bigdata_flightanalysis_spark.operators.multimodal import (
        extract_payload_features,
        text_as_payload,
    )

    docs = spark.createDataFrame(
        [(1, "hello"), (2, None)], "doc_id bigint, text string"
    )
    feats = {
        r["asset_id"]: r
        for r in extract_payload_features(
            text_as_payload(docs, "doc_id", "text")
        ).collect()
    }
    assert feats[1]["byte_len"] == 5 and feats[1]["payload_md5"] is not None
    assert feats[2]["byte_len"] is None
    assert feats[2]["payload_md5"] is None
    assert feats[2]["fingerprint"] is None


def test_resize_images_fake_upscale_honors_size_contract(spark):
    """Upscales must satisfy the ceil(len·scale²) contract too — byte
    decimation alone can never emit more than len(payload) bytes, so
    the fake kernel tiles the payload for scale > 1 (r14 review)."""
    from pyspark.sql import functions as F

    from bigdata_flightanalysis_spark.operators.multimodal import (
        resize_images,
        text_as_payload,
    )

    docs = spark.createDataFrame([(1, "abcdef")], "doc_id bigint, text string")
    assets = text_as_payload(docs, "doc_id", "text").select(
        "asset_id",
        "payload",
        F.struct(
            F.lit("image/png").alias("mime"),
            F.lit(32).cast("int").alias("width"),
            F.lit(32).cast("int").alias("height"),
        ).alias("meta"),
    )
    out = resize_images(assets, 64, 64, fake=True).collect()[0]
    # scale² = 4: 6-byte payload → 24 bytes, tiled deterministically
    assert len(out["payload"]) == 24
    assert out["payload"] == b"abcdef" * 4
