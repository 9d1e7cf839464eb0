"""Codec-boundary differential fuzz (r15 verdict item 5): malformed /
truncated / bit-flipped image+audio payloads must surface as
QUARANTINED rows (NULL stats + error_kind) from the tolerant batch
decoder — never as executor exceptions — and the raw decoders must
fail with the documented exception types within bounded memory (no
header-trusted allocation, no decompression-bomb inflate).

The corpus is deterministic: every well-formed base payload is built
with the repo's own encoders, then mutated (cut at several offsets,
bit-flipped in header/stream/tail, re-tagged, zero-length, random
bytes, absurd-dimension headers, a crafted zlib bomb), giving >20
adversarial payloads per run.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from bigdata_flightanalysis_spark.operators.codecs import (
    decode_bmp,
    decode_image_array,
    decode_png,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_ppm,
    encode_wav,
)

rng = np.random.default_rng(1227)

_IMG = rng.integers(0, 256, (9, 7, 3), dtype=np.uint8)
_WAVE = rng.integers(-32768, 32768, 64, dtype=np.int16)


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body))
    )


def _bomb_png() -> bytes:
    """Claims plausible 64x64 dims but carries deflate that inflates
    to ~16 MiB — the decoder must stop at the header-promised size."""
    ihdr = struct.pack(">IIBBBBB", 64, 64, 8, 2, 0, 0, 0)
    blob = zlib.compress(b"\x00" * (16 << 20), 9)  # ~16 KiB compressed
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", blob)
        + _png_chunk(b"IEND", b"")
    )


def _huge_dims_png() -> bytes:
    """Header claims 40000x40000 RGB (~4.8 GB) — must be rejected by
    the allocation cap BEFORE any inflate/allocation."""
    ihdr = struct.pack(">IIBBBBB", 40000, 40000, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 64))
        + _png_chunk(b"IEND", b"")
    )


def _flip(data: bytes, pos: int, mask: int = 0xFF) -> bytes:
    b = bytearray(data)
    b[pos % len(b)] ^= mask
    return bytes(b)


def adversarial_corpus() -> list[tuple[str, bytes]]:
    """(label, payload) pairs; every payload must FAIL to decode as an
    image (audio lane reuses the WAV-derived subset)."""
    png = encode_png(_IMG)
    ppm = encode_ppm(_IMG)
    bmp = encode_bmp(_IMG)
    wav = encode_wav(16000, _WAVE)
    corpus: list[tuple[str, bytes]] = [
        ("empty", b""),
        ("one_byte", b"\x89"),
        ("sig_only", b"\x89PNG\r\n\x1a\n"),
        ("random_64", bytes(rng.integers(0, 256, 64, dtype=np.uint8))),
        ("random_4k", bytes(rng.integers(1, 255, 4096, dtype=np.uint8))),
        ("text_bytes", b"the cat sat on the mat " * 8),
        # truncations at structurally different offsets
        ("png_cut_header", png[:20]),
        ("png_cut_mid_idat", png[: len(png) // 2]),
        # −20 reaches the IDAT payload; smaller cuts only clip the
        # unverified IEND/IDAT CRCs and stay decodable by design
        ("png_cut_tail_idat", png[:-20]),
        ("png_no_idat", png[:33] + _png_chunk(b"IEND", b"")),
        # bit flips: zlib header, deflate stream, IHDR dims
        ("png_flip_zlib_cmf", _flip(png, 41)),
        ("png_flip_stream", _flip(png, 50)),
        ("png_flip_depth", _flip(png, 24, 0x10)),  # depth 8 -> 24
        ("png_bad_ihdr_len", png[:8] + _png_chunk(b"IHDR", b"\x00" * 5) + png[33:]),
        ("png_bomb", _bomb_png()),
        ("png_huge_dims", _huge_dims_png()),
        ("ppm_cut_header", ppm[:3]),
        ("ppm_cut_raster", ppm[: len(ppm) // 2]),
        ("ppm_bad_maxval", b"P6\n7 9\n65535\n" + ppm[10:]),
        ("ppm_nondigit_dims", b"P6\nseven nine\n255\n" + bytes(32)),
        ("bmp_cut_header", bmp[:30]),
        ("bmp_cut_pixels", bmp[: len(bmp) - 8]),
        ("bmp_depth_flip", _flip(bmp, 28, 0x08)),  # 24 -> 16 bit
        ("modality_wav_as_image", wav),  # valid audio routed to the image lane
        ("wav_cut_header", wav[:16]),
        ("wav_cut_data", wav[: len(wav) // 2]),
        ("wav_flip_fmt", _flip(wav, 20)),
        ("riff_not_wave", wav[:8] + b"XXXX" + wav[12:]),
    ]
    assert len(corpus) >= 20
    return corpus


# the exception contract: decoders raise ONLY these (quarantined by
# decode_media_stats); anything else (MemoryError, SystemError, a
# numpy shape error leaking through…) is a decoder bug
_EXPECTED = (ValueError, NotImplementedError, EOFError, OSError, Exception)
_STRICT = (ValueError, NotImplementedError, EOFError, OSError)


def test_every_adversarial_payload_fails_with_a_documented_type():
    import wave as wave_mod

    for label, payload in adversarial_corpus():
        with pytest.raises(Exception) as exc_info:
            decode_image_array(payload)
        exc = exc_info.value
        ok = isinstance(exc, _STRICT) or isinstance(exc, wave_mod.Error)
        # struct.error subclasses Exception only — allow it explicitly
        ok = ok or isinstance(exc, struct.error)
        assert ok, (label, type(exc).__name__, exc)


def test_wav_adversarials_fail_with_documented_types():
    import wave as wave_mod

    for label, payload in adversarial_corpus():
        if not label.startswith(("wav_", "riff_", "empty", "random")):
            continue
        with pytest.raises(Exception) as exc_info:
            decode_wav(payload)
        exc = exc_info.value
        ok = isinstance(exc, _STRICT) or isinstance(
            exc, (wave_mod.Error, struct.error)
        )
        assert ok, (label, type(exc).__name__, exc)


def test_png_bomb_never_inflates_past_header_promise():
    """16 MiB-of-zeros deflate behind a 64x64 header: the bounded
    decompressobj stops at expected+1 bytes, so the failure is a cheap
    ValueError, not a 16 MiB inflate per corrupt payload."""
    with pytest.raises(ValueError, match="length mismatch"):
        decode_png(_bomb_png())


def test_png_huge_dims_rejected_before_allocation():
    with pytest.raises(ValueError, match="decoder cap"):
        decode_png(_huge_dims_png())


def test_well_formed_controls_still_decode():
    assert np.array_equal(decode_png(encode_png(_IMG)), _IMG)
    assert np.array_equal(decode_ppm(encode_ppm(_IMG)), _IMG)
    assert np.array_equal(decode_bmp(encode_bmp(_IMG)), _IMG)
    sr, arr = decode_wav(encode_wav(16000, _WAVE))
    assert sr == 16000 and np.array_equal(arr[:, 0], _WAVE)


def test_quarantine_job_survives_the_whole_corpus(spark):
    """One mapInPandas job over the full adversarial corpus plus two
    intact controls: the job COMPLETES, malformed rows come back
    NULL-stat with error_kind set, controls decode exactly."""
    from bigdata_flightanalysis_spark.operators.multimodal import (
        decode_media_stats,
    )

    corpus = adversarial_corpus()
    rows = [(i, payload) for i, (_, payload) in enumerate(corpus)]
    rows.append((1000, bytearray(encode_png(_IMG))))
    rows.append((1001, None))  # NULL payload: quarantined, not TypeError
    df = spark.createDataFrame(rows, "asset_id bigint, payload binary")
    out = {
        r["asset_id"]: r
        for r in decode_media_stats(df, "image", on_error="null").collect()
    }
    assert len(out) == len(corpus) + 2
    for i, (label, _) in enumerate(corpus):
        r = out[i]
        assert r["error_kind"] is not None, label
        assert r["width"] is None and r["mean_value"] is None, label
    good = out[1000]
    assert good["error_kind"] is None
    assert (good["height"], good["width"], good["n_channels"]) == (9, 7, 3)
    assert good["mean_value"] == pytest.approx(float(_IMG.mean()))
    assert out[1001]["error_kind"] == "NullPayload"


def test_quarantine_audio_kind_and_raise_mode(spark):
    from bigdata_flightanalysis_spark.operators.multimodal import (
        decode_media_stats,
    )

    wav = bytearray(encode_wav(8000, _WAVE))
    rows = [(0, wav), (1, bytearray(wav[: len(wav) // 2]))]
    df = spark.createDataFrame(rows, "asset_id bigint, payload binary")
    out = {
        r["asset_id"]: r
        for r in decode_media_stats(df, "audio", on_error="null").collect()
    }
    assert out[0]["error_kind"] is None
    assert out[0]["sample_rate"] == 8000 and out[0]["n_frames"] == 64
    assert out[1]["error_kind"] is not None
    # strict mode: the corrupt payload DOES fail the job
    with pytest.raises(Exception):
        decode_media_stats(df, "audio", on_error="raise").collect()
