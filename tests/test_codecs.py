"""Real codec path (operators/codecs.py): pure-stdlib PNG/PPM/WAV
decode-resample-encode, exercised on the reference repo's own PNG
assets (`/root/reference/Images/*.png` — 8-bit RGB non-interlaced, the
exact profile the built-in decoder targets)."""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np
import pytest

from bigdata_flightanalysis_spark.operators.codecs import (
    _png_chunk,
    _PNG_SIG,
    decode_image_array,
    decode_png,
    decode_ppm,
    decode_wav,
    encode_image,
    encode_png,
    encode_ppm,
    encode_wav,
    pil_available,
    resize_nearest,
    sniff_format,
)
from bigdata_flightanalysis_spark.operators.multimodal import (
    decode_audio,
    decode_image,
    resize_images,
)

REF_PNG = "/root/reference/Images/Silhoutte-Scores.png"

rng = np.random.default_rng(42)


def test_png_roundtrip_rgb():
    arr = rng.integers(0, 256, (21, 13, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(arr)), arr)


def test_png_roundtrip_gray_and_rgba():
    g = rng.integers(0, 256, (7, 9), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(g)), g[:, :, None])
    rgba = rng.integers(0, 256, (6, 5, 4), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(rgba)), rgba)


def _forward_filter(arr: np.ndarray, filters: list[int]) -> bytes:
    """Apply PNG filters scanline-by-scanline (the encoder side of
    filters 0-4) so the decoder's unfiltering is tested against an
    independent implementation."""
    h, w, c = arr.shape
    stride, bpp = w * c, c
    flat = arr.reshape(h, stride).astype(int)
    out = bytearray()
    prev = np.zeros(stride, int)
    for y in range(h):
        rec = flat[y]
        fty = filters[y % len(filters)]
        out.append(fty)
        for x in range(stride):
            a = int(rec[x - bpp]) if x >= bpp else 0
            b = int(prev[x])
            cc = int(prev[x - bpp]) if x >= bpp else 0
            if fty == 0:
                v = rec[x]
            elif fty == 1:
                v = rec[x] - a
            elif fty == 2:
                v = rec[x] - b
            elif fty == 3:
                v = rec[x] - ((a + b) >> 1)
            else:  # Paeth
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                v = rec[x] - pred
            out.append(v & 0xFF)
        prev = rec
    return bytes(out)


def test_png_decode_all_filter_types():
    arr = rng.integers(0, 256, (10, 8, 3), dtype=np.uint8)
    raw = _forward_filter(arr, filters=[0, 1, 2, 3, 4])
    ihdr = struct.pack(">IIBBBBB", 8, 10, 8, 2, 0, 0, 0)
    png = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(png), arr)


@pytest.mark.skipif(not os.path.exists(REF_PNG), reason="reference assets absent")
def test_reference_png_decodes():
    payload = open(REF_PNG, "rb").read()
    assert sniff_format(payload) == "png"
    arr = decode_png(payload)
    assert arr.shape == (455, 567, 3)  # matches the IHDR of the real asset
    stats = decode_image(payload, "image/png")  # real path, no fake=
    assert stats["width"] == 567 and stats["height"] == 455
    assert 0.0 < stats["mean_value"] < 255.0
    # decode is deterministic
    assert stats == decode_image(payload, "image/png")


@pytest.mark.skipif(not os.path.exists(REF_PNG), reason="reference assets absent")
def test_resize_images_real_path_on_reference_png(spark):
    payload = open(REF_PNG, "rb").read()
    df = spark.createDataFrame(
        [(1, bytearray(payload), {"mime": "image/png", "width": 567,
                                  "height": 455})],
        "asset_id long, payload binary, "
        "meta struct<mime:string,width:int,height:int>",
    )
    rows = resize_images(df, 32, 24).collect()  # REAL kernel (no fake=)
    assert len(rows) == 1
    out = bytes(rows[0]["payload"])
    assert out[:8] == _PNG_SIG  # re-encoded in the same format
    resized = decode_png(out)
    assert resized.shape == (24, 32, 3)
    assert rows[0]["meta"]["width"] == 32 and rows[0]["meta"]["height"] == 24
    # nearest-neighbor resample of the actual pixels, not a byte trick
    expect = resize_nearest(decode_png(payload), 32, 24)
    assert np.array_equal(resized, expect)


def test_ppm_roundtrip_and_resize():
    arr = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
    data = encode_ppm(arr)
    assert sniff_format(data) == "ppm"
    assert np.array_equal(decode_ppm(data), arr)
    fmt, back = decode_image_array(data)
    assert fmt == "ppm" and np.array_equal(back, arr)
    gray = rng.integers(0, 256, (4, 6), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(gray)), gray[:, :, None])


def test_ppm_comment_header():
    data = b"P6\n# a comment\n2 2\n255\n" + bytes(range(12))
    assert decode_ppm(data).shape == (2, 2, 3)


def test_ppm_sniff_accepts_every_isspace_separator():
    """sniff_format's netpbm whitespace set must match decode_ppm's
    header parser (bytes.isspace): \\f and \\x0B after the magic are
    spec-legal, and omitting them routed decodable files to the PIL
    fallback — NotImplementedError in this container (r16 review)."""
    for sep in (b" ", b"\t", b"\n", b"\r", b"\x0b", b"\f"):
        data = b"P6" + sep + b"2 2\n255\n" + bytes(range(12))
        assert sniff_format(data) == "ppm", sep
        assert decode_ppm(data).shape == (2, 2, 3), sep
        data5 = b"P5" + sep + b"2 2\n255\n" + bytes(range(4))
        assert sniff_format(data5) == "pgm", sep


def test_resize_nearest_block_semantics():
    arr = np.array([[[0], [10]], [[20], [30]]], dtype=np.uint8)
    up = resize_nearest(arr, 4, 4)
    assert np.array_equal(up[:2, :2, 0], np.zeros((2, 2)))  # 2x2 blocks
    assert up[3, 3, 0] == 30
    down = resize_nearest(up, 2, 2)
    assert np.array_equal(down, arr)


def test_wav_roundtrip_and_decode_audio():
    sr = 8000
    t = np.arange(sr // 10)
    mono = (np.sin(2 * np.pi * 440 * t / sr) * 12000).astype(np.int16)
    data = encode_wav(sr, mono)
    assert sniff_format(data) == "wav"
    sr2, back = decode_wav(data)
    assert sr2 == sr and np.array_equal(back[:, 0], mono)
    stats = decode_audio(data, "audio/wav")  # real path
    assert stats["sample_rate"] == sr
    assert stats["n_frames"] == len(mono) and stats["n_channels"] == 1
    stereo = np.stack([mono, -mono], axis=1)
    sr3, back2 = decode_wav(encode_wav(sr, stereo))
    assert np.array_equal(back2, stereo)


def test_unsupported_formats_keep_documented_gap():
    jpeg_magic = b"\xff\xd8\xff\xe0" + b"\x00" * 16
    assert sniff_format(jpeg_magic) == "jpeg"
    if not pil_available():
        with pytest.raises(NotImplementedError):
            decode_image(jpeg_magic, "image/jpeg")
        with pytest.raises(NotImplementedError):
            encode_image("jpeg", np.zeros((2, 2, 3), np.uint8))
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3" + b"\x00" * 32, "audio/mpeg")  # mp3: no libav
    # truncated magics are unrecognized, not misdecoded
    assert sniff_format(b"\x89PNG") is None
    assert sniff_format(b"RIFF") is None


def test_png_malformed_raises_value_error():
    with pytest.raises(ValueError):
        decode_png(b"\x00" * 20)
    truncated = encode_png(np.zeros((4, 4, 3), np.uint8))[:20]
    with pytest.raises(ValueError):
        decode_png(truncated)


def test_bmp_roundtrip_and_padding():
    from bigdata_flightanalysis_spark.operators.codecs import (
        decode_bmp,
        encode_bmp,
    )

    rng = np.random.default_rng(7)
    # width 3 → stride 9 rounds up to 12: exercises the row padding
    img = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)
    data = encode_bmp(img)
    assert sniff_format(data) == "bmp"
    assert np.array_equal(decode_bmp(data), img)
    # grayscale input is promoted to 3 identical channels
    gray = rng.integers(0, 256, size=(4, 7), dtype=np.uint8)
    back = decode_bmp(encode_bmp(gray))
    assert np.array_equal(back[:, :, 0], gray)
    assert np.array_equal(back[:, :, 0], back[:, :, 2])


def test_bmp_unsupported_profiles_and_malformed():
    from bigdata_flightanalysis_spark.operators.codecs import (
        decode_bmp,
        encode_bmp,
    )

    good = encode_bmp(np.zeros((2, 2, 3), np.uint8))
    with pytest.raises(ValueError):
        decode_bmp(b"BM" + b"\x00" * 10)  # truncated header
    with pytest.raises(ValueError):
        decode_bmp(good[:-3])  # truncated pixel data
    depth8 = bytearray(good)
    depth8[28:30] = (8).to_bytes(2, "little")
    with pytest.raises(NotImplementedError):
        decode_bmp(bytes(depth8))  # 8-bit → documented gap
    rle = bytearray(good)
    rle[30:34] = (1).to_bytes(4, "little")
    with pytest.raises(NotImplementedError):
        decode_bmp(bytes(rle))  # RLE compression → documented gap


def test_bmp_flows_through_generic_dispatch():
    from bigdata_flightanalysis_spark.operators.codecs import (
        decode_image_array,
        encode_bmp,
        encode_image,
    )

    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    fmt, arr = decode_image_array(encode_bmp(img))
    assert fmt == "bmp" and np.array_equal(arr, img)
    assert np.array_equal(
        decode_image_array(encode_image("bmp", img))[1], img
    )
