"""Real (pure-stdlib + numpy) image/audio codecs for the multimodal
operators.

The container has no PIL/libav/ffmpeg, but a genuine decode path still
matters: the reference repo's own image assets are 8-bit non-interlaced
RGB PNGs (``/root/reference/Images/*.png``), and PNG at that profile —
plus netpbm (PPM/PGM) and RIFF/WAVE PCM — is fully decodable with
``zlib``/``wave``/``struct`` alone.  So these are real codecs, not
stubs: they produce actual pixel/sample arrays, roundtrip bit-exactly,
and are exercised against a real reference PNG in tests.

If PIL *is* importable (a production image, not this container), it is
used as the fallback for formats the built-in decoders don't cover
(JPEG, WebP, …); otherwise those formats keep the documented
``NotImplementedError``.

Scope notes (reference-quality, documented limits):
- PNG: bit depth 8, color types 0/2/3/4/6, non-interlaced. Filters
  0-4 implemented (Sub/Up vectorized; Average/Paeth are sequential by
  definition, done byte-wise). Ancillary chunks ignored.
- PPM/PGM: binary (P6/P5), maxval 255.
- WAV: whatever stdlib ``wave`` accepts (PCM), 16-bit samples.
- Encoders emit filter-0 PNG / binary netpbm / PCM16 WAV — valid
  files any standard tool opens.

These run inside ``mapInPandas`` batch loops (see
``operators/multimodal.py``): per-asset Python cost is intrinsic codec
work, the Spark-side batching is what the 100 TB posture cares about.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: formats the built-in (no-PIL) codecs handle
BUILTIN_IMAGE_FORMATS = ("png", "ppm", "pgm", "bmp")
BUILTIN_AUDIO_FORMATS = ("wav",)


#: Decoder allocation cap (1 GiB of raw pixels). Payload headers are
#: UNTRUSTED at ingest: a malformed PNG can claim 2^31 x 2^31 px and a
#: few-KiB deflate stream can inflate to GiB — decode must fail with
#: ValueError before allocating, never OOM an executor.
_MAX_DECODED_BYTES = 1 << 30


def pil_available() -> bool:
    import importlib.util

    return importlib.util.find_spec("PIL") is not None


def sniff_format(payload: bytes) -> str | None:
    """Magic-byte sniff. Returns a format tag or None if unrecognized
    (truncated magics — e.g. a bare ``b"RIFF"`` — are unrecognized)."""
    if payload[:8] == _PNG_SIG:
        return "png"
    # whitespace set matches decode_ppm's header parser (bytes.isspace:
    # \x0B and \f are legal magic separators too — omitting them routed
    # spec-valid files to the PIL fallback, r16 review)
    if payload[:2] in (b"P6", b"P5") and len(payload) > 2 and payload[2:3] in b" \t\n\x0b\f\r":
        return "ppm" if payload[:2] == b"P6" else "pgm"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:2] == b"BM" and len(payload) >= 14:
        return "bmp"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    return None


# --------------------------------------------------------------------------
# PNG


def decode_png(data: bytes) -> np.ndarray:
    """PNG → uint8 array (h, w, channels). Palette images are expanded
    to RGB. Raises ValueError on malformed input, NotImplementedError
    on valid-but-unsupported profiles (16-bit, interlaced)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    idat: list[bytes] = []
    palette = None
    w = h = depth = ctype = interlace = None
    while pos + 8 <= len(data):
        (length,), tag = struct.unpack(">I", data[pos : pos + 4]), data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        if len(chunk) != length:
            raise ValueError("truncated PNG chunk")
        pos += 12 + length
        if tag == b"IHDR":
            if len(chunk) != 13:
                raise ValueError("bad PNG IHDR length")
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
        elif tag == b"PLTE":
            palette = np.frombuffer(chunk, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(chunk)
        elif tag == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")
    if depth != 8 or interlace != 0:
        raise NotImplementedError(
            f"PNG profile not supported by the built-in decoder "
            f"(depth={depth}, interlace={interlace}; need 8-bit "
            "non-interlaced)"
        )
    try:
        channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    except KeyError:
        raise ValueError(f"bad PNG color type {ctype}") from None
    stride = w * channels
    expected = (stride + 1) * h
    # header-driven allocation cap + BOUNDED inflate: a malformed (or
    # adversarial) payload may claim absurd dimensions or carry a
    # decompression bomb — a few KiB of deflate expanding to GiB.
    # Never allocate or inflate past what the header promises.
    if expected > _MAX_DECODED_BYTES:
        raise ValueError(
            f"PNG dimensions {w}x{h}x{channels} exceed the decoder cap"
        )
    try:
        d = zlib.decompressobj()
        raw = d.decompress(b"".join(idat), expected + 1)
    except zlib.error as exc:
        raise ValueError(f"corrupt PNG compressed data: {exc}") from None
    if len(raw) != expected:
        raise ValueError("PNG pixel data length mismatch")
    bpp = channels
    out = np.empty((h, stride), np.uint8)
    prev = bytearray(stride)  # zero row above the first scanline
    for y in range(h):
        fty = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if fty == 0:
            rec = line
        elif fty == 1:  # Sub — cumulative per bpp-lane, vectorized
            arr = np.frombuffer(bytes(line), np.uint8).reshape(w, bpp)
            rec = bytearray(
                (np.cumsum(arr, axis=0, dtype=np.uint32) & 0xFF)
                .astype(np.uint8)
                .tobytes()
            )
        elif fty == 2:  # Up — vectorized
            arr = np.frombuffer(bytes(line), np.uint8).astype(np.uint16)
            parr = np.frombuffer(bytes(prev), np.uint8)
            rec = bytearray(((arr + parr) & 0xFF).astype(np.uint8).tobytes())
        elif fty == 3:  # Average — sequential by definition
            rec = line
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                rec[x] = (rec[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif fty == 4:  # Paeth — sequential by definition
            rec = line
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                c = prev[x - bpp] if x >= bpp else 0
                b = prev[x]
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (rec[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {fty}")
        out[y] = np.frombuffer(bytes(rec), np.uint8)
        prev = rec
    arr = out.reshape(h, w, channels)
    if ctype == 3:
        if palette is None:
            raise ValueError("palette PNG without PLTE chunk")
        arr = palette[arr[..., 0]]
    return arr


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body))
    )


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 array (h, w[, channels]) → PNG bytes (filter 0)."""
    arr = np.ascontiguousarray(arr, np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    try:
        ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    except KeyError:
        raise ValueError(f"cannot encode {c}-channel image as PNG") from None
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


# --------------------------------------------------------------------------
# netpbm (PPM/PGM binary)


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM (P6) / PGM (P5), maxval 255 → uint8 (h, w, c)."""
    magic = data[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM")
    # header = magic, width, height, maxval as whitespace-separated
    # tokens (comment lines start with '#'), then ONE whitespace byte
    # before the raster
    tokens: list[int] = []
    pos = 2
    while len(tokens) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(data[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise NotImplementedError("only maxval=255 netpbm supported")
    c = 3 if magic == b"P6" else 1
    raster = np.frombuffer(data, np.uint8, w * h * c, pos)
    return raster.reshape(h, w, c).copy()


def encode_ppm(arr: np.ndarray) -> bytes:
    arr = np.ascontiguousarray(arr, np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if c == 3:
        magic = b"P6"
    elif c == 1:
        magic = b"P5"
    else:
        raise ValueError(f"cannot encode {c}-channel image as PPM/PGM")
    return magic + f"\n{w} {h}\n255\n".encode() + arr.tobytes()


# --------------------------------------------------------------------------
# BMP (24-bit uncompressed BI_RGB — the interchange baseline)


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP → uint8 array (h, w, 3). Supports the 24-bit uncompressed
    BI_RGB profile (BITMAPINFOHEADER); rows are stored bottom-up in
    BGR with 4-byte row padding — both undone here. ValueError on
    malformed input, NotImplementedError on other bit depths or
    compression modes."""
    if data[:2] != b"BM" or len(data) < 54:
        raise ValueError("not a BMP (bad signature or truncated header)")
    pixel_off = struct.unpack("<I", data[10:14])[0]
    hdr_size = struct.unpack("<I", data[14:18])[0]
    if hdr_size < 40:
        raise NotImplementedError(f"BMP header size {hdr_size} unsupported")
    w, h = struct.unpack("<ii", data[18:26])
    planes, depth = struct.unpack("<HH", data[26:30])
    compression = struct.unpack("<I", data[30:34])[0]
    if depth != 24 or compression != 0:
        raise NotImplementedError(
            f"BMP profile not supported by the built-in decoder "
            f"(depth={depth}, compression={compression}; need 24-bit BI_RGB)"
        )
    if planes != 1 or w <= 0 or h == 0:
        raise ValueError("bad BMP header")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    end = pixel_off + stride * h
    if len(data) < end:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(data[pixel_off:end], np.uint8).reshape(h, stride)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        bgr = bgr[::-1]
    return np.ascontiguousarray(bgr[:, :, ::-1])  # BGR → RGB


def encode_bmp(arr: np.ndarray) -> bytes:
    arr = np.ascontiguousarray(arr, np.uint8)
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    h, w, c = arr.shape
    if c != 3:
        raise ValueError(f"cannot encode {c}-channel image as 24-bit BMP")
    stride = (w * 3 + 3) & ~3
    padded = np.zeros((h, stride), np.uint8)
    padded[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    body = padded.tobytes()
    header = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + info + body


# --------------------------------------------------------------------------
# WAV (PCM via stdlib wave)


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes → (sample_rate, int16 array (n_frames, n_channels))."""
    with wave.open(io.BytesIO(data)) as f:
        if f.getsampwidth() != 2:
            raise NotImplementedError("only 16-bit PCM WAV supported")
        sr, nch, nfr = f.getframerate(), f.getnchannels(), f.getnframes()
        raw = f.readframes(nfr)
    # stdlib wave silently returns however many frames the (possibly
    # truncated) data chunk holds — a cut payload must FAIL, not
    # masquerade as a shorter recording (r16 codec fuzz)
    if len(raw) != nfr * nch * 2:
        raise ValueError(
            f"truncated WAV data: header declares {nfr} frames, "
            f"payload holds {len(raw) // max(nch * 2, 1)}"
        )
    samples = np.frombuffer(raw, np.int16)
    return sr, samples.reshape(-1, nch)


def encode_wav(sample_rate: int, samples: np.ndarray) -> bytes:
    samples = np.ascontiguousarray(samples, np.int16)
    if samples.ndim == 1:
        samples = samples[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(samples.shape[1])
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(samples.tobytes())
    return buf.getvalue()


# --------------------------------------------------------------------------
# resize + dispatch


def resize_nearest(arr: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resample (h, w, c) → (target_h, target_w, c)."""
    h, w = arr.shape[:2]
    rows = (np.arange(target_h) * h) // target_h
    cols = (np.arange(target_w) * w) // target_w
    return arr[rows][:, cols]


def decode_image_array(payload: bytes) -> tuple[str, np.ndarray]:
    """Decode any supported image payload → (format, uint8 array).

    Built-in: PNG / PPM / PGM. Falls back to PIL for other formats when
    importable; otherwise NotImplementedError (the documented gap)."""
    fmt = sniff_format(payload)
    if fmt == "png":
        return fmt, decode_png(payload)
    if fmt in ("ppm", "pgm"):
        return fmt, decode_ppm(payload)
    if fmt == "bmp":
        return fmt, decode_bmp(payload)
    if pil_available():
        from PIL import Image

        im = Image.open(io.BytesIO(payload))
        # propagate PIL's REAL detected format (lowercased, e.g.
        # "webp"): the old "pil" placeholder reached encode_image as
        # format='PIL', an invalid PIL format name that crashed every
        # resize round-trip of a format outside the sniff table
        real_fmt = fmt or (im.format or "png").lower()
        return real_fmt, np.asarray(im)
    raise NotImplementedError(
        f"image format {fmt or 'unknown'!r} needs PIL (not installed); "
        f"built-in decoders handle {BUILTIN_IMAGE_FORMATS}"
    )


def encode_image(fmt: str, arr: np.ndarray) -> bytes:
    if fmt == "png":
        return encode_png(arr)
    if fmt in ("ppm", "pgm"):
        return encode_ppm(arr)
    if fmt == "bmp":
        return encode_bmp(arr)
    if pil_available():
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format=fmt.upper())
        return buf.getvalue()
    raise NotImplementedError(f"cannot encode format {fmt!r} without PIL")
