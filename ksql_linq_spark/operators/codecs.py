"""Real media codecs in pure stdlib (zlib/struct) — no external libs.

The multimodal operators (operators/multimodal.py) were specified with
stubbed decode because "the image/audio libs aren't in this container".
This module removes the stub for the formats a stdlib implementation can
cover COMPLETELY and CORRECTLY:

- **PNG**: full decode (zlib inflate + per-scanline unfilter, filters
  0-4 incl. Paeth) and encode for 8-bit gray/RGB/RGBA — the PNG spec's
  reference algorithms, implemented against the public spec
  (https://www.w3.org/TR/png-3/), not any codec library.
- **BMP**: 24-bit uncompressed decode (BITMAPINFOHEADER, bottom-up rows,
  4-byte row padding).
- **GIF / JPEG**: header-only dimension sniffing (logical screen
  descriptor; SOF0/1/2 marker scan).  JPEG *pixel* decode genuinely
  needs a DCT codec → still NotImplementedError.
- **WAV**: full PCM decode/encode (RIFF/fmt/data chunks, 16-bit PCM) —
  channels, sample rate, duration, and the samples themselves.

Per-blob python is fine here because these functions only ever run
inside Arrow-batched ``mapInPandas`` stages (multimodal.py) — the
per-batch boundary, partition-parallel across executors, is the scale
contract; the kernel is CPU-bound python either way (a C codec would be
faster per byte, and slots in via the same hooks when available).
"""

from __future__ import annotations

import struct
import zlib

# ----------------------------------------------------------------------- PNG

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples per pixel


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data))
    )


def encode_png(pixels: bytes, width: int, height: int, channels: int = 1) -> bytes:
    """8-bit gray (1), RGB (3), or RGBA (4) -> PNG bytes (filter 0)."""
    color = {1: 0, 3: 2, 4: 6}[channels]
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError(f"need {stride * height} pixel bytes, got {len(pixels)}")
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> dict:
    """PNG -> {width, height, channels, pixels: bytes} (8-bit depths).

    Full spec unfiltering (None/Sub/Up/Average/Paeth per scanline)."""
    if not data.startswith(_PNG_MAGIC):
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    color = depth = None
    idat = []
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # len + type + crc
        if typ == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color not in _CHANNELS or interlace:
                raise NotImplementedError(
                    f"PNG depth={depth} color={color} interlace={interlace} "
                    "outside the stdlib decoder's 8-bit non-interlaced subset"
                )
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    ch = _CHANNELS[color]
    stride = width * ch
    raw = zlib.decompress(b"".join(idat))
    out = bytearray()
    prev = bytearray(stride)
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if f == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif f != 0:
            raise ValueError(f"bad PNG filter {f}")
        out += line
        prev = line
    return {"width": width, "height": height, "channels": ch, "pixels": bytes(out)}


def resize_nearest(
    pixels: bytes, width: int, height: int, channels: int, new_w: int, new_h: int
) -> bytes:
    """Nearest-neighbor resample on a flat 8-bit pixel buffer."""
    src_stride = width * channels
    out = bytearray(new_w * new_h * channels)
    for y in range(new_h):
        sy = min(y * height // new_h, height - 1)
        row = sy * src_stride
        oy = y * new_w * channels
        for x in range(new_w):
            sx = min(x * width // new_w, width - 1) * channels
            out[oy + x * channels : oy + (x + 1) * channels] = pixels[
                row + sx : row + sx + channels
            ]
    return bytes(out)


# ----------------------------------------------------------------- BMP / GIF


def decode_bmp(data: bytes) -> dict:
    """24-bit uncompressed BMP -> {width, height, channels:3, pixels}
    (rows re-ordered top-down, BGR -> RGB)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (off,) = struct.unpack("<I", data[10:14])
    width, height = struct.unpack("<ii", data[18:26])
    (bpp,) = struct.unpack("<H", data[28:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"BMP bpp={bpp} compression={compression}")
    bottom_up = height > 0
    height = abs(height)
    row_sz = (width * 3 + 3) & ~3
    out = bytearray()
    for y in range(height):
        sy = (height - 1 - y) if bottom_up else y
        row = data[off + sy * row_sz : off + sy * row_sz + width * 3]
        for x in range(width):
            b, g, r = row[x * 3 : x * 3 + 3]
            out += bytes((r, g, b))
    return {"width": width, "height": height, "channels": 3, "pixels": bytes(out)}


def sniff_dimensions(data: bytes) -> dict | None:
    """Header-only (width, height, format) for PNG/BMP/GIF/JPEG; None if
    unrecognized.  This never decodes pixels — O(header) per blob."""
    if data.startswith(_PNG_MAGIC) and data[12:16] == b"IHDR":
        w, h = struct.unpack(">II", data[16:24])
        return {"format": "png", "width": w, "height": h}
    if data[:2] == b"BM" and len(data) >= 26:
        w, h = struct.unpack("<ii", data[18:26])
        return {"format": "bmp", "width": w, "height": abs(h)}
    if data[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", data[6:10])
        return {"format": "gif", "width": w, "height": h}
    if data[:2] == b"\xff\xd8":  # JPEG: scan for a start-of-frame marker
        pos = 2
        while pos + 9 < len(data):
            if data[pos] != 0xFF:
                pos += 1
                continue
            marker = data[pos + 1]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", data[pos + 5 : pos + 9])
                return {"format": "jpeg", "width": w, "height": h}
            (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
            pos += 2 + ln
        return None
    return None


# ----------------------------------------------------------------------- WAV


def encode_wav(samples: list[int], sample_rate: int, channels: int = 1) -> bytes:
    """16-bit PCM samples (interleaved if multichannel) -> RIFF/WAV."""
    body = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * channels * 2, channels * 2, 16
    )
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(body))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", 16)
        + fmt
        + b"data"
        + struct.pack("<I", len(body))
        + body
    )


# ------------------------------------------------------------ frame packs
# Minimal length-prefixed frame container ("FRPK1"): real video codecs
# (H.264/VP9) genuinely require external libraries, but the SPARK-side
# mechanics of video processing — split a binary blob into frames,
# sample every Nth, decode each frame, hash/feature it — are codec-
# independent.  This container carries real PNG/BMP frames so that whole
# chain runs on genuinely decodable bytes; swap the parser for pyav
# demuxing in production and nothing downstream changes.

_FRPK_MAGIC = b"FRPK1"


def encode_frames(frames: list[bytes]) -> bytes:
    """Pack encoded frames (e.g. PNGs) into one binary blob."""
    out = [_FRPK_MAGIC, struct.pack(">I", len(frames))]
    for f in frames:
        out.append(struct.pack(">I", len(f)))
        out.append(f)
    return b"".join(out)


def decode_frames(data: bytes) -> list[bytes]:
    """Frame-pack blob -> list of frame bytes (raises on bad container)."""
    if not data.startswith(_FRPK_MAGIC):
        raise ValueError("not a FRPK1 frame pack")
    (n,) = struct.unpack(">I", data[5:9])
    pos = 9
    frames = []
    for _ in range(n):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        frames.append(data[pos + 4 : pos + 4 + ln])
        pos += 4 + ln
    return frames


def decode_wav(data: bytes) -> dict:
    """WAV -> {channels, sample_rate, bits, n_samples, duration_ms,
    samples} for 16-bit PCM (metadata-only for other encodings)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    meta: dict = {}
    while pos + 8 <= len(data):
        typ = data[pos : pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
        if typ == b"fmt ":
            audio_fmt, ch, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            meta.update(
                {"audio_format": audio_fmt, "channels": ch,
                 "sample_rate": rate, "bits": bits}
            )
        elif typ == b"data":
            meta["_data"] = body
    if "sample_rate" not in meta or "_data" not in meta:
        raise ValueError("WAV missing fmt/data chunk")
    body = meta.pop("_data")
    frame = meta["channels"] * meta["bits"] // 8
    meta["n_samples"] = len(body) // frame
    meta["duration_ms"] = meta["n_samples"] * 1000 // meta["sample_rate"]
    if meta["audio_format"] == 1 and meta["bits"] == 16:
        count = len(body) // 2
        meta["samples"] = list(struct.unpack(f"<{count}h", body[: count * 2]))
    else:
        meta["samples"] = None
    return meta
