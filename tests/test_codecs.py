"""Pure-stdlib media codec tests (operators/codecs.py) and the real
multimodal decode/resize paths built on them."""

from __future__ import annotations

import struct
import zlib

import pytest

from ksql_linq_spark.operators import codecs, multimodal


def _gradient(w: int, h: int, ch: int) -> bytes:
    return bytes(((x * 7 + y * 13 + c * 29) % 256)
                 for y in range(h) for x in range(w) for c in range(ch))


@pytest.mark.parametrize("ch", [1, 3, 4])
def test_png_roundtrip(ch):
    w, h = 13, 9  # odd sizes catch stride bugs
    pix = _gradient(w, h, ch)
    data = codecs.encode_png(pix, w, h, ch)
    out = codecs.decode_png(data)
    assert (out["width"], out["height"], out["channels"]) == (w, h, ch)
    assert out["pixels"] == pix


def test_png_all_filter_types_unfilter():
    """Hand-build an IDAT using every filter type (Sub/Up/Average/Paeth)
    and check the decoder reconstructs the same pixels a filter-0 image
    carries — exercises the spec's unfilter algorithms, not just our own
    encoder's filter-0 path."""
    w, h, ch = 8, 5, 3
    pix = _gradient(w, h, ch)
    stride = w * ch
    rows = [bytearray(pix[y * stride:(y + 1) * stride]) for y in range(h)]

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    filtered = bytearray()
    prev = bytearray(stride)
    for y, filt in zip(range(h), [0, 1, 2, 3, 4]):
        line = rows[y]
        enc = bytearray(line)
        if filt == 1:
            for i in range(stride - 1, ch - 1, -1):
                enc[i] = (line[i] - line[i - ch]) & 0xFF
        elif filt == 2:
            for i in range(stride):
                enc[i] = (line[i] - prev[i]) & 0xFF
        elif filt == 3:
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                enc[i] = (line[i] - ((a + prev[i]) >> 1)) & 0xFF
        elif filt == 4:
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                enc[i] = (line[i] - paeth(a, prev[i], c)) & 0xFF
        filtered += bytes([filt]) + enc
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + codecs._png_chunk(b"IHDR", ihdr)
        + codecs._png_chunk(b"IDAT", zlib.compress(bytes(filtered)))
        + codecs._png_chunk(b"IEND", b"")
    )
    assert codecs.decode_png(data)["pixels"] == pix


def test_bmp_decode_bottom_up_bgr():
    """2x2 24-bit BMP: red top-left, blue bottom-right, padded rows."""
    px = {  # (x, y) -> RGB
        (0, 0): (255, 0, 0), (1, 0): (0, 255, 0),
        (0, 1): (0, 0, 255), (1, 1): (255, 255, 255),
    }
    row_sz = (2 * 3 + 3) & ~3  # 8 bytes with padding
    body = bytearray()
    for y in (1, 0):  # bottom-up storage
        row = bytearray()
        for x in (0, 1):
            r, g, b = px[(x, y)]
            row += bytes((b, g, r))  # BGR on disk
        row += bytes(row_sz - len(row))
        body += row
    header = (
        b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(body), 0, 0, 0, 0)
    )
    out = codecs.decode_bmp(bytes(header + body))
    assert (out["width"], out["height"], out["channels"]) == (2, 2, 3)
    got = out["pixels"]
    assert tuple(got[0:3]) == px[(0, 0)]      # top-left first after reorder
    assert tuple(got[9:12]) == px[(1, 1)]


def test_sniff_gif_jpeg_png():
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 6
    assert codecs.sniff_dimensions(gif) == {"format": "gif", "width": 320, "height": 200}
    # minimal JPEG: SOI, APP0 (skipped), SOF0 with dims, EOI
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 4) + b"JF"
        + b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", 77, 99)
        + b"\x03" + b"\x00" * 2
        + b"\xff\xd9"
    )
    assert codecs.sniff_dimensions(jpeg) == {"format": "jpeg", "width": 99, "height": 77}
    png = codecs.encode_png(b"\x00" * 12, 4, 3, 1)
    assert codecs.sniff_dimensions(png) == {"format": "png", "width": 4, "height": 3}
    assert codecs.sniff_dimensions(b"not media") is None


def test_wav_roundtrip_and_duration():
    samples = [int(1000 * ((i % 7) - 3)) for i in range(1600)]
    data = codecs.encode_wav(samples, sample_rate=8000)
    out = codecs.decode_wav(data)
    assert out["channels"] == 1 and out["sample_rate"] == 8000 and out["bits"] == 16
    assert out["n_samples"] == 1600
    assert out["duration_ms"] == 200  # 1600 / 8000 s
    assert out["samples"] == samples


def test_resize_nearest_downscale():
    w, h = 4, 4
    pix = _gradient(w, h, 3)
    out = codecs.resize_nearest(pix, w, h, 3, 2, 2)
    assert len(out) == 2 * 2 * 3
    # top-left output pixel must be the source (0,0) pixel
    assert out[0:3] == pix[0:3]


def test_multimodal_stdlib_decode_png_wav():
    png = codecs.encode_png(bytes([42] * (6 * 5)), 6, 5, 1)
    m = multimodal.stdlib_decode(png, "image")
    assert (m["format"], m["width"], m["height"]) == ("png", 6, 5)
    assert m["px_mean"] == 42.0
    wav = codecs.encode_wav([100] * 800, 8000)
    a = multimodal.stdlib_decode(wav, "audio")
    assert (a["format"], a["duration_ms"], a["sample_mean"]) == ("wav", 100, 100.0)
    with pytest.raises(NotImplementedError):
        multimodal.stdlib_decode(b"garbage", "image")


def test_multimodal_real_resize_spark(spark):
    """End-to-end real resize through mapInPandas: PNG in → resized PNG
    out whose decoded dimensions and pixels are verifiable."""
    pix = _gradient(10, 8, 3)
    rows = [
        (1, "image", codecs.encode_png(pix, 10, 8, 3), None),
        (2, "audio", codecs.encode_wav([0] * 80, 8000), None),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in multimodal.resize_images(df, 5, 4).collect()}
    dec = codecs.decode_png(bytes(out[1]["content"]))
    assert (dec["width"], dec["height"]) == (5, 4)
    assert dec["pixels"] == codecs.resize_nearest(pix, 10, 8, 3, 5, 4)
    assert (out[1]["out_width"], out[1]["out_height"]) == (5, 4)
    # non-image row passes through untouched
    assert bytes(out[2]["content"]) == codecs.encode_wav([0] * 80, 8000)
    assert out[2]["out_width"] is None


def test_image_dhash_near_dup_detection(spark):
    """dHash on real decoded pixels: a re-encoded + slightly-noised copy
    of an image stays within a few hamming bits, a different image is
    far, and the banded pair search finds exactly the near-dup pair."""
    import random

    from ksql_linq_spark.operators.multimodal import (
        dhash_near_dup_pairs,
        image_dhash,
    )

    rng = random.Random(11)
    w, h = 40, 30
    base = bytes(
        min(255, (x * 6 + (y // 4)) % 256) for y in range(h) for x in range(w)
    )
    noised = bytes(
        max(0, min(255, b + rng.randint(-4, 4))) for b in base
    )
    other = bytes(rng.randrange(256) for _ in range(w * h))
    rows = [
        (1, "image", codecs.encode_png(base, w, h, 1), None),
        (2, "image", codecs.encode_png(noised, w, h, 1), None),
        (3, "image", codecs.encode_png(other, w, h, 1), None),
        (4, "audio", codecs.encode_wav([0] * 80, 8000), None),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    hashed = image_dhash(df)
    got = {r["media_id"]: r["dhash"] for r in hashed.collect()}
    assert got[4] is None  # non-image rows are not hashed
    assert got[1] == got[2] or bin(got[1] ^ got[2]).count("1") <= 4
    assert bin(got[1] ^ got[3]).count("1") > 10
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dhash_near_dup_pairs(hashed, max_hamming=4).collect()
    }
    assert set(pairs) == {(1, 2)}


def test_audio_fingerprint_gain_invariant_near_dup(spark):
    """Energy-delta fingerprint on real PCM: a gain-scaled copy of a
    signal has the IDENTICAL hash (sign of energy deltas is gain
    invariant), a different envelope is far, and the banded pair search
    reuses the dhash machinery unchanged."""
    import math
    import random

    from ksql_linq_spark.operators.multimodal import (
        audio_fingerprint,
        dhash_near_dup_pairs,
    )

    rng = random.Random(5)
    n = 6500
    ramp = [int(10000 * math.sin(i / 50.0) * (i / n)) for i in range(n)]
    quiet = [int(s * 0.3) for s in ramp]  # same envelope, lower gain
    noise = [rng.randint(-8000, 8000) for _ in range(n)]
    rows = [
        (1, "audio", codecs.encode_wav(ramp, 8000), None),
        (2, "audio", codecs.encode_wav(quiet, 8000), None),
        (3, "audio", codecs.encode_wav(noise, 8000), None),
        (4, "image", codecs.encode_png(b"\x00" * 12, 4, 3, 1), None),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    hashed = audio_fingerprint(df)
    got = {r["media_id"]: r["afp"] for r in hashed.collect()}
    assert got[4] is None
    assert bin(got[1] ^ got[2]).count("1") <= 4  # gain change ~ invariant
    assert bin(got[1] ^ got[3]).count("1") > 10
    pairs = set(
        (r["id_a"], r["id_b"])
        for r in dhash_near_dup_pairs(hashed, hash_col="afp", max_hamming=4).collect()
    )
    assert pairs == {(1, 2)}


def test_video_frame_sampling_and_hashing_real_frames(spark):
    """FRPK1 frame packs: sample_frames extracts REAL per-frame PNGs
    (every Nth, decodable), and video_frame_hashes dHashes each — two
    videos sharing frames share hashes, the video near-dup signal."""
    from ksql_linq_spark.operators.multimodal import (
        sample_frames,
        video_frame_hashes,
    )

    w, h = 16, 12
    f_inc = codecs.encode_png(bytes(min(255, x * 16) for _ in range(h) for x in range(w)), w, h, 1)
    f_dec = codecs.encode_png(bytes(min(255, (w - 1 - x) * 16) for _ in range(h) for x in range(w)), w, h, 1)
    vid_a = codecs.encode_frames([f_inc, f_dec, f_inc, f_dec])
    vid_b = codecs.encode_frames([f_inc, f_inc])  # shares frame 0 with A
    rows = [
        (1, "video", vid_a, None),
        (2, "video", vid_b, None),
        (3, "image", f_inc, None),  # non-video rows skipped
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)

    sampled = sample_frames(df, every_n=2).collect()
    got = {(r["media_id"], r["frame_idx"]): bytes(r["frame"]) for r in sampled}
    assert set(got) == {(1, 0), (1, 2), (2, 0)}
    assert got[(1, 0)] == f_inc and got[(1, 2)] == f_inc
    assert codecs.decode_png(got[(2, 0)])["width"] == w  # genuinely decodable

    hashes = video_frame_hashes(df, every_n=1).collect()
    by_vid = {}
    for r in hashes:
        by_vid.setdefault(r["media_id"], set()).add(r["dhash"])
    assert len(by_vid[1]) == 2  # two distinct frames
    assert by_vid[2] <= by_vid[1]  # B's frames all appear in A
