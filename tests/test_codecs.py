"""Pure-stdlib codec tests: PNG encode/decode round trips, all five
scanline filters, WAV parsing, aHash behavior. No Spark needed."""

from __future__ import annotations

import struct
import zlib

import pytest

from neo4j_database_spark.pipeline import codecs


def _gradient(w, h, ch):
    return bytes((x * 3 + y * 5 + c) % 256 for y in range(h) for x in range(w) for c in range(ch))


@pytest.mark.parametrize("w,h,ch", [(1, 1, 1), (7, 5, 3), (16, 12, 4), (8, 8, 2)])
def test_png_roundtrip(w, h, ch):
    px = _gradient(w, h, ch)
    data = codecs.encode_png(w, h, px, ch)
    rw, rh, rch, rpx = codecs.decode_png(data)
    assert (rw, rh, rch) == (w, h, ch)
    assert bytes(rpx) == px


def _png_with_filters(w, h, ch, px, filters):
    """Hand-build a PNG whose scanlines use the given filter types —
    exercising decode paths our simple encoder (filter 0) never emits."""
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    stride = w * ch
    prev = bytearray(stride)
    raw = bytearray()
    for y in range(h):
        line = bytearray(px[y * stride : (y + 1) * stride])
        f = filters[y % len(filters)]
        enc = bytearray(stride)
        for i in range(stride):
            left = line[i - ch] if i >= ch else 0
            ul = prev[i - ch] if i >= ch else 0
            if f == 0:
                enc[i] = line[i]
            elif f == 1:
                enc[i] = (line[i] - left) & 0xFF
            elif f == 2:
                enc[i] = (line[i] - prev[i]) & 0xFF
            elif f == 3:
                enc[i] = (line[i] - ((left + prev[i]) >> 1)) & 0xFF
            else:
                enc[i] = (line[i] - codecs._paeth(left, prev[i], ul)) & 0xFF
        raw += bytes([f]) + enc
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        codecs._PNG_SIG
        + codecs._chunk(b"IHDR", ihdr)
        + codecs._chunk(b"IDAT", zlib.compress(bytes(raw)))
        + codecs._chunk(b"IEND", b"")
    )


def test_png_all_filter_types_decode():
    w, h, ch = 9, 10, 3
    px = _gradient(w, h, ch)
    data = _png_with_filters(w, h, ch, px, filters=[0, 1, 2, 3, 4])
    rw, rh, rch, rpx = codecs.decode_png(data)
    assert (rw, rh, rch) == (w, h, ch)
    assert bytes(rpx) == px


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        codecs.decode_png(b"definitely not a png")
    # truncated: signature + IHDR only
    good = codecs.encode_png(4, 4, _gradient(4, 4, 3), 3)
    with pytest.raises(Exception):
        codecs.decode_png(good[:40])


def test_wav_roundtrip():
    samples = [((t * 17) % 2048) - 1024 for t in range(8000)]
    data = codecs.encode_wav(samples, rate=8000)
    info = codecs.decode_wav(data)
    assert info["rate"] == 8000
    assert info["channels"] == 1
    assert info["n_frames"] == 8000
    assert info["duration_ms"] == 1000
    assert info["peak"] == max(abs(s) for s in samples)
    assert info["mean_abs"] == sum(abs(s) for s in samples) // 8000


def test_ahash_resize_invariance_and_discrimination():
    # the same image content at two resolutions → small hamming distance;
    # different content → large
    def render(w, h, fn):
        return bytes(
            fn(x / w, y / h) for y in range(h) for x in range(w) for _ in range(1)
        )

    def half_dark(u, v):
        return 30 if u < 0.5 else 220

    def diagonal(u, v):
        return 30 if u + v < 1.0 else 220

    def hamming(a, b):
        return bin(a ^ b).count("1")

    a1 = codecs.ahash64(32, 32, 1, render(32, 32, half_dark))
    a2 = codecs.ahash64(64, 48, 1, render(64, 48, half_dark))
    b1 = codecs.ahash64(32, 32, 1, render(32, 32, diagonal))
    assert hamming(a1, a2) <= 4  # same content, different resolution
    assert hamming(a1, b1) >= 16  # different content


def test_mp4_roundtrip_metadata():
    from neo4j_database_spark.pipeline import codecs

    b = codecs.encode_mp4(320, 240, 2000, fps=25)
    info = codecs.parse_mp4(b)
    assert info["width"] == 320 and info["height"] == 240
    assert info["duration_ms"] == 2000
    assert info["n_frames"] == 50          # 2 s at 25 fps, from stts
    assert info["handler"] == "vide"
    assert info["timescale"] == 1000


def test_mp4_rejects_non_bmff():
    import pytest

    from neo4j_database_spark.pipeline import codecs

    for junk in (b"", b"\x00" * 40, b"RIFF" + b"\x00" * 60,
                 codecs.encode_mp4(8, 8, 100)[:20]):  # truncated
        with pytest.raises(ValueError):
            codecs.parse_mp4(junk)
