"""Pure-stdlib media codecs for the multimodal kernels.

No PIL/libvips/ffmpeg exists in this environment, but PNG is just
zlib-compressed filtered scanlines and WAV is a RIFF header over PCM —
both fully decodable with ``zlib``/``struct``/``wave``. These are REAL
codecs (byte-exact encode→decode round trips, all five PNG filter
types), not stubs: the Arrow-batched kernels in multimodal.py do
genuine pixel/sample work. A production deployment would swap these for
SIMD codecs for throughput, not for correctness.

Supported: PNG 8-bit greyscale / RGB / RGBA, non-interlaced (the
overwhelmingly common case); PCM WAV via the stdlib ``wave`` reader.
Video containers (mp4) have no stdlib parser — the frame-sample plan in
multimodal.py stays metadata-driven and is documented as such.
"""

from __future__ import annotations

import struct
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type → samples per pixel (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, pixels: bytes, channels: int = 3) -> bytes:
    """Minimal PNG writer: 8-bit, filter 0 on every scanline.

    ``pixels`` is row-major packed samples (len == width*height*channels).
    """
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer does not match dimensions")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    stride = width * channels
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> tuple[int, int, int, bytearray]:
    """Decode a non-interlaced 8-bit PNG → (width, height, channels,
    pixels). Reverses all five scanline filters (None/Sub/Up/Average/
    Paeth) per the PNG spec, so output from any standard encoder decodes
    byte-exactly."""
    if data[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = len(_PNG_SIG)
    width = height = channels = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if depth != 8 or interlace != 0 or color_type not in _CHANNELS:
                raise ValueError("unsupported PNG variant")
            channels = _CHANNELS[color_type]
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("truncated PNG")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("scanline size mismatch")
    out = bytearray(height * stride)
    prev = bytearray(stride)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                ul = prev[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad filter {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return width, height, channels, out


def greyscale(width: int, height: int, channels: int, pixels) -> bytearray:
    """Integer-luma greyscale plane ((r+g+b)//3 for color; alpha ignored)."""
    if channels == 1:
        return bytearray(pixels)
    out = bytearray(width * height)
    for idx in range(width * height):
        base = idx * channels
        if channels == 2:  # grey + alpha
            out[idx] = pixels[base]
        else:
            out[idx] = (
                pixels[base] + pixels[base + 1] + pixels[base + 2]
            ) // 3
    return out


def ahash64(width: int, height: int, channels: int, pixels) -> int:
    """Average-hash: mean-pool the greyscale plane to 8×8, threshold at
    the mean → 64-bit perceptual fingerprint. Near-duplicate images
    (resizes, light edits) land within a small Hamming distance — the
    image-side analogue of SimHash for text dedup."""
    grey = greyscale(width, height, channels, pixels)
    cells = [0] * 64
    counts = [0] * 64
    for y in range(height):
        cy = min(y * 8 // height, 7)
        row = y * width
        for x in range(width):
            c = cy * 8 + min(x * 8 // width, 7)
            cells[c] += grey[row + x]
            counts[c] += 1
    means = [cells[i] // max(counts[i], 1) for i in range(64)]
    overall = sum(means) // 64
    bits = 0
    for i, m in enumerate(means):
        if m > overall:
            bits |= 1 << i
    return bits


def encode_wav(samples: list[int], rate: int = 8000, channels: int = 1) -> bytes:
    """PCM16 WAV writer via the stdlib wave module."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def decode_wav(data: bytes) -> dict:
    """PCM WAV reader: rate/channels/duration plus integer sample stats
    (peak and mean absolute amplitude — exact integer math)."""
    import io
    import wave

    with wave.open(io.BytesIO(data), "rb") as w:
        rate = w.getframerate()
        channels = w.getnchannels()
        n_frames = w.getnframes()
        width = w.getsampwidth()
        frames = w.readframes(n_frames)
    if width != 2:
        raise ValueError("only PCM16 supported")
    n = n_frames * channels
    samples = struct.unpack(f"<{n}h", frames[: n * 2])
    peak = max((abs(s) for s in samples), default=0)
    mean_abs = sum(abs(s) for s in samples) // max(n, 1)
    return {
        "rate": rate,
        "channels": channels,
        "n_frames": n_frames,
        "duration_ms": n_frames * 1000 // max(rate, 1),
        "peak": peak,
        "mean_abs": mean_abs,
    }
