"""Real (pure-stdlib) media codecs: PNG and WAV.

This container has no PIL/opencv/libav, but PNG and WAV need none of
them: PNG is zlib (stdlib) + per-scanline filters + CRC-32, WAV is a
RIFF header around PCM samples (stdlib ``wave``). These codecs replace
the round-1 deterministic-fake decode stub with a REAL decode path for
two of the three media types (mp4 remains stubbed — a video demuxer is
genuinely out of stdlib reach; the frame-sampling plumbing keeps its
documented fake).

Decoder coverage: 8-bit greyscale (color type 0) and RGB (type 2),
non-interlaced, all five scanline filters (None/Sub/Up/Average/Paeth)
— i.e. real-world files from any encoder using the standard filters.
The encoder emits filter 0 with fixed zlib level 6, so output bytes are
deterministic (oracle-hashable).

Reference: PNG spec (RFC 2083) §§ 4.1, 6.2-6.6; WAVE via ``wave``.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """uint8 array (h, w) greyscale or (h, w, 3) RGB → PNG bytes
    (8-bit, non-interlaced, filter 0, zlib level 6 — deterministic)."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        color_type, channels = 0, 1
        h, w = px.shape
    elif px.ndim == 3 and px.shape[2] == 3:
        color_type, channels = 2, 3
        h, w = px.shape[:2]
    else:
        raise ValueError("expected (h, w) greyscale or (h, w, 3) RGB uint8")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = px.reshape(h, w * channels)
    scanlines = b"".join(b"\x00" + raw[y].tobytes() for y in range(h))
    idat = zlib.compress(scanlines, 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (h, w) or (h, w, 3). Verifies signature
    and chunk CRCs; supports 8-bit color types 0/2, non-interlaced,
    all five scanline filters."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    off = 8
    ihdr = None
    idat = b""
    while off < len(data):
        (length,) = struct.unpack(">I", data[off : off + 4])
        tag = data[off + 4 : off + 8]
        body = data[off + 8 : off + 8 + length]
        (crc,) = struct.unpack(
            ">I", data[off + 8 + length : off + 12 + length]
        )
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        off += 12 + length
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or color_type not in (0, 2) or interlace:
        raise NotImplementedError(
            "decoder supports 8-bit grey/RGB non-interlaced PNG"
        )
    ch = 1 if color_type == 0 else 3
    stride = w * ch
    raw = zlib.decompress(idat)
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if f == 0:  # None
            cur = line
        elif f == 2:  # Up
            cur = line + prev
        elif f == 1:  # Sub: per-lane prefix sum mod 256 (vectorized —
            # recon[x] = raw[x] + recon[x-ch] is a cumsum per byte lane)
            cur = (
                line.reshape(w, ch).astype(np.int64).cumsum(axis=0) & 0xFF
            ).astype(np.uint8).reshape(stride)
        elif f in (3, 4):  # Average / Paeth: the predictor reads the
            # just-reconstructed LEFT byte through a floor/branch, an
            # inherently sequential recurrence — per-element by nature
            cur = line
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                if f == 3:
                    pred = (a + int(prev[x])) // 2
                else:
                    b = int(prev[x])
                    c = int(prev[x - ch]) if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (int(cur[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown scanline filter {f}")
        out[y] = cur
        prev = out[y]
    return out.reshape((h, w) if ch == 1 else (h, w, 3))


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 mono samples → WAV bytes (PCM16, deterministic)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(
            np.ascontiguousarray(samples, dtype="<i2").tobytes()
        )
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (int16 mono samples, sample rate)."""
    with wave.open(io.BytesIO(data), "rb") as wf:
        if wf.getnchannels() != 1 or wf.getsampwidth() != 2:
            raise NotImplementedError("decoder supports PCM16 mono")
        frames = wf.readframes(wf.getnframes())
        return np.frombuffer(frames, dtype="<i2"), wf.getframerate()


# --- MP4 container (ISO BMFF box parse — metadata only) -------------------
#
# A video DECODER is genuinely outside stdlib reach (no libav here), but
# the CONTAINER is just length-prefixed boxes (ISO/IEC 14496-12 §4.2):
# ftyp / moov(mvhd, trak(tkhd)…) / mdat. Parsing mvhd (timescale,
# duration) and tkhd (track count, presentation width/height) is pure
# struct reads — so container metadata is REAL here and only frame
# decode remains stubbed (multimodal.sample_frames).


def _mp4_box(tag: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + tag + body


def encode_mp4(
    duration_ms: int,
    width: int,
    height: int,
    payload: bytes = b"",
    timescale: int = 1000,
) -> bytes:
    """Minimal valid MP4: ftyp + moov(mvhd + trak(tkhd)) + mdat.
    Deterministic bytes (fixed brands, zeroed timestamps), so payloads
    are oracle-hashable."""
    dur = int(duration_ms * timescale // 1000)
    ftyp = _mp4_box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    matrix = struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                         0x40000000)
    mvhd = _mp4_box(
        b"mvhd",
        struct.pack(">B3xIIII", 0, 0, 0, timescale, dur)   # v0, ts, dur
        + struct.pack(">IHH8x", 0x10000, 0x0100, 0)        # rate, volume
        + matrix
        + struct.pack(">6I", 0, 0, 0, 0, 0, 0)             # pre_defined
        + struct.pack(">I", 2),                            # next_track_id
    )
    tkhd = _mp4_box(
        b"tkhd",
        # v0 layout: ver/flags, creation, modification, track_id,
        # reserved, duration, reserved(8), layer/alt/volume/reserved
        struct.pack(">B3xIIIII8x", 0, 0, 0, 1, 0, dur)
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + matrix
        + struct.pack(">II", width << 16, height << 16),   # 16.16 fixed
    )
    moov = _mp4_box(b"moov", mvhd + _mp4_box(b"trak", tkhd))
    return ftyp + moov + _mp4_box(b"mdat", payload)


def _iter_boxes(data: bytes, start: int, end: int):
    off = start
    while off + 8 <= end:
        (size,) = struct.unpack(">I", data[off:off + 4])
        tag = data[off + 4:off + 8]
        body = off + 8
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack(">Q", data[off + 8:off + 16])
            body = off + 16
        elif size == 0:  # box extends to EOF
            size = end - off
        if size < 8 or off + size > end:
            raise ValueError(f"bad box size {size} at offset {off}")
        yield tag, body, off + size
        off += size


def parse_mp4(data: bytes) -> dict:
    """MP4 bytes → {timescale, duration_ms, n_tracks, width, height,
    mdat: bytes}. Handles mvhd/tkhd versions 0 and 1; width/height are
    the FIRST track's presentation size (16.16 fixed → int)."""
    if len(data) < 8 or data[4:8] != b"ftyp":
        raise ValueError("not an MP4 (missing leading ftyp box)")
    out: dict = {"timescale": None, "duration_ms": None, "n_tracks": 0,
                 "width": None, "height": None, "mdat": b""}
    for tag, body, bend in _iter_boxes(data, 0, len(data)):
        if tag == b"mdat":
            out["mdat"] = data[body:bend]
        elif tag == b"moov":
            for t2, b2, e2 in _iter_boxes(data, body, bend):
                if t2 == b"mvhd":
                    ver = data[b2]
                    if ver == 1:
                        ts, dur = struct.unpack(
                            ">IQ", data[b2 + 20:b2 + 32])
                    else:
                        ts, dur = struct.unpack(
                            ">II", data[b2 + 12:b2 + 20])
                    out["timescale"] = ts
                    out["duration_ms"] = int(dur * 1000 // ts)
                elif t2 == b"trak":
                    out["n_tracks"] += 1
                    for t3, b3, _e3 in _iter_boxes(data, b2, e2):
                        if t3 == b"tkhd" and out["width"] is None:
                            ver = data[b3]
                            wh_off = b3 + (88 if ver == 1 else 76)
                            w, h = struct.unpack(
                                ">II", data[wh_off:wh_off + 8])
                            out["width"] = w >> 16
                            out["height"] = h >> 16
    if out["timescale"] is None:
        raise ValueError("missing moov/mvhd box")
    return out
