"""Pure-stdlib PNG/WAV codecs: round-trips, filter coverage, validation,
and the Spark decode_media path vs direct decoding (no Spark needed for
the codec itself)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from antidb_spark.functions.mediacodec import (
    _PNG_SIG,
    _chunk,
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
)


@pytest.mark.parametrize("shape", [(8, 8), (5, 7), (1, 1), (16, 3, 3), (2, 9, 3)])
def test_png_roundtrip(shape):
    px = np.random.default_rng(0).integers(0, 256, size=shape, dtype=np.uint8)
    assert (decode_png(encode_png(px)) == px).all()


def test_png_decodes_all_filters():
    """Hand-encode one scanline per filter type (None/Sub/Up/Average/
    Paeth) — the shapes any real-world encoder emits."""
    rng = np.random.default_rng(1)
    px = rng.integers(0, 256, size=(5, 4), dtype=np.uint8)
    lines, prev = [], np.zeros(4, dtype=int)
    for y, f in enumerate([0, 1, 2, 3, 4]):
        cur = px[y].astype(int)
        enc = cur.copy()
        for x in range(4):
            a = cur[x - 1] if x >= 1 else 0
            b, c = prev[x], (prev[x - 1] if x >= 1 else 0)
            if f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            elif f == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            else:
                pred = 0
            enc[x] = (cur[x] - pred) % 256
        lines.append(bytes([f]) + bytes(enc.astype(np.uint8)))
        prev = cur
    ihdr = struct.pack(">IIBBBBB", 4, 5, 8, 0, 0, 0, 0)
    png = (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + _chunk(b"IEND", b"")
    )
    assert (decode_png(png) == px).all()


def test_png_rejects_garbage_and_bad_crc():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"not a png at all")
    good = encode_png(np.zeros((2, 2), dtype=np.uint8))
    bad = bytearray(good)
    bad[-5] ^= 0xFF  # corrupt IEND CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))


def test_wav_roundtrip():
    s = np.random.default_rng(2).integers(
        -32768, 32768, size=161, dtype=np.int16
    )
    out, rate = decode_wav(encode_wav(s, rate=16000))
    assert rate == 16000
    assert (out == s).all()


def test_decode_media_matches_direct(spark):
    """Spark decode path == direct python decode of the same payloads."""
    from antidb_spark.operators.multimodal import (
        _derived_bytes,
        decode_media,
        real_media_table,
    )

    docs = spark.createDataFrame(
        [(i, f"document number {i} text") for i in range(8)],
        "doc_id long, text string",
    )
    rows = {
        r["media_id"]: r
        for r in decode_media(real_media_table(docs)).collect()
    }
    for i in range(8):
        b = _derived_bytes(f"document number {i} text")
        if i % 3 == 0:
            px = np.frombuffer(b, dtype=np.uint8).astype(np.float64)
            assert rows[i]["media_type"] == "image/png"
            assert (rows[i]["width"], rows[i]["height"]) == (8, 8)
            assert rows[i]["mean_val"] == round(float(px.mean()), 6)
        elif i % 3 == 1:
            smp = np.abs(np.frombuffer(b, dtype="<i2").astype(np.float64))
            assert rows[i]["media_type"] == "audio/wav"
            assert rows[i]["n_samples"] == 32
            assert rows[i]["mean_val"] == round(float(smp.mean()), 6)
        else:
            # MP4: metadata from the ISO-BMFF box parse must equal the
            # derivation the encoder used; mdat stats round-trip too
            assert rows[i]["media_type"] == "video/mp4"
            assert rows[i]["duration_ms"] == 1000 + (b[0] | (b[1] << 8)) % 60000
            assert rows[i]["width"] == 16 * (1 + b[2] % 64)
            assert rows[i]["height"] == 16 * (1 + b[3] % 64)
            assert rows[i]["n_tracks"] == 1
            mdat = np.frombuffer(b, dtype=np.uint8).astype(np.float64)
            assert rows[i]["mean_val"] == round(float(mdat.mean()), 6)


def test_mp4_box_roundtrip_and_versions():
    """encode_mp4 → parse_mp4 round-trips metadata and mdat; the parser
    also handles version-1 (64-bit) mvhd/tkhd boxes from other muxers."""
    import struct

    from antidb_spark.functions.mediacodec import encode_mp4, parse_mp4

    b = encode_mp4(4321, 640, 360, payload=b"hello" * 10)
    m = parse_mp4(b)
    assert (m["duration_ms"], m["width"], m["height"], m["n_tracks"],
            m["timescale"]) == (4321, 640, 360, 1, 1000)
    assert m["mdat"] == b"hello" * 10

    def box(tag, body):
        return struct.pack(">I", len(body) + 8) + tag + body

    mvhd1 = box(b"mvhd", struct.pack(">B3xQQIQ", 1, 0, 0, 90000,
                                     90000 * 7) + b"\x00" * 80)
    tkhd1 = box(b"tkhd", struct.pack(">B3xQQI4xQ8x", 1, 0, 0, 1, 90000 * 7)
                + struct.pack(">HHHH", 0, 0, 0, 0) + b"\x00" * 36
                + struct.pack(">II", 1280 << 16, 720 << 16))
    data = (box(b"ftyp", b"isom" + b"\x00" * 4 + b"isom")
            + box(b"moov", mvhd1 + box(b"trak", tkhd1))
            + box(b"mdat", b"x"))
    m = parse_mp4(data)
    assert (m["duration_ms"], m["width"], m["height"]) == (7000, 1280, 720)

    import pytest as _pytest
    with _pytest.raises(ValueError):
        parse_mp4(b"\x00\x00\x00\x08free")  # no ftyp
    with _pytest.raises(ValueError):
        parse_mp4(encode_mp4(1, 1, 1)[:20] + b"\xff" * 8)  # bad box size
