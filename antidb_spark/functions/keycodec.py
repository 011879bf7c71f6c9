"""Memcomparable key encoding — persist ANY key shape with orderable,
stats-prunable bytes.

The reference persists a ``.adb`` for any key type — composite coords,
``natur``-normalized rsIDs, phantom ints (idx.py:41-92) — and relies on
Python tuple/list comparison at query time (prs.py:46-77). Parquet
min/max statistics (the engine's B+tree-descent analog) only exist for
flat scalar columns, so complex normalized keys (the SortRule encodings,
struct composite keys) are serialized into an ORDER-PRESERVING byte
string: bytewise comparison of encodings == Python comparison of the
normalized keys. Stored as lowercase hex (2 chars per byte, so hex
string order == byte order), which survives JSON manifests and Spark
string comparisons unchanged.

Scheme (each element self-delimiting and prefix-free, so concatenated
sequences compare like Python lists — shorter prefix first):

- tag byte orders types (never compared across types in practice: every
  key POSITION has a fixed type — column schemas are typed, and the
  SortRule py keys are positionally typed);
- bool → ``01`` + 1 byte; int → ``02`` + 8-byte big-endian biased by
  2^63 (exact for the full int64 range, unlike a float64 round-trip);
  date → ``02`` + biased ordinal (dates ARE ints here); float → ``03``
  + IEEE-754 bits with the sign trick (negative → all bits flipped,
  positive → sign bit set; -0.0 normalized to 0.0 so Python ``==`` and
  byte equality agree); str → ``04`` + UTF-8 with ``00`` escaped as
  ``00 ff``, terminated by ``00``; sequence/tuple/dict-values → ``05``
  + elements + ``00`` terminator; datetime → ``02`` + biased epoch
  micros; bytes → ``06`` + ``00``-escaped payload + ``00``.
"""

from __future__ import annotations

import datetime as _dt
import struct as _struct
from typing import Any

import numpy as _np

_SIGN = 0x8000000000000000
_ALL = 0xFFFFFFFFFFFFFFFF
_BIAS = 1 << 63


def _enc_float(x: float) -> bytes:
    if x == 0.0:
        x = 0.0  # collapse -0.0 (Python compares them equal)
    (u,) = _struct.unpack(">Q", _struct.pack(">d", float(x)))
    u = (u ^ _ALL) if (u & _SIGN) else (u | _SIGN)
    return u.to_bytes(8, "big")


def _enc_int(i: int) -> bytes:
    return (int(i) + _BIAS).to_bytes(8, "big")


def _enc_str(s: str) -> bytes:
    return s.encode("utf-8").replace(b"\x00", b"\x00\xff") + b"\x00"


def encode_value(v: Any) -> bytes:
    # numpy scalars ride along the bool/int/float branches: pandas hands
    # the encoder np.int64/np.float64/np.bool_ from typed Series and
    # struct sub-frames (np.float64 subclasses float; np.int64/np.bool_
    # do NOT subclass their Python twins, so the unions are load-bearing)
    if isinstance(v, (bool, _np.bool_)):  # before int (bool ⊂ int)
        return b"\x01" + (b"\x01" if v else b"\x00")
    if isinstance(v, (int, _np.integer)):
        return b"\x02" + _enc_int(v)
    if isinstance(v, _dt.datetime):  # before date (datetime subclasses it)
        # epoch microseconds via exact timedelta integer fields (a float
        # .timestamp() round-trip would lose sub-ms order); covers
        # pd.Timestamp too (a datetime subclass), i.e. TimestampType keys.
        # Aware values subtract the UTC epoch so the encoding is INSTANT-
        # based: the same instant in different zones encodes identically
        # and mixed-tz columns order correctly (timedelta subtraction
        # between aware datetimes already normalizes, no astimezone needed)
        epoch = (
            _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
            if v.tzinfo is not None
            else _dt.datetime(1970, 1, 1)
        )
        d = v - epoch
        return b"\x02" + _enc_int(
            (d.days * 86400 + d.seconds) * 1_000_000 + d.microseconds
        )
    if isinstance(v, _dt.date):
        return b"\x02" + _enc_int(v.toordinal())
    if isinstance(v, (float, _np.floating)):
        return b"\x03" + _enc_float(v)
    if isinstance(v, str):
        return b"\x04" + _enc_str(v)
    if isinstance(v, (bytes, bytearray)):  # BinaryType keys
        return b"\x06" + bytes(v).replace(b"\x00", b"\x00\xff") + b"\x00"
    if isinstance(v, dict):  # Arrow struct → dict, field order preserved
        return b"\x05" + b"".join(encode_value(e) for e in v.values()) + b"\x00"
    if isinstance(v, (list, tuple, _np.ndarray)):
        return b"\x05" + b"".join(encode_value(e) for e in v) + b"\x00"
    raise TypeError(f"unencodable key element: {type(v).__name__}")


def encode_key(key: Any) -> bytes:
    """Top-level key → bytes. A top-level sequence is encoded WITHOUT
    the sequence tag/terminator: full-key comparisons make the outer
    frame redundant, and dropping it keeps point-lookup keys short."""
    if isinstance(key, dict):
        return b"".join(encode_value(e) for e in key.values())
    if isinstance(key, (list, tuple, _np.ndarray)):
        return b"".join(encode_value(e) for e in key)
    return encode_value(key)


def hex_key(key: Any) -> str:
    return encode_key(key).hex()


def hex_i64_batch(vals: _np.ndarray) -> list[str]:
    """Vectorized ``'02' + 16 hex`` encodings for an int64 batch —
    byte-identical to ``encode_value(int(v)).hex()`` per element (the
    tag-02 branch covers ints, epoch-micro timestamps, and date
    ordinals, so one numpy path serves every rule-less scalar key the
    codec stores as integers). XOR with the sign bit == adding the
    2^63 bias mod 2^64; views (not casts) sidestep numpy>=2 overflow
    rules."""
    u = vals.astype(_np.int64, copy=False).view(_np.uint64) ^ _np.uint64(
        _BIAS
    )
    buf = _np.empty((len(vals), 9), dtype=_np.uint8)
    buf[:, 0] = 0x02
    buf[:, 1:] = u.astype(">u8").view(_np.uint8).reshape(-1, 8)
    h = buf.tobytes().hex()
    return [h[i: i + 18] for i in range(0, len(h), 18)]
