"""Multimodal column handling: opaque binary payloads + typed metadata.

Design (per the task brief): image/audio/video payloads are opaque
``binary`` columns accompanied by a typed metadata struct. All Spark
plumbing — schemas, partition-preserving mapInPandas, Arrow batch
shapes, UDF signatures — is real and tested. Codecs:

- **REAL** PNG and WAV decode, and **REAL** MP4 container metadata
  (pure stdlib, ``functions/mediacodec``): ``real_media_table`` builds
  genuine PNG/WAV/MP4 payloads and ``decode_media`` decodes them —
  pixels/samples for PNG/WAV, ISO-BMFF box parse (mvhd duration,
  timescale, tkhd width/height, track count, mdat stats) for MP4. The
  driver oracle recomputes the decoded statistics from the payloads'
  deterministic derivation WITHOUT decoding, so the hash check proves
  the encode∘decode round-trip end-to-end.
- Only mp4 FRAME decode remains STUBBED (``decode_image(fake=True)``
  / ``sample_frames``): a video frame decoder is genuinely outside
  stdlib reach; the deterministic fake keeps the Arrow plumbing
  exercised and pinned.

The media relation itself is synthesized from any text corpus
(``as_media_table``): payload = utf-8 bytes of the text, media_type
cycled deterministically. On a real deployment the payload column comes
from Parquet/Iceberg binary columns and everything downstream is
unchanged — that seam is the point of the stub.

Scale notes: payloads never pass through the driver; decode /
feature-extract run as mapInPandas over Arrow record batches
(``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch memory
for fat rows); frame-sampling emits multiple rows per input via the
iterator protocol without materializing a whole partition.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_TYPES = ("image/png", "audio/wav", "video/mp4")

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.LongType(), False),
                    T.StructField("sha1", T.StringType(), False),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            False,
        ),
    ]
)


def as_media_table(
    corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic media relation from a text corpus: payload =
    utf-8 bytes, media_type = cycle by id, meta filled JVM-side."""
    payload = F.encode(F.col(text_col), "UTF-8")
    mt = F.element_at(
        F.array(*[F.lit(m) for m in MEDIA_TYPES]),
        (F.col(id_col).cast("long") % len(MEDIA_TYPES) + 1).cast("int"),
    )
    return corpus.select(
        F.col(id_col).cast("long").alias("media_id"),
        mt.alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.length(payload).cast("long").alias("n_bytes"),
            F.sha1(payload).alias("sha1"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


# --- decode / feature extraction (STUBBED codecs) -----------------------

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("mean_px", T.DoubleType(), False),
        T.StructField("std_px", T.DoubleType(), False),
        T.StructField("phash", T.LongType(), False),
    ]
)


def _fake_decode(payload: bytes) -> np.ndarray:
    """DETERMINISTIC FAKE decoder (this container has no codec libs):
    derives an 8×8 'pixel' array from sha256 of the payload. Stable
    across partitioning/parallelism; replace with PIL/libav in prod."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * 2)[:64], dtype=np.uint8)
    return raw.reshape(8, 8).astype(np.float64)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    if not fake:
        raise NotImplementedError(
            "real image decode requires PIL/opencv (not in this container); "
            "pass fake=True for the deterministic stub"
        )
    return _fake_decode(payload)


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Per-payload feature extraction via Arrow-batched mapInPandas:
    (media_id, media_type, n_bytes, mean_px, std_px, phash). The phash
    is an 8×8 mean-threshold perceptual hash of the (fake-)decoded
    pixels — the exact UDF shape a real decoder would use."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for mid, mtype, payload in zip(
                batch["media_id"], batch["media_type"], batch["payload"]
            ):
                px = decode_image(bytes(payload), fake=fake)
                bits = (px > px.mean()).flatten()
                phash = 0
                for i, b in enumerate(bits):
                    if b:
                        phash |= 1 << i
                rows.append(
                    (
                        int(mid),
                        mtype,
                        len(bytes(payload)),
                        float(px.mean()),
                        float(px.std()),
                        # two's-complement reinterpretation in pure int
                        # math (np.uint64→int64 casts with bit 63 set
                        # raise OverflowError under NumPy >= 2.0)
                        phash - (1 << 64) if phash >= (1 << 63) else phash,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FEATURES_SCHEMA.fields]
            )

    return media.select("media_id", "media_type", "payload").mapInPandas(
        gen, schema=FEATURES_SCHEMA
    )


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_sha256", T.StringType(), False),
    ]
)


def sample_frames(media: DataFrame, every_n: int = 4, fake: bool = True) -> DataFrame:
    """Frame sampling for video payloads: 1-to-many mapInPandas (each
    payload yields ceil(n_chunks / every_n) frames; the fake 'frame' is
    a byte slice — a real decoder would emit decoded frame tensors).
    The frame id is sha256 of the slice, an expression ANSI SQL can
    recompute from the payload derivation — which is what makes this
    stub's plumbing oracle-checkable end-to-end."""
    if not fake:
        raise NotImplementedError("real frame extraction needs libav")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for mid, payload in zip(batch["media_id"], batch["payload"]):
                data = bytes(payload)
                n_chunks = max(1, len(data) // 16)
                for fi, start in enumerate(range(0, n_chunks, every_n)):
                    chunk = data[start * 16 : (start + 1) * 16]
                    rows.append(
                        (int(mid), fi, hashlib.sha256(chunk).hexdigest())
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAMES_SCHEMA.fields]
            )

    return (
        media.filter(F.col("media_type") == "video/mp4")
        .select("media_id", "payload")
        .mapInPandas(gen, schema=FRAMES_SCHEMA)
    )


# --- REAL codec path (PNG/WAV, pure stdlib — functions/mediacodec) ------

REAL_MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_samples", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("n_tracks", T.IntegerType(), True),
        T.StructField("mean_val", T.DoubleType(), False),
    ]
)


def _derived_bytes(text: str) -> bytes:
    """64 deterministic bytes per document: sha256(text) ‖
    sha256(text + 'x') — reproducible in ANSI SQL (DuckDB sha256), which
    is what makes the REAL-codec round-trip oracle-checkable: the oracle
    recomputes pixel/sample statistics from this derivation WITHOUT
    decoding, so a hash match proves decode(encode(x)) == x end-to-end
    through two independent paths."""
    raw = text.encode()
    return hashlib.sha256(raw).digest() + hashlib.sha256(raw + b"x").digest()


def real_media_table(
    corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(media_id, media_type, payload) with GENUINE payload bytes,
    cycled by id mod 3: 8×8 greyscale PNG / 32-sample PCM16 WAV / MP4
    container (ftyp+moov(mvhd,trak(tkhd))+mdat), all encoded from the
    sha256-derived bytes of the text (mediacodec). The MP4's metadata
    derives from the first bytes — duration_ms = 1000 + (b0 ‖ b1) %
    60000, width/height = 16·(1 + b2/b3 % 64) — and its mdat carries
    the 64 bytes, so the container round-trip is oracle-checkable."""
    from antidb_spark.functions.mediacodec import (
        encode_mp4,
        encode_png,
        encode_wav,
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for mid, text in zip(batch[id_col], batch[text_col]):
                b = _derived_bytes(text)
                r = int(mid) % 3
                if r == 0:
                    px = np.frombuffer(b, dtype=np.uint8).reshape(8, 8)
                    rows.append((int(mid), "image/png", encode_png(px)))
                elif r == 1:
                    smp = np.frombuffer(b, dtype="<i2")
                    rows.append((int(mid), "audio/wav", encode_wav(smp)))
                else:
                    rows.append((int(mid), "video/mp4", encode_mp4(
                        1000 + (b[0] | (b[1] << 8)) % 60000,
                        16 * (1 + b[2] % 64),
                        16 * (1 + b[3] % 64),
                        payload=b,
                    )))
            yield pd.DataFrame(
                rows, columns=[f.name for f in REAL_MEDIA_SCHEMA.fields]
            )

    return corpus.select(id_col, text_col).mapInPandas(
        gen, schema=REAL_MEDIA_SCHEMA
    )


def decode_media(media: DataFrame) -> DataFrame:
    """REAL decode of PNG/WAV/MP4 payloads (no fakes): per-payload
    (media_id, media_type, width, height, n_samples, duration_ms,
    n_tracks, mean_val) where mean_val = mean pixel value (PNG) /
    mean |sample| (WAV) / mean mdat byte (MP4), rounded 6dp. MP4
    metadata (mvhd duration·timescale, tkhd presentation size, track
    count) comes from the pure-stdlib ISO-BMFF box parse — only FRAME
    decode remains stubbed (needs libav). Arrow-batched mapInPandas;
    payloads never touch the driver."""
    from antidb_spark.functions.mediacodec import (
        decode_png,
        decode_wav,
        parse_mp4,
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for mid, mtype, payload in zip(
                batch["media_id"], batch["media_type"], batch["payload"]
            ):
                data = bytes(payload)
                if mtype == "image/png":
                    px = decode_png(data)
                    rows.append(
                        (int(mid), mtype, px.shape[1], px.shape[0], None,
                         None, None, round(float(px.mean()), 6))
                    )
                elif mtype == "audio/wav":
                    smp, _rate = decode_wav(data)
                    rows.append(
                        (int(mid), mtype, None, None, int(smp.size),
                         None, None,
                         round(float(np.abs(smp.astype(np.float64)).mean()), 6))
                    )
                elif mtype == "video/mp4":
                    m = parse_mp4(data)
                    md = np.frombuffer(m["mdat"], dtype=np.uint8)
                    rows.append(
                        (int(mid), mtype, m["width"], m["height"], None,
                         int(m["duration_ms"]), int(m["n_tracks"]),
                         round(float(md.mean()) if md.size else 0.0, 6))
                    )
                else:
                    raise NotImplementedError(
                        f"no stdlib decoder for {mtype}"
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in DECODED_SCHEMA.fields]
            )

    return media.select("media_id", "media_type", "payload").mapInPandas(
        gen, schema=DECODED_SCHEMA
    )


def media_meta(media: DataFrame) -> DataFrame:
    """Typed-metadata projection (JVM-side only — no decode): the
    oracle-checkable face of the media relation."""
    return media.select(
        "media_id",
        "media_type",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.sha1").alias("sha1"),
    )
