"""Multimodal plumbing: media relation, stubbed decode, frame sampling."""

from __future__ import annotations

import hashlib

import pytest

from antidb_spark.operators.multimodal import (
    as_media_table,
    decode_image,
    extract_features,
    media_meta,
    sample_frames,
)

DOCS = [
    (0, "an image payload body with enough bytes to chunk"),
    (1, "an audio payload"),
    (2, "a video payload that should be frame sampled into chunks ok"),
    (3, "another image"),
]


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    df = as_media_table(docs).cache()
    df.count()
    return df


def test_media_schema_and_meta(media):
    rows = {r["media_id"]: r for r in media.collect()}
    assert rows[0]["media_type"] == "image/png"
    assert rows[1]["media_type"] == "audio/wav"
    assert rows[2]["media_type"] == "video/mp4"
    for i, text in DOCS:
        raw = text.encode()
        assert bytes(rows[i]["payload"]) == raw
        assert rows[i]["meta"]["n_bytes"] == len(raw)
        assert rows[i]["meta"]["sha1"] == hashlib.sha1(raw).hexdigest()


def test_decode_stub_gated():
    with pytest.raises(NotImplementedError):
        decode_image(b"abc")
    px = decode_image(b"abc", fake=True)
    assert px.shape == (8, 8)
    assert (px == decode_image(b"abc", fake=True)).all()  # deterministic


def test_extract_features(media):
    feats = {r["media_id"]: r for r in extract_features(media).collect()}
    assert set(feats) == {0, 1, 2, 3}
    for i, text in DOCS:
        assert feats[i]["n_bytes"] == len(text.encode())
        assert 0.0 <= feats[i]["mean_px"] <= 255.0
    # identical payloads → identical phash; different → (almost surely) not
    assert feats[0]["phash"] != feats[1]["phash"]


def test_sample_frames_one_to_many(media):
    frames = sample_frames(media, every_n=2).collect()
    ids = {r["media_id"] for r in frames}
    assert ids == {2}  # only the video row
    idxs = sorted(r["frame_idx"] for r in frames)
    assert idxs == list(range(len(idxs))) and len(idxs) >= 1


def test_media_meta_projection(media):
    out = media_meta(media)
    assert out.columns == ["media_id", "media_type", "n_bytes", "sha1"]
    assert out.count() == len(DOCS)
