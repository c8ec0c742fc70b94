"""Multimodal binary-column plumbing (operators/multimodal.py)."""

import pytest

from map_v2_etl_spark.operators.multimodal import (
    FEATURE_BINS,
    MEDIA_KINDS,
    _decode_payload,
    byte_histogram,
    extract_features,
    resize_images,
    synth_media,
)
from map_v2_etl_spark.sources.registry import load_table


def test_synth_media_schema_and_kinds(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    media = synth_media(docs)
    assert [f.name for f in media.schema.fields] == [
        "media_id", "kind", "payload", "n_bytes", "meta",
    ]
    rows = media.limit(20).collect()
    for r in rows:
        assert r.kind in MEDIA_KINDS
        assert r.kind == MEDIA_KINDS[r.media_id % 3]
        assert isinstance(r.payload, (bytes, bytearray))
        assert r.n_bytes == len(r.payload)
        assert set(r.meta) == {"source", "lang"}


def test_extract_features_ground_truth(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).limit(50)
    media = synth_media(docs)
    payloads = {r.media_id: bytes(r.payload) for r in media.collect()}
    feats = extract_features(media).collect()
    assert len(feats) == len(payloads)
    for r in feats:
        expect = byte_histogram(payloads[r.media_id])
        assert list(r.histogram) == expect
        assert len(r.histogram) == FEATURE_BINS
        assert sum(r.histogram) == len(payloads[r.media_id])
        assert r.n_bytes == len(payloads[r.media_id])


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        _decode_payload("image", b"\x89PNG")


def test_resize_stage_surfaces_codec_stub(spark, sf_dir):
    """The resize plan builds (schema contract is real); executing it hits
    the stubbed codec boundary."""
    docs = load_table(spark, "documents", sf_dir).limit(3)
    plan = resize_images(synth_media(docs), 64, 64)
    assert plan.schema == synth_media(docs).schema
    with pytest.raises(Exception, match="NotImplementedError|media decode"):
        plan.collect()
