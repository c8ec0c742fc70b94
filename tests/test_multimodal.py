"""Multimodal binary-column plumbing (operators/multimodal.py)."""

import pytest
from pyspark.sql import functions as F

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


# ---------------------------------------------------------------------------
# real codec paths: WAV / BMP (wave stdlib + numpy, no external libs)
# ---------------------------------------------------------------------------


def test_wav_roundtrip_decode():
    import io
    import wave as wavelib

    import numpy as np

    from map_v2_etl_spark.operators.multimodal import _decode_wav

    t = np.arange(800) / 8000.0
    sig = (np.sin(2 * np.pi * 440 * t) * 12000).astype("<i2")
    buf = io.BytesIO()
    with wavelib.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(sig.tobytes())
    sr, data = _decode_wav(buf.getvalue())
    assert sr == 8000
    np.testing.assert_array_equal(data, sig)


def test_bmp_roundtrip_and_resize():
    import numpy as np

    from map_v2_etl_spark.operators.multimodal import _decode_bmp, _encode_bmp

    img = np.arange(6 * 5 * 3, dtype=np.uint8).reshape(6, 5, 3)
    out = _decode_bmp(_encode_bmp(img))
    np.testing.assert_array_equal(out, img)


def test_media_decode_stats_real_payloads(spark, sf_dir):
    import math

    from map_v2_etl_spark.plans.queries_wave8 import q_media_decode_stats

    rows = {r["media_id"]: r for r in q_media_decode_stats(spark, sf_dir).collect()}
    docs_n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == docs_n
    for mid, r in rows.items():
        if mid % 2 == 0:
            assert r["kind"] == "audio"
            assert r["n_units"] == 400 and r["rate_or_width"] == 8000
            # sine peak ~20000 (sampling may just miss the crest)
            assert 18000 <= r["peak"] <= 20000
        else:
            assert r["kind"] == "image"
            assert r["n_units"] == 64 and r["rate_or_width"] == 8
            assert 0 <= r["peak"] <= 255


def test_resize_images_real_bmp(spark, sf_dir):
    from map_v2_etl_spark.operators.multimodal import (
        _decode_bmp,
        decode_stats,
        resize_images,
        synth_real_media,
    )
    from map_v2_etl_spark.sources.registry import load_table as lt

    docs = lt(spark, "documents", sf_dir).limit(10)
    media = synth_real_media(docs)
    resized = resize_images(media, 4, 4).collect()
    assert resized  # odd ids -> images
    for r in resized:
        img = _decode_bmp(bytes(r["payload"]))
        assert img.shape == (4, 4, 3)


def test_m2ev_roundtrip_and_sampling(spark, sf_dir):
    """M2EV container round-trip: synth -> decode recovers dimensions
    and exact pixel content; sample_frames keeps exactly frames
    0, n, 2n, ... and reports exact integer sums."""
    import numpy as np

    from map_v2_etl_spark.operators.multimodal import (
        _decode_m2ev,
        sample_frames,
        synth_video,
    )
    from map_v2_etl_spark.sources.registry import load_table

    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("doc_id") < 20
    )
    media = synth_video(docs)
    row = media.filter(F.col("media_id") == 7).collect()[0]
    w, h, frames = _decode_m2ev(bytes(row["payload"]))
    assert (w, h) == (8, 6)
    assert len(frames) == 12 + 7 % 20
    yx = np.indices((6, 8))
    want0 = (yx[1] + yx[0] * 8 + 7) % 256
    assert (frames[0] == want0).all()

    sampled = sample_frames(media, every_n=5).collect()
    by_id = {}
    for r in sampled:
        by_id.setdefault(r["media_id"], []).append(r["frame_ix"])
    for mid, ixs in by_id.items():
        n_frames = 12 + mid % 20
        assert sorted(ixs) == list(range(0, n_frames, 5))
    r7 = [r for r in sampled if r["media_id"] == 7 and r["frame_ix"] == 5]
    assert r7[0]["sum_px"] == int(((want0 + 15) % 256).sum())


def test_sample_frames_guards(spark):
    """every_n validates at the driver; null payloads yield no frames
    instead of crashing the Arrow task; M2EV decodes through the
    single codec boundary (_decode_payload)."""
    import pytest
    from pyspark.sql import types as T

    from map_v2_etl_spark.operators.multimodal import (
        _decode_payload,
        sample_frames,
        synth_video,
    )

    docs = spark.createDataFrame([(1,), (2,)], "doc_id LONG")
    media = synth_video(docs)
    with pytest.raises(ValueError, match="every_n"):
        sample_frames(media, every_n=0)
    # null payload row: skipped, not a TypeError in the executor
    null_row = spark.createDataFrame(
        [(99, "video", None)],
        T.StructType([
            T.StructField("media_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("payload", T.BinaryType()),
        ]),
    )
    got = sample_frames(
        media.unionByName(null_row), every_n=30
    ).collect()
    assert {r["media_id"] for r in got} == {1, 2}
    # the codec boundary sniffs M2EV now
    payload = bytes(media.filter("media_id = 1").first()["payload"])
    w, h, frames = _decode_payload("video", payload)
    assert (w, h, len(frames)) == (8, 6, 13)
