"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The engine's charter (training-data pipeline at 100 TB) treats media as
first-class table columns: ``payload BINARY`` beside typed metadata, with
decode / feature-extract / resize / frame-sample as Arrow-batched
``mapInPandas`` stages. The Spark-side plumbing — schema, batch shape,
partition sizing — is real and tested; the codec step itself is stubbed
(image/audio libraries are not in this container) behind
``NotImplementedError`` plus a deterministic fake used by tests, so
swapping in Pillow/torchaudio later only replaces ``_decode_payload``.

Scale posture: payloads never pass through Python row-at-a-time — Arrow
moves binary batches; ``spark.sql.files.maxPartitionBytes`` bounds batch
memory; metadata-only plans never touch the payload column thanks to
Parquet column pruning.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_KINDS = ["image", "audio", "video"]

# media table schema: one binary payload + typed metadata per row
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_BINS = 16

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("histogram", T.ArrayType(T.LongType()), True),
    ]
)


def synth_media(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from `documents`: payload =
    utf-8 bytes of the text (a stand-in blob), kind round-robins by id.
    This is the test harness for the plumbing, not a codec."""
    kind = F.element_at(
        F.array(*[F.lit(k) for k in MEDIA_KINDS]),
        (F.col("doc_id") % len(MEDIA_KINDS) + 1).cast("int"),
    )
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.create_map(
            F.lit("source"), F.col("source"), F.lit("lang"), F.col("lang")
        ).alias("meta"),
    )


def _decode_payload(kind: str, payload: bytes):
    """THE codec boundary — intentionally stubbed.

    A production deployment replaces this with Pillow (image), soundfile
    (audio), or pyav (video) decodes. Nothing else in the module changes.
    """
    raise NotImplementedError(
        f"media decode for kind={kind!r} requires codec libraries not "
        "present in this environment; see _fake_decode for the "
        "deterministic test double"
    )


def _fake_decode(payload: bytes) -> bytes:
    """Deterministic decode stand-in: identity on the raw bytes."""
    return payload or b""


def byte_histogram(payload: bytes, bins: int = FEATURE_BINS) -> list[int]:
    """Feature vector of the deterministic fake decoder: count of bytes
    per value bucket (256/bins wide)."""
    hist = [0] * bins
    step = 256 // bins
    for b in _fake_decode(payload):
        hist[b // step] += 1
    return hist


def extract_features(media: DataFrame, bins: int = FEATURE_BINS) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    mapInPandas: each pandas batch holds (media_id, kind, payload);
    the output batch is the typed feature frame. The decode call is the
    stub boundary; the batch shape / schema contract is production-real.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else None
                    ),
                    "histogram": pdf["payload"].map(
                        lambda p: byte_histogram(p, bins)
                        if p is not None
                        else None
                    ),
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, FEATURE_SCHEMA
    )


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize stage — stub: plumbing declared, codec not present."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf["payload"] = pdf.apply(
                lambda r: _decode_payload(r["kind"], r["payload"]), axis=1
            )
            yield pdf

    return media.mapInPandas(run, media.schema)


def sample_frames(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling stage — stub: one output row per sampled
    frame once a codec is wired into _decode_payload."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf["payload"] = pdf.apply(
                lambda r: _decode_payload(r["kind"], r["payload"]), axis=1
            )
            yield pdf

    return media.filter(F.col("kind") == "video").mapInPandas(
        run, media.schema
    )
