"""Multimodal column plumbing (BASELINE.json north star).

Images/audio/video ride through the engine as opaque ``binary`` columns
with typed metadata. The Spark-side plumbing — schema, partition-parallel
batch processing via ``mapInPandas``, Arrow batch shapes — is real and
tested; the actual media decode is STUBBED (``decode_media``) because the
container has no image/audio libraries: it either raises
``NotImplementedError`` (strict) or produces a deterministic fake feature
vector (``fake=True``) so pipelines can be exercised end-to-end.

Pattern at scale: binary payloads keep row-groups fat, so
``spark.sql.files.maxPartitionBytes`` governs batch memory; the
``mapInPandas`` iterator processes one Arrow batch at a time and never
materializes a partition in memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media binary, media_type string, byte_len int, sha string"
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Build a typed binary-media table from the documents fixture (the
    text bytes stand in for an image/audio payload): opaque payload +
    extracted metadata, all JVM-side."""
    payload = F.encode("text", "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("media"),
        F.lit("text/plain").alias("media_type"),
        F.octet_length(payload).alias("byte_len"),
        F.sha2(payload, 256).alias("sha"),
    )


def decode_media(
    media_df: DataFrame, *, fake: bool = False, feature_dim: int = 8
) -> DataFrame:
    """Decode/feature-extract stage over binary payloads via
    ``mapInPandas`` (Arrow-batched; the only sanctioned Python hop in the
    engine). Real decoders (PIL/librosa/ffmpeg) are not in this
    environment — ``fake=False`` raises NotImplementedError at plan
    execution; ``fake=True`` emits a deterministic byte-histogram feature
    vector with the exact schema a real extractor would produce."""
    out_schema = f"doc_id long, media_type string, features array<double>"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires image/audio libraries not present "
                    "in this environment; pass fake=True for the deterministic "
                    "test extractor"
                )
            feats = []
            for blob in pdf["media"]:
                hist = [0.0] * feature_dim
                for byte in blob:
                    hist[byte % feature_dim] += 1.0
                total = sum(hist) or 1.0
                feats.append([round(h / total, 6) for h in hist])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "features": feats,
                }
            )

    return media_df.mapInPandas(extract, schema=out_schema)


def resize_media(
    media_df: DataFrame, *, target_bytes: int = 64, fake: bool = False
) -> DataFrame:
    """Resize/transcode stage (images: downscale; audio: resample) over
    ``mapInPandas``. Output schema mirrors the input media table so resize
    stages compose with decode/feature-extract. The real transform is
    stubbed like :func:`decode_media`; ``fake=True`` truncates/pads the
    payload to ``target_bytes`` deterministically so batch shapes and
    schema travel end-to-end."""
    out_schema = MEDIA_SCHEMA

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media resize requires image/audio libraries not present "
                    "in this environment; pass fake=True for the deterministic "
                    "stub"
                )
            out = []
            for blob in pdf["media"]:
                b = bytes(blob)[:target_bytes]
                b = b + b"\x00" * (target_bytes - len(b))
                out.append(b)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": out,
                    "media_type": pdf["media_type"],
                    "byte_len": [len(b) for b in out],
                    "sha": [hashlib.sha256(b).hexdigest() for b in out],
                }
            )

    return media_df.mapInPandas(resize, schema=out_schema)


def sample_frames(
    media_df: DataFrame,
    *,
    frame_bytes: int = 32,
    every_nth: int = 4,
    fake: bool = False,
) -> DataFrame:
    """Frame-sampling stage (video → every nth frame) — the ONE-TO-MANY
    ``mapInPandas`` shape: each input row yields a variable number of
    output rows, which Arrow batches handle natively (no explode of a
    pre-built array, no per-row UDF). ``fake=True`` treats the payload as
    fixed-size pseudo-frames; a real build would hand the container to
    ffmpeg per batch."""
    out_schema = "doc_id long, frame_idx int, frame binary"

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "frame sampling requires ffmpeg/video libraries not "
                    "present in this environment; pass fake=True for the "
                    "deterministic stub"
                )
            ids, idxs, frames = [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                b = bytes(blob)
                n_frames = max(1, len(b) // frame_bytes)
                for i in range(0, n_frames, every_nth):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(b[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return media_df.mapInPandas(sample, schema=out_schema)
