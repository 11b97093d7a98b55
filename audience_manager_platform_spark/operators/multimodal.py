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
