"""Multimodal column plumbing: images/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery here is real and tested — schema contract,
Arrow-batched ``mapInPandas`` feature extraction, partition sizing —
while the actual media decode is STUBBED (this container has no
image/audio codecs): :func:`decode_image` raises
``NotImplementedError`` and the pipeline ships a deterministic fake
extractor (:func:`fake_image_features`) so the batch shape, schema,
and partitioning behavior can be exercised end-to-end. Swapping the
fake for Pillow/ffmpeg is a one-function change on a cluster that has
the codecs installed.

Design notes for 100 TB of media:

- Binary payloads ride in parquet BYTE_ARRAY; rows are large, so
  ``spark.sql.files.maxPartitionBytes`` (set in session.py) — not row
  count — controls scan parallelism.
- ``mapInPandas`` streams Arrow record batches through Python; peak
  memory per task is one batch, not one partition, so huge partitions
  are safe as long as single payloads fit.
- Feature extraction is a narrow map: no shuffle at all until an
  aggregation/join is requested downstream.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:
    import pandas as pd

# Typed metadata contract for an opaque media column.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def decode_image(payload: bytes):  # pragma: no cover - intentional stub
    """Decode an image payload to pixels. STUB: the container has no
    imaging libraries; on a real cluster this would be
    ``PIL.Image.open(io.BytesIO(payload))``."""
    raise NotImplementedError(
        "image decode requires an imaging library not present in this "
        "environment; use fake_image_features for plumbing tests"
    )


def fake_image_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake feature vector derived from the payload
    bytes (sha256-seeded) — same shape/dtype a real encoder would
    emit, so downstream similarity plumbing is fully exercisable."""
    digest = hashlib.sha256(payload).digest()
    return [digest[i % len(digest)] / 255.0 for i in range(dim)]


def extract_image_features(
    media: DataFrame, batch_decoder=fake_image_features, dim: int = 8
) -> DataFrame:
    """Arrow-batched feature extraction over an opaque binary column.

    ``mapInPandas`` keeps transfer vectorized (one Arrow batch per
    Python call); the per-row python work is the unavoidable decode
    itself — exactly the pattern to use when the real codec lands.
    """

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "sha256": payloads.map(
                        lambda b: hashlib.sha256(b).hexdigest()
                    ),
                    "feature": payloads.map(
                        lambda b: batch_decoder(b, dim)
                    ),
                }
            )

    return media.mapInPandas(run, schema=IMAGE_FEATURE_SCHEMA)


def binary_metadata(df: DataFrame, payload_col: str, id_col: str) -> DataFrame:
    """Metadata over any binary column with pure built-ins (no Python
    at all): byte length + sha256 — the cheap scan-side pass a media
    pipeline runs before deciding what to decode."""
    return df.select(
        F.col(id_col),
        F.octet_length(F.col(payload_col)).alias("n_bytes"),
        F.sha2(F.col(payload_col), 256).alias("sha256"),
    )
