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


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_sha256", T.StringType()),
    ]
)


def fake_resize_payload(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for decode → resize → re-encode: the
    "resized image" is the payload's sha256 hexdigest repeated to the
    width*height*3 byte budget (an RGB raster's size). Hex-string
    bytes so a SQL oracle can reproduce the exact blob; a real
    resizer returns real pixels through the same signature."""
    target = width * height * 3
    hexd = hashlib.sha256(payload).hexdigest()
    reps = -(-target // len(hexd))
    return (hexd * reps)[:target].encode()


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    resizer=fake_resize_payload,
) -> DataFrame:
    """Arrow-batched resize over an opaque binary column — the decode
    (stubbed, see module docstring) and re-encode are the per-row
    Python work; everything around them is vectorized Arrow transfer.
    Output keeps the binary payload contract (media_id, width, height,
    n_bytes, payload) so downstream stages are agnostic to whether a
    payload was resized."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = pdf["payload"].map(
                lambda b: resizer(bytes(b), width, height)
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pd.Series(width, index=pdf.index, dtype="int32"),
                    "height": pd.Series(
                        height, index=pdf.index, dtype="int32"
                    ),
                    "n_bytes": out.map(len).astype("int32"),
                    "payload": out,
                }
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


FAKE_BYTES_PER_FRAME = 64  # shared with the SQL oracle


def fake_frame_count(payload: bytes) -> int:
    """Fake "video length": one frame per FAKE_BYTES_PER_FRAME payload
    bytes, plus one (a real counter reads the container's frame
    index). 64 bytes/frame makes even short test documents span
    multiple sampled frames, so the row-expanding path is exercised."""
    return len(payload) // FAKE_BYTES_PER_FRAME + 1


def sample_frames(
    media: DataFrame,
    every_n: int = 4,
    frame_counter=fake_frame_count,
) -> DataFrame:
    """Frame sampling over an opaque video column: each media row
    EXPLODES into rows for frames 0, every_n, 2*every_n, ... —
    ``mapInPandas`` may emit any number of output rows per input row,
    which is exactly the shape a frame sampler needs (and the frame
    decode is the stubbed step: the fake emits a deterministic
    per-frame content hash instead of pixels).

    Scale note: output size is rows × frames/every_n; the explosion
    happens executor-side inside the Arrow stream, never on the
    driver, and no shuffle is introduced."""
    if every_n <= 0:
        raise ValueError(f"every_n must be positive, got {every_n}")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            mids, idxs, hashes = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                for idx in range(0, frame_counter(b), every_n):
                    mids.append(mid)
                    idxs.append(idx)
                    hashes.append(
                        hashlib.sha256(
                            b + b":" + str(idx).encode()
                        ).hexdigest()
                    )
            if mids:
                yield pd.DataFrame(
                    {
                        "media_id": pd.Series(mids, dtype="int64"),
                        "frame_idx": pd.Series(idxs, dtype="int32"),
                        "frame_sha256": hashes,
                    }
                )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def binary_metadata(df: DataFrame, payload_col: str, id_col: str) -> DataFrame:
    """Metadata over any binary column with pure built-ins (no Python
    at all): byte length + sha256 — the cheap scan-side pass a media
    pipeline runs before deciding what to decode."""
    return df.select(
        F.col(id_col),
        F.octet_length(F.col(payload_col)).alias("n_bytes"),
        F.sha2(F.col(payload_col), 256).alias("sha256"),
    )


AUDIO_ENERGY_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("window_idx", T.IntegerType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("energy", T.LongType()),
    ]
)


def payload_energy_windows(
    media: DataFrame, window_bytes: int = 32
) -> DataFrame:
    """Audio-shaped windowed analysis over opaque payloads: split each
    payload into fixed ``window_bytes`` windows and compute per-window
    byte energy (the sum an RMS/loudness pass reduces once a real PCM
    decode replaces the stub) — the row-expanding numeric-aggregation
    pattern audio pipelines run (VAD, silence trimming, loudness
    normalization all start exactly here).

    Arrow-batched ``mapInPandas``; per payload the window sums are ONE
    vectorized ``np.add.reduceat`` over the byte buffer — no Python
    per-byte loop. Executor-side explosion, no shuffle; expansion
    factor is payload length over window size.
    """
    if window_bytes <= 0:
        raise ValueError(f"window_bytes must be positive, got {window_bytes}")

    def split(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out: list[tuple] = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                buf = np.frombuffer(bytes(payload), dtype=np.uint8)
                if buf.size == 0:
                    continue
                starts = np.arange(0, buf.size, window_bytes)
                sums = np.add.reduceat(buf.astype(np.int64), starts)
                for wi, s in enumerate(sums):
                    n = int(
                        min(window_bytes, buf.size - wi * window_bytes)
                    )
                    out.append((int(mid), wi, n, int(s)))
            yield pd.DataFrame(
                out, columns=["media_id", "window_idx", "n_bytes", "energy"]
            )

    return media.select("media_id", "payload").mapInPandas(
        split, AUDIO_ENERGY_SCHEMA
    )


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("phash", T.LongType()),
    ]
)


def fake_image_grid(payload: bytes, cells: int = 64) -> list[float]:
    """Deterministic fake decode to a ``cells``-cell grayscale grid:
    byte means over equal payload slices — the structure a real
    decode + downsample yields. Unlike the sha-seeded feature fake,
    this is LOCALITY-PRESERVING: a small payload edit perturbs few
    cells, so hash distance tracks payload similarity — the property
    perceptual hashing needs and a cryptographic fake destroys. Swap
    for a real decode+resize on a cluster with codecs."""
    n = len(payload)
    if n == 0:
        return [0.0] * cells
    out = []
    for i in range(cells):
        lo, hi = i * n // cells, (i + 1) * n // cells
        chunk = payload[lo:hi] or payload[lo : lo + 1]
        out.append(sum(chunk) / max(len(chunk), 1))
    return out


def payload_phash(
    media: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    grid_fn=fake_image_grid,
) -> DataFrame:
    """64-bit average-hash (aHash) per payload: decode to an 8×8
    grid, bit i set iff cell i exceeds the grid mean — the classic
    perceptual fingerprint whose Hamming distance approximates visual
    difference. Arrow-batched ``mapInPandas`` (the decode is the
    unavoidable Python step); output (media_id, phash int64)."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        def one(b: bytes) -> int:
            cells = grid_fn(b, 64)
            mean = sum(cells) / 64.0
            h = 0
            for i, c in enumerate(cells):
                if c > mean:
                    h |= 1 << i
            # wrap to signed int64 (bit 63 is just a hash bit)
            return h - (1 << 64) if h >= (1 << 63) else h

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "phash": np.array(
                        [one(b) for b in pdf[payload_col]], dtype=np.int64
                    ),
                }
            )

    return media.select(id_col, payload_col).mapInPandas(
        run, schema=PHASH_SCHEMA
    )


def phash_near_dup_pairs(
    media: DataFrame,
    max_hamming: int = 6,
    payload_col: str = "payload",
    id_col: str = "media_id",
    grid_fn=fake_image_grid,
) -> DataFrame:
    """Perceptual near-duplicate pairs: (id_a, id_b, hamming) with
    Hamming(phash) <= ``max_hamming`` — image-level dedup the byte
    hash cannot do (re-encodes/minor edits change every byte but few
    grid cells).

    Scale shape — the pigeonhole banding the SimHash text family
    uses: split the 64 bits into ``max_hamming + 1`` bands; any pair
    within distance ``max_hamming`` agrees EXACTLY on >= 1 band
    (pigeonhole), so candidates come from an equi-join on
    (band_idx, band_value) — never an all-pairs comparison — and the
    exact Hamming check (JVM ``bit_count(xor)``) filters false
    bucket-mates. Recall is exactly 1 within the threshold."""
    bands = max_hamming + 1
    ph = payload_phash(media, payload_col, id_col, grid_fn).localCheckpoint(
        eager=True
    )  # one Python pass feeds both join sides
    bounds = [
        (i * 64 // bands, (i + 1) * 64 // bands) for i in range(bands)
    ]
    band_structs = [
        F.struct(
            F.lit(i).alias("band"),
            F.expr(
                f"(shiftrightunsigned(phash, {lo}) & "
                f"{(1 << (hi - lo)) - 1}) "
            ).alias("val"),
        )
        for i, (lo, hi) in enumerate(bounds)
    ]
    coded = ph.select(
        F.col("media_id").alias("vid"),
        "phash",
        F.explode(F.array(*band_structs)).alias("b"),
    ).select("vid", "phash", F.col("b.band").alias("band"), F.col("b.val").alias("val"))
    a, b = coded.alias("a"), coded.alias("b")
    cand = (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.val") == F.col("b.val"),
                F.col("a.vid") < F.col("b.vid"),
            ],
        )
        .select(
            F.col("a.vid").alias("id_a"),
            F.col("b.vid").alias("id_b"),
            F.col("a.phash").alias("ph_a"),
            F.col("b.phash").alias("ph_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.expr("ph_a ^ ph_b"))
    return cand.where(ham <= max_hamming).select(
        "id_a", "id_b", ham.cast("int").alias("hamming")
    )
