"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs via
``mapInPandas``.

The container has no image/audio codecs, so the decode kernels are STUBS
behind ``_HAS_CODECS`` (deterministic fakes keep the pipeline testable); the
Spark-side plumbing — schema, batch iteration, partitioning, UDF signatures —
is real and tested. Swapping a real decoder in changes only the marked inner
functions.

Scale notes: media bytes dominate row width, so operators here
- select ONLY the columns they need (binary columns never ride along through
  joins they don't participate in),
- use ``mapInPandas`` (streaming Arrow batches, bounded memory) rather than
  collect-style UDFs,
- repartition by a size-balancing key before heavy decode so one partition
  of 4K videos doesn't straggle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_HAS_CODECS = False  # no PIL/ffmpeg in this container — deterministic fakes below

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("kind", T.StringType(), False),  # image | audio | video
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta_width", T.IntegerType(), True),
    T.StructField("meta_height", T.IntegerType(), True),
    T.StructField("meta_duration_ms", T.IntegerType(), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.IntegerType(), False),
    T.StructField("sha1", T.StringType(), False),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
])


def media_from_text(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic synthetic media table from a text corpus (no external
    data): payload = utf-8 bytes, kind round-robins by id hash, metadata
    derived arithmetically. Exercises the binary-column plumbing end-to-end."""
    i = F.abs(F.xxhash64(F.col(id_col).cast("string")))
    kind = F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (i % 3 + 1).cast("int"))
    return docs.select(
        F.col(id_col).cast("string").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        ((i % 640) + 16).cast("int").alias("meta_width"),
        ((i % 480) + 16).cast("int").alias("meta_height"),
        ((i % 30000) + 1000).cast("int").alias("meta_duration_ms"),
    )


def _decode_image(payload: bytes) -> list[float]:
    """STUB decode (no codec libs in container). Real impl: PIL.Image.open →
    resize(8,8) → grayscale → flatten/255. Deterministic fake: 8 floats from
    sha1 bytes — stable across runs/partitions."""
    if _HAS_CODECS:
        raise NotImplementedError("real image decode requires PIL")
    h = hashlib.sha1(payload).digest()
    return [b / 255.0 for b in h[:8]]


def _sample_frames(payload: bytes, n_frames: int = 4) -> list[bytes]:
    """STUB frame sampler. Real impl: ffmpeg keyframe extraction. Fake:
    n deterministic byte-slices."""
    if _HAS_CODECS:
        raise NotImplementedError("real frame sampling requires ffmpeg")
    step = max(1, len(payload) // n_frames)
    return [payload[i * step:(i + 1) * step] or b"\x00" for i in range(n_frames)]


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction: bytes → (n_bytes, sha1, feature vec).

    The UDF iterates Arrow record batches — constant memory per task no
    matter the partition size; video rows fan into sampled frames whose
    features are mean-pooled (the real pipeline's shape).
    """
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            feats = []
            for kind, payload in zip(pdf["kind"], payloads):
                payload = bytes(payload) if payload is not None else b""
                if kind == "video":
                    frames = [_decode_image(fr) for fr in _sample_frames(payload)]
                    feats.append([sum(c) / len(frames) for c in zip(*frames)])
                else:
                    feats.append(_decode_image(payload))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0).astype("int32"),
                "sha1": payloads.map(lambda b: hashlib.sha1(bytes(b) if b is not None else b"").hexdigest()),
                "feature": feats,
            })

    cols = ["media_id", "kind", "payload"]
    return media.select(*cols).mapInPandas(fn, FEATURE_SCHEMA)


def media_metadata(media: DataFrame) -> DataFrame:
    """Pure-Column metadata pass (no Python): byte length, magic prefix,
    aspect ratio — the cheap path that should NEVER need a UDF."""
    return media.select(
        "media_id",
        "kind",
        F.length(F.col("payload")).cast("int").alias("n_bytes"),
        F.substring(F.hex(F.col("payload")), 1, 8).alias("magic"),
        F.round(F.col("meta_width") / F.col("meta_height"), 3).alias("aspect"),
    )
