"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with typed metadata structs —
the 100 TB layout: bytes stay columnar, partition-pruned, and are only
materialized inside Arrow batches on executors. The actual codecs
(PIL/ffmpeg/torchaudio) are NOT in this container, so the decode step
is a clearly-marked stub behind the real Spark plumbing: schemas,
Arrow batch shapes, and the mapInPandas signatures are production-
shaped and tested; ``decode_fn`` is the only thing a real deployment
swaps.

Operators:
- **sniff_media_meta**: native magic-byte sniffing (format, byte size,
  md5) — no Python, pure expressions.
- **decode_features**: mapInPandas stage binary -> fixed-dim feature
  vector. Default ``decode_fn`` raises NotImplementedError (codec
  absent); ``deterministic_fake_features`` is the testing stand-in
  (byte-histogram features — real math over real bytes, so the
  plumbing is exercised honestly).
- **frame_sample**: mapInPandas stage binary video -> exploded
  (frame_idx, frame_bytes) rows; stub slices the byte stream
  deterministically (fixed stride), exercising the 1->N fan-out shape
  a real frame sampler has.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("format", T.StringType(), False),
        T.StructField("content_md5", T.StringType(), False),
    ]
)

_MAGIC = [
    ("89504e47", "png"),
    ("ffd8ff", "jpeg"),
    ("47494638", "gif"),
    ("494433", "mp3"),
    ("52494646", "riff"),  # wav/avi container
    ("3c68746d6c", "html"),
]


def sniff_media_meta(df: DataFrame, bin_col: str) -> DataFrame:
    """Add a ``media_meta`` struct (n_bytes, format, content_md5) from
    magic bytes — native expressions only."""
    hexhead = F.lower(F.hex(F.substring(F.col(bin_col), 1, 8)))
    fmt = F.lit("unknown")
    for magic, name in reversed(_MAGIC):
        fmt = F.when(hexhead.startswith(magic.lower()), F.lit(name)).otherwise(fmt)
    return df.withColumn(
        "media_meta",
        F.struct(
            F.length(F.col(bin_col)).cast("long").alias("n_bytes"),
            fmt.alias("format"),
            F.md5(F.col(bin_col)).alias("content_md5"),
        ),
    )


def not_implemented_decode(blobs: pd.Series) -> np.ndarray:
    """The production decode slot. Image/audio codecs are not available
    in this container — swap this for a real decoder (PIL/ffmpeg)."""
    raise NotImplementedError(
        "media codecs not available in this environment; "
        "use deterministic_fake_features for tests"
    )


def deterministic_fake_features(blobs: pd.Series, dim: int = 16) -> np.ndarray:
    """Testing stand-in: byte-value histogram folded to ``dim`` buckets,
    L1-normalized. Deterministic, batch-vectorized, real math over the
    real bytes — the Arrow plumbing is exercised end to end."""
    out = np.zeros((len(blobs), dim), dtype="float32")
    for i, b in enumerate(blobs):
        if b is None or len(b) == 0:
            continue
        arr = np.frombuffer(bytes(b), dtype=np.uint8)
        hist = np.bincount(arr % dim, minlength=dim).astype("float32")
        out[i] = hist / max(hist.sum(), 1.0)
    return out


def decode_features(
    df: DataFrame,
    id_col: str,
    bin_col: str,
    dim: int = 16,
    decode_fn: Callable[[pd.Series], np.ndarray] | None = None,
) -> DataFrame:
    """binary -> (id, features array<float>) via an Arrow-batched
    mapInPandas stage. ``decode_fn`` maps a batch of blobs to an
    (n, dim) float array; defaults to the NotImplementedError stub."""
    fn = decode_fn or not_implemented_decode
    schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("features", T.ArrayType(T.FloatType()), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = fn(pdf[bin_col])
            yield pd.DataFrame({id_col: pdf[id_col], "features": list(feats)})

    return df.select(id_col, bin_col).mapInPandas(run, schema)


def frame_sample(
    df: DataFrame,
    id_col: str,
    bin_col: str,
    stride: int = 1024,
    frame_bytes: int = 256,
    max_frames: int = 8,
) -> DataFrame:
    """binary 'video' -> exploded (id, frame_idx, frame) rows — the
    1->N fan-out shape of a real frame sampler. The stub slices the
    byte stream at a fixed stride; a real deployment replaces the
    slicing with an ffmpeg keyframe decode at the same signature."""
    schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, b in zip(pdf[id_col], pdf[bin_col]):
                if b is None:
                    continue
                b = bytes(b)
                for f in range(min(max_frames, max(len(b) - frame_bytes, 0) // stride + 1)):
                    start = f * stride
                    ids.append(i)
                    idxs.append(f)
                    frames.append(b[start : start + frame_bytes])
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, bin_col).mapInPandas(run, schema)
