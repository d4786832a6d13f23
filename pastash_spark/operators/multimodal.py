"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schemas, Arrow batch shapes, partition-friendly UDF
signatures) is real and tested; the actual codec calls are stubbed behind
``decoder=`` injection because no image/audio libraries exist in this
container — a production deploy passes e.g. a PIL/torchaudio-backed decoder
with the same signature.

Design points for 100 TB:
  * payloads stay opaque bytes until the LAST possible operator — metadata
    predicates (media_type, width, duration) prune via column stats before
    any decode happens;
  * decode/feature ops run in ``mapInPandas`` so one Arrow batch moves per
    partition-chunk, never per row;
  * decoded features are fixed-size float arrays -> columnar, joinable with
    the embedding similarity operators.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("media_type", T.StringType(), False),   # image|audio|video
    T.StructField("payload", T.BinaryType(), True),        # opaque bytes
    T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
])


def deterministic_fake_decoder(payload: bytes, media_type: str,
                               n_features: int = 16) -> np.ndarray:
    """Stand-in decode+feature-extract: derives a stable float vector from a
    sha256 of the payload.  Deterministic so tests can golden it; replace
    with a real codec in production (same signature: bytes -> float32[n])."""
    if payload is None:
        return np.zeros(n_features, dtype=np.float32)
    h = hashlib.sha256(payload + media_type.encode()).digest()
    raw = np.frombuffer((h * ((4 * n_features) // len(h) + 1))[: 4 * n_features],
                        dtype=np.uint32)
    return (raw.astype(np.float64) / 2**32).astype(np.float32)


def extract_features(df: DataFrame, *, n_features: int = 16,
                     decoder: Callable[[bytes, str, int], np.ndarray] | None = None,
                     payload_col: str = "payload",
                     type_col: str = "media_type",
                     target: str = "features") -> DataFrame:
    """Decode + feature-extract per media row via mapInPandas (one Arrow
    batch per chunk).  With no real codecs installed the default decoder is
    the deterministic fake; pass a real one in production."""
    dec = decoder or deterministic_fake_decoder
    fields = [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
    out_schema = ", ".join(fields + [f"`{target}` array<float>"])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out[target] = [
                dec(p, t, n_features).tolist()
                for p, t in zip(pdf[payload_col], pdf[type_col])
            ]
            yield out

    return df.mapInPandas(run, schema=out_schema)


def frame_sample(df: DataFrame, *, every_n: int = 10,
                 payload_col: str = "payload",
                 target: str = "frames") -> DataFrame:
    """Video frame sampling STUB: real implementation would demux the
    container and emit every Nth frame as its own binary.  Here the
    Spark-side contract (1 -> N explode of frame structs with frame_no) is
    real; the demux is a deterministic fake that slices the payload."""
    fields = [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
    out_schema = ", ".join(fields + [f"`{target}` array<struct<frame_no:int,data:binary>>"])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            frames = []
            for p in pdf[payload_col]:
                if p is None:
                    frames.append([])
                    continue
                chunks = [p[i:i + 16] for i in range(0, len(p), 16)]
                frames.append([{"frame_no": i, "data": c}
                               for i, c in enumerate(chunks) if i % every_n == 0])
            out[target] = frames
            yield out

    return df.mapInPandas(run, schema=out_schema)


def decode_image(df: DataFrame, **_kw) -> DataFrame:
    """Real image decode requires PIL/opencv — not available in this
    container.  The feature path users need is extract_features(); raw
    pixel decode is explicitly unimplemented."""
    raise NotImplementedError(
        "image decoding needs PIL/opencv (not in this environment); "
        "use extract_features(decoder=...) with a real codec in production")


def media_stats(df: DataFrame) -> DataFrame:
    """Metadata-only aggregate — must never touch `payload` (verify with
    .explain: ReadSchema excludes the binary column)."""
    return (df.groupBy("media_type")
            .agg(F.count("*").alias("n"),
                 F.avg(F.element_at("meta", "width").cast("double")).alias("avg_width")))
