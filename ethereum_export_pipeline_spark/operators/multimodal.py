"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video travel as `binary` columns with a struct of typed
metadata next to them. The Spark-side plumbing — schema, batch shape,
`mapInPandas` signatures, partition sizing — is real and tested; the
actual media decode is STUBBED (`_decode_image_stub`) because codec
libraries are not in this environment: it derives deterministic fake
"pixels"/features from the bytes so the pipeline shape is exercised
end-to-end. Swap the stub for PIL/torchaudio/decord in production.

Scale notes: binary payloads dominate row size, so feature extraction
uses `mapInPandas` (Arrow batches, zero row-at-a-time serde) and
`spark.sql.files.maxPartitionBytes` should be sized so one batch of
payloads fits executor memory (e.g. 64 MB batches of ~1 MB images).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("format", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ])),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    # DOUBLE, deliberately: the hash check reconstructs exact integer
    # bucket counts as round(feature[b] * n_bytes), which is lossless
    # for b < 2^51 under float64 but breaks at b ≥ ~2^23 under float32
    # (24-bit mantissa) — i.e. any ~8 MiB payload concentrated in one
    # bucket would silently flap the cross-engine hash
    T.StructField("feature", T.ArrayType(T.DoubleType())),
])


def documents_as_media(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Make an opaque-binary media table out of the documents fixture:
    payload = utf-8 bytes, metadata struct alongside — the canonical
    multimodal column layout."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("format"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
        ).alias("meta"),
    )


def _decode_image_stub(payload: bytes | None) -> list[float] | None:
    """Deterministic fake 'decode': 8 byte-histogram features.
    Production would decode real pixels here (PIL/torchaudio/decord —
    not in this environment, so this stub keeps the pipeline shape
    real). NULL payload → NULL feature, never an exception: one bad
    row must not fail a 100 TB job."""
    if payload is None:
        return None
    buckets = [0] * 8
    for byte in payload:
        buckets[byte >> 5] += 1
    total = max(len(payload), 1)
    return [b / total for b in buckets]


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over the binary column via
    mapInPandas — the real multimodal hot path shape."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "n_bytes": pdf["payload"].map(
                    lambda b: 0 if b is None else len(b)).astype("int64"),
                "feature": pdf["payload"].map(_decode_image_stub),
            })
    return media.mapInPandas(run, FEATURE_SCHEMA)


def resize_media(media: DataFrame, target_w: int = 64,
                 target_h: int = 64) -> DataFrame:
    """Resize plumbing: binary in → binary out with updated metadata,
    Arrow-batched. The pixel resample is STUBBED (no codec libs in this
    environment): payload is deterministically resampled at the byte
    level to the target 'pixel' count so batch shapes, output sizes and
    metadata math are real. Swap the inner function for PIL in
    production."""
    n_out = target_w * target_h

    import numpy as np
    base_idx = np.arange(n_out)

    def _resample(payload: bytes | None) -> bytes | None:
        if payload is None:
            return None
        if len(payload) == 0:
            return b"\x00" * n_out
        # vectorized byte gather (a Python per-byte loop here costs
        # n_out iterations PER ROW — the classic Pandas-UDF hot-path
        # mistake this module exists to avoid)
        step = max(len(payload) // n_out, 1)
        idx = np.minimum(base_idx * step, len(payload) - 1)
        return np.frombuffer(payload, dtype=np.uint8)[idx].tobytes()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf["payload"].map(_resample)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "payload": out,
                "width": target_w, "height": target_h,
                "n_bytes": out.map(lambda b: 0 if b is None else len(b))
                              .astype("int64"),
            })

    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ])
    return media.mapInPandas(run, schema)


def sample_frames(media: DataFrame, n_frames: int = 4,
                  frame_bytes: int = 256) -> DataFrame:
    """Frame-sampling plumbing for video-shaped payloads: one output
    row per sampled frame (media_id, frame_idx, frame payload) —
    the 1→N row fan-out shape mapInPandas must produce for video.
    Frame extraction is STUBBED as evenly-spaced byte windows; swap for
    a real demuxer (decord/pyav) in production."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None or len(payload) == 0:
                    continue
                stride = max(len(payload) // n_frames, 1)
                for i in range(min(n_frames, len(payload))):
                    off = i * stride
                    ids.append(mid); idxs.append(i)
                    frames.append(bytes(payload[off:off + frame_bytes]))
            yield pd.DataFrame({"media_id": pd.Series(ids, dtype="int64"),
                                "frame_idx": pd.Series(idxs, dtype="int64"),
                                "frame": frames if frames else
                                         pd.Series([], dtype=object)})

    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ])
    return media.mapInPandas(run, schema)


def binary_stats(media: DataFrame, format_col: str = "meta.format") -> DataFrame:
    """Oracle-checkable part of the multimodal surface: pure byte-level
    accounting over the binary column (no decode)."""
    return (
        media.groupBy(F.col(format_col).alias("format"))
             .agg(F.count(F.lit(1)).alias("n_items"),
                  F.sum(F.octet_length("payload")).cast("long").alias("total_bytes"),
                  F.max(F.octet_length("payload")).cast("long").alias("max_bytes"),
                  F.min(F.octet_length("payload")).cast("long").alias("min_bytes"))
    )
