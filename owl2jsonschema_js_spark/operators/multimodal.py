"""Multimodal column plumbing: image/audio/video as opaque `binary` columns
with typed metadata.

The decode step is STUBBED (no image/audio libraries in this container):
`decode_stub=True` (default) runs a deterministic fake featurizer so the
Spark-side plumbing — schema, Arrow batch shape, mapInPandas signature,
partitioning — is real and tested; `decode_stub=False` raises
NotImplementedError where a real decoder (PIL/torchaudio/ffmpeg) would plug in.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)

FEATURES_SCHEMA = ("media_id long, kind string, n_bytes long, byte_sum long, "
                   "feature array<float>")


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table in the canonical multimodal shape.

    Every derived field is a pure arithmetic function of the row id (no
    engine-specific hash), so an independent SQL oracle can reproduce the
    table exactly — kind = id%3, n_frames = (id*37+11)%300+1, payload =
    4x-repeated sha256 hex of 'm<id>' (256 bytes)."""
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(kinds, (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int")).alias("kind"),
        # payload: deterministic pseudo-bytes (sha of the id, repeated)
        F.encode(F.repeat(F.sha2(F.concat(F.lit("m"), F.col("id")), 256), 4), "utf-8").alias("payload"),
        F.struct(
            (F.pmod(F.col("id") * 7, F.lit(512)) + 16).cast("int").alias("width"),
            (F.pmod(F.col("id") * 13, F.lit(512)) + 16).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.pmod(F.col("id") * 37 + 11, F.lit(300)) + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )
    return df


def extract_features(media: DataFrame, feat_dim: int = 16,
                     decode_stub: bool = True) -> DataFrame:
    """mapInPandas featurizer: binary payload -> fixed-dim float feature.

    The real path would decode (image resize / audio resample / frame sample)
    here; the stub derives a deterministic feature from payload bytes so batch
    shape, schema, and downstream joins are exercised for real."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires PIL/torchaudio/ffmpeg — not in container")
            feats, sums = [], []
            for payload in pdf["payload"]:
                b = np.frombuffer(payload, dtype=np.uint8)
                sums.append(int(b.astype(np.int64).sum()))
                # deterministic fake embedding: binned byte means
                chunks = np.array_split(b.astype(np.float32), feat_dim)
                feats.append(np.array([c.mean() if c.size else 0.0 for c in chunks],
                                      dtype=np.float32) / 255.0)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                # integer-exact content checksum: lets an independent oracle
                # verify the bytes actually traversed the Arrow batch path
                "byte_sum": pd.Series(sums, dtype="int64"),
                "feature": feats,
            })

    return media.mapInPandas(run, FEATURES_SCHEMA)


FRAMES_SCHEMA = "media_id long, frame_no int, frame_payload binary"


def sample_frames(media: DataFrame, every_n: int = 10,
                  decode_stub: bool = True) -> DataFrame:
    """Frame sampling for video rows: one input row -> ceil(n_frames/every_n)
    frame rows (the 1->N mapInPandas explosion shape a real decoder needs).

    Stub path emits deterministic per-frame pseudo-bytes derived from
    (payload head, frame_no); the real path would seek+decode keyframes via
    ffmpeg. Non-video rows pass through with zero frames."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real frame decode requires ffmpeg — not in container")
            ids, nos, payloads = [], [], []
            vids = pdf[pdf["kind"] == "video"]
            for mid, payload, meta in zip(vids["media_id"], vids["payload"],
                                          vids["meta"]):
                n_frames = int(meta["n_frames"]) if meta is not None else 0
                head = bytes(payload[:8])
                for fno in range(0, n_frames, every_n):
                    ids.append(mid)
                    nos.append(fno)
                    payloads.append(head + fno.to_bytes(4, "big"))
            yield pd.DataFrame({
                "media_id": pd.Series(ids, dtype="int64"),
                "frame_no": pd.Series(nos, dtype="int32"),
                "frame_payload": pd.Series(payloads, dtype=object),
            })

    return media.mapInPandas(run, FRAMES_SCHEMA)
