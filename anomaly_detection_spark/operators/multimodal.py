"""Multimodal (image/audio/video) column handling for training-data
pipelines: opaque ``binary`` payload columns with typed metadata,
processed by Arrow-batched ``mapInPandas`` stages.

The Spark-side plumbing — schema, batching, partition sizing, UDF
signatures — is real and tested; the actual codec step is STUBBED
(this container has no image/audio libraries): ``decode_media`` uses
PIL/soundfile when importable, otherwise a clearly-marked deterministic
fake derived from the payload bytes. Swapping in a real codec changes
ONE function, not the pipeline.

Scale notes:
- media bytes never pass through a shuffle: every stage below is a
  mapInPandas projection (narrow dependency); aggregations happen on
  the small extracted-feature columns AFTER the bytes are dropped.
- batch size is bounded by spark.sql.execution.arrow.maxRecordsPerBatch
  (set in session.py) so a partition of large blobs streams through
  the Python worker in bounded memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_ref string, kind string, payload binary, meta map<string,string>"
)

DECODED_SCHEMA = (
    "media_ref string, kind string, width int, height int, n_frames int, "
    "sample_rate int, duration_ms int, decode_ok boolean"
)

FEATURE_DIM = 64
FEATURE_SCHEMA = f"media_ref string, kind string, feature array<float>"

_HAVE_PIL = False
try:  # pragma: no cover - not installed in this environment
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except Exception:
    pass


def synthetic_media(spark, documents: DataFrame, payload_bytes: int = 256) -> DataFrame:
    """Deterministic fake media table for the media_refs used by a
    documents table: payload = repeated sha2 of the ref (stands in for
    real bytes; sizes/types derivable from the ref hash)."""
    refs = (
        documents.select(F.explode("spans").alias("s"))
        .filter((F.col("s.kind") == "media") & F.col("s.media_ref").isNotNull() & (F.col("s.media_ref") != ""))
        .select(F.col("s.media_ref").alias("media_ref"))
        .distinct()
    )
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64("media_ref"), F.lit(3)) + 1).cast("int"),
    )
    reps = payload_bytes // 32 + 1
    payload = F.substring(
        F.concat(*[F.sha2(F.concat(F.col("media_ref"), F.lit(str(i))), 256) for i in range(reps // 2 + 1)]),
        1,
        payload_bytes,
    ).cast("binary")
    return refs.select(
        "media_ref",
        kind.alias("kind"),
        payload.alias("payload"),
        F.create_map(F.lit("source"), F.lit("synthetic")).alias("meta"),
    )


def _stub_decode(ref: str, kind: str, payload: bytes) -> dict:
    """STUB decode: deterministic pseudo-metadata from the payload hash.

    Real deployment: replace with PIL.Image.open / soundfile.read /
    pyav frame probing. Marked NotImplemented for real-codec fidelity.
    """
    h = hashlib.sha256(payload or b"").digest()
    w = 64 + h[0] % 192 * 16
    ht = 64 + h[1] % 108 * 16
    if kind == "image":
        return dict(width=w, height=ht, n_frames=1, sample_rate=None, duration_ms=None, decode_ok=True)
    if kind == "audio":
        return dict(width=None, height=None, n_frames=None, sample_rate=8000 + (h[2] % 5) * 8000, duration_ms=500 + h[3] * 40, decode_ok=True)
    if kind == "video":
        return dict(width=w, height=ht, n_frames=16 + h[4] % 240, sample_rate=None, duration_ms=1000 + h[5] * 200, decode_ok=True)
    return dict(width=None, height=None, n_frames=None, sample_rate=None, duration_ms=None, decode_ok=False)


def decode_media(media: DataFrame) -> DataFrame:
    """Decode/probe stage: binary payload → typed metadata, via
    mapInPandas (one Python call per Arrow batch, bytes never shuffled)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [
                {"media_ref": r.media_ref, "kind": r.kind, **_stub_decode(r.media_ref, r.kind, r.payload)}
                for r in pdf.itertuples()
            ]
            yield pd.DataFrame(rows, columns=["media_ref", "kind", "width", "height", "n_frames", "sample_rate", "duration_ms", "decode_ok"])

    return media.mapInPandas(batches, DECODED_SCHEMA)


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Feature-extraction stage: payload → fixed-dim float vector.

    STUB embedding: vectorized numpy fold of the payload bytes into
    ``dim`` buckets, L2-normalized — deterministic, shape-correct, and
    exercises the exact Arrow path a real encoder (CLIP/wav2vec) would.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(payload or b"\x00", dtype=np.uint8).astype(np.float32)
                pad = (-len(arr)) % dim
                if pad:
                    arr = np.pad(arr, (0, pad))
                v = arr.reshape(-1, dim).sum(axis=0)
                n = float(np.linalg.norm(v))
                feats.append((v / n if n > 0 else v).astype(np.float32).tolist())
            yield pd.DataFrame(
                {"media_ref": pdf["media_ref"], "kind": pdf["kind"], "feature": feats}
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def resize_images(media: DataFrame, target_w: int = 224, target_h: int = 224) -> DataFrame:
    """Resize stage (images only). STUB: passes payload through and
    records the target dims in meta — the real implementation is a
    PIL resize inside the same mapInPandas shape."""
    if _HAVE_PIL:  # pragma: no cover
        raise NotImplementedError("real PIL resize path not exercised in this sandbox")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            pdf["meta"] = [
                {**(m or {}), "resized_to": f"{target_w}x{target_h}", "resize": "stub"}
                for m in pdf["meta"]
            ]
            yield pdf

    return media.filter(F.col("kind") == "image").mapInPandas(batches, MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 8) -> DataFrame:
    """Frame-sampling stage (videos): one output row per sampled frame
    index — the explode-shaped stage a video pipeline needs. Frame
    count comes from the decode stage; payload slicing is stubbed as
    byte-range metadata."""
    decoded = decode_media(media.filter(F.col("kind") == "video"))
    return decoded.select(
        "media_ref",
        F.explode(F.sequence(F.lit(0), F.greatest((F.col("n_frames") - 1) / every_n, F.lit(0)).cast("int"))).alias("sample_idx"),
        (F.col("n_frames")).alias("n_frames"),
    ).select(
        "media_ref",
        (F.col("sample_idx") * every_n).alias("frame_idx"),
        "n_frames",
    )


def media_quality_verdicts(media: DataFrame, min_w: int = 32, min_h: int = 32) -> DataFrame:
    """Per-kind quality verdict over decoded metadata: Unhealthy iff any
    decode failed or an image is under the minimum dimensions —
    aggregation happens on the small decoded columns, never the bytes."""
    d = decode_media(media)
    bad = F.when(
        ~F.col("decode_ok")
        | ((F.col("kind") == "image") & ((F.col("width") < min_w) | (F.col("height") < min_h))),
        1,
    ).otherwise(0)
    return (
        d.groupBy("kind")
        .agg(F.count(F.lit(1)).alias("n_assets"), F.sum(bad).alias("n_bad"))
        .select(
            "kind",
            "n_assets",
            "n_bad",
            F.when(F.col("n_bad") > 0, F.lit("Unhealthy")).otherwise(F.lit("Healthy")).alias("status"),
        )
    )
