"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Beyond-reference mandate (the reference's type system cannot even
carry binary/list/struct — arrow-interop/src/schema_utils.rs:29-33).
Design: image/audio/video are ``binary`` columns with a modality tag
and a metadata map; decode / feature-extract / resize / frame-sample
run as Arrow-batched ``mapInPandas`` stages (the UDF slow path, used
only where built-ins genuinely cannot express the work).

The actual codec step is STUBBED (no image/audio libs in this
container): ``_decode_stub`` raises NotImplementedError when
``strict`` else produces a deterministic fake decode from the bytes.
Everything around it — schema, batch iteration, partitioning, output
types — is real and tested, so swapping in PIL/librosa later is a
one-function change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MODALITIES = ["image", "audio", "video"]

ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("modality", StringType()),
        StructField("data", BinaryType()),
        StructField("width", LongType()),     # image/video
        StructField("height", LongType()),    # image/video
        StructField("duration_ms", LongType()),  # audio/video
    ]
)

FEATURE_DIM = 16

DECODED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def synth_assets(docs: DataFrame) -> DataFrame:
    """Derive a deterministic multimodal asset table from documents:
    payload = utf-8 bytes of the text, modality by doc_id mod 3,
    metadata derived from n_chars. Stands in for real blobs so the
    plumbing is exercised end-to-end on fixture data."""
    modality = F.element_at(
        F.array(*[F.lit(m) for m in MODALITIES]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        modality.alias("modality"),
        F.encode("text", "utf-8").alias("data"),
        (F.col("n_chars") % 1920 + 1).alias("width"),
        (F.col("n_chars") % 1080 + 1).alias("height"),
        (F.col("n_chars") * 10).alias("duration_ms"),
    )


def _decode_stub(data: bytes, modality: str, strict: bool = False) -> bytes:
    """Codec stub. Real decoders (PIL / soundfile / pyav) are not in
    this container; strict mode makes that explicit, fake mode returns
    a deterministic digest-expanded payload standing in for pixels."""
    if strict:
        raise NotImplementedError(
            f"no {modality} codec available in this environment; "
            "install PIL/soundfile/pyav and replace _decode_stub"
        )
    digest = hashlib.sha256(data).digest()
    return digest * 4  # 128 deterministic pseudo-decoded bytes


def _bytes_feature(data: bytes) -> list[float]:
    """Deterministic FEATURE_DIM-dim feature from a payload: bucketed
    byte histogram, L1-normalized. The stand-in for a real encoder."""
    hist = [0] * FEATURE_DIM
    for b in data:
        hist[b % FEATURE_DIM] += 1
    total = max(sum(hist), 1)
    return [h / total for h in hist]


def decode_and_featurize(assets: DataFrame, strict: bool = False) -> DataFrame:
    """mapInPandas decode + feature-extraction stage.

    Arrow-batched: each pandas batch decodes payloads and emits
    (asset_id, modality, n_bytes, feature). Narrow map — no shuffle;
    at 100 TB this pipelines behind the scan with batch size governed
    by spark.sql.execution.arrow.maxRecordsPerBatch (EngineConfig
    batch_size)."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                _decode_stub(d, m, strict)
                for d, m in zip(pdf["data"], pdf["modality"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(d) for d in pdf["data"]],
                    "feature": [_bytes_feature(d) for d in decoded],
                }
            )

    return assets.mapInPandas(process, DECODED_SCHEMA)


def resize_images(assets: DataFrame, max_w: int = 224, max_h: int = 224) -> DataFrame:
    """Metadata-level resize planning (aspect-preserving target dims).

    The arithmetic is plain SQL (JVM-side); only the pixel transform
    itself would be a UDF — and that is the stubbed codec step."""
    scale = F.least(
        F.lit(max_w) / F.col("width"), F.lit(max_h) / F.col("height"), F.lit(1.0)
    )
    return assets.filter(F.col("modality") == "image").select(
        "asset_id",
        "width",
        "height",
        F.greatest(F.floor(F.col("width") * scale), F.lit(1)).cast("long").alias("target_w"),
        F.greatest(F.floor(F.col("height") * scale), F.lit(1)).cast("long").alias("target_h"),
    )


def sample_frames(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video assets: one row per sampled
    timestamp (explode of a sequence — pure SQL, no UDF)."""
    vids = assets.filter(F.col("modality") == "video")
    stamps = F.sequence(
        F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms)
    )
    return vids.select(
        "asset_id",
        F.explode(stamps).alias("frame_ts_ms"),
    )
