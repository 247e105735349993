"""Multimodal queries: binary payload + metadata pipeline over assets
synthesized deterministically from ``documents`` (see
operators/multimodal.py). Everything except the codec UDF stage is
plain SQL, so inventory / resize / frame-sample are oracle-checked;
the mapInPandas decode+featurize stage is rows-only (Python UDF, not
SQL-expressible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_olap_engine_spark.operators import multimodal as M
from gpu_olap_engine_spark.queries import register
from gpu_olap_engine_spark.queries.tables import T

# doc_id % 3 -> modality, payload = utf-8 text bytes (synth_assets twin)
_ASSETS = """
assets AS (
    SELECT doc_id AS asset_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                ELSE 'video' END AS modality,
           octet_length(encode(text)) AS n_bytes,
           n_chars % 1920 + 1 AS width,
           n_chars % 1080 + 1 AS height,
           n_chars * 10 AS duration_ms
    FROM documents
)
"""


@register(
    "mm_inventory",
    oracle=f"""
    WITH {_ASSETS}
    SELECT modality, COUNT(*) AS n_assets,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           CAST(MAX(width) AS BIGINT) AS max_width
    FROM assets GROUP BY modality
    """,
)
def mm_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asset inventory over binary columns: modality counts, payload
    bytes, metadata extrema — the catalog pass of a multimodal
    pipeline (binary columns are representable-for-free in Spark; the
    reference rejects them, schema_utils.rs:29-33)."""
    assets = M.synth_assets(T(spark, sf_dir, "documents"))
    return assets.groupBy("modality").agg(
        F.count("*").alias("n_assets"),
        F.sum(F.length("data")).cast("long").alias("total_bytes"),
        F.max("width").cast("long").alias("max_width"),
    )


@register(
    "mm_resize_plan",
    oracle=f"""
    WITH {_ASSETS}
    SELECT asset_id,
           CAST(width AS BIGINT) AS width,
           CAST(height AS BIGINT) AS height,
           CAST(greatest(floor(width * least(224.0 / width, 224.0 / height, 1.0)), 1)
                AS BIGINT) AS target_w,
           CAST(greatest(floor(height * least(224.0 / width, 224.0 / height, 1.0)), 1)
                AS BIGINT) AS target_h
    FROM assets WHERE modality = 'image'
    """,
)
def mm_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize planning (metadata arithmetic,
    JVM-side; the pixel transform itself is the stubbed codec UDF)."""
    assets = M.synth_assets(T(spark, sf_dir, "documents"))
    return M.resize_images(assets).select(
        "asset_id",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        "target_w",
        "target_h",
    )


@register(
    "mm_frame_sample",
    oracle=f"""
    WITH {_ASSETS}
    SELECT asset_id, CAST(unnest(generate_series(0, duration_ms - 1, 1000)) AS BIGINT)
               AS frame_ts_ms
    FROM assets WHERE modality = 'video'
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan: one row per 1000 ms sample point
    (explode of a sequence — narrow, shuffle-free)."""
    assets = M.synth_assets(T(spark, sf_dir, "documents"))
    return M.sample_frames(assets, every_ms=1000).select(
        "asset_id", F.col("frame_ts_ms").cast("long").alias("frame_ts_ms")
    )


@register(
    "mm_decode_features",
    # Oracle of the deterministic fake decode: decoded payload =
    # sha256(data)*4 (operators.multimodal._decode_stub), feature[i] =
    # count(decoded byte % 16 == i) / 128. The *4 repeat cancels under
    # L1 normalization, so feature[i] = (digest bytes with low nibble
    # i) / 32 — and a byte's low nibble is the even-position hex char
    # of DuckDB's sha256() hex string. h/32 is a dyadic rational,
    # exact in float32 and double, so %.6f renders identically.
    oracle="""
    WITH a AS (
        SELECT doc_id AS asset_id,
               CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                    ELSE 'video' END AS modality,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               sha256(text) AS hx
        FROM documents
    ),
    n AS (
        SELECT asset_id, modality, n_bytes,
               list_transform(generate_series(1, 32),
                              j -> substr(hx, 2 * CAST(j AS INTEGER), 1)) AS nibs
        FROM a
    )
    SELECT asset_id, modality, n_bytes,
           array_to_string(
               list_transform(
                   ['0','1','2','3','4','5','6','7',
                    '8','9','a','b','c','d','e','f'],
                   d -> printf('%.6f',
                               CAST(len(list_filter(nibs, x -> x = d)) AS DOUBLE)
                               / 32.0)
               ), ',') AS feature_csv
    FROM n
    """,
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas decode + featurize (codec stubbed —
    deterministic fake decode; see operators.multimodal._decode_stub).
    The stub's digest arithmetic is mirrored in the DuckDB oracle, so
    this Python stage is value-checked, not rows-only. The array<float>
    feature vector is emitted as a fixed-precision CSV string so the
    harness's canonical sort (pandas sort_values over all columns) has
    hashable, totally-ordered cells; the array-typed stage stays
    available via operators.multimodal.decode_and_featurize."""
    # no spread: Python-worker spin-up per partition dominates at this
    # payload size; real deployments inherit parallelism from input
    # splits.
    assets = M.synth_assets(T(spark, sf_dir, "documents"))
    decoded = M.decode_and_featurize(assets)
    feature_csv = F.concat_ws(
        ",", F.transform("feature", lambda x: F.format_string("%.6f", x))
    )
    return decoded.select(
        "asset_id", "modality", "n_bytes", feature_csv.alias("feature_csv")
    )


@register(
    "mm_exact_dedup",
    oracle="""
    WITH hashed AS (
        SELECT doc_id AS asset_id, sha256(text) AS content_sha
        FROM documents
    )
    SELECT content_sha,
           COUNT(*) AS n_copies,
           MIN(asset_id) AS canonical_asset,
           CAST(MAX(asset_id) AS BIGINT) AS newest_asset
    FROM hashed
    GROUP BY content_sha
    """,
)
def mm_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed exact dedup over BINARY payloads: sha-256 each
    asset's bytes JVM-side (F.sha2 — no Python boundary), group by
    digest, elect the lowest asset_id as canonical, report every
    content group (n_copies > 1 marks duplicates; emitting singletons
    too makes the gate value-check EVERY digest across engines, not
    just the few planted dups). This is how image/audio stores dedup at 100 TB: the
    digest shuffle carries 32-byte keys instead of payloads, and the
    payload column never leaves the scan (column pruning drops it
    after the hash projection). Both engines emit lowercase hex, so
    the digest strings compare bit-exactly."""
    assets = M.synth_assets(T(spark, sf_dir, "documents"))
    return (
        assets.select(
            F.col("asset_id"), F.sha2(F.col("data"), 256).alias("content_sha")
        )
        .groupBy("content_sha")
        .agg(
            F.count("*").alias("n_copies"),
            F.min("asset_id").alias("canonical_asset"),
            F.max("asset_id").alias("newest_asset"),
        )
    )


@register(
    "mm_chunk_manifest",
    oracle="""
    WITH c AS (
        SELECT doc_id AS asset_id,
               CAST(i AS BIGINT) AS chunk_idx,
               substring(text, CAST(i * 64 + 1 AS BIGINT), 64) AS chunk
        FROM documents, unnest(generate_series(
            0, CAST(ceil(length(text) / 64.0) AS BIGINT) - 1
        )) AS t(i)
    )
    SELECT asset_id, chunk_idx,
           CAST(strlen(chunk) AS BIGINT) AS n_bytes,
           sha256(chunk) AS chunk_sha
    FROM c
    """,
)
def mm_chunk_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed chunk manifest over BINARY payloads: each
    asset split into fixed 64-char chunks (64 KB byte chunks in
    production; DuckDB's substring is VARCHAR-only so the shared
    oracle chunks characters and digests the UTF-8 bytes of each) — the dedup
    storage / rsync-style transfer-planning primitive for a 100 TB
    multimodal lake: identical chunks across assets share one blob,
    and a changed asset re-uploads only changed chunks. The split is
    a JVM-side transform (no UDF — one output row per CHUNK), so the
    shuffle-free plan reads payloads once; the digests are the same engine-native
    sha-256 pair as mm_exact_dedup (reference analog: none — the
    reference has no binary surface; LLM-pipeline mandate)."""
    docs = T(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.posexplode(
            # the if() guards zero-length text: Spark's sequence(0, -1)
            # yields the DESCENDING array [0, -1] (two empty-chunk
            # rows) where DuckDB's generate_series(0, -1) is empty —
            # an empty asset must produce zero manifest rows on both
            F.expr(
                "transform(if(length(text) > 0,"
                " sequence(0, int(ceil(length(text) / 64.0)) - 1),"
                " array()),"
                " i -> substring(text, i * 64 + 1, 64))"
            )
        ).alias("chunk_idx", "chunk"),
    ).select(
        "asset_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.length(F.encode(F.col("chunk"), "UTF-8")).cast("long").alias(
            "n_bytes"
        ),
        F.sha2(F.encode(F.col("chunk"), "UTF-8"), 256).alias("chunk_sha"),
    )
