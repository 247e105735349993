"""Column-function surface of the engine.

Re-exports the engine's custom column expressions (all built on
pyspark.sql.functions, JVM-side) plus thin sketches/approximation
helpers. The reference has no scalar-function surface at all ("No
string operations in kernels", README.md:412); everything here is
either a pyspark built-in passthrough or a composition documented in
its home module.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from gpu_olap_engine_spark.operators.dedup import base_hash, tokenize
from gpu_olap_engine_spark.operators.similarity import (
    cosine_similarity,
    scaled_dot,
    scaled_norm_sq,
    sign_bucket,
)
from gpu_olap_engine_spark.operators.text import (
    bpe_ish_token_count,
    fingerprint,
    marker_score,
    predict_lang,
    token_count,
)

__all__ = [
    "base_hash",
    "tokenize",
    "cosine_similarity",
    "scaled_dot",
    "scaled_norm_sq",
    "sign_bucket",
    "token_count",
    "bpe_ish_token_count",
    "fingerprint",
    "marker_score",
    "predict_lang",
    "approx_distinct",
    "approx_quantiles",
]


def approx_distinct(col: str | Column, rsd: float = 0.05) -> Column:
    """HyperLogLog++ distinct-count sketch — the 100 TB replacement
    for exact COUNT(DISTINCT) when cardinality is what matters
    (one pass, no shuffle of distinct values)."""
    return F.approx_count_distinct(col, rsd)


def approx_quantiles(col: str | Column, probs: list[float], acc: int = 10000) -> Column:
    """Greenwald-Khanna approximate percentiles (single pass,
    mergeable — scales where exact percentile_disc cannot)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.percentile_approx(c, probs, acc)
