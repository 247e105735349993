"""gpu_olap_engine_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query surface of the
reference GPU OLAP engine (``/root/reference``, a Rust/CUDA skeleton):
SQL execution over Parquet-backed tables, pandas/Polars interchange,
joins / aggregates / sorts / filters — plus the LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal
plumbing) a 100 TB training-data pipeline needs.

Design stance (see SURVEY.md): the reference's GPU machinery (slab
allocators, PTX JIT, transfer queues) maps onto Spark built-ins
(Tungsten, whole-stage codegen, shuffle); we do NOT rebuild it. Custom
code is confined to the engine facade, the LLM-pipeline operators, and
the differential-oracle test harness.
"""

from gpu_olap_engine_spark.config import EngineConfig
from gpu_olap_engine_spark.engine import OlapEngine

__all__ = ["EngineConfig", "OlapEngine"]
__version__ = "0.1.0"
