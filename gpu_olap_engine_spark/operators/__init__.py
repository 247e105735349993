"""Custom operators the reference lacks but a 100 TB training-data
pipeline needs: deduplication, similarity search, text analysis,
multimodal column plumbing.

All hot paths are built-in Spark SQL expressions (JVM-side, codegen);
Python appears only in Arrow-batched pandas UDFs where semantics
genuinely require it (multimodal decode stubs).
"""
