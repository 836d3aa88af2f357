"""Reusable column-expression builders for the LLM-data-pipeline ops.

Everything here emits Spark SQL *expressions* (strings for selectExpr /
Column objects) built from ``pyspark.sql.functions`` and higher-order
array functions — JVM-side, whole-stage-codegen-friendly, no Python
UDFs in any hot path. The one deliberate Python crossing is
``multimodal.extract_features`` (Arrow-batched ``mapInPandas``), which
exists precisely to exercise that surface.

The reference has no function registry at all (SURVEY §2.3: expressions
pass through its rewrite opaquely, optimizer_rules/mod.rs:33-36);
this namespace is driver-mandated LLM-pipeline capability.
"""

from . import dedup, multimodal, similarity, text

__all__ = ["text", "dedup", "similarity", "multimodal"]
