"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over ``robi_biometric_qdrant_vector_db_service_spark.workload.REGISTRY`` — one entry per
operator from SURVEY.md §2, each with a DuckDB oracle unless genuinely
non-SQL-expressible (those run a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from robi_biometric_qdrant_vector_db_service_spark.workload import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §7 phase 1): filtered top-k cosine search over
    the sf0.001 embeddings corpus — the Spark restatement of the reference's
    ``POST /api/v1/vectors/search`` (src/core/qdrant_client.py:311-405)."""
    return REGISTRY["knn_topk"].run(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.run for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
