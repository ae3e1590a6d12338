"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over ``robi_biometric_qdrant_vector_db_service_spark.workload.REGISTRY`` — one entry per
operator from SURVEY.md §2, each with a DuckDB oracle unless genuinely
non-SQL-expressible (those run a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from robi_biometric_qdrant_vector_db_service_spark.workload import FRONT_QUERIES, REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §7 phase 1): filtered top-k cosine search over
    the sf0.001 embeddings corpus — the Spark restatement of the reference's
    ``POST /api/v1/vectors/search`` (src/core/qdrant_client.py:311-405)."""
    return REGISTRY["knn_topk"].run(spark, "/root/testdata/sf0.001")


def _ordered() -> list[str]:
    # FRONT_QUERIES rotates per round by recording provenance (never
    # driver-recorded first, then changed-this-round, then stalest rows) so
    # the driver's 50-row correctness window cycles through the registry;
    # the rest keep registry order and are covered by the committed local
    # oracle replica (CORRECTNESS_LOCAL_r{N}.json)
    return FRONT_QUERIES + [n for n in REGISTRY if n not in FRONT_QUERIES]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: REGISTRY[name].run for name in _ordered()}


def oracle_sql() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle
        for name in _ordered()
        if REGISTRY[name].oracle is not None
    }
