"""Leaf-module text constants shared by the workload registries.

Hoisted out of ``workload_text`` so that ``workload_pipeline`` (whose
registrations run at import time, mid-way through the registry root's
submodule imports) never has to import a sibling workload module — doing
so made `import robi_biometric_qdrant_vector_db_service_spark.workload_text` fail when it
was the FIRST module imported (circular: workload_text -> workload ->
workload_pipeline -> workload_text, still partially initialized).

This module imports nothing from the package, so it is always safe.
"""

from __future__ import annotations

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "for")

# DuckDB/Spark-SQL literal list for `t IN (...)` membership tests.
STOP_SQL = "('" + "', '".join(STOPWORDS) + "')"
