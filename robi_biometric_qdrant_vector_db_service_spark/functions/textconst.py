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

# Tokenize + 3-shingle expression text (Spark SQL | DuckDB SQL twins) —
# hoisted from ``workload_dedup`` (r15, same reason as STOP_SQL's r14
# hoist): ``workload_pipeline``'s module-level import of these made
# `import ...workload_dedup` fail when it was the first module imported
# (circular: workload_dedup -> workload -> workload_pipeline ->
# workload_dedup, still partially initialized).  ``workload_dedup``
# re-exports them, so registry-side call sites are unchanged.

SPARK_TOKENS = "split(text, ' ')"
DUCK_TOKENS = "string_split(text, ' ')"

SPARK_SHINGLES = (
    "CASE WHEN size(toks) >= 3 THEN "
    "array_distinct(transform(sequence(1, size(toks) - 2), i -> concat_ws(' ', slice(toks, i, 3)))) "
    "ELSE array(concat_ws(' ', toks)) END"
)
DUCK_SHINGLES = (
    "CASE WHEN len(toks) >= 3 THEN "
    "list_distinct([array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks) - 1)]) "
    "ELSE [array_to_string(toks, ' ')] END"
)

# DuckDB-oracle cosine fragment (r15 hoist from the registry root — lets
# ``workload_ann`` define ``duck_kmeans_cents_cte`` above its root import,
# which ``workload_dedup``'s SemDeDup oracle calls at registration time).

DDOT = "list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"


def dcos(a: str, b: str) -> str:
    dot = DDOT.format(a=a, b=b)
    na = f"greatest(sqrt({DDOT.format(a=a, b=a)}), 1e-12)"
    nb = f"greatest(sqrt({DDOT.format(a=b, b=b)}), 1e-12)"
    return f"({dot} / ({na} * {nb}))"
