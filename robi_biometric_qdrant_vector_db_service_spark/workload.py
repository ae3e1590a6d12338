"""Workload registry: every operator from SURVEY.md §2 as a named query.

Each entry pairs
- ``run(spark, sf_dir) -> DataFrame``   the Spark implementation, and
- ``oracle``                            equivalent ANSI SQL for DuckDB
                                        (None → driver does a rows-only check)

`__spark_entry__.py` re-exports this registry to the driver.  Column names
and rounding are aligned on both sides so the driver's order-insensitive
value-hash matches exactly (see FIXTURES.md "Oracle notes").

Float-parity policy (SURVEY §7 risk 1):
- dot products: DOUBLE left-fold on both sides (bit-identical), rounded 6dp
  at the output boundary only;
- large additive aggregates: accumulate in DECIMAL (exact, order-independent
  → immune to Spark's nondeterministic partial-agg order), cast to DOUBLE at
  the end;
- top-k: deterministic id tiebreaks everywhere (risk 2).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.vector import cosine_sql, norm_sql
from .operators import search as S
from .sources.catalog import load_table

# Number of probe vectors used by the vector-query fixtures (the reference's
# "request batch"): small by construction, broadcast to the corpus side.
N_QUERIES = 8


@dataclass(frozen=True)
class QuerySpec:
    run: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: Optional[str]):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(run=fn, oracle=oracle)
        return fn

    return deco


def _probes(spark: SparkSession, sf_dir: str, n: int = N_QUERIES) -> DataFrame:
    """The query batch: first ``n`` corpus vectors (deterministic fixture,
    mirrors the reference's self-retrieval smoke, scripts/simple_test.py:121-148)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )


# SQL fragments shared by the DuckDB oracles --------------------------------

_DDOT = "list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"


def _dcos(a: str, b: str) -> str:
    dot = _DDOT.format(a=a, b=b)
    na = f"greatest(sqrt({_DDOT.format(a=a, b=a)}), 1e-12)"
    nb = f"greatest(sqrt({_DDOT.format(a=b, b=b)}), 1e-12)"
    return f"({dot} / ({na} * {nb}))"


_ORACLE_SCORED = f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < {N_QUERIES}
),
scored AS (
  SELECT q.q_id, e.vec_id, {_dcos('e.embedding', 'q.q_emb')} AS score
  FROM embeddings e CROSS JOIN q
)
"""


# ---------------------------------------------------------------------------
# Q1 — filtered top-k cosine search (qdrant_client.py:311-405)
# ---------------------------------------------------------------------------

@register(
    "knn_topk",
    _ORACLE_SCORED
    + """
, ranked AS (
  SELECT q_id, vec_id, score,
         row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank
  FROM scored
)
SELECT q_id, vec_id, CAST(rank AS INT) AS rank, round(score, 6) AS score
FROM ranked WHERE rank <= 10
""",
)
def knn_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = load_table(spark, sf_dir, "embeddings")
    return S.knn_search(corpus, _probes(spark, sf_dir), k=10)


@register(
    "knn_filtered",
    f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < {N_QUERIES}
),
scored AS (
  SELECT q.q_id, e.vec_id, {_dcos('e.embedding', 'q.q_emb')} AS score
  FROM embeddings e CROSS JOIN q
  WHERE e.label IN (2, 5)
),
ranked AS (
  SELECT q_id, vec_id, score,
         row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank
  FROM scored WHERE score >= 0.0
)
SELECT q_id, vec_id, CAST(rank AS INT) AS rank, round(score, 6) AS score
FROM ranked WHERE rank <= 5
""",
)
def knn_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 + P1/P2 keyword filter + P5 threshold (qdrant_client.py:354-374).

    The label filter is pushed into the parquet scan (PushedFilters), the
    threshold prunes candidates before the ranking shuffle."""
    corpus = load_table(spark, sf_dir, "embeddings")
    return S.knn_search(
        corpus, _probes(spark, sf_dir), k=5, score_threshold=0.0, label_filter=[2, 5]
    )


# ---------------------------------------------------------------------------
# F1 — L2 normalize (gpu_optimizer.py:81-124); norm audit of the corpus
# ---------------------------------------------------------------------------

@register(
    "vector_norms",
    """
SELECT
  CAST(count(*) AS BIGINT) AS n,
  round(min(nrm), 6) AS min_norm,
  round(max(nrm), 6) AS max_norm,
  round(CAST(sum(CAST(round(nrm, 9) AS DECIMAL(18, 9))) AS DOUBLE) / count(*), 6) AS avg_norm
FROM (
  SELECT sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
  FROM embeddings
)
""",
)
def vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Norm audit: the reference stores unit vectors (normalize-at-write,
    qdrant_client.py:200-202); this checks ||x||≈1 corpus-wide.  The mean is
    accumulated in DECIMAL so the parallel sum is order-independent."""
    emb = load_table(spark, sf_dir, "embeddings")
    nrm = emb.select(F.expr(norm_sql("embedding")).alias("nrm"))
    return nrm.agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(F.min("nrm"), 6).alias("min_norm"),
        F.round(F.max("nrm"), 6).alias("max_norm"),
        F.round(
            F.sum(F.round(F.col("nrm"), 9).cast("decimal(18,9)")).cast("double")
            / F.count("*"),
            6,
        ).alias("avg_norm"),
    )
