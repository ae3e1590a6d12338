"""Q1–Q4: the reference's query surface as Spark plans.

- Q1 filtered top-k cosine search   (src/core/qdrant_client.py:311-405)
- Q2 weighted multi-vector fusion   (src/core/advanced_indexing.py:280-348)
- Q3 verify, 1:1                    (api_spec.md:478-502 — spec-only upstream)
- Q4 detect/identify, 1:N           (api_spec.md:504-528 — spec-only upstream)

Plan shape (scale rationale)
----------------------------
The corpus side is the 100 TB side; the query side is small by construction
(a search request batch).  So every search is:

    scan(corpus)  --pushed-down filters-->  crossJoin(broadcast(queries))
        → project(score)  → filter(score ≥ t)  → per-query top-k

* The broadcast means the corpus is never shuffled for scoring — each corpus
  partition scores all queries locally (one pass, map-side).
* The score-threshold filter runs BEFORE the top-k window, so the only
  shuffle (partition by q_id for ranking) carries the surviving candidates,
  not Q×N rows.  With AQE the post-filter exchange coalesces.
* Ties broken by ``vec_id`` so top-k is deterministic (SURVEY §7 risk 2 —
  the reference inherits Qdrant's internal tie order; we pin ours).
* For corpora above ``plans.strategy.FULL_SCAN_THRESHOLD`` the ANN path
  (operators.ann) pre-buckets candidates; this module is the exact engine
  that also serves as the ANN recall oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import cosine_sql

DEFAULT_SCORE_THRESHOLD = 0.65  # settings.similarity_threshold (settings.py:22)
MAX_K = 100  # SearchRequest bound (src/api/schemas.py:64)


def validate_search_args(k: int, score_threshold: float | None) -> None:
    """P7 request-validation predicates (src/api/schemas.py:61-72): the
    reference's Pydantic bounds enforced at plan-build time — the engine's
    analyzer stage."""
    if not 1 <= k <= MAX_K:
        raise ValueError(f"k must be in [1, {MAX_K}], got {k}")
    if score_threshold is not None and not 0.0 <= score_threshold <= 1.0:
        raise ValueError(f"score_threshold must be in [0, 1], got {score_threshold}")


def score_pairs(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    corpus_vec: str = "embedding",
    query_vec: str = "q_emb",
) -> DataFrame:
    """Cross-score every (corpus row × query row) with cosine similarity.

    Query side is broadcast (small); scoring stays in whole-stage codegen.
    """
    return corpus.crossJoin(F.broadcast(queries)).withColumn(
        "score", F.expr(cosine_sql(corpus_vec, query_vec))
    )


def knn_search(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    *,
    score_threshold: float | None = None,
    label_filter: list | None = None,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "q_id",
    query_vec: str = "q_emb",
) -> DataFrame:
    """Q1: per-query top-k by cosine, optional keyword filter + threshold.

    Mirrors qdrant_client.py:311-405: (1) predicate pushdown of the keyword
    filter (P1/P2 — reaches the parquet scan), (2) similarity projection
    (F2), (3) ``score >= threshold`` (P5, qdrant_client.py:372), (4) top-k
    per query (T1) via row_number window, deterministic vec_id tiebreak.

    Returns: (q_id, vec_id, rank, score) — score rounded to 6dp for stable
    cross-engine comparison; ranking uses the unrounded value.
    """
    validate_search_args(k, score_threshold)
    if label_filter is not None:
        corpus = corpus.filter(F.col("label").isin(label_filter))
    scored = score_pairs(corpus, queries, corpus_vec=corpus_vec, query_vec=query_vec)
    if score_threshold is not None:
        scored = scored.filter(F.col("score") >= float(score_threshold))
    w = Window.partitionBy(query_id).orderBy(F.desc("score"), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col(query_id),
            F.col(corpus_id),
            F.col("rank"),
            F.round("score", 6).alias("score"),
        )
    )


def fusion_search(
    corpus: DataFrame,
    weighted_queries: DataFrame,
    k: int = 10,
    *,
    per_query_k: int | None = None,
    corpus_id: str = "vec_id",
) -> DataFrame:
    """Q2: weighted multi-vector fusion (advanced_indexing.py:280-348).

    Per query vector: top ``2k`` candidates (the reference searches ``k*2``,
    advanced_indexing.py:306-311); then per candidate point:
    ``score = Σ weight_i · score_i`` and ``votes = #queries retrieving it``
    (:313-328); composite order (score desc, votes desc) limit k (:330-335).

    ``weighted_queries``: (q_id, q_emb, weight).
    Returns: (vec_id, fused_score, votes).
    """
    per_query_k = per_query_k or 2 * k
    hits = knn_search(corpus, weighted_queries.select("q_id", "q_emb"), per_query_k, corpus_id=corpus_id)
    hits = hits.join(F.broadcast(weighted_queries.select("q_id", "weight")), "q_id")
    fused = (
        hits.groupBy(corpus_id)
        .agg(
            F.round(F.sum(F.col("score") * F.col("weight")), 6).alias("fused_score"),
            F.count("*").alias("votes"),
        )
        .orderBy(F.desc("fused_score"), F.desc("votes"), F.col(corpus_id))
        .limit(k)
    )
    return fused


def verify(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    threshold: float = DEFAULT_SCORE_THRESHOLD,
    query_id: str = "q_id",
    query_label: str = "claim_label",
) -> DataFrame:
    """Q3 (1:1): restrict the corpus to the claimed identity, compare the
    best score against the threshold (api_spec.md:478-502).

    ``queries``: (q_id, q_emb, claim_label).
    Returns: (q_id, best_score, verified).
    """
    scored = corpus.join(
        F.broadcast(queries), F.col("label") == F.col(query_label), "inner"
    ).withColumn("score", F.expr(cosine_sql("embedding", "q_emb")))
    return (
        scored.groupBy(query_id)
        .agg(F.round(F.max("score"), 6).alias("best_score"))
        .withColumn("verified", F.col("best_score") >= F.lit(threshold))
        .select(query_id, "best_score", "verified")
    )


def detect(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    *,
    candidate_k: int = 50,
    query_id: str = "q_id",
) -> DataFrame:
    """Q4 (1:N identify): top-k candidate identities per probe with the best
    score per identity as confidence (api_spec.md:504-528; k ≤ 50).

    Candidate top-``candidate_k`` per probe, then per-identity best score,
    ranked; deterministic label tiebreak.
    Returns: (q_id, label, confidence, rank).
    """
    hits = knn_search(corpus, queries, candidate_k, query_id=query_id)
    with_label = hits.join(corpus.select("vec_id", "label"), "vec_id")
    w = Window.partitionBy(query_id).orderBy(F.desc("confidence"), F.col("label"))
    return (
        with_label.groupBy(query_id, "label")
        .agg(F.max("score").alias("confidence"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, "label", F.round("confidence", 6).alias("confidence"), "rank")
    )
