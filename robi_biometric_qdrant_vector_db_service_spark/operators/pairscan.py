"""Blocked all-pairs cosine scan (the GEMM form of the N² near-dup oracle).

The naive plan — theta-join on ``v1 < v2`` + a per-pair Catalyst fold — pays
lambda-interpretation cost on every one of N²/2 pairs.  This operator keeps
the same *answers* but restructures the physical plan the way a numeric
engine would (and the way the reference's GPU kernel batches its matrix
product, src/core/gpu_optimizer.py:126-174):

- vectors are grouped into B deterministic blocks (``vec_id % B``);
- block pairs (b1 ≤ b2) fan out to executors — B(B+1)/2 tasks;
- inside each task, Arrow hands NumPy the two blocks and the scores are
  64 vectorized rank-1 accumulations.

Bit-parity guarantee: the accumulation loop ``acc += A[:,i] * B[:,i]`` is
the SAME left-fold, in the same order, with the same float64 roundings as
Catalyst's ``aggregate(zip_with(...))`` and DuckDB's ``list_dot_product``
— each per-pair product of float32 inputs is exact in float64, and the adds
happen dimension-by-dimension.  So results (including threshold decisions)
are identical to the fold plan, not merely close.

Scale: shuffle = one groupBy on block id carrying each vector once, plus a
B² broadcast-able block-pair join; per-task memory = 2 blocks + the score
tile, so B is chosen so a block fits comfortably in an executor (tile size
(N/B)² doubles as the emit bound).  Never materializes the N² pair rows.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAIR_SCHEMA = "v1 bigint, v2 bigint, cos_raw double"


def _fold_dot_block(A, B):
    """Pairwise dot products of all rows of A × rows of B, accumulated
    dimension-by-dimension — the vectorized form of the sequential fold."""
    import numpy as np

    acc = np.zeros((A.shape[0], B.shape[0]), dtype=np.float64)
    for i in range(A.shape[1]):
        acc += np.outer(A[:, i], B[:, i])
    return acc


def _fold_norm(A):
    import numpy as np

    acc = np.zeros(A.shape[0], dtype=np.float64)
    for i in range(A.shape[1]):
        acc += A[:, i] * A[:, i]
    return np.maximum(np.sqrt(acc), 1e-12)


def gemm_knn(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    *,
    score_threshold: float | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 32,
) -> DataFrame:
    """Q1 top-k with the GEMM physical plan: corpus blocks × the (small,
    broadcast) query batch, per-block PARTIAL top-k inside the Arrow task,
    then a global merge of only B·k candidates per query.

    Identical results to operators.search.knn_search (scores are the same
    bit-exact sequential fold; partial top-k ordered by (score desc, vec_id)
    commutes with the global merge) — but the ranking shuffle carries B·k
    rows per query instead of every threshold survivor, which is what makes
    per-query top-k viable when the corpus side is 100 TB: per-executor
    work is one tile multiply + a local select, exactly the map-side-combine
    shape of TakeOrderedAndProject generalized per query.

    Returns (q_id, vec_id, rank, score·6dp).
    """
    from pyspark.sql import Window

    src = corpus.select(
        F.col(id_col).cast("bigint").alias("_id"),
        F.col(vec_col).alias("_v"),
        F.pmod(F.col(id_col).cast("bigint"), F.lit(n_blocks)).alias("_b"),
    )
    blocks = src.groupBy("_b").agg(F.collect_list(F.struct("_id", "_v")).alias("pts"))
    qrow = probes.select(
        F.collect_list(F.struct(F.col("q_id").alias("_qid"), F.col("q_emb").alias("_qv"))).alias("qs")
    )
    tiles = blocks.crossJoin(F.broadcast(qrow))
    thr = -float("inf") if score_threshold is None else float(score_threshold)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            for _, row in pdf.iterrows():
                ids = np.asarray([p["_id"] for p in row["pts"]], dtype=np.int64)
                A = np.asarray([p["_v"] for p in row["pts"]], dtype=np.float64)
                order = np.argsort(ids)  # id-sorted rows: stable sort below
                ids, A = ids[order], A[order]  # then breaks ties by id asc
                qids = np.asarray([q["_qid"] for q in row["qs"]], dtype=np.int64)
                Q = np.asarray([q["_qv"] for q in row["qs"]], dtype=np.float64)
                S = _fold_dot_block(A, Q) / np.outer(_fold_norm(A), _fold_norm(Q))
                kk = min(k, len(ids))
                # one vectorized partial top-k for ALL queries: stable
                # argsort of -S (exact sign flip) over id-sorted rows ==
                # ORDER BY score DESC, id ASC per column
                top = np.argsort(-S, axis=0, kind="stable")[:kk]  # (kk, Q)
                col = np.repeat(np.arange(S.shape[1]), kk)
                rowi = top.T.ravel()
                scores = S[rowi, col]
                keep = scores >= thr
                yield pd.DataFrame(
                    {
                        "q_id": qids[col[keep]],
                        "vec_id": ids[rowi[keep]],
                        "score_raw": scores[keep],
                    }
                )

    cand = tiles.mapInPandas(run, "q_id bigint, vec_id bigint, score_raw double")
    w = Window.partitionBy("q_id").orderBy(F.desc("score_raw"), F.col("vec_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", "rank", F.round("score_raw", 6).alias("score"))
    )


def cosine_pair_scan(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    n_blocks: int = 16,
) -> DataFrame:
    """All pairs (v1 < v2) with cosine ≥ threshold.

    Returns (v1, v2, cos_raw) — raw double scores; callers round at the
    output boundary so comparisons stay in one engine.
    """
    src = corpus.select(
        F.col(id_col).cast("bigint").alias("_id"),
        F.col(vec_col).alias("_v"),
        F.pmod(F.col(id_col).cast("bigint"), F.lit(n_blocks)).alias("_b"),
    )
    blocks = src.groupBy("_b").agg(F.collect_list(F.struct("_id", "_v")).alias("pts"))
    left = blocks.select(F.col("_b").alias("b1"), F.col("pts").alias("p1"))
    right = blocks.select(F.col("_b").alias("b2"), F.col("pts").alias("p2"))
    bp = left.join(right, F.col("b1") <= F.col("b2"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            for _, row in pdf.iterrows():
                ids1 = np.asarray([p["_id"] for p in row["p1"]], dtype=np.int64)
                A = np.asarray([p["_v"] for p in row["p1"]], dtype=np.float64)
                ids2 = np.asarray([p["_id"] for p in row["p2"]], dtype=np.int64)
                B = np.asarray([p["_v"] for p in row["p2"]], dtype=np.float64)
                S = _fold_dot_block(A, B) / np.outer(_fold_norm(A), _fold_norm(B))
                if row["b1"] == row["b2"]:
                    # diagonal tile: each unordered pair appears once as i<j
                    mask = (ids1[:, None] < ids2[None, :]) & (S >= threshold)
                    i, j = np.nonzero(mask)
                    v1, v2 = ids1[i], ids2[j]
                else:
                    # off-diagonal tile: ids interleave across blocks, so
                    # orient each hit by id (cosine is exactly symmetric —
                    # products and the norm product commute bit-for-bit)
                    i, j = np.nonzero(S >= threshold)
                    a, b = ids1[i], ids2[j]
                    v1, v2 = np.minimum(a, b), np.maximum(a, b)
                yield pd.DataFrame({"v1": v1, "v2": v2, "cos_raw": S[i, j]})

    return bp.mapInPandas(run, PAIR_SCHEMA)
