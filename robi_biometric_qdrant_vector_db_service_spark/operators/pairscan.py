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
