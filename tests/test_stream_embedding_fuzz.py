"""End-to-end differential fuzz of the incremental streaming embedding
near-dup gate (``streaming/neardup_embedding.embedding_neardup_stream``)
against a from-scratch pure-Python/NumPy replica of the documented
semantics: per vector, 8 coordinate-sign buckets over disjoint 4-dim
groups; candidate pairs = any shared (table, bucket); admit when exact
cosine >= COSINE_T, rounded 6 dp HALF_UP (Spark ``round``).

The fuzz writes a RANDOM embeddings corpus as the table of a synthetic
sf_dir, drains the real stream (8 staged files, maxFilesPerTrigger=2 —
multiple genuine micro-batches over random-sized corpora), and the
drained pair set must equal the replica's full-corpus answer exactly —
pair identity AND rounded cosine — independent of how rows landed in
batches.  This is the strongest statement of the exactly-once protocol:
the union of per-batch emissions reconstructs the batch answer with no
pair lost (later member's batch only) and none duplicated.

Replica choices that matter: cosine accumulates dimension-at-a-time in
float64 (the engine's cosine_pudf is the vectorized form of the same
sequential fold — bit-equal by construction), and rounding replicates
Spark ROUND via Decimal HALF_UP on the float's shortest repr.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

# registry root first: importing workload_dedup before it trips the
# remaining sibling-import cycle (workload_pipeline's module-level
# `from .workload_dedup import DUCK_SHINGLES` — the DUCK_SHINGLES twin of
# the _STOP_SQL cycle fixed this round; product-side hoist is next round's
# pre-artifact item)
import robi_biometric_qdrant_vector_db_service_spark.workload  # noqa: F401
from robi_biometric_qdrant_vector_db_service_spark.workload_dedup import (
    COSINE_T,
    LSH_BITS,
    LSH_TABLES,
)

# tables index dims t*LSH_BITS..(t+1)*LSH_BITS-1, so DIM covers all 8x4
DIM = LSH_TABLES * LSH_BITS  # 32


def _round6(x: float) -> float:
    return float(Decimal(repr(float(x))).quantize(Decimal("0.000001"),
                                                  rounding=ROUND_HALF_UP))


def ref_pairs(vecs: dict[int, list[float]]) -> dict[tuple[int, int], float]:
    """Full-corpus replica: sign buckets -> candidates -> exact cosine."""
    buckets: dict[int, list[int]] = {}
    for vid, v in vecs.items():
        bs = []
        for t in range(LSH_TABLES):
            b = 0
            for i in range(LSH_BITS):
                if v[t * LSH_BITS + i] >= 0:
                    b |= 1 << i
            bs.append(b)
        buckets[vid] = bs
    out: dict[tuple[int, int], float] = {}
    ids = sorted(vecs)
    for i, v1 in enumerate(ids):
        for v2 in ids[i + 1:]:
            if not any(buckets[v1][t] == buckets[v2][t]
                       for t in range(LSH_TABLES)):
                continue
            a = np.asarray(vecs[v1], dtype=np.float64)
            b = np.asarray(vecs[v2], dtype=np.float64)
            dot = na = nb = 0.0
            for j in range(DIM):  # sequential fold, like the engine
                dot += a[j] * b[j]
                na += a[j] * a[j]
                nb += b[j] * b[j]
            cos = dot / (max(np.sqrt(na), 1e-12) * max(np.sqrt(nb), 1e-12))
            if cos >= COSINE_T:
                out[(v1, v2)] = _round6(cos)
    return out


@settings(max_examples=4, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=10_000),
    n=st.integers(min_value=3, max_value=40),
    dup_pairs=st.integers(min_value=0, max_value=4),
)
def test_stream_drains_to_exact_replica_pair_set(spark, tmp_path_factory,
                                                 seed, n, dup_pairs):
    import robi_biometric_qdrant_vector_db_service_spark.streaming.neardup_embedding as nde

    rng = np.random.default_rng(seed)
    vecs = {i: rng.normal(size=DIM).astype(np.float32) for i in range(n)}
    # plant near-dups (jittered copies) so admissions happen often
    for k in range(dup_pairs):
        src = int(rng.integers(0, n))
        vecs[n + k] = (vecs[src] + rng.normal(scale=0.05, size=DIM)
                       .astype(np.float32))
    sf_dir = str(tmp_path_factory.mktemp("fuzz_sf"))
    spark.createDataFrame(
        [(int(i), [float(x) for x in v], 0) for i, v in vecs.items()],
        "vec_id bigint, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(f"{sf_dir}/embeddings.parquet")

    # fresh staging per corpus (the module caches per sf_dir; tmp dirs are
    # unique per example so the cache key never collides)
    streamed = {
        (r["v1"], r["v2"]): r["cos_sim"]
        for r in nde.embedding_neardup_stream(spark, sf_dir).collect()
    }
    # float32 storage: the engine reads array<float>; replicate by
    # round-tripping through float32 before the float64 fold
    expect = ref_pairs({i: np.asarray(v, dtype=np.float32).astype(np.float64)
                        .tolist() for i, v in vecs.items()})
    assert streamed == expect, (seed, n, dup_pairs,
                                len(streamed), len(expect))
