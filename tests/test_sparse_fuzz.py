"""Property-based differential fuzz of the sparse-vector search operators
(``operators/sparse``): ``build_postings``, ``sparse_knn`` (exact integer
dot product, df_cap stop-term prune, top-k by (score desc, id asc)), and
``sparse_knn_idf`` (Qdrant ``Modifier.IDF``: per-term BM25 idf rounded to
6 dp, DECIMAL(28,10) accumulation) — each against a pure-Python replica.

What the fixed-corpus oracle cannot cross and this fuzz does: the df_cap
actually pruning query terms, query terms absent from the corpus
(dropped, never scored), zero-overlap (q, id) pairs never materializing,
rank ties broken by id at equal scores, and the exact k-cut.  The idf
replica mirrors the engine's determinism discipline step for step
(idf HALF_UP-quantized at 6 dp, each contribution double-multiplied then
HALF_UP-quantized at 10 dp into a Decimal sum, final 6 dp round).
"""

from __future__ import annotations

import math
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

from robi_biometric_qdrant_vector_db_service_spark.operators.sparse import (
    build_postings,
    sparse_knn,
    sparse_knn_idf,
)

TERMS = ["t0", "t1", "t2", "t3", "t4", "zz"]  # 'zz' kept out of most corpora


def _q(x: float, places: str) -> Decimal:
    return Decimal(x).quantize(Decimal(places), rounding=ROUND_HALF_UP)


@st.composite
def sparse_case(draw):
    docs = draw(
        st.lists(
            st.lists(st.sampled_from(TERMS[:5]), min_size=1, max_size=8),
            min_size=1,
            max_size=6,
        )
    )
    n_queries = draw(st.integers(min_value=1, max_value=3))
    queries = []
    for q_id in range(n_queries):
        terms = draw(
            st.lists(st.sampled_from(TERMS), min_size=1, max_size=4, unique=True)
        )
        queries.extend((q_id, t, draw(st.integers(min_value=1, max_value=3))) for t in terms)
    k = draw(st.integers(min_value=1, max_value=4))
    df_cap = draw(st.sampled_from([None, 1, 2]))
    return docs, queries, k, df_cap


def ref_postings(docs) -> dict[tuple, int]:
    out = {}
    for i, toks in enumerate(docs):
        for t, n in Counter(toks).items():
            out[(i, t)] = n
    return out


def ref_topk(scores: dict, k: int) -> dict[tuple, tuple]:
    """(q_id, id) -> (rank, score) for the per-query top k by
    (score desc, id asc)."""
    out = {}
    by_q: dict = {}
    for (q, i), s in scores.items():
        by_q.setdefault(q, []).append((i, s))
    for q, rows in by_q.items():
        rows.sort(key=lambda r: (-r[1], r[0]))
        for rank, (i, s) in enumerate(rows[:k], start=1):
            out[(q, i)] = (rank, s)
    return out


@settings(max_examples=12, deadline=None)
@given(case=sparse_case())
def test_sparse_knn_matches_integer_replica(spark, case):
    docs, queries, k, df_cap = case
    docs_df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id bigint, text string",
    )
    post = build_postings(docs_df)
    got_post = {(r["id"], r["term"]): r["tf"] for r in post.collect()}
    exp_post = ref_postings(docs)
    assert got_post == exp_post

    qdf = spark.createDataFrame(queries, "q_id bigint, term string, qtf bigint")
    got = {
        (r["q_id"], r["id"]): (r["rank"], r["score"])
        for r in sparse_knn(post, qdf, k=k, df_cap=df_cap).collect()
    }
    doc_freq = Counter(t for (_, t) in exp_post)
    qkept = [
        (q, t, w)
        for q, t, w in queries
        if df_cap is None or doc_freq[t] <= df_cap
    ]
    scores: dict = {}
    for (i, t), tf in exp_post.items():
        for q, qt, w in qkept:
            if qt == t:
                scores[(q, i)] = scores.get((q, i), 0) + tf * w
    assert got == ref_topk(scores, k)


@settings(max_examples=12, deadline=None)
@given(case=sparse_case())
def test_sparse_knn_idf_matches_decimal_replica(spark, case):
    docs, queries, k, _ = case
    docs_df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id bigint, text string",
    )
    post = build_postings(docs_df)
    qdf = spark.createDataFrame(queries, "q_id bigint, term string, qtf bigint")
    n = len(docs)
    got = {
        (r["q_id"], r["id"]): (r["rank"], r["score"])
        for r in sparse_knn_idf(post, qdf, n, k=k).collect()
    }
    exp_post = ref_postings(docs)
    doc_freq = Counter(t for (_, t) in exp_post)
    idf = {
        t: float(_q(math.log((n - d + 0.5) / (d + 0.5) + 1.0), "0.000001"))
        for t, d in doc_freq.items()
    }
    sums: dict = {}
    for (i, t), tf in exp_post.items():
        for q, qt, w in queries:
            if qt == t:  # query terms absent from the corpus never score
                c = _q(float(tf * w) * idf[t], "0.0000000001")
                sums[(q, i)] = sums.get((q, i), Decimal(0)) + c
    # rank by the exact DECIMAL sum (the engine's window key), report the
    # 6dp-rounded double
    exp: dict = {}
    by_q: dict = {}
    for (q, i), s in sums.items():
        by_q.setdefault(q, []).append((i, s))
    for q, rows in by_q.items():
        rows.sort(key=lambda r: (-r[1], r[0]))
        for rank, (i, s) in enumerate(rows[:k], start=1):
            exp[(q, i)] = (rank, float(_q(float(s), "0.000001")))
    assert got == exp
