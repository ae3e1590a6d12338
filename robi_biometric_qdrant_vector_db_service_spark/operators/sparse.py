"""Sparse-vector search — Qdrant's second vector modality.

Qdrant collections carry *sparse vectors* alongside dense ones (public
API: ``SparseVectorParams``, points with ``{indices: [...], values:
[...]}``, searched by dot product over the shared indices — the
BM25/SPLADE serving shape).  The reference pins dense cosine only
(qdrant_client.py:60-151 configures a single dense vector space), but the
engine-surface goal includes the modality: at 100 TB the sparse path IS
the inverted index, and a columnar engine expresses it natively as a
*posting-list equi-join* — no per-point index structure needed.

Representation: a sparse vector set is a long-form postings DataFrame
``(id, term, weight)`` — one row per non-zero dimension.  This is the
columnar dual of Qdrant's ``indices``/``values`` arrays and is what a
100 TB corpus wants anyway: terms partition/bucket cleanly, weights
compress, and the dot product is a join + partial-aggregated sum instead
of a per-row array intersection.

Scale posture of ``sparse_knn``:
  * the query side is request-bounded (a handful of probes × their
    non-zero terms) → broadcast; the corpus postings NEVER shuffle for
    the join.
  * the dot-product sum is a map-side-combined hash aggregate keyed on
    (probe, point) — only matched pairs materialize, i.e. cost follows
    the posting lists actually touched, not the corpus size.
  * the per-probe top-k is a ranking window Spark executes as
    WindowGroupLimit (per-partition prune to k before the shuffle).
  * skew guard: a stop-term (df ≫ everything) inflates one join key;
    ``df_cap`` drops query terms whose document frequency exceeds the
    cap — the classic stopword prune, same discipline as the n-gram
    near-dup DF_CAP (workload_dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_postings(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    delim: str = " ",
) -> DataFrame:
    """Long-form sparse vectors from whitespace-tokenized text: one
    ``(id, term, tf)`` row per distinct term per document, weight = raw
    term frequency (the "user-supplied values" of Qdrant's sparse points;
    IDF-style reweighting composes on top when wanted).  Two map-side
    combined hash aggregates; no joins."""
    return (
        docs.select(F.col(id_col).alias("id"), F.explode(F.split(text_col, delim)).alias("term"))
        .groupBy("id", "term")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )


def sparse_knn(
    postings: DataFrame,
    query_postings: DataFrame,
    *,
    k: int = 10,
    df_cap: int | None = None,
) -> DataFrame:
    """Sparse top-k search: dot product between each query's sparse vector
    and every corpus sparse vector, over the inverted-index join.

    ``postings``:       (id, term, tf)    — the corpus (build_postings)
    ``query_postings``: (q_id, term, qtf) — the probes' sparse vectors

    The score is the exact integer dot product ``Σ_term tf·qtf`` (BIGINT
    — order-independent, so the result hashes identically regardless of
    partitioning; float weights would need the DECIMAL-sum discipline the
    RRF fusion uses).  Candidates with no shared term never materialize —
    Qdrant's sparse search has the same contract (zero-overlap points are
    not returned).

    Returns (q_id, id, rank, score), rank by (score desc, id asc).
    """
    q = query_postings
    if df_cap is not None:
        df = postings.groupBy("term").agg(F.count("*").alias("_df"))
        q = (
            q.join(F.broadcast(df.filter(F.col("_df") > df_cap)), "term", "left_anti")
        )
    scored = (
        postings.join(F.broadcast(q), "term")
        .groupBy("q_id", "id")
        .agg(F.sum(F.col("tf") * F.col("qtf")).cast("bigint").alias("score"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "id", F.col("rank").cast("int").alias("rank"), "score")
    )


def sparse_knn_idf(
    postings: DataFrame,
    query_postings: DataFrame,
    n_docs: int,
    *,
    k: int = 10,
) -> DataFrame:
    """Sparse top-k with Qdrant's ``Modifier.IDF`` — the sparse-space
    option (``SparseVectorParams(modifier=Modifier.IDF)``) that rescales
    each QUERY term weight by the BM25 inverse document frequency before
    the dot product (Qdrant's documented formula):

        idf(term) = ln( (N − n(term) + 0.5) / (n(term) + 0.5) + 1 )

    where N = collection size and n(term) = number of points whose sparse
    vector carries the term.  Corpus weights stay as stored; the score is
    ``Σ_term tf · qtf · idf(term)``.

    Determinism discipline: idf is rounded to 6 dp FIRST (collapses the
    1-ulp ``ln`` divergence between libm implementations — verified
    exhaustively over df ∈ 1..N for every fixture corpus size), each
    term's contribution is a single IEEE multiply (bit-deterministic),
    and the sum accumulates in DECIMAL(28,10) so partial-agg order can't
    perturb the hash (the RRF discipline).

    Scale posture (beyond ``sparse_knn``'s): n(term) is computed ONLY for
    the query's terms — the df aggregate is left-semi-pruned by the
    broadcast term list before it touches the corpus, so its cost follows
    the request, not the vocabulary.  N is catalog state (one count).

    Returns (q_id, id, rank, score) — score DOUBLE rounded 6 dp.
    """
    q_terms = query_postings.select("term").distinct()
    dfreq = (
        postings.join(F.broadcast(q_terms), "term", "left_semi")
        .groupBy("term")
        .agg(F.count_distinct("id").alias("_df"))
    )
    idf = dfreq.select(
        "term",
        F.round(
            F.log(
                (F.lit(float(n_docs)) - F.col("_df") + F.lit(0.5))
                / (F.col("_df") + F.lit(0.5))
                + F.lit(1.0)
            ),
            6,
        ).alias("_idf"),
    )
    # terms absent from every corpus vector drop here — they cannot match
    q = query_postings.join(F.broadcast(idf), "term")
    scored = (
        postings.join(F.broadcast(q), "term")
        .groupBy("q_id", "id")
        .agg(
            F.sum(
                (F.col("tf") * F.col("qtf") * F.col("_idf")).cast("decimal(28,10)")
            ).alias("_s")
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("_s"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "q_id",
            "id",
            F.col("rank").cast("int").alias("rank"),
            F.round(F.col("_s").cast("double"), 6).alias("score"),
        )
    )
