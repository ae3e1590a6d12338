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
from .operators.payload_index import _CJK_CHAR_CLASS
from .sources.catalog import load_table

# Number of probe vectors used by the vector-query fixtures (the reference's
# "request batch"): small by construction, broadcast to the corpus side.
N_QUERIES = 8


@dataclass(frozen=True)
class QuerySpec:
    run: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]


REGISTRY: dict[str, QuerySpec] = {}

# One-time layout/staging builds (index writes, stream staging dirs) that a
# serving deployment runs out-of-band — the reference's analogue is Qdrant's
# background HNSW indexing, which its own benchmarks exclude by sleeping
# until indexing settles (scripts/simple_test.py).  bench.py invokes these
# during warmup; correctness runs don't need to (each query stages lazily).
PREPARE: list[Callable[[SparkSession, str], None]] = []


# Persisted per-query intermediates (shingle indexes, signatures).  A query
# that persists a DataFrame its RETURNED plan still references cannot
# unpersist it before the caller collects — so queries register scratch
# caches here and the next query invocation releases them.  Without this,
# a long run (77 queries × N bench iterations) accumulates dead cached
# partitions until eviction starts churning the hot store.
_SCRATCH: list[DataFrame] = []


def track_scratch(df: DataFrame) -> DataFrame:
    _SCRATCH.append(df)
    return df


def _release_scratch() -> None:
    while _SCRATCH:
        try:
            _SCRATCH.pop().unpersist()
        except Exception:  # noqa: BLE001 — session may already be gone
            pass


def register(name: str, oracle: Optional[str]):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _release_scratch()
            return fn(spark, sf_dir)

        REGISTRY[name] = QuerySpec(run=run, oracle=oracle)
        return fn

    return deco


def prepare_all(spark: SparkSession, sf_dir: str) -> None:
    for fn in PREPARE:
        fn(spark, sf_dir)


def _probes(spark: SparkSession, sf_dir: str, n: int = N_QUERIES) -> DataFrame:
    """The query batch: first ``n`` corpus vectors (deterministic fixture,
    mirrors the reference's self-retrieval smoke, scripts/simple_test.py:121-148)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )


# SQL fragments shared by the DuckDB oracles — defined in the leaf module
# functions.textconst (r15 hoist, see there), re-exported under the
# historical names every registry module imports.

from .functions.textconst import DDOT as _DDOT  # noqa: E402
from .functions.textconst import dcos as _dcos  # noqa: E402


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


# Deterministic-fold L1 distance (defined ahead of its first oracle use in
# query_batch_points; knn_manhattan_topk shares it below).  Bit-parity:
# both engines evaluate the same seeded left-fold (0.0 + d1 == d1 exactly,
# so Spark's seeded aggregate == DuckDB's unseeded list_reduce).
_DL1 = (
    "list_reduce(list_transform(list_zip(CAST({a} AS DOUBLE[]), "
    "CAST({b} AS DOUBLE[])), p -> abs(p[1] - p[2])), (acc, x) -> acc + x)"
)


@register(
    "named_vector_search",
    f"""
WITH pts AS (
  SELECT vec_id, embedding AS dense, list_reverse(embedding) AS rev
  FROM embeddings
),
q AS (
  SELECT vec_id AS q_id, dense AS qd, rev AS qr FROM pts WHERE vec_id < {N_QUERIES}
),
sd AS (
  SELECT 'dense' AS space, q.q_id, p.vec_id, {_dcos('p.dense', 'q.qd')} AS score
  FROM pts p CROSS JOIN q
),
sr AS (
  SELECT 'rev' AS space, q.q_id, p.vec_id, {_dcos('p.rev', 'q.qr')} AS score
  FROM pts p CROSS JOIN q
),
ranked AS (
  SELECT space, q_id, vec_id, score,
         row_number() OVER (PARTITION BY space, q_id ORDER BY score DESC, vec_id) AS rank
  FROM (SELECT * FROM sd UNION ALL SELECT * FROM sr)
)
SELECT space, q_id, vec_id, CAST(rank AS INT) AS rank, round(score, 6) AS score
FROM ranked WHERE rank <= 5
""",
)
def named_vector_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant named vector spaces: a point carries several vectors
    (``{{"dense": …, "rev": …}}``) and a request picks one with
    ``using=``.  Columnar-natively, each named space IS a column — the
    ``using`` selector is column choice, so per-space searches scan only
    their space's bytes (parquet column pruning; unused spaces are never
    read).  The fixture's second space is the reversed embedding
    (deterministic, genuinely distinct fold order); both spaces are
    searched here, tagged, and ranked independently."""
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        "vec_id",
        F.col("embedding").alias("dense"),
        F.reverse("embedding").alias("rev"),
    )
    probes = pts.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("dense").alias("qd"),
        F.col("rev").alias("qr"),
    )
    out_d = S.knn_search(
        pts,
        probes.select("q_id", F.col("qd").alias("q_emb")),
        k=5,
        corpus_vec="dense",
    ).withColumn("space", F.lit("dense"))
    out_r = S.knn_search(
        pts,
        probes.select("q_id", F.col("qr").alias("q_emb")),
        k=5,
        corpus_vec="rev",
    ).withColumn("space", F.lit("rev"))
    return out_d.unionByName(out_r).select("space", "q_id", "vec_id", "rank", "score")


@register(
    "query_batch_points",
    f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < {N_QUERIES}
),
s1 AS (
  SELECT 1 AS req_id, q.q_id, e.vec_id, {_dcos('e.embedding', 'q.q_emb')} AS score
  FROM embeddings e CROSS JOIN q
),
s2 AS (
  SELECT 2 AS req_id, q.q_id, e.vec_id, {_dcos('e.embedding', 'q.q_emb')} AS score
  FROM embeddings e CROSS JOIN q WHERE e.label IN (2, 5)
),
s3 AS (
  SELECT 3 AS req_id, q.q_id, e.vec_id,
         {_DL1.format(a='e.embedding', b='q.q_emb')} AS score
  FROM embeddings e CROSS JOIN q
),
ranked AS (
  SELECT req_id, q_id, vec_id, score,
         row_number() OVER (
           PARTITION BY req_id, q_id
           ORDER BY CASE WHEN req_id = 3 THEN score ELSE -score END, vec_id) AS rank
  FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2 UNION ALL SELECT * FROM s3)
)
SELECT CAST(req_id AS INT) AS req_id, q_id, vec_id, CAST(rank AS INT) AS rank,
       round(score, 6) AS score
FROM ranked WHERE rank <= 5
""",
)
def query_batch_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant ``query_batch_points``: several heterogeneous requests in
    one call — here a plain cosine top-5, a combinator-filtered top-5,
    and a manhattan-metric top-5 over the same probe batch, results
    tagged by request.  Each sub-request keeps its own plan (filter
    pushdown, metric polarity); the union is plan-level composition, not
    a new operator — the batch API's promise is amortizing the round
    trip, which the one-job union delivers."""
    corpus = load_table(spark, sf_dir, "embeddings")
    probes = _probes(spark, sf_dir)
    r1 = S.knn_search(corpus, probes, k=5).withColumn("req_id", F.lit(1))
    r2 = S.knn_search(
        corpus,
        probes,
        k=5,
        query_filter={"must": [{"key": "label", "match": {"any": [2, 5]}}]},
        corpus_id="vec_id",
    ).withColumn("req_id", F.lit(2))
    r3 = S.knn_search(corpus, probes, k=5, metric="manhattan").withColumn(
        "req_id", F.lit(3)
    )
    return (
        r1.unionByName(r2)
        .unionByName(r3)
        .select(F.col("req_id").cast("int"), "q_id", "vec_id", "rank", "score")
    )


@register(
    "knn_offset_page",
    _ORACLE_SCORED
    + """
, ranked AS (
  SELECT q_id, vec_id, score,
         row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank
  FROM scored
)
SELECT q_id, vec_id, CAST(rank AS INT) AS rank, round(score, 6) AS score
FROM ranked WHERE rank > 10 AND rank <= 20
""",
)
def knn_offset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant search ``offset`` pagination: the SECOND page of 10
    (ranks 11–20) per probe.  Still one WindowGroupLimit plan — the
    upper bound offset+k prunes below the ranking shuffle; rank stays
    the absolute position so pages concatenate into the full ranking.
    (Deep pagination belongs to the scroll family's keyset cursors —
    the same caveat Qdrant documents for its offset parameter.)"""
    corpus = load_table(spark, sf_dir, "embeddings")
    return S.knn_search(corpus, _probes(spark, sf_dir), k=10, offset=10)


# Manhattan-metric top-k — Qdrant's public Distance.MANHATTAN (the
# reference pins COSINE, qdrant_client.py:105; the metric enum is the
# other public axis of the same search surface).  Distances rank
# ASCENDING.  The shared deterministic-fold L1 oracle fragment _DL1 is
# defined above query_batch_points.


@register(
    "knn_manhattan_topk",
    f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < {N_QUERIES}
),
scored AS (
  SELECT q.q_id, e.vec_id, {_DL1.format(a='e.embedding', b='q.q_emb')} AS score
  FROM embeddings e CROSS JOIN q
),
ranked AS (
  SELECT q_id, vec_id, score,
         row_number() OVER (PARTITION BY q_id ORDER BY score, vec_id) AS rank
  FROM scored
)
SELECT q_id, vec_id, CAST(rank AS INT) AS rank, round(score, 6) AS score
FROM ranked WHERE rank <= 10
""",
)
def knn_manhattan_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 under Qdrant's Manhattan metric: per-query 10 nearest by L1
    distance, ascending (lower = closer; rank 1 is the probe itself at
    distance 0).  Same broadcast-probes plan as `knn_topk` — the metric
    only changes the scoring projection and the window's sort polarity."""
    corpus = load_table(spark, sf_dir, "embeddings")
    return S.knn_search(corpus, _probes(spark, sf_dir), k=10, metric="manhattan")


@register(
    "knn_combinator_filtered",
    f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < {N_QUERIES}
),
scored AS (
  SELECT q.q_id, e.vec_id, {_dcos('e.embedding', 'q.q_emb')} AS score
  FROM embeddings e CROSS JOIN q
  WHERE (e.label IN (2, 5) OR e.label >= 8)
    AND ((e.vec_id > 400 AND e.vec_id <= 450) IS NOT TRUE)
),
ranked AS (
  SELECT q_id, vec_id, score,
         row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank
  FROM scored
)
SELECT q_id, vec_id, CAST(rank AS INT) AS rank, round(score, 6) AS score
FROM ranked WHERE rank <= 5
""",
)
def knn_combinator_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 + Qdrant's full ``Filter`` model as the search pre-filter —
    ``search(query_filter={{should, must_not}})``, the composition the
    reference never builds (must-only conjunctions,
    qdrant_client.py:355-363).  The whole combinator tree (disjunction +
    IS-NOT-TRUE negation) prunes the corpus BEFORE scoring and pushes to
    the parquet scan; same broadcast-probes top-k plan as `knn_filtered`
    beyond the predicate."""
    corpus = load_table(spark, sf_dir, "embeddings")
    return S.knn_search(
        corpus,
        _probes(spark, sf_dir),
        k=5,
        query_filter={
            "should": [
                {"key": "label", "match": {"any": [2, 5]}},
                {"key": "label", "range": {"gte": 8}},
            ],
            "must_not": [{"key": "vec_id", "range": {"gt": 400, "lte": 450}}],
        },
    )


# ---------------------------------------------------------------------------
# F1 — L2 normalize (gpu_optimizer.py:81-124); norm audit of the corpus
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Q2 — weighted multi-vector fusion (advanced_indexing.py:280-348)
# Fused score accumulates in DECIMAL (exact, order-independent) so the
# parallel groupBy matches the oracle bit-for-bit.
# ---------------------------------------------------------------------------

FUSION_WEIGHTS = [(0, "0.5"), (1, "0.3"), (2, "0.2")]


@register(
    "multi_vector_fusion",
    f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS q_emb,
         CAST(CASE vec_id WHEN 0 THEN 0.5 WHEN 1 THEN 0.3 ELSE 0.2 END AS DECIMAL(4,2)) AS weight
  FROM embeddings WHERE vec_id < 3
),
scored AS (
  SELECT q.q_id, q.weight, e.vec_id, {_dcos('e.embedding', 'q.q_emb')} AS score
  FROM embeddings e CROSS JOIN q
),
ranked AS (
  SELECT q_id, weight, vec_id, round(score, 6) AS score,
         row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank
  FROM scored
),
hits AS (SELECT * FROM ranked WHERE rank <= 20)
SELECT vec_id,
       CAST(sum(CAST(score AS DECIMAL(10,6)) * weight) AS DOUBLE) AS fused_score,
       CAST(count(*) AS BIGINT) AS votes
FROM hits
GROUP BY vec_id
ORDER BY fused_score DESC, votes DESC, vec_id
LIMIT 10
""",
)
def multi_vector_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = load_table(spark, sf_dir, "embeddings")
    probes = _probes(spark, sf_dir, 3)
    weights = spark.createDataFrame(
        [(int(q), w) for q, w in FUSION_WEIGHTS], "q_id int, weight string"
    ).withColumn("weight", F.col("weight").cast("decimal(4,2)"))
    wq = probes.join(F.broadcast(weights), "q_id")
    hits = S.knn_search(corpus, wq.select("q_id", "q_emb"), k=20)
    hits = hits.join(F.broadcast(wq.select("q_id", "weight")), "q_id")
    return (
        hits.groupBy("vec_id")
        .agg(
            F.sum(F.col("score").cast("decimal(10,6)") * F.col("weight"))
            .cast("double")
            .alias("fused_score"),
            F.count("*").cast("bigint").alias("votes"),
        )
        .orderBy(F.desc("fused_score"), F.desc("votes"), F.col("vec_id"))
        .limit(10)
    )


RRF_K = 60  # Cormack et al.'s standard constant; Qdrant's own Fusion.RRF
            # uses a much smaller K, which weights top ranks harder — the
            # combinator shape is identical and K is this one knob


@register(
    "rrf_fusion_topk",
    f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 3
),
scored AS (
  SELECT q.q_id, e.vec_id, {{dcos}} AS score
  FROM embeddings e CROSS JOIN q
),
ranked AS (
  SELECT q_id, vec_id,
         row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank
  FROM scored
),
hits AS (SELECT * FROM ranked WHERE rank <= 20)
SELECT vec_id,
       CAST(sum(CAST(1e0 / ({RRF_K} + rank) AS DECIMAL(18,12))) AS DOUBLE) AS rrf_score,
       CAST(count(*) AS BIGINT) AS votes
FROM hits
GROUP BY vec_id
ORDER BY rrf_score DESC, votes DESC, vec_id
LIMIT 10
""".format(dcos=_dcos("e.embedding", "q.q_emb")),
)
def rrf_fusion_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of several probes' rankings — the rank-based
    combinator of Qdrant's ``Fusion.RRF`` prefetch API: each probe
    contributes 1/(RRF_K + rank) for its top-20 hits and candidates are
    ordered by the summed contribution.  RRF_K here is the standard
    Cormack 60 (Qdrant's implementation picks a smaller K, weighting top
    ranks harder — same formula, different knob setting).  Rank-based
    fusion complements the score-weighted Q2 (`multi_vector_fusion`): it
    needs no weight tuning and is robust to incomparable score scales.

    Determinism: contributions are exact DECIMAL(18,12) values summed with
    an order-independent DECIMAL aggregate (float SUM would depend on
    accumulation order), then cast to DOUBLE once — the same trick Q2 uses
    for its weighted sum.

    Scale: per-probe rankings come from the broadcast-probe k-NN plan
    (corpus never shuffles; map-side WindowGroupLimit bounds the shuffle to
    k rows per probe per partition); the fusion group-by touches ≤ probes·k
    rows."""
    corpus = load_table(spark, sf_dir, "embeddings")
    probes = _probes(spark, sf_dir, 3)
    hits = S.knn_search(corpus, probes, k=20)
    contrib = F.expr(f"CAST(1e0 / ({RRF_K} + rank) AS DECIMAL(18,12))")
    return (
        hits.groupBy("vec_id")
        .agg(
            F.sum(contrib).cast("double").alias("rrf_score"),
            F.count("*").cast("bigint").alias("votes"),
        )
        .orderBy(F.desc("rrf_score"), F.desc("votes"), F.col("vec_id"))
        .limit(10)
    )


# DBSF — Qdrant's other public `query_points` fusion combinator
# (Fusion.DBSF, "distribution-based score fusion"): per ranking, normalize
# scores with the ranking's mean ± 3σ as the [0, 1] limits (clipped), then
# sum the normalized scores of the same point across rankings.  One textual
# formula evaluated by BOTH engines over identically-derived operands (the
# BM25 discipline): the per-ranking moment sums are exact DECIMAL
# aggregates (order-independent), μ/σ and the normalization are then pure
# IEEE-754 correctly-rounded expressions, and the cross-ranking sum goes
# through DECIMAL(18,12) contributions like RRF's.
_DBSF_MU = "(CAST(ssum AS DOUBLE) / cnt)"
_DBSF_SIGMA = (
    f"sqrt(greatest(0e0, CAST(s2sum AS DOUBLE) / cnt - {_DBSF_MU} * {_DBSF_MU}))"
)
_DBSF_NORM = (
    "CASE WHEN sigma = 0e0 THEN 0.5e0 "
    "ELSE least(1e0, greatest(0e0, (score - (mu - 3e0 * sigma)) / (6e0 * sigma))) END"
)


@register(
    "dbsf_fusion_topk",
    f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 3
),
scored AS (
  SELECT q.q_id, e.vec_id, {_dcos('e.embedding', 'q.q_emb')} AS raw
  FROM embeddings e CROSS JOIN q
),
ranked AS (
  SELECT q_id, vec_id, round(raw, 6) AS score,
         row_number() OVER (PARTITION BY q_id ORDER BY raw DESC, vec_id) AS rank
  FROM scored
),
hits AS (SELECT q_id, vec_id, score FROM ranked WHERE rank <= 20),
stats AS (
  SELECT q_id, CAST(count(*) AS BIGINT) AS cnt,
         sum(CAST(score AS DECIMAL(10,6))) AS ssum,
         sum(CAST(score AS DECIMAL(10,6)) * CAST(score AS DECIMAL(10,6))) AS s2sum
  FROM hits GROUP BY q_id
),
mus AS (SELECT q_id, {_DBSF_MU} AS mu, {_DBSF_SIGMA} AS sigma FROM stats),
normed AS (
  SELECT h.vec_id, CAST({_DBSF_NORM} AS DECIMAL(18,12)) AS contrib
  FROM hits h JOIN mus USING (q_id)
)
SELECT vec_id, CAST(sum(contrib) AS DOUBLE) AS dbsf_score,
       CAST(count(*) AS BIGINT) AS votes
FROM normed
GROUP BY vec_id
ORDER BY dbsf_score DESC, votes DESC, vec_id
LIMIT 10
""",
)
def dbsf_fusion_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-based score fusion of several probes' rankings —
    Qdrant's ``Fusion.DBSF``: each ranking's top-20 scores are normalized
    to [0, 1] using that ranking's mean ± 3σ as the limits (values outside
    clip), and a candidate's fused score is the sum of its normalized
    scores across rankings.  Score-distribution-aware where RRF is
    rank-only: a point that wins one ranking by a wide margin keeps that
    margin through fusion.

    Determinism: the per-ranking moments (Σs, Σs²) accumulate in exact
    DECIMAL (order-independent under the parallel groupBy); μ, σ, and the
    normalization are one shared textual formula of correctly-rounded
    IEEE-754 ops over those exact operands, so both engines produce
    bit-equal doubles; cross-ranking summation goes through exact
    DECIMAL(18,12) contributions (the RRF/Q2 trick).

    Scale: rankings come from the broadcast-probe k-NN plan (corpus never
    shuffles); the moment aggregate and fusion group-by touch ≤ probes·k
    rows; `mus` is ≤ probes rows, broadcast back."""
    corpus = load_table(spark, sf_dir, "embeddings")
    probes = _probes(spark, sf_dir, 3)
    hits = S.knn_search(corpus, probes, k=20).select("q_id", "vec_id", "score")
    dec = F.col("score").cast("decimal(10,6)")
    stats = hits.groupBy("q_id").agg(
        F.count("*").cast("bigint").alias("cnt"),
        F.sum(dec).alias("ssum"),
        F.sum(dec * dec).alias("s2sum"),
    )
    mus = stats.select(
        "q_id", F.expr(_DBSF_MU).alias("mu"), F.expr(_DBSF_SIGMA).alias("sigma")
    )
    normed = hits.join(F.broadcast(mus), "q_id").withColumn(
        "contrib", F.expr(_DBSF_NORM).cast("decimal(18,12)")
    )
    return (
        normed.groupBy("vec_id")
        .agg(
            F.sum("contrib").cast("double").alias("dbsf_score"),
            F.count("*").cast("bigint").alias("votes"),
        )
        .orderBy(F.desc("dbsf_score"), F.desc("votes"), F.col("vec_id"))
        .limit(10)
    )


# Sparse vectors — Qdrant's second vector modality (SparseVectorParams;
# points carry {indices, values}; search = dot product over shared
# indices).  The engine represents a sparse corpus as long-form postings
# (id, term, tf) and searches via the inverted-index join
# (operators/sparse.py).  Sparse tf vectors derive from the documents
# table with the same whitespace tokenization the text workload pins.
_SPARSE_TF_SQL = """
t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM t GROUP BY 1, 2)
"""


@register(
    "sparse_knn_topk",
    f"""
WITH {_SPARSE_TF_SQL},
q AS (SELECT doc_id AS q_id, term, tf AS qtf FROM tf WHERE doc_id < 5),
scored AS (
  SELECT q.q_id, tf.doc_id AS id, CAST(sum(tf.tf * q.qtf) AS BIGINT) AS score
  FROM tf JOIN q USING (term)
  GROUP BY 1, 2
),
ranked AS (
  SELECT q_id, id, score,
         row_number() OVER (PARTITION BY q_id ORDER BY score DESC, id) AS rank
  FROM scored
)
SELECT q_id, id, CAST(rank AS INT) AS rank, score
FROM ranked WHERE rank <= 10
""",
)
def sparse_knn_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse-vector top-k search — Qdrant's sparse modality: each probe's
    sparse tf vector (documents 0–4) dot-producted against every corpus
    sparse vector over the inverted-index join, top-10 per probe.  The
    score is the exact BIGINT dot product (order-independent sum — no
    float accumulation to pin); zero-overlap candidates never materialize
    (Qdrant's sparse contract).

    Scale: the probe postings broadcast (request-bounded); the corpus
    postings never shuffle for the join; the dot-product aggregate is
    map-side combined on (probe, point); the per-probe top-10 is a
    WindowGroupLimit-prunable ranking."""
    from .operators.sparse import build_postings, sparse_knn

    docs = load_table(spark, sf_dir, "documents")
    postings = build_postings(docs)
    q = postings.filter(F.col("id") < 5).select(
        F.col("id").alias("q_id"), "term", F.col("tf").alias("qtf")
    )
    return sparse_knn(postings, q, k=10)


@register(
    "hybrid_search_rrf",
    f"""
WITH {_SPARSE_TF_SQL},
qd AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 3),
dense_scored AS (
  SELECT qd.q_id, e.vec_id AS pid, {{dcos}} AS s
  FROM embeddings e CROSS JOIN qd
),
dense AS (
  SELECT q_id, pid,
         row_number() OVER (PARTITION BY q_id ORDER BY s DESC, pid) AS rank
  FROM dense_scored
),
qs AS (SELECT doc_id AS q_id, term, tf AS qtf FROM tf WHERE doc_id < 3),
sp_scored AS (
  SELECT qs.q_id, tf.doc_id AS pid, sum(tf.tf * qs.qtf) AS s
  FROM tf JOIN qs USING (term)
  GROUP BY 1, 2
),
sparse AS (
  SELECT q_id, pid,
         row_number() OVER (PARTITION BY q_id ORDER BY s DESC, pid) AS rank
  FROM sp_scored
),
hits AS (
  SELECT q_id, pid, rank FROM dense WHERE rank <= 20
  UNION ALL
  SELECT q_id, pid, rank FROM sparse WHERE rank <= 20
)
SELECT pid AS point_id,
       CAST(sum(CAST(1e0 / ({RRF_K} + rank) AS DECIMAL(18,12))) AS DOUBLE) AS rrf_score,
       CAST(count(*) AS BIGINT) AS votes
FROM hits
GROUP BY pid
ORDER BY rrf_score DESC, votes DESC, point_id
LIMIT 10
""".format(dcos=_dcos("e.embedding", "qd.q_emb")),
)
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid dense + sparse search — Qdrant's flagship `query_points`
    composition: a dense prefetch (cosine top-20 per probe) and a sparse
    prefetch (tf dot-product top-20 per probe) fused with ``Fusion.RRF``.
    Probes 0–2 query both modalities (the synthetic corpus aligns
    ``vec_id`` and ``doc_id`` as one point-id space); each of the 6
    rankings contributes 1/(60 + rank) per hit, summed through exact
    DECIMAL(18,12) (the order-independent RRF discipline).

    Scale: both prefetch legs keep the corpus un-shuffled (broadcast
    probes for dense, broadcast query postings for sparse); fusion
    touches ≤ rankings·k rows."""
    from .operators.sparse import build_postings, sparse_knn

    corpus = load_table(spark, sf_dir, "embeddings")
    dense = S.knn_search(corpus, _probes(spark, sf_dir, 3), k=20).select(
        "q_id", F.col("vec_id").alias("pid"), "rank"
    )
    postings = build_postings(load_table(spark, sf_dir, "documents"))
    q = postings.filter(F.col("id") < 3).select(
        F.col("id").alias("q_id"), "term", F.col("tf").alias("qtf")
    )
    sparse = sparse_knn(postings, q, k=20).select(
        "q_id", F.col("id").alias("pid"), "rank"
    )
    contrib = F.expr(f"CAST(1e0 / ({RRF_K} + rank) AS DECIMAL(18,12))")
    return (
        dense.unionByName(sparse)
        .groupBy("pid")
        .agg(
            F.sum(contrib).cast("double").alias("rrf_score"),
            F.count("*").cast("bigint").alias("votes"),
        )
        .orderBy(F.desc("rrf_score"), F.desc("votes"), F.col("pid"))
        .limit(10)
        .select(F.col("pid").alias("point_id"), "rrf_score", "votes")
    )


@register(
    "sparse_idf_knn",
    f"""
WITH {_SPARSE_TF_SQL},
n AS (SELECT count(*) AS n_docs FROM documents),
q AS (SELECT doc_id AS q_id, term, tf AS qtf FROM tf WHERE doc_id < 5),
dfreq AS (
  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM tf WHERE term IN (SELECT DISTINCT term FROM q)
  GROUP BY term
),
idf AS (
  SELECT term,
         round(ln((CAST(n.n_docs AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0), 6) AS idf
  FROM dfreq CROSS JOIN n
),
scored AS (
  SELECT q.q_id, tf.doc_id AS id,
         sum(CAST(tf.tf * q.qtf * idf.idf AS DECIMAL(28,10))) AS s
  FROM tf JOIN q USING (term) JOIN idf USING (term)
  GROUP BY 1, 2
),
ranked AS (
  SELECT q_id, id, s,
         row_number() OVER (PARTITION BY q_id ORDER BY s DESC, id) AS rank
  FROM scored
)
SELECT q_id, id, CAST(rank AS INT) AS rank, round(CAST(s AS DOUBLE), 6) AS score
FROM ranked WHERE rank <= 10
""",
)
def sparse_idf_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse search under Qdrant's ``Modifier.IDF`` — the BM25-style
    sparse-space option: query term weights are rescaled by
    ``ln((N − df + 0.5)/(df + 0.5) + 1)`` before the inverted-index dot
    product (the reference pins dense-only, qdrant_client.py:60-151; this
    is the public sparse-space knob).  Probes = documents 0–4's tf
    vectors, top-10 per probe.

    Float parity: idf rounds to 6 dp before use (collapses cross-libm
    ``ln`` ulp drift — verified exhaustively for every fixture N); each
    contribution is one IEEE multiply; the sum accumulates in
    DECIMAL(28,10) (order-independent).

    Scale: document frequency is computed only for the probes' terms
    (left-semi prune via the broadcast term list), so the df pass costs
    the request, not the vocabulary; everything else inherits
    sparse_knn's posture (corpus postings never shuffle)."""
    from .operators.sparse import build_postings, sparse_knn_idf

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    postings = build_postings(docs)
    q = postings.filter(F.col("id") < 5).select(
        F.col("id").alias("q_id"), "term", F.col("tf").alias("qtf")
    )
    return sparse_knn_idf(postings, q, n_docs, k=10)


@register(
    "prefetch_chain_rescore",
    f"""
WITH {_SPARSE_TF_SQL},
qs AS (SELECT doc_id AS q_id, term, tf AS qtf FROM tf WHERE doc_id < 4),
sp_scored AS (
  SELECT qs.q_id, tf.doc_id AS pid, CAST(sum(tf.tf * qs.qtf) AS BIGINT) AS s
  FROM tf JOIN qs USING (term)
  GROUP BY 1, 2
),
sp AS (
  SELECT q_id, pid FROM (
    SELECT q_id, pid,
           row_number() OVER (PARTITION BY q_id ORDER BY s DESC, pid) AS rank
    FROM sp_scored
  ) WHERE rank <= 40
),
q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 4),
mid AS (
  SELECT q_id, vec_id, embedding, q_emb, cos FROM (
    SELECT sp.q_id, e.vec_id, e.embedding, q.q_emb,
           {{mcos}} AS cos,
           row_number() OVER (PARTITION BY sp.q_id
                              ORDER BY {{mcos}} DESC, e.vec_id) AS rank
    FROM sp JOIN embeddings e ON sp.pid = e.vec_id
            JOIN q ON sp.q_id = q.q_id
  ) WHERE rank <= 15
),
fin AS (
  SELECT q_id, vec_id, cos, {{mdot}} AS dot,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY {{mdot}} DESC, vec_id) AS rank
  FROM mid
)
SELECT q_id, vec_id AS point_id, CAST(rank AS INT) AS rank,
       round(dot, 6) AS score, round(cos, 6) AS prefetch_score
FROM fin WHERE rank <= 5
""".format(
        mcos=_dcos("e.embedding", "q.q_emb"),
        mdot=_DDOT.format(a="embedding", b="q_emb"),
    ),
)
def prefetch_chain_rescore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested prefetch chain — Qdrant's multi-stage ``query_points``
    composition (``Prefetch`` objects nest arbitrarily):

        prefetch { prefetch { sparse tf dot-product, limit 40 }
                   dense cosine rescore,            limit 15 }
        query: dense DOT-product rescore,           limit 5

    i.e. a cheap inverted-index recall stage feeds an exact cosine
    re-ranker, whose survivors are re-scored under a different metric
    (dot — rank-divergent from cosine when norms vary).  This is the
    published retrieve→rescore serving pattern the single-leg
    FormulaQuery (operators/formula.py) can't express: stage N's
    candidate set is stage N−1's result, not a fresh search.

    Scale: every stage narrows — the corpus is touched once by the
    sparse leg (postings never shuffle), then all later stages run on
    request-bounded candidate sets (≤ probes × 40 rows) that broadcast;
    rescores never rescan the corpus, they semi-join it by point id.

    Returns (q_id, point_id, rank, score, prefetch_score)."""
    from .functions.vector import dot_sql
    from .operators.sparse import build_postings, sparse_knn
    from pyspark.sql import Window

    corpus = load_table(spark, sf_dir, "embeddings")
    postings = build_postings(load_table(spark, sf_dir, "documents"))
    qsp = postings.filter(F.col("id") < 4).select(
        F.col("id").alias("q_id"), "term", F.col("tf").alias("qtf")
    )
    inner = sparse_knn(postings, qsp, k=40).select("q_id", F.col("id").alias("vec_id"))
    cand = corpus.join(F.broadcast(inner), "vec_id")
    probes = _probes(spark, sf_dir, 4)
    mid = cand.join(F.broadcast(probes), "q_id").withColumn(
        "cos", F.expr(cosine_sql("embedding", "q_emb"))
    )
    w_mid = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.col("vec_id"))
    kept = mid.withColumn("rank", F.row_number().over(w_mid)).filter(
        F.col("rank") <= 15
    )
    fin = kept.withColumn("dot", F.expr(dot_sql("embedding", "q_emb")))
    w_fin = Window.partitionBy("q_id").orderBy(F.desc("dot"), F.col("vec_id"))
    return (
        fin.withColumn("frank", F.row_number().over(w_fin))
        .filter(F.col("frank") <= 5)
        .select(
            "q_id",
            F.col("vec_id").alias("point_id"),
            F.col("frank").cast("int").alias("rank"),
            F.round("dot", 6).alias("score"),
            F.round("cos", 6).alias("prefetch_score"),
        )
    )


# MMR diversity reranking — Qdrant's public `mmr` query option.  The oracle
# restates the greedy selection as a DuckDB recursive CTE: candidates and
# pairwise sims from the shared fold expressions, then one LATERAL argmax
# per step carrying the selected set as a list.  The Spark side computes
# the SAME sims JVM-side and runs the greedy loop per-probe in
# applyInPandas on those exact doubles — bit-equal selections.
@register(
    "mmr_diversity_topk",
    f"""
WITH RECURSIVE q AS (
  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 3
),
cand AS (
  SELECT q_id, vec_id, embedding, score FROM (
    SELECT q.q_id, e.vec_id, e.embedding, {_dcos('e.embedding', 'q.q_emb')} AS score,
           row_number() OVER (PARTITION BY q.q_id
                              ORDER BY {_dcos('e.embedding', 'q.q_emb')} DESC, e.vec_id) AS rn
    FROM embeddings e CROSS JOIN q) WHERE rn <= 15
),
sims AS (
  SELECT a.q_id, a.vec_id AS v1, b.vec_id AS v2, {_dcos('a.embedding', 'b.embedding')} AS sim
  FROM cand a JOIN cand b ON a.q_id = b.q_id AND a.vec_id <> b.vec_id
),
t(q_id, step, sel, vec_id, score) AS (
  SELECT q_id, 1, [vec_id], vec_id, score FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rn
    FROM cand) WHERE rn = 1
  UNION ALL
  SELECT t.q_id, t.step + 1, list_append(t.sel, pick.v), pick.v, pick.s
  FROM t, LATERAL (
    SELECT c.vec_id AS v, c.score AS s
    FROM cand c
    WHERE c.q_id = t.q_id AND NOT list_contains(t.sel, c.vec_id)
    ORDER BY 0.5 * c.score - 0.5 * (SELECT max(s2.sim) FROM sims s2
        WHERE s2.q_id = c.q_id AND s2.v1 = c.vec_id
          AND list_contains(t.sel, s2.v2)) DESC,
      c.vec_id
    LIMIT 1
  ) pick
  WHERE t.step < 5
)
SELECT q_id, CAST(step AS INT) AS mmr_rank, vec_id, round(score, 6) AS score
FROM t
""",
)
def mmr_diversity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant ``mmr`` diversity rerank: top-15 candidates per probe,
    greedy λ=0.5 maximal-marginal-relevance selection of 5 — each pick
    maximizes λ·probe-sim − (1−λ)·max-sim-to-already-selected.  The
    curation counterpart: a diverse exemplar sample instead of 5
    near-duplicates of the best hit."""
    corpus = load_table(spark, sf_dir, "embeddings")
    return S.mmr_rerank(
        corpus, _probes(spark, sf_dir, 3), k=5, candidates=15, diversity=0.5
    )


# ---------------------------------------------------------------------------
# Q3 verify (1:1) and Q4 detect (1:N) — api_spec.md:452-528 (spec-only in the
# reference; implemented here as first-class queries)
# ---------------------------------------------------------------------------

@register(
    "verify_1to1",
    f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS q_emb, CAST(vec_id % 10 AS INT) AS claim_label
  FROM embeddings WHERE vec_id < {N_QUERIES}
),
scored AS (
  SELECT q.q_id, {_dcos('e.embedding', 'q.q_emb')} AS score
  FROM embeddings e JOIN q ON e.label = q.claim_label
)
SELECT q_id, round(max(score), 6) AS best_score,
       round(max(score), 6) >= 0.65 AS verified
FROM scored GROUP BY q_id
""",
)
def verify_1to1(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = load_table(spark, sf_dir, "embeddings")
    queries = _probes(spark, sf_dir).withColumn(
        "claim_label", (F.col("q_id") % 10).cast("int")
    )
    return S.verify(corpus, queries, threshold=0.65)


@register(
    "detect_1toN",
    f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < {N_QUERIES}
),
scored AS (
  SELECT q.q_id, e.vec_id, e.label, {_dcos('e.embedding', 'q.q_emb')} AS score
  FROM embeddings e CROSS JOIN q
),
cand AS (
  SELECT * FROM (
    SELECT q_id, vec_id, label, round(score, 6) AS score,
           row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rnk
    FROM scored
  ) WHERE rnk <= 50
),
per_label AS (
  SELECT q_id, label, max(score) AS confidence FROM cand GROUP BY q_id, label
),
ranked AS (
  SELECT q_id, label, confidence,
         row_number() OVER (PARTITION BY q_id ORDER BY confidence DESC, label) AS rank
  FROM per_label
)
SELECT q_id, label, round(confidence, 6) AS confidence, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 3
""",
)
def detect_1toN(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = load_table(spark, sf_dir, "embeddings")
    return S.detect(corpus, _probes(spark, sf_dir), k=3, candidate_k=50)


# ---------------------------------------------------------------------------
# S2/S3/S6/S7 — write path via the versioned VectorStore (operators.store).
# Each query materializes a store copy in /tmp, runs the REAL mutation path,
# and returns the resulting state as a DataFrame the oracle can predict.
# ---------------------------------------------------------------------------

_base_store_cache: dict[str, str] = {}


def _fresh_store(spark: SparkSession, sf_dir: str, tag: str):
    """An isolated store seeded with the embeddings corpus.  The corpus
    snapshot is materialized ONCE per sf_dir; each query receives a
    zero-copy manifest clone (operators.store.VectorStore.clone), so its
    mutations write only their own segments — both faster per query and a
    direct exercise of the snapshot-isolation the segment model provides."""
    import tempfile

    from .operators.store import VectorStore

    if sf_dir not in _base_store_cache:
        emb = load_table(spark, sf_dir, "embeddings")
        points = emb.select(
            F.col("vec_id").cast("string").alias("point_id"),
            F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("embedding"),
            F.concat(F.lit("u"), F.col("label").cast("string")).alias("user_id"),
            (F.lit(1000.0) + F.col("vec_id")).alias("ts"),
            F.create_map().cast("map<string,string>").alias("metadata"),
        )
        root = tempfile.mkdtemp(prefix="vstore_base_")
        VectorStore.create(spark, root, points)
        _base_store_cache[sf_dir] = root
    base = VectorStore(spark, _base_store_cache[sf_dir])
    return base.clone(tempfile.mkdtemp(prefix=f"vstore_{tag}_"))


def _prepare_base_store(spark: SparkSession, sf_dir: str) -> None:
    """Materialize the shared corpus snapshot out-of-band (bench warmup) —
    the store-mutation queries then pay only their clone + mutation, the
    way a serving deployment's collection already exists before traffic."""
    _fresh_store(spark, sf_dir, "warm")


PREPARE.append(_prepare_base_store)


@register(
    "delete_by_predicate",
    """
SELECT concat('u', CAST(label AS VARCHAR)) AS user_id, CAST(count(*) AS BIGINT) AS n
FROM embeddings WHERE label <> 3
GROUP BY label
""",
)
def delete_by_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7: delete every point of user 'u3' through the store's real delete
    path (exact count, unlike qdrant_client.py:461), then report surviving
    per-user counts."""
    store = _fresh_store(spark, sf_dir, "del")
    store.delete_where("user_id = 'u3'")
    return store.read().groupBy("user_id").agg(F.count("*").cast("bigint").alias("n"))


@register(
    "delete_by_user",
    """
SELECT concat('u', CAST(label AS VARCHAR)) AS user_id, CAST(count(*) AS BIGINT) AS n
FROM embeddings WHERE label <> 3
GROUP BY label
""",
)
def delete_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's exact S7 call — delete_user_vectors(user_id)
    (qdrant_client.py:434-469) — on the bucket-pruned fast path: the user's
    bucket is resolved driver-side, so the locate scan AND the rewrite read
    exactly one bucket of the store (vs delete_by_predicate's general
    delete_where, which must scan the predicate columns of every bucket).
    Same survivor state, cheapest possible mutation."""
    store = _fresh_store(spark, sf_dir, "deluser")
    n = store.delete_user("u3")
    assert n > 0, n
    return store.read().groupBy("user_id").agg(F.count("*").cast("bigint").alias("n"))


@register(
    "upsert_merge",
    """
SELECT CASE WHEN vec_id < 50 THEN 'moved' ELSE concat('u', CAST(label AS VARCHAR)) END AS user_id,
       CAST(count(*) AS BIGINT) AS n
FROM embeddings
GROUP BY 1
""",
)
def upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/S3 upsert (MERGE ON point_id): move the first 50 points to user
    'moved' through the store's real upsert path; report per-user counts."""
    store = _fresh_store(spark, sf_dir, "ups")
    emb = load_table(spark, sf_dir, "embeddings")
    updates = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").cast("string").alias("point_id"),
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("embedding"),
        F.lit("moved").alias("user_id"),
    )
    store.upsert(updates)
    return store.read().groupBy("user_id").agg(F.count("*").cast("bigint").alias("n"))


@register(
    "set_payload_points",
    """
SELECT CAST(vec_id AS VARCHAR) AS point_id,
       CASE WHEN vec_id < 10 THEN 'gold'
            WHEN vec_id < 25 THEN NULL
            ELSE 'bronze' END AS tier,
       CASE WHEN vec_id < 10 THEN '1' ELSE NULL END AS reviewed,
       CASE WHEN vec_id >= 20 AND vec_id < 25 THEN NULL
            ELSE CAST(vec_id AS VARCHAR) END AS seq,
       CAST(CASE WHEN vec_id < 10 THEN 3
                 WHEN vec_id < 20 THEN 1
                 WHEN vec_id < 25 THEN 0
                 ELSE 2 END AS INT) AS n_keys
FROM embeddings WHERE vec_id < 60
""",
)
def set_payload_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant's payload-mutation points API through the store's real
    bucket-selective rewrite path: ``set_payload`` (merge-with-override on
    ids 0–9: tier→gold + new reviewed key), ``delete_payload`` (drop tier
    on ids 10–19; seq survives), ``clear_payload`` (ids 20–24 → empty
    map), everything else byte-identical carry-through.  The oracle states
    the expected post-mutation payload per point — read back as projected
    map entries + key count.

    The store starts EMPTY (``VectorStore.create`` with the 60 points as
    the initial segment) — NOT the corpus-seeded ``_fresh_store`` clone:
    the oracle describes exactly these 60 rows, and ids 0..59 already
    exist in the corpus clone (an ``add_batch`` there would double them
    and every mutation count — the round-9 regression)."""
    import tempfile

    from .operators.store import VectorStore

    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.filter(F.col("vec_id") < 60).select(
        F.col("vec_id").cast("string").alias("point_id"),
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("embedding"),
        F.concat(F.lit("u"), F.col("label").cast("string")).alias("user_id"),
        (F.lit(1000.0) + F.col("vec_id")).alias("ts"),
        F.create_map(
            F.lit("tier"), F.lit("bronze"),
            F.lit("seq"), F.col("vec_id").cast("string"),
        ).alias("metadata"),
    )
    store = VectorStore.create(spark, tempfile.mkdtemp(prefix="vstore_setpl_"), pts)
    n_set = store.set_payload(
        [str(i) for i in range(10)], {"tier": "gold", "reviewed": "1"}
    )
    n_del = store.delete_payload([str(i) for i in range(10, 20)], ["tier"])
    n_clr = store.clear_payload([str(i) for i in range(20, 25)])
    assert (n_set, n_del, n_clr) == (10, 10, 5), (n_set, n_del, n_clr)
    return store.read().select(
        "point_id",
        F.element_at("metadata", "tier").alias("tier"),
        F.element_at("metadata", "reviewed").alias("reviewed"),
        F.element_at("metadata", "seq").alias("seq"),
        F.size("metadata").cast("int").alias("n_keys"),
    )


@register(
    "update_vectors_points",
    """
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
  FROM embeddings WHERE vec_id < 60
),
upd AS (
  SELECT vec_id,
    CASE WHEN vec_id >= 10 AND vec_id < 20 THEN
      list_transform(list_reverse(e),
        x -> x / greatest(sqrt(list_dot_product(list_reverse(e), list_reverse(e))), 1e-12))
    ELSE e END AS e2
  FROM base
)
SELECT CAST(vec_id AS VARCHAR) AS point_id,
       CAST(vec_id AS VARCHAR) AS seq,
       round(e2[4], 6) AS e3,
       round(sqrt(list_dot_product(e2, e2)), 6) AS nrm
FROM upd
""",
)
def update_vectors_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant's vector-mutation points API (``update_vectors``, ``PUT
    /points/vectors``) through the store's bucket-selective rewrite:
    overwrite ONLY the vector of ids 10–19 (reversed embedding,
    L2-normalized at write like ingest) — the payload (``seq``), user_id
    and ts carry through untouched, every other point byte-identical,
    and a nonexistent id in the request is ignored (count = matched
    only).  The oracle states the expected post-mutation vector per point
    (normalized-reversed for the 10, raw seed for the rest) via one
    element + the norm.  Empty-store seed discipline (the r9 lesson):
    the oracle describes exactly these 60 rows."""
    import tempfile

    from .operators.store import VectorStore

    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.filter(F.col("vec_id") < 60).select(
        F.col("vec_id").cast("string").alias("point_id"),
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("embedding"),
        F.concat(F.lit("u"), F.col("label").cast("string")).alias("user_id"),
        (F.lit(1000.0) + F.col("vec_id")).alias("ts"),
        F.create_map(F.lit("seq"), F.col("vec_id").cast("string")).alias("metadata"),
    )
    store = VectorStore.create(spark, tempfile.mkdtemp(prefix="vstore_updvec_"), pts)
    updates = (
        emb.filter((F.col("vec_id") >= 10) & (F.col("vec_id") < 20))
        .select(
            F.col("vec_id").cast("string").alias("point_id"),
            F.reverse("embedding").alias("embedding"),
        )
        .unionByName(
            spark.createDataFrame(
                [("999999", [0.0] * 8)], "point_id string, embedding array<double>"
            )
        )
    )
    n = store.update_vectors(updates)
    assert n == 10, n
    return store.read().select(
        "point_id",
        F.element_at("metadata", "seq").alias("seq"),
        F.round(F.element_at("embedding", 4), 6).alias("e3"),
        F.round(F.expr(norm_sql("embedding")), 6).alias("nrm"),
    )


_blue_green_cache: dict[str, tuple] = {}


def _blue_green_stores(spark: SparkSession, sf_dir: str):
    """The two READ-ONLY collections the alias query swaps between,
    materialized once per sf_dir (the collections pre-exist in a real
    blue/green deployment; the query under test is the SWAP + read, not
    the reindex).  Each invocation still gets its own alias registry."""
    if sf_dir not in _blue_green_cache:
        import tempfile

        from .operators.store import VectorStore

        emb = load_table(spark, sf_dir, "embeddings")

        def pts(n: int, gen: str):
            return emb.filter(F.col("vec_id") < n).select(
                F.col("vec_id").cast("string").alias("point_id"),
                F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("embedding"),
                F.concat(F.lit("u"), F.col("label").cast("string")).alias("user_id"),
                (F.lit(1000.0) + F.col("vec_id")).alias("ts"),
                F.create_map(F.lit("gen"), F.lit(gen)).alias("metadata"),
            )

        _blue_green_cache[sf_dir] = (
            VectorStore.create(spark, tempfile.mkdtemp(prefix="vstore_blue_"), pts(10, "blue")),
            VectorStore.create(spark, tempfile.mkdtemp(prefix="vstore_green_"), pts(60, "green")),
        )
    return _blue_green_cache[sf_dir]


def _prepare_blue_green(spark: SparkSession, sf_dir: str) -> None:
    _blue_green_stores(spark, sf_dir)


PREPARE.append(_prepare_blue_green)


@register(
    "alias_blue_green_read",
    """
SELECT CAST(vec_id AS VARCHAR) AS point_id, 'green' AS gen
FROM embeddings WHERE vec_id < 60
""",
)
def alias_blue_green_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant collection aliases (``update_collection_aliases``): the
    blue/green reindex pattern — serve through a stable alias, reindex
    into a fresh collection, swap the alias ATOMICALLY (one alias-table
    publish; readers see old or new, never a gap or a mix).  The read
    goes through ``resolve()`` AFTER the swap, so the oracle describes
    exactly the green collection: all 60 points, gen=green — any blue
    row (10 points, gen=blue) surviving the swap fails the hash."""
    import tempfile

    from .operators.store import AliasRegistry

    blue, green = _blue_green_stores(spark, sf_dir)
    reg = AliasRegistry(spark, tempfile.mkdtemp(prefix="aliases_"))
    reg.update_aliases([("create", "prod", blue.root)])
    assert reg.aliases() == {"prod": blue.root}
    reg.update_aliases([("create", "prod", green.root)])  # re-point IS the swap
    return reg.resolve("prod").read().select(
        "point_id", F.element_at("metadata", "gen").alias("gen")
    )


def _alias_scripted_registry(spark: SparkSession):
    """A fresh alias registry carrying the scripted five-commit history the
    alias-changefeed queries diff: two tiny collections with DETERMINISTIC
    basenames (blue/green — the tempdir prefix stays out of the oracle via
    basename projection), then create / create / atomic-swap-plus-rename /
    delete / no-op-re-point.  The no-op commit (v5) is the adversarial
    member: it bumps the log version but nets zero change rows — the alias
    plane's compaction-silence contract."""
    import os
    import tempfile

    from .operators.store import AliasRegistry, VectorStore

    root = tempfile.mkdtemp(prefix="aliasfeed_")
    blue = VectorStore.create(spark, os.path.join(root, "blue"))
    green = VectorStore.create(spark, os.path.join(root, "green"))
    reg = AliasRegistry(spark, os.path.join(root, "registry"))
    reg.update_aliases([("create", "prod", blue.root)])    # v1
    reg.update_aliases([("create", "staging", green.root)])  # v2
    reg.update_aliases([                                   # v3: one atomic batch
        ("create", "prod", green.root),                    #   re-point IS the swap
        ("rename", "staging", "shadow"),
    ])
    reg.update_aliases([("delete", "shadow")])             # v4
    reg.update_aliases([("create", "prod", green.root)])   # v5: no-op re-point
    assert reg.current_version() == 5
    assert reg.aliases() == {"prod": green.root}
    return reg


_ALIAS_EVENTS_ORACLE = """
SELECT CAST(version AS INT) AS version, change, alias, coll FROM (VALUES
  (1, 'set', 'prod', 'blue'),
  (2, 'set', 'staging', 'green'),
  (3, 'unset', 'prod', 'blue'),
  (3, 'set', 'prod', 'green'),
  (3, 'unset', 'staging', 'green'),
  (3, 'set', 'shadow', 'green'),
  (4, 'unset', 'shadow', 'green')
) AS t(version, change, alias, coll)
"""


def _alias_events_project(feed: DataFrame) -> DataFrame:
    return feed.select(
        F.col("version").cast("int").alias("version"),
        "change",
        "alias",
        F.element_at(F.split("target", "/"), -1).alias("coll"),
    )


@register("alias_changelog", _ALIAS_EVENTS_ORACLE)
def alias_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed over the ALIAS control plane (r16 VERDICT item 4):
    every ``update_collection_aliases`` batch commits an immutable
    ``alias_log_<v>.json`` (the VectorStore manifest-log discipline,
    r17), so the control plane is time-travelable and diffable —
    ``alias_changes(0)`` replays the scripted history as logical set /
    unset rows per version.  The oracle states all seven: the atomic v3
    batch must surface as one version carrying BOTH the blue→green swap
    (unset+set on prod) and the staging→shadow rename (unset staging,
    set shadow), and the v5 no-op re-point must emit NOTHING — version
    advanced, zero rows, the compaction-silence contract one level up.
    Scale: the alias table is bounded driver state by construction
    (collections, not points), so the diff is a JSON walk — what
    matters is the log making alias history auditable and tailable."""
    reg = _alias_scripted_registry(spark)
    return _alias_events_project(reg.alias_changes(0))


@register("stream_alias_events", _ALIAS_EVENTS_ORACLE)
def stream_alias_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The alias changefeed as a CONTINUOUS stage — the last batch-only
    store surface gains its streaming twin (r16 VERDICT item 4,
    completing the 'every batch op also runs continuously' charter):
    `streaming/aliasfeed.py` tails the registry's immutable alias log
    with a Structured Streaming file source (one commit per micro-batch)
    and emits each version's single-commit diff exactly once,
    per-directory-overwrite idempotent under foreachBatch retries — a
    serving tier follows blue/green swaps live instead of polling the
    alias file.  Same scripted history and oracle as the batch
    `alias_changelog` (the drain-equals-batch contract, pinned as an
    equality in tests/test_stream_replay.py), including the v5 no-op
    commit that must drain as a version with ZERO rows."""
    from .streaming.aliasfeed import alias_feed_stream

    reg = _alias_scripted_registry(spark)
    return _alias_events_project(alias_feed_stream(spark, reg, since=0))


@register(
    "points_update_batch",
    """
WITH base AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
  FROM embeddings WHERE vec_id < 40
),
n AS (
  SELECT vec_id, label, e,
    list_transform(e,
      x -> x / greatest(sqrt(list_dot_product(e, e)), 1e-12)) AS en,
    list_transform(list_reverse(e),
      x -> x / greatest(sqrt(list_dot_product(e, e)), 1e-12)) AS er
  FROM base
),
fin AS (
  SELECT vec_id, label,
    CASE WHEN vec_id BETWEEN 3 AND 7 THEN er
         WHEN vec_id < 3 THEN en
         ELSE e END AS ef
  FROM n WHERE NOT vec_id BETWEEN 8 AND 12
)
SELECT CAST(vec_id AS VARCHAR) AS point_id,
       CASE WHEN vec_id < 5 THEN 'moved'
            ELSE concat('u', CAST(label AS VARCHAR)) END AS user_id,
       CASE WHEN vec_id < 8 THEN 'gold'
            WHEN vec_id BETWEEN 13 AND 15 THEN NULL
            ELSE 'bronze' END AS tier,
       CASE WHEN vec_id < 5 OR vec_id BETWEEN 13 AND 15 THEN NULL
            ELSE CAST(vec_id AS VARCHAR) END AS seq,
       CAST(CASE WHEN vec_id < 5 THEN 1
                 WHEN vec_id BETWEEN 13 AND 15 THEN 0
                 ELSE 2 END AS INT) AS n_keys,
       round(ef[4], 6) AS e3,
       round(sqrt(list_dot_product(ef, ef)), 6) AS nrm
FROM fin
""",
)
def points_update_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant's points batch-update API (``batch_update_points``): an
    ORDERED op sequence through ``VectorStore.apply_batch`` whose ranges
    deliberately overlap so the oracle proves sequential consistency —
    the upsert wipes ids 0–4's payloads (and moves them to user 'moved',
    normalizing at write), THEN set_payload puts ``tier=gold`` on ids 0–9
    (so the wiped rows end with exactly one key), THEN update_vectors
    (in the SAME coalesced rewrite run since r15) overwrites ids 3–8's
    vectors with their normalized reverses — id 8 still live, so it
    counts — THEN the delete removes ids 8–12 (two freshly gilded rows
    and one freshly re-vectored row among them), THEN clear_payload
    empties ids 13–15.  Any reordering changes the final state the
    oracle pins, now including each survivor's vector (element + norm:
    reversed-normalized for 3–7, upsert-normalized for 0–2, raw seed
    for the rest)."""
    import tempfile

    from .operators.store import VectorStore

    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.filter(F.col("vec_id") < 40).select(
        F.col("vec_id").cast("string").alias("point_id"),
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("embedding"),
        F.concat(F.lit("u"), F.col("label").cast("string")).alias("user_id"),
        (F.lit(1000.0) + F.col("vec_id")).alias("ts"),
        F.create_map(
            F.lit("tier"), F.lit("bronze"),
            F.lit("seq"), F.col("vec_id").cast("string"),
        ).alias("metadata"),
    )
    store = VectorStore.create(spark, tempfile.mkdtemp(prefix="vstore_batch_"), pts)
    moved = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").cast("string").alias("point_id"),
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("embedding"),
        F.lit("moved").alias("user_id"),
    )
    revved = (
        emb.filter((F.col("vec_id") >= 3) & (F.col("vec_id") <= 8))
        .select(
            F.col("vec_id").cast("string").alias("point_id"),
            F.reverse("embedding").alias("embedding"),
        )
        .unionByName(
            spark.createDataFrame(
                [("999999", [0.0] * 8)], "point_id string, embedding array<double>"
            )
        )
    )
    counts = store.apply_batch(
        [
            ("upsert", moved),
            ("set_payload", [str(i) for i in range(10)], {"tier": "gold"}),
            ("update_vectors", revved),
            ("delete", [str(i) for i in range(8, 13)]),
            ("clear_payload", [str(i) for i in range(13, 16)]),
        ]
    )
    assert counts == [5, 10, 6, 5, 3], counts
    return store.read().select(
        "point_id",
        "user_id",
        F.element_at("metadata", "tier").alias("tier"),
        F.element_at("metadata", "seq").alias("seq"),
        F.size("metadata").cast("int").alias("n_keys"),
        F.round(F.element_at("embedding", 4), 6).alias("e3"),
        F.round(F.expr(norm_sql("embedding")), 6).alias("nrm"),
    )


@register(
    "add_batch_append",
    """
WITH base AS (
  SELECT concat('u', CAST(label AS VARCHAR)) AS user_id FROM embeddings
  UNION ALL
  SELECT 'new_user' FROM range(10)
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM base GROUP BY user_id
""",
)
def add_batch_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 batch add: append 10 synthetic one-hot points (uuid ids, write-time
    L2 normalization — qdrant_client.py:242-309) and report per-user counts."""
    store = _fresh_store(spark, sf_dir, "add")
    dim = 64
    rows = [([2.0 if j == i else 0.0 for j in range(dim)],) for i in range(10)]
    batch = (
        spark.createDataFrame(rows, "embedding array<double>")
        .withColumn("user_id", F.lit("new_user"))
    )
    store.add_batch(batch)
    return store.read().groupBy("user_id").agg(F.count("*").cast("bigint").alias("n"))


@register(
    "store_search_api",
    f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < {N_QUERIES}
),
scored AS (
  SELECT q.q_id, CAST(e.vec_id AS VARCHAR) AS point_id,
         {_dcos('e.embedding', 'q.q_emb')} AS score
  FROM embeddings e CROSS JOIN q
  WHERE e.label = 3
),
ranked AS (
  SELECT q_id, point_id, score,
         row_number() OVER (PARTITION BY q_id ORDER BY score DESC, point_id) AS rank
  FROM scored WHERE score >= 0.0
)
SELECT q_id, point_id, CAST(rank AS INT) AS rank, round(score, 6) AS score
FROM ranked WHERE rank <= 5
""",
)
def store_search_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full service read path end-to-end: points live in the versioned
    store (bucket-partitioned by user), and search runs through
    ``VectorStore.search`` — user filter pruned to one partition (O1),
    threshold, top-k keyed by point_id (string tiebreak, as stored)."""
    store = _fresh_store(spark, sf_dir, "api")
    return store.search(
        _probes(spark, sf_dir), k=5, score_threshold=0.0, user_filter="u3"
    )


@register(
    "snapshot_restore_read",
    """
SELECT CAST(vec_id AS VARCHAR) AS point_id, 'green' AS gen
FROM embeddings WHERE vec_id < 60
""",
)
def snapshot_restore_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant ``create_snapshot`` / ``recover_snapshot``: a self-contained
    portable copy of one collection version, restored as a fresh
    collection and read back.  Unlike the zero-copy ``clone`` (borrowed
    files, dies with source-side vacuum), the snapshot owns its bytes —
    the oracle describes the snapshotted version exactly; pinning against
    post-snapshot source mutations is pytest-covered
    (tests/test_invariants.py)."""
    import tempfile

    from .operators.store import VectorStore

    _, green = _blue_green_stores(spark, sf_dir)
    snap = green.snapshot(tempfile.mkdtemp(prefix="snap_"))
    restored = VectorStore.restore(spark, snap, tempfile.mkdtemp(prefix="restored_"))
    return restored.read().select(
        "point_id", F.element_at("metadata", "gen").alias("gen")
    )


@register(
    "tenant_routed_search",
    f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < {N_QUERIES}
),
scored AS (
  SELECT q.q_id, CAST(e.vec_id AS VARCHAR) AS point_id,
         {_dcos('e.embedding', 'q.q_emb')} AS score
  FROM embeddings e CROSS JOIN q
  WHERE concat('u', CAST(e.label AS VARCHAR)) IN ('u2', 'u5')
),
ranked AS (
  SELECT q_id, point_id, score,
         row_number() OVER (PARTITION BY q_id ORDER BY score DESC, point_id) AS rank
  FROM scored
)
SELECT q_id, point_id, CAST(rank AS INT) AS rank, round(score, 6) AS score
FROM ranked WHERE rank <= 5
""",
)
def tenant_routed_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant multitenant ``shard_key_selector``: the search fans out to
    only the selected tenants' shards.  Here the manifest routes the key
    set {u2, u5} to its buckets' files — every other tenant's files are
    never even enumerated (stronger than partition pruning), then the
    exact ``user_id IN`` predicate pushes inside the surviving buckets.
    At 100 TB a two-tenant query costs two tenants' data, not the corpus
    (tests/test_plans.py pins the file-list pruning)."""
    store = _fresh_store(spark, sf_dir, "tenant")
    return store.search(_probes(spark, sf_dir), k=5, shard_selector=["u2", "u5"])


@register(
    "dedup_keep_newest",
    """
SELECT user_id, point_id, ts
FROM (
  SELECT concat('u', CAST(label AS VARCHAR)) AS user_id,
         CAST(vec_id AS VARCHAR) AS point_id,
         1000.0 + vec_id AS ts,
         row_number() OVER (PARTITION BY label ORDER BY 1000.0 + vec_id DESC, vec_id) AS rn
  FROM embeddings
)
WHERE rn = 1
""",
)
def dedup_keep_newest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.6 derived dedup: keep the newest point per user — the
    write-time compaction an LLM pipeline runs where the reference keeps
    every row and filters at query time (P1+P3).  One window pass, shuffle
    keyed on user_id; at scale this is the same plan per partition."""
    store = _fresh_store(spark, sf_dir, "keepnew")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.col("point_id"))
    return (
        store.read()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "point_id", "ts")
    )


@register(
    "delete_by_id",
    """
SELECT concat('u', CAST(label AS VARCHAR)) AS user_id, CAST(count(*) AS BIGINT) AS n
FROM embeddings WHERE vec_id >= 10
GROUP BY label
""",
)
def delete_by_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6: delete the first ten points by id through the store's real delete
    path (qdrant_client.py:407-432), asserting the exact deleted count, then
    report surviving per-user counts."""
    store = _fresh_store(spark, sf_dir, "delid")
    n = store.delete_by_id([str(i) for i in range(10)])
    assert n == 10, n
    return store.read().groupBy("user_id").agg(F.count("*").cast("bigint").alias("n"))


@register(
    "time_travel_read",
    """
SELECT 'v_now' AS snapshot, concat('u', CAST(label AS VARCHAR)) AS user_id,
       CAST(count(*) AS BIGINT) AS n
FROM embeddings WHERE label <> 3 GROUP BY label
UNION ALL
SELECT 'v_past', concat('u', CAST(label AS VARCHAR)), CAST(count(*) AS BIGINT)
FROM embeddings GROUP BY label
""",
)
def time_travel_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot isolation as a queryable surface: after a predicate delete,
    the PRIOR manifest version still serves the pre-delete state (Delta-
    style time travel — the manifest log keeps every version until
    vacuum()).  Mirrors the reference's consistent-segment reads
    (qdrant_client.py:117-127) and proves mutations never modify shared
    files in place."""
    store = _fresh_store(spark, sf_dir, "ttravel")
    v_before = store._current_version()
    store.delete_where("user_id = 'u3'")
    now = store.read().groupBy("user_id").agg(F.count("*").cast("bigint").alias("n"))
    past = (
        store.read(version=v_before)
        .groupBy("user_id")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    return now.select(F.lit("v_now").alias("snapshot"), "user_id", "n").unionByName(
        past.select(F.lit("v_past").alias("snapshot"), "user_id", "n")
    )


@register(
    "store_changelog",
    """
WITH e AS (
  SELECT vec_id, label, concat('u', CAST(label AS VARCHAR)) AS user_id
  FROM embeddings
)
SELECT 'delete' AS change, user_id, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(1000.0 + vec_id) AS DOUBLE) AS ts_sum
FROM e WHERE label = 2 GROUP BY user_id
UNION ALL
SELECT 'update_preimage', user_id, CAST(count(*) AS BIGINT),
       CAST(sum(1000.0 + vec_id) AS DOUBLE)
FROM e WHERE vec_id < 10 AND label <> 2 GROUP BY user_id
UNION ALL
SELECT 'update_postimage', user_id, CAST(count(*) AS BIGINT),
       CAST(sum(500000000.0 + vec_id) AS DOUBLE)
FROM e WHERE vec_id < 10 AND label <> 2 GROUP BY user_id
UNION ALL
SELECT 'insert', 'unew', CAST(count(*) AS BIGINT),
       CAST(sum(700000000.0 + vec_id) AS DOUBLE)
FROM e WHERE vec_id < 5
""",
)
def store_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed between manifest versions (Delta CDF semantics over
    the segment store — the missing half of time travel: not just "read the
    past" but "what changed since").  The query commits three mutation
    generations on a fresh clone — a predicate delete (u2), an upsert that
    UPDATES ten existing points (ts bump) and INSERTS five new ones, and a
    full compaction — then reads ``changes(v0)`` and aggregates per
    (change, user).  The oracle states the logical truth; the compaction is
    the adversarial part, because it rewrites EVERY file (maximal physical
    churn) yet must emit zero change rows — content-identity, not file
    identity, defines the feed.  Scale: only files added/removed between
    the versions are scanned (immutable segments make file identity a
    content proof for the untouched bulk), then one full-outer join keyed
    on point_id inside the churned slice."""
    store = _fresh_store(spark, sf_dir, "cdc")
    v0 = store._current_version()
    store.delete_where("user_id = 'u2'")
    emb = load_table(spark, sf_dir, "embeddings")

    def _rows(df: DataFrame, pid, user, ts) -> DataFrame:
        return df.select(
            pid.alias("point_id"),
            F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("embedding"),
            user.alias("user_id"),
            ts.alias("ts"),
            F.create_map().cast("map<string,string>").alias("metadata"),
        )

    updates = _rows(
        emb.filter((F.col("vec_id") < 10) & (F.col("label") != 2)),
        F.col("vec_id").cast("string"),
        F.concat(F.lit("u"), F.col("label").cast("string")),
        F.lit(5.0e8) + F.col("vec_id"),
    )
    inserts = _rows(
        emb.filter(F.col("vec_id") < 5),
        F.concat(F.lit("n"), F.col("vec_id").cast("string")),
        F.lit("unew"),
        F.lit(7.0e8) + F.col("vec_id"),
    )
    store.upsert(updates.unionByName(inserts), normalize=False)
    store.compact(max_files_per_bucket=1)
    return (
        store.changes(v0)
        .groupBy("change", "user_id")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("ts").cast("double").alias("ts_sum"),
        )
    )


@register(
    "stream_store_changelog",
    """
WITH e AS (
  SELECT vec_id, label, concat('u', CAST(label AS VARCHAR)) AS user_id
  FROM embeddings
)
SELECT 1 AS step, 'delete' AS change, user_id,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(1000.0 + vec_id) AS DOUBLE) AS ts_sum
FROM e WHERE label = 2 GROUP BY user_id
UNION ALL
SELECT 2, 'update_preimage', user_id, CAST(count(*) AS BIGINT),
       CAST(sum(1000.0 + vec_id) AS DOUBLE)
FROM e WHERE vec_id < 10 AND label <> 2 GROUP BY user_id
UNION ALL
SELECT 2, 'update_postimage', user_id, CAST(count(*) AS BIGINT),
       CAST(sum(500000000.0 + vec_id) AS DOUBLE)
FROM e WHERE vec_id < 10 AND label <> 2 GROUP BY user_id
UNION ALL
SELECT 2, 'insert', 'unew', CAST(count(*) AS BIGINT),
       CAST(sum(700000000.0 + vec_id) AS DOUBLE)
FROM e WHERE vec_id < 5
""",
)
def stream_store_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The change-data-feed as a CONTINUOUS stage (r15 VERDICT item 4):
    the manifest log is itself a stream — one immutable
    ``manifest_<v>.json`` per commit — so `streaming/changefeed.py` tails
    it with a Structured Streaming file source (one commit per
    micro-batch) and emits each version's single-commit diff exactly
    once, per-directory-overwrite idempotent under foreachBatch retries.

    Same three mutation generations as the batch `store_changelog`
    (predicate delete → mixed update/insert upsert → full compaction),
    but the feed now carries per-COMMIT granularity: the ``step`` column
    (version − v0) pins WHICH commit produced each change — deletes in
    step 1, updates+inserts in step 2, and the compaction (maximal
    physical churn, step 3) emits ZERO rows, which the oracle asserts by
    listing no step-3 group.  Because no entity is touched twice, the
    union of per-commit diffs here equals the batch endpoint diff — the
    drain-equals-batch contract, with the step split as the extra
    evidence only a true per-commit tail can produce."""
    from .streaming.changefeed import changes_feed_stream

    store = _fresh_store(spark, sf_dir, "cdcstream")
    v0 = store._current_version()
    store.delete_where("user_id = 'u2'")
    emb = load_table(spark, sf_dir, "embeddings")

    def _rows(df: DataFrame, pid, user, ts) -> DataFrame:
        return df.select(
            pid.alias("point_id"),
            F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("embedding"),
            user.alias("user_id"),
            ts.alias("ts"),
            F.create_map().cast("map<string,string>").alias("metadata"),
        )

    updates = _rows(
        emb.filter((F.col("vec_id") < 10) & (F.col("label") != 2)),
        F.col("vec_id").cast("string"),
        F.concat(F.lit("u"), F.col("label").cast("string")),
        F.lit(5.0e8) + F.col("vec_id"),
    )
    inserts = _rows(
        emb.filter(F.col("vec_id") < 5),
        F.concat(F.lit("n"), F.col("vec_id").cast("string")),
        F.lit("unew"),
        F.lit(7.0e8) + F.col("vec_id"),
    )
    store.upsert(updates.unionByName(inserts), normalize=False)
    store.compact(max_files_per_bucket=1)
    feed = changes_feed_stream(spark, store, since=v0)
    return (
        feed.withColumn("step", (F.col("version") - v0).cast("int"))
        .groupBy("step", "change", "user_id")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("ts").cast("double").alias("ts_sum"),
        )
    )


@register(
    "time_range_scan",
    """
SELECT concat('u', CAST(label AS VARCHAR)) AS user_id,
       CAST(count(*) AS BIGINT) AS n, TRUE AS pruned
FROM embeddings WHERE vec_id < 50
GROUP BY label
""",
)
def time_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATETIME payload-index semantics (advanced_indexing.py:61-69) as
    manifest data skipping: a fresh batch lands with a disjoint ts band
    (5000+), and a ``ts_range`` read drops every base-corpus file from the
    scan using the per-file min/max the manifest recorded at write time —
    before Spark ever plans the job.  The ``pruned`` flag asserts the scan
    touched strictly fewer files than the store holds; the oracle pins it
    TRUE and checks the surviving rows."""
    store = _fresh_store(spark, sf_dir, "tsrange")
    emb = load_table(spark, sf_dir, "embeddings")
    # base corpus carries ts = 1000 + vec_id; a 1e9 band stays disjoint at
    # any scale factor (1e9 base rows is beyond any fixture), so the oracle
    # contract cannot silently break at a larger sf
    batch = emb.filter(F.col("vec_id") < 50).select(
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("embedding"),
        F.concat(F.lit("u"), F.col("label").cast("string")).alias("user_id"),
        (F.lit(1.0e9) + F.col("vec_id")).alias("ts"),
    )
    store.add_batch(batch, normalize=False)
    total_files = len(store.input_files())
    df = store.read(ts_range=(1.0e9, 2.0e9))
    scanned = len(df.inputFiles())
    return (
        df.groupBy("user_id")
        .agg(F.count("*").cast("bigint").alias("n"))
        .withColumn("pruned", F.lit(bool(0 < scanned < total_files)))
    )


@register(
    "store_compaction",
    """
WITH allrows AS (
  SELECT label FROM embeddings
  UNION ALL SELECT label FROM embeddings WHERE vec_id < 30
  UNION ALL SELECT label FROM embeddings WHERE vec_id >= 30 AND vec_id < 60
)
SELECT concat('u', CAST(label AS VARCHAR)) AS user_id,
       CAST(count(*) AS BIGINT) AS n, TRUE AS compacted
FROM allrows GROUP BY label
""",
)
def store_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O7 segment optimizer: two small appends fragment every bucket into
    three files; ``compact()`` merges each back to one (Qdrant's background
    segment merge, qdrant_client.py:117-125).  The result is the SAME rows
    from fewer files — the query returns per-user counts read from the
    compacted snapshot plus a ``compacted`` flag asserting the file count
    actually shrank, which the oracle pins to TRUE."""
    store = _fresh_store(spark, sf_dir, "compact")
    emb = load_table(spark, sf_dir, "embeddings")

    def _slice(lo: int, hi: int) -> DataFrame:
        return emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)).select(
            F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("embedding"),
            F.concat(F.lit("u"), F.col("label").cast("string")).alias("user_id"),
        )

    store.add_batch(_slice(0, 30), normalize=False)
    store.add_batch(_slice(30, 60), normalize=False)
    before = len(store.input_files())
    n_merged = store.compact(max_files_per_bucket=1)
    after = len(store.input_files())
    return (
        store.read()
        .groupBy("user_id")
        .agg(F.count("*").cast("bigint").alias("n"))
        .withColumn("compacted", F.lit(bool(n_merged > 0 and after < before)))
    )


@register(
    "payload_index_filter",
    """
SELECT CAST(vec_id AS VARCHAR) AS point_id,
       concat('u', CAST(label AS VARCHAR)) AS user_id,
       CAST(1000.0 + vec_id AS DOUBLE) AS ts,
       CAST((vec_id % 4) * 0.25 AS DOUBLE) AS confidence_score,
       CAST(vec_id % 5 AS INT) AS face_quality,
       concat('g', CAST(vec_id % 3 AS VARCHAR)) AS enrollment_group
FROM embeddings
WHERE concat('u', CAST(label AS VARCHAR)) IN ('u1', 'u2', 'u4')
  AND 1000.0 + vec_id BETWEEN 1100.0 AND 1900.0
  AND (vec_id % 4) * 0.25 >= 0.5
  AND vec_id % 5 >= 2
  AND concat('g', CAST(vec_id % 3 AS VARCHAR)) IN ('g0', 'g2')
""",
)
def payload_index_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full advanced-indexing path (advanced_indexing.py:39-210):
    schemaless payload metadata → per-field typed-column promotion (the
    engine's 'create_payload_index') → the five-condition composite filter
    of create_advanced_filters (user in-list, timestamp range,
    confidence >=, quality >=, enrollment-group in-list).  Every condition
    lands on a typed column, so the whole conjunction is one pushable
    parquet predicate — the columnar form of the reference's RAM field
    indexes.  Metadata values are exact binary fractions (k * 0.25) so the
    string round-trip through the map is lossless."""
    from .operators.payload_index import advanced_filter, promote_payload_fields

    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        F.col("vec_id").cast("string").alias("point_id"),
        F.concat(F.lit("u"), F.col("label").cast("string")).alias("user_id"),
        (F.lit(1000.0) + F.col("vec_id")).alias("ts"),
        F.create_map(
            F.lit("confidence_score"),
            ((F.col("vec_id") % 4) * 0.25).cast("string"),
            F.lit("face_quality"),
            (F.col("vec_id") % 5).cast("string"),
            F.lit("enrollment_group"),
            F.concat(F.lit("g"), (F.col("vec_id") % 3).cast("string")),
        ).alias("metadata"),
    )
    idx = promote_payload_fields(
        pts,
        {"confidence_score": "float", "face_quality": "integer", "enrollment_group": "keyword"},
    )
    return advanced_filter(
        idx,
        user_ids=["u1", "u2", "u4"],
        time_range={"start": 1100.0, "end": 1900.0},
        confidence_min=0.5,
        quality_min=2,
        enrollment_groups=["g0", "g2"],
    ).select(
        "point_id", "user_id", "ts", "confidence_score", "face_quality", "enrollment_group"
    )


@register(
    "advanced_filter_should_not",
    """
SELECT CAST(vec_id AS VARCHAR) AS point_id,
       concat('u', CAST(label AS VARCHAR)) AS user_id,
       CAST(1000.0 + vec_id AS DOUBLE) AS ts,
       CAST((vec_id % 4) * 0.25 AS DOUBLE) AS confidence_score,
       CAST(vec_id % 5 AS INT) AS face_quality,
       CASE WHEN vec_id % 7 = 0 THEN NULL
            ELSE concat('g', CAST(vec_id % 3 AS VARCHAR)) END AS enrollment_group
FROM embeddings
WHERE (1000.0 + vec_id >= 1050.0 AND 1000.0 + vec_id < 1950.0)
  AND (vec_id % 5 >= 4 OR (vec_id % 4) * 0.25 = 0.75)
  AND ((CASE WHEN vec_id % 7 = 0 THEN NULL
             ELSE concat('g', CAST(vec_id % 3 AS VARCHAR)) END = 'g1') IS NOT TRUE)
  AND ((concat('u', CAST(label AS VARCHAR)) = 'u3') IS NOT TRUE)
""",
)
def advanced_filter_should_not(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant's full public ``Filter`` combinator surface — the clause
    types the reference never composes (it builds must-only conjunctions,
    advanced_indexing.py:147-208): ``must`` (ts range) AND ``should``
    (quality >= 4 OR confidence == 0.75) AND ``must_not`` (group g1,
    user u3).  The 3VL pin: enrollment_group is NULL for every 7th point,
    and Qdrant's must_not passes points with the field ABSENT — so the
    predicate compiles to ``(cond) IS NOT TRUE`` (a pushable
    ``NOT ... OR IS NULL`` disjunction), not SQL ``NOT``, and the NULL-group
    rows that satisfy the other clauses MUST appear in the result.  The
    DuckDB oracle states the same IS NOT TRUE predicate."""
    from .operators.payload_index import promote_payload_fields, qdrant_filter

    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        F.col("vec_id").cast("string").alias("point_id"),
        F.concat(F.lit("u"), F.col("label").cast("string")).alias("user_id"),
        (F.lit(1000.0) + F.col("vec_id")).alias("ts"),
        F.create_map(
            F.lit("confidence_score"),
            ((F.col("vec_id") % 4) * 0.25).cast("string"),
            F.lit("face_quality"),
            (F.col("vec_id") % 5).cast("string"),
            F.lit("enrollment_group"),
            F.when(
                F.col("vec_id") % 7 == 0, F.lit(None).cast("string")
            ).otherwise(F.concat(F.lit("g"), (F.col("vec_id") % 3).cast("string"))),
        ).alias("metadata"),
    )
    idx = promote_payload_fields(
        pts,
        {"confidence_score": "float", "face_quality": "integer", "enrollment_group": "keyword"},
    )
    return qdrant_filter(
        idx,
        {
            "must": [{"key": "ts", "range": {"gte": 1050.0, "lt": 1950.0}}],
            "should": [
                {"key": "face_quality", "range": {"gte": 4}},
                {"key": "confidence_score", "match": {"value": 0.75}},
            ],
            "must_not": [
                {"key": "enrollment_group", "match": {"any": ["g1"]}},
                {"key": "user_id", "match": {"value": "u3"}},
            ],
        },
    ).select(
        "point_id", "user_id", "ts", "confidence_score", "face_quality", "enrollment_group"
    )


@register(
    "count_filtered",
    """
SELECT CAST(count(*) AS BIGINT) AS n
FROM embeddings
WHERE (vec_id >= 100 AND vec_id < 4000)
  AND (label IN (1, 3) OR label >= 9)
  AND ((label = 3) IS NOT TRUE)
""",
)
def count_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant's ``count`` API (``client.count(collection, count_filter=…,
    exact=True)``) over the full Filter model: must range + should
    disjunction + IS-NOT-TRUE must_not, counted exactly.  The whole
    predicate pushes to the scan and the count is map-side partial —
    exactness is free in a columnar engine (the reference's client
    exposes the same call; Qdrant's exact=False approximation exists for
    its segment internals, not needed here)."""
    from .operators.payload_index import count_points

    emb = load_table(spark, sf_dir, "embeddings")
    return count_points(
        emb,
        {
            "must": [{"key": "vec_id", "range": {"gte": 100, "lt": 4000}}],
            "should": [
                {"key": "label", "match": {"any": [1, 3]}},
                {"key": "label", "range": {"gte": 9}},
            ],
            "must_not": [{"key": "label", "match": {"value": 3}}],
        },
        id_col="vec_id",
    )


@register(
    "payload_projection",
    """
SELECT CAST(vec_id AS VARCHAR) AS point_id, 'test_id' AS key, CAST(vec_id AS VARCHAR) AS value
FROM embeddings
UNION ALL
SELECT CAST(vec_id AS VARCHAR), 'category', concat('category_', CAST(label % 10 AS VARCHAR))
FROM embeddings
""",
)
def payload_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6/F6/F7: payload construction and result shaping as map algebra —
    merge system fields with caller metadata (map_concat, the payload build
    at qdrant_client.py:209-213), then project the metadata back OUT of the
    payload (map_filter, the result shaping at qdrant_client.py:383-384),
    emitted as exploded key/value rows."""
    emb = load_table(spark, sf_dir, "embeddings")
    payload = F.map_concat(
        F.create_map(
            F.lit("user_id"), F.concat(F.lit("u"), F.col("label").cast("string")),
            F.lit("timestamp"), (F.lit(1000.0) + F.col("vec_id")).cast("string"),
        ),
        F.create_map(
            F.lit("test_id"), F.col("vec_id").cast("string"),
            F.lit("category"), F.concat(F.lit("category_"), (F.col("label") % 10).cast("string")),
        ),
    )
    shaped = emb.withColumn("payload", payload).select(
        F.col("vec_id").cast("string").alias("point_id"),
        F.explode(
            F.expr("map_filter(payload, (k, v) -> k NOT IN ('user_id', 'timestamp'))")
        ).alias("key", "value"),
    )
    return shaped


@register(
    "match_text_filter",
    r"""
SELECT doc_id, lang, source
FROM documents
WHERE list_contains(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'), 'spark')
  AND list_contains(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'), 'window')
  AND list_contains(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'), 'query')
  AND (list_contains(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'), 'vector')
       IS NOT TRUE)
""",
)
def match_text_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant ``MatchText`` (full-text payload index, ``match: {"text":
    …}``): every query token present in the field under the text index's
    word tokenizer + lowercasing — here as a ``must`` text match AND a
    ``must_not`` text match (IS-NOT-TRUE negation).  The reference's
    payload filters are exact-match only (advanced_indexing.py:147-208);
    this is the text-index condition Qdrant adds on top.  Columnar shape:
    one scan, the tokenization + containment runs fused in codegen —
    Qdrant pays an inverted-index probe instead; at 100 TB the relational
    analogue of that index is ``tfidf_top_terms``'s posting table, and
    this predicate is the scan-side fallback that needs no index at all."""
    from .operators.payload_index import qdrant_filter

    docs = load_table(spark, sf_dir, "documents")
    return qdrant_filter(
        docs,
        {
            "must": [{"key": "text", "match": {"text": "spark window query"}}],
            "must_not": [{"key": "text", "match": {"text": "vector"}}],
        },
        id_col="doc_id",
    ).select("doc_id", "lang", "source")


@register(
    "match_text_multilingual",
    f"""
WITH aug AS (
  SELECT doc_id, lang,
         text
         || CASE WHEN doc_id % 7 = 0 THEN ' 向量搜索引擎' ELSE '' END
         || CASE WHEN doc_id % 7 = 3 THEN ' 搜索速' ELSE '' END AS t
  FROM documents
),
tk AS (
  SELECT doc_id, lang,
         regexp_split_to_array(
           regexp_replace(lower(t), '({_CJK_CHAR_CLASS})', ' \\1 ', 'g'),
           '[^\\p{{L}}\\p{{N}}]+') AS toks
  FROM aug
)
SELECT doc_id, lang
FROM tk
WHERE list_contains(toks, 'spark')
  AND list_contains(toks, '搜') AND list_contains(toks, '索')
  AND list_contains(toks, '引') AND list_contains(toks, '擎')
""",
)
def match_text_multilingual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant ``TextIndexParams(tokenizer=MULTILINGUAL)``, best-effort:
    charabia segments scripts without word boundaries CHARACTER-wise, so
    a Han/kana/hangul query token matches per codepoint while Latin words
    keep word segmentation — one query string mixes both here
    ('spark 搜索引擎' → tokens [spark, 搜, 索, 引, 擎], all required).
    The fixture PLANTS the CJK payloads deterministically (the synthetic
    corpus is ASCII): doc_id % 7 == 0 carries the full phrase, % 7 == 3 a
    two-char decoy that must NOT match.  Index-time and query-time
    analysis share one codepoint-class space-injection
    (payload_index._CJK_CHAR_CLASS — the identical literal in Java regex,
    RE2, and Python re), mirroring Qdrant's analyzer symmetry.  Full ICU
    segmentation (Thai/Khmer/Lao) stays gated with remediation.  Same
    one-scan fused-codegen shape as ``match_text_filter``."""
    from .operators.payload_index import qdrant_filter

    docs = load_table(spark, sf_dir, "documents")
    aug = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 7 == 0, F.lit(" 向量搜索引擎")).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 7 == 3, F.lit(" 搜索速")).otherwise(F.lit("")),
        ),
    )
    return qdrant_filter(
        aug,
        {
            "must": [
                {
                    "key": "text",
                    "match": {
                        "text": "spark 搜索引擎",
                        "params": {"tokenizer": "multilingual"},
                    },
                }
            ]
        },
        id_col="doc_id",
    ).select("doc_id", "lang")


@register(
    "match_text_prefix",
    r"""
SELECT doc_id, lang
FROM documents
WHERE len(list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
          t -> len(t) BETWEEN 2 AND 12 AND starts_with(t, 'spar'))) > 0
  AND len(list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
          t -> len(t) BETWEEN 2 AND 12 AND starts_with(t, 'win'))) > 0
""",
)
def match_text_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant ``TextIndexParams(tokenizer=PREFIX, min_token_len,
    max_token_len)``: the text index stores min..max-length prefixes of
    every token, so a query token matches any field token it PREFIXES —
    'spar' hits 'spark', 'win' hits 'window'.  The schema-free compiler
    inlines the index declaration at the condition (``match.params``);
    query-time analysis mirrors index-time (same tokenizer, same bounds —
    an out-of-bounds query token matches nothing, exactly as an unindexed
    prefix).  Compiled to an EXISTS higher-order predicate per query
    token — still one scan, fused codegen, zero shuffles; Qdrant pays a
    prefix-trie probe, this is the scan-side fallback."""
    from .operators.payload_index import qdrant_filter

    docs = load_table(spark, sf_dir, "documents")
    params = {"tokenizer": "prefix", "min_token_len": 2, "max_token_len": 12}
    return qdrant_filter(
        docs,
        {
            "must": [
                {"key": "text", "match": {"text": "spar win", "params": params}},
            ]
        },
        id_col="doc_id",
    ).select("doc_id", "lang")


@register(
    "match_phrase_filter",
    r"""
SELECT doc_id, n_chars
FROM documents
WHERE concat(' ', regexp_replace(lower(text), '[^\p{L}\p{N}]+', ' ', 'g'), ' ')
      LIKE '% fast sort %'
""",
)
def match_phrase_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant ``MatchPhrase`` (``match: {"phrase": …}``, phrase matching
    on a text index): the query tokens appear CONSECUTIVELY in order.
    Compiled to a token-boundary substring test over the word-normalized
    field (space-padded Contains) — one scan, zero shuffles, fused
    codegen; order sensitivity is what distinguishes it from MatchText's
    bag-of-tokens conjunction."""
    from .operators.payload_index import qdrant_filter

    docs = load_table(spark, sf_dir, "documents")
    return qdrant_filter(
        docs,
        {"must": [{"key": "text", "match": {"phrase": "fast sort"}}]},
        id_col="doc_id",
    ).select("doc_id", "n_chars")


@register(
    "values_count_filter",
    """
WITH aug AS (
  SELECT doc_id,
    text
    || CASE WHEN doc_id % 5 = 0
            THEN ' see https://site' || CAST(doc_id % 13 AS VARCHAR) || '.example/p' || CAST(doc_id AS VARCHAR) || ' ok'
            ELSE '' END
    || CASE WHEN doc_id % 10 = 0
            THEN ' and https://site3.example/extra'
            ELSE '' END AS t
  FROM documents
),
cnt AS (
  SELECT doc_id, len(regexp_extract_all(t, 'https?://[^ ]+')) AS n_urls FROM aug
)
SELECT doc_id, CAST(n_urls AS INT) AS n_urls
FROM cnt WHERE n_urls >= 1 AND NOT n_urls >= 2
""",
)
def values_count_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant ``ValuesCount`` (``values_count: {gte/lt/…}``): bounds on
    how many values a payload key holds — the array-cardinality condition
    its secondary index serves.  Fixture: the URL lists planted by the
    ``domain_blocklist_filter`` pipeline become an array-typed promoted
    column; must(count>=1) AND must_not(count>=2) keeps the exactly-one-
    URL documents.  ValuesCount negation is plain NOT (the count is 0 for
    absent fields, never NULL — Qdrant evaluates the 0, so must_not does
    NOT blanket-pass absent rows like match/range negation does)."""
    from .operators.payload_index import qdrant_filter

    docs = load_table(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" see https://site"),
                    (F.col("doc_id") % 13).cast("string"),
                    F.lit(".example/p"),
                    F.col("doc_id").cast("string"),
                    F.lit(" ok"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 10 == 0, F.lit(" and https://site3.example/extra")
            ).otherwise(F.lit("")),
        ).alias("t"),
    )
    pts = aug.select(
        "doc_id",
        F.regexp_extract_all(F.col("t"), F.lit("https?://[^ ]+"), F.lit(0)).alias("urls"),
    )
    return qdrant_filter(
        pts,
        {
            "must": [{"key": "urls", "values_count": {"gte": 1}}],
            "must_not": [{"key": "urls", "values_count": {"gte": 2}}],
        },
        id_col="doc_id",
    ).select("doc_id", F.size("urls").cast("int").alias("n_urls"))


@register(
    "datetime_range_filter",
    """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(value AS DECIMAL(18, 6))) AS DOUBLE) AS total_value
FROM events
WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
  AND ts <  TIMESTAMP '2024-01-12 00:00:00'
  AND event_type IN ('click', 'purchase', 'view')
GROUP BY event_type
""",
)
def datetime_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant ``DatetimeRange`` (``datetime_range: {gte/lt: RFC3339}``,
    the DATETIME payload-index condition of advanced_indexing.py:61-69
    promoted to calendar semantics): ISO-string bounds parse to timestamp
    literals at compile time (constant-folded; session tz pinned UTC on
    both engines), so the predicate pushes to the parquet scan and prunes
    row groups on ts min/max — the columnar form of Qdrant's datetime
    index.  Composed with a keyword ``match any`` and rolled up per type
    (DECIMAL-exact sum, order-independent)."""
    from .operators.payload_index import qdrant_filter

    ev = load_table(spark, sf_dir, "events")
    hits = qdrant_filter(
        ev,
        {
            "must": [
                {
                    "key": "ts",
                    "datetime_range": {
                        "gte": "2024-01-10T00:00:00",
                        "lt": "2024-01-12T00:00:00",
                    },
                },
                {"key": "event_type", "match": {"any": ["click", "purchase", "view"]}},
            ]
        },
        id_col="event_id",
    )
    return hits.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
    )


@register(
    "geo_filter_search",
    """
WITH g AS (
  SELECT c_custkey,
         (c_custkey * 7919 % 18000) / 100.0 - 90.0 AS lat,
         (c_custkey * 104729 % 36000) / 100.0 - 180.0 AS lon
  FROM customer
)
SELECT c_custkey, lat, lon
FROM g
WHERE lat <= 55.0 AND lat >= 35.0 AND lon >= -10.0 AND lon <= 30.0
  AND 2 * 6371000 * asin(sqrt(
        pow(sin((radians(lat) - radians(45.0)) / 2), 2)
        + cos(radians(45.0)) * cos(radians(lat))
          * pow(sin((radians(lon) - radians(10.0)) / 2), 2))) <= 1500000.0
""",
)
def geo_filter_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant geo conditions (``geo_bounding_box`` + ``geo_radius``): the
    point's geo payload is a struct<lat,lon> column; the box is four
    pushable comparisons (antimeridian wrap handled as an OR of
    half-intervals) and the radius is a fused-codegen haversine — no UDF,
    no shuffle, one scan.  Coordinates derive deterministically from
    c_custkey (integer arithmetic, identical in the oracle); the fixture's
    radius boundary margin is ~7 km at sf0.01 (pinned by pytest), far
    beyond any float divergence between the two engines' libm.  At 100 TB
    the box predicate prunes row groups when the layout is geo-sorted
    (Hilbert/Z-order on lat,lon) — the columnar analogue of Qdrant's geo
    index."""
    from .operators.payload_index import qdrant_filter

    cust = load_table(spark, sf_dir, "customer")
    pts = cust.select(
        "c_custkey",
        ((F.col("c_custkey") * 7919 % 18000) / 100.0 - 90.0).alias("lat"),
        ((F.col("c_custkey") * 104729 % 36000) / 100.0 - 180.0).alias("lon"),
    ).withColumn("geo", F.struct("lat", "lon"))
    return qdrant_filter(
        pts,
        {
            "must": [
                {
                    "key": "geo",
                    "geo_bounding_box": {
                        "top_left": {"lat": 55.0, "lon": -10.0},
                        "bottom_right": {"lat": 35.0, "lon": 30.0},
                    },
                },
                {
                    "key": "geo",
                    "geo_radius": {
                        "center": {"lat": 45.0, "lon": 10.0},
                        "radius": 1500000.0,
                    },
                },
            ]
        },
        id_col="c_custkey",
    ).select("c_custkey", "lat", "lon")


# geo_polygon fixture rings (lat, lon) — pentagon over "Europe" with a
# triangular hole; the SAME literals drive the engine spec and the oracle
# SQL (crossing terms generated by _ring_crossings_sql below, slope folded
# to one literal exactly as operators.payload_index._point_in_ring does).
_POLY_EXTERIOR = [(35.0, -10.0), (35.0, 30.0), (60.0, 30.0), (65.0, 10.0), (60.0, -10.0)]
_POLY_HOLE = [(44.0, 4.0), (50.0, 16.0), (44.0, 16.0)]


def _ring_crossings_sql(pts: list[tuple[float, float]]) -> str:
    """Even-odd ray-casting parity over a literal ring as DuckDB SQL —
    term-for-term the expression _point_in_ring compiles, so both engines
    run the identical IEEE-754 arithmetic."""
    terms = []
    n = len(pts)
    for i in range(n):
        y1, x1 = pts[i]
        y2, x2 = pts[(i + 1) % n]
        if y1 == y2:
            continue
        slope = (x2 - x1) / (y2 - y1)
        terms.append(
            f"CASE WHEN (({y1!r} > lat) <> ({y2!r} > lat)) "
            f"AND lon < (lat - {y1!r}) * {slope!r} + {x1!r} THEN 1 ELSE 0 END"
        )
    return "(" + " + ".join(terms) + ") % 2 = 1"


def _ring_spec(pts: list[tuple[float, float]]) -> dict:
    return {"points": [{"lat": la, "lon": lo} for la, lo in pts]}


@register(
    "geo_polygon_filter",
    f"""
WITH g AS (
  SELECT c_custkey,
         (c_custkey * 7919 % 18000) / 100.0 - 90.0 AS lat,
         (c_custkey * 104729 % 36000) / 100.0 - 180.0 AS lon
  FROM customer
)
SELECT c_custkey, lat, lon
FROM g
WHERE ({_ring_crossings_sql(_POLY_EXTERIOR)})
  AND NOT ({_ring_crossings_sql(_POLY_HOLE)})
""",
)
def geo_polygon_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant ``GeoPolygon`` (exterior ring + interior holes) — the last
    gated geo condition, now compiled: the polygon is request-side data,
    so even-odd ray casting UNROLLS at compile time into one fixed-size
    codegen predicate (a crossing indicator per edge, parity decides) —
    no UDF, no loop at runtime, one scan, zero shuffles.  All arithmetic
    is literal-folded identically on both engines (the slope folds to a
    single double before touching any column), so the filter set matches
    exactly — no boundary fuzz needed, unlike the haversine's libm.  Same
    deterministic custkey-derived coordinates as geo_filter_search."""
    from .operators.payload_index import qdrant_filter

    cust = load_table(spark, sf_dir, "customer")
    pts = cust.select(
        "c_custkey",
        ((F.col("c_custkey") * 7919 % 18000) / 100.0 - 90.0).alias("lat"),
        ((F.col("c_custkey") * 104729 % 36000) / 100.0 - 180.0).alias("lon"),
    ).withColumn("geo", F.struct("lat", "lon"))
    return qdrant_filter(
        pts,
        {
            "must": [
                {
                    "key": "geo",
                    "geo_polygon": {
                        "exterior": _ring_spec(_POLY_EXTERIOR),
                        "interiors": [_ring_spec(_POLY_HOLE)],
                    },
                }
            ]
        },
        id_col="c_custkey",
    ).select("c_custkey", "lat", "lon")


@register(
    "has_vector_filter",
    """
SELECT vec_id, label
FROM embeddings
WHERE label % 3 <> 0 AND NOT vec_id % 4 = 0
""",
)
def has_vector_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant ``HasVector`` (``has_vector: "space"``): keep points that
    carry a vector in a named space.  Column-per-space model
    (``named_vector_search``): presence is IsNotNull on the space's
    column — pushable, and parquet never reads the vector bytes for the
    presence test (row-group null counts answer it).  Fixture: the
    ``rev`` space exists for label%3≠0 points, the ``aux`` space for
    vec_id%4=0 points; must(has_vector rev) AND must_not(has_vector aux)
    — the must_not is an exact IsNull complement (a vector column is
    never semantically three-valued)."""
    from .operators.payload_index import qdrant_filter

    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        "vec_id",
        "label",
        F.col("embedding").alias("dense"),
        F.when(F.col("label") % 3 != 0, F.reverse("embedding")).alias("rev"),
        F.when(F.col("vec_id") % 4 == 0, F.col("embedding")).alias("aux"),
    )
    return qdrant_filter(
        pts,
        {
            "must": [{"has_vector": "rev"}],
            "must_not": [{"has_vector": "aux"}],
        },
        id_col="vec_id",
    ).select("vec_id", "label")


# ---------------------------------------------------------------------------
# A1/A3/A4 — counts and statistics
# ---------------------------------------------------------------------------

@register(
    "collection_stats",
    """
SELECT CAST(count(*) AS BIGINT) AS total_vectors,
       CAST(count(DISTINCT label) AS BIGINT) AS distinct_labels,
       round(CAST(sum(CAST(round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))), 9) AS DECIMAL(18,9))) AS DOUBLE) / count(*), 6) AS avg_norm
FROM embeddings
""",
)
def collection_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 count + A3 collection health (qdrant_client.py:471-520)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.agg(
        F.count("*").cast("bigint").alias("total_vectors"),
        F.countDistinct("label").cast("bigint").alias("distinct_labels"),
        F.round(
            F.sum(F.round(F.expr(norm_sql("embedding")), 9).cast("decimal(18,9)")).cast(
                "double"
            )
            / F.count("*"),
            6,
        ).alias("avg_norm"),
    )


@register(
    "latency_distribution",
    """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
       round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS mean,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.95), 6) AS p95,
       round(quantile_cont(value, 0.99), 6) AS p99,
       round(min(value), 6) AS min_v,
       round(max(value), 6) AS max_v
FROM events
GROUP BY event_type
""",
)
def latency_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: distribution stats over a duration-like metric, per op type —
    mean/median/p95/p99/min/max (utils/performance.py:139-175,
    scripts/performance_test.py:451-476).  The mean accumulates in DECIMAL
    (order-independent); percentiles use exact interpolation on both sides."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double") / F.count("*"), 6
        ).alias("mean"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
        F.round(F.min("value"), 6).alias("min_v"),
        F.round(F.max("value"), 6).alias("max_v"),
    )


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


# ---------------------------------------------------------------------------
# Q5/Q6/S9 — the remaining Qdrant client query surface the reference's
# collection serves beside `search`: recommend-by-example, grouped search,
# keyset scroll (public qdrant-client API; qdrant_client.py:311 wraps the
# same collection).
# ---------------------------------------------------------------------------

# 4 recommend requests, each 2 positive + 1 negative example point id.  Two
# positives keep the per-dimension average a single commutative addition, so
# Spark's parallel avg and DuckDB's sequential avg are bit-identical.
RECOMMEND_EXAMPLES = [
    (q, vid, pol)
    for q in range(4)
    for vid, pol in [(2 * q, "pos"), (2 * q + 1, "pos"), (100 + q, "neg")]
]

_EX_VALUES = ", ".join(f"({q}, {v}, '{p}')" for q, v, p in RECOMMEND_EXAMPLES)


@register(
    "recommend_by_examples",
    f"""
WITH ex(q_id, vec_id, polarity) AS (VALUES {_EX_VALUES}),
exv AS (
  SELECT ex.q_id, ex.polarity, e.embedding FROM ex JOIN embeddings e USING (vec_id)
),
flat AS (
  SELECT q_id, polarity, generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM exv
),
per_dim AS (
  SELECT q_id, pos,
         avg(CASE WHEN polarity = 'pos' THEN v END) AS ap,
         avg(CASE WHEN polarity = 'neg' THEN v END) AS an
  FROM flat GROUP BY q_id, pos
),
probes AS (
  SELECT q_id,
         list(CASE WHEN an IS NULL THEN ap ELSE 2.0 * ap - an END ORDER BY pos) AS q_emb
  FROM per_dim GROUP BY q_id
),
scored AS (
  SELECT p.q_id, e.vec_id, {_dcos('e.embedding', 'p.q_emb')} AS score
  FROM embeddings e CROSS JOIN probes p
  WHERE NOT EXISTS (
    SELECT 1 FROM ex WHERE ex.q_id = p.q_id AND ex.vec_id = e.vec_id
  )
),
ranked AS (
  SELECT q_id, vec_id, score,
         row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank
  FROM scored
)
SELECT q_id, vec_id, CAST(rank AS INT) AS rank, round(score, 6) AS score
FROM ranked WHERE rank <= 10
""",
)
def recommend_by_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 recommend: average_vector strategy from example point ids, examples
    excluded from the hits (public Qdrant recommend API)."""
    corpus = load_table(spark, sf_dir, "embeddings")
    examples = spark.createDataFrame(
        RECOMMEND_EXAMPLES, "q_id int, vec_id bigint, polarity string"
    )
    return S.recommend(corpus, examples, k=10)


@register(
    "recommend_groups_topk",
    f"""
WITH ex(q_id, vec_id, polarity) AS (VALUES {_EX_VALUES}),
exv AS (
  SELECT ex.q_id, ex.polarity, e.embedding FROM ex JOIN embeddings e USING (vec_id)
),
flat AS (
  SELECT q_id, polarity, generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM exv
),
per_dim AS (
  SELECT q_id, pos,
         avg(CASE WHEN polarity = 'pos' THEN v END) AS ap,
         avg(CASE WHEN polarity = 'neg' THEN v END) AS an
  FROM flat GROUP BY q_id, pos
),
probes AS (
  SELECT q_id,
         list(CASE WHEN an IS NULL THEN ap ELSE 2.0 * ap - an END ORDER BY pos) AS q_emb
  FROM per_dim GROUP BY q_id
),
scored AS (
  SELECT p.q_id, e.vec_id, e.label, {_dcos('e.embedding', 'p.q_emb')} AS score
  FROM embeddings e CROSS JOIN probes p
  WHERE NOT EXISTS (
    SELECT 1 FROM ex WHERE ex.q_id = p.q_id AND ex.vec_id = e.vec_id
  )
),
hits AS (
  SELECT q_id, label, vec_id, score,
         row_number() OVER (PARTITION BY q_id, label ORDER BY score DESC, vec_id) AS hit_rank
  FROM scored
),
best AS (
  SELECT q_id, label, vec_id, hit_rank, score,
         max(score) OVER (PARTITION BY q_id, label) AS group_best
  FROM hits WHERE hit_rank <= 2
),
gr AS (
  SELECT q_id, label, vec_id, hit_rank, score,
         dense_rank() OVER (PARTITION BY q_id ORDER BY group_best DESC, label) AS group_rank
  FROM best
)
SELECT q_id, label, CAST(group_rank AS INT) AS group_rank, vec_id,
       CAST(hit_rank AS INT) AS hit_rank, round(score, 6) AS score
FROM gr WHERE group_rank <= 4
""",
)
def recommend_groups_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant ``recommend_groups``: average_vector probes from example
    point ids (examples excluded) feeding grouped ranking — top 4 label
    groups per request by best hit, 2 hits each.  A pure composition of
    ``recommend_probes`` and ``search_groups`` (one q_id shuffle)."""
    corpus = load_table(spark, sf_dir, "embeddings")
    examples = spark.createDataFrame(
        RECOMMEND_EXAMPLES, "q_id int, vec_id bigint, polarity string"
    )
    return S.recommend_groups(corpus, examples, n_groups=4, group_size=2)


# 2 discovery requests, each 2 (positive, negative) context example pairs.
DISCOVER_CONTEXT = [(0, 10, 20), (0, 12, 22), (1, 11, 21), (1, 13, 23)]

_CTX_VALUES = ", ".join(f"({q}, {p}, {n})" for q, p, n in DISCOVER_CONTEXT)


@register(
    "recommend_best_score",
    f"""
WITH ex(q_id, vec_id, polarity) AS (VALUES {{ex_values}}),
exv AS (
  SELECT ex.q_id, ex.polarity, e.embedding AS emb
  FROM ex JOIN embeddings e USING (vec_id)
),
maxima AS (
  SELECT x.q_id, c.vec_id,
         max(CASE WHEN x.polarity = 'pos'
                  THEN {_dcos('c.embedding', 'x.emb')} END) AS bp,
         max(CASE WHEN x.polarity = 'neg'
                  THEN {_dcos('c.embedding', 'x.emb')} END) AS bn
  FROM embeddings c CROSS JOIN exv x
  GROUP BY 1, 2
),
scored AS (
  SELECT m.q_id, m.vec_id,
         CASE WHEN m.bp > coalesce(m.bn, CAST(-2.0 AS DOUBLE)) THEN m.bp
              ELSE -(m.bn * m.bn) END AS score
  FROM maxima m
  WHERE NOT EXISTS (
    SELECT 1 FROM ex WHERE ex.q_id = m.q_id AND ex.vec_id = m.vec_id
  )
),
ranked AS (
  SELECT q_id, vec_id, score,
         row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank
  FROM scored
)
SELECT q_id, vec_id, CAST(rank AS INT) AS rank, round(score, 6) AS score
FROM ranked WHERE rank <= 10
""".format(ex_values=_EX_VALUES),
)
def recommend_best_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 recommend, Qdrant's second public strategy
    (``RecommendStrategy.BEST_SCORE``): candidates score by their best
    positive-example similarity unless a negative example is closer, in
    which case the squared-negative penalty sinks them.  Per-example maxima
    are exact (greatest of identical doubles ≡ the oracle's MAX), so the
    whole ranking pins bit-for-bit against the SQL restatement."""
    corpus = load_table(spark, sf_dir, "embeddings")
    examples = spark.createDataFrame(
        RECOMMEND_EXAMPLES, "q_id int, vec_id bigint, polarity string"
    )
    return S.recommend_best_score(corpus, examples, k=10)


@register(
    "recommend_sum_scores",
    f"""
WITH ex(q_id, vec_id, polarity) AS (VALUES {{ex_values}}),
exv AS (
  SELECT ex.q_id, ex.polarity, e.embedding AS emb
  FROM ex JOIN embeddings e USING (vec_id)
),
sums AS (
  SELECT x.q_id, c.vec_id,
         CAST(sum(CAST((CASE WHEN x.polarity = 'pos' THEN 1.0 ELSE -1.0 END)
                  * {_dcos('c.embedding', 'x.emb')} AS DECIMAL(18,12)))
              AS DOUBLE) AS score
  FROM embeddings c CROSS JOIN exv x
  GROUP BY 1, 2
),
scored AS (
  SELECT m.q_id, m.vec_id, m.score FROM sums m
  WHERE NOT EXISTS (
    SELECT 1 FROM ex WHERE ex.q_id = m.q_id AND ex.vec_id = m.vec_id
  )
),
ranked AS (
  SELECT q_id, vec_id, score,
         row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank
  FROM scored
)
SELECT q_id, vec_id, CAST(rank AS INT) AS rank, round(score, 6) AS score
FROM ranked WHERE rank <= 10
""".format(ex_values=_EX_VALUES),
)
def recommend_sum_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 recommend, Qdrant's third public strategy
    (``RecommendStrategy.SUM_SCORES``): candidates score by the SUM of
    their positive-example similarities minus the sum of their
    negative-example similarities (the Rocchio relevance-feedback
    scorer).  Each signed contribution is cast to exact DECIMAL(18,12)
    before summation on BOTH engines, so the group-by sum (oracle) and
    the broadcast array fold (engine) are the same exact number in any
    order — the ranking pins bit-for-bit."""
    corpus = load_table(spark, sf_dir, "embeddings")
    examples = spark.createDataFrame(
        RECOMMEND_EXAMPLES, "q_id int, vec_id bigint, polarity string"
    )
    return S.recommend_sum_scores(corpus, examples, k=10)


@register(
    "multivector_maxsim_topk",
    f"""
WITH mv AS (
  SELECT vec_id // 4 AS doc_id, list(embedding ORDER BY vec_id) AS vectors
  FROM embeddings GROUP BY 1
),
q AS (SELECT doc_id AS q_id, vectors AS q_vecs FROM mv WHERE doc_id < 3),
scored AS (
  SELECT q.q_id, d.doc_id,
         list_reduce(list_transform(q.q_vecs, qv ->
           list_reduce(list_transform(d.vectors, dv -> {_dcos('dv', 'qv')}),
                       (a, b) -> greatest(a, b))),
           (a, b) -> a + b) AS score
  FROM mv d CROSS JOIN q
),
ranked AS (
  SELECT q_id, doc_id, score,
         row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS rank
  FROM scored
)
SELECT q_id, doc_id, CAST(rank AS INT) AS rank, round(score, 6) AS score
FROM ranked WHERE rank <= 10
""",
)
def multivector_maxsim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 extension: Qdrant MULTIVECTOR collections with the MaxSim
    comparator (``MultiVectorConfig(comparator=MAX_SIM)`` — ColBERT late
    interaction): each doc stores a LIST of vectors (here 4 consecutive
    embeddings per doc, a deterministic fixture grouping); a multivector
    query scores Σ_t max_v cos(t, v).  The whole double fold runs
    map-side in one fused higher-order expression — no explode, no
    per-token shuffle (operators/search.py multivector_maxsim).  Oracle:
    the same fold as DuckDB list lambdas — the inner max is
    order-independent, the outer sum adds in the same fixed array order,
    so hashes pin exactly."""
    emb = load_table(spark, sf_dir, "embeddings")
    docs = emb.groupBy(F.expr("vec_id DIV 4").alias("doc_id")).agg(
        F.expr(
            "transform(array_sort(collect_list(struct(vec_id, embedding))), "
            "s -> s.embedding)"
        ).alias("vectors")
    )
    queries = docs.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("q_id"), F.col("vectors").alias("q_vecs")
    )
    return S.multivector_maxsim(docs, queries, k=10)


@register(
    "nested_payload_filter",
    """
SELECT l_orderkey AS order_id, CAST(count(*) AS INT) AS n_items
FROM lineitem
GROUP BY l_orderkey
HAVING bool_or(l_quantity > 45 AND l_returnflag = 'R')
   AND NOT bool_or(l_returnflag = 'A' AND l_quantity < 3)
""",
)
def nested_payload_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant ``NestedCondition`` (``{"nested": {"key", "filter"}}``): the
    payload key is an ARRAY OF OBJECTS and the inner filter must hold on
    the SAME element — `items[].qty > 45 AND items[].rf = 'R'` in one
    element, not across two.  Compiled to Spark's EXISTS higher-order
    function over the array column (operators/payload_index.py) — a pure
    codegen predicate, no explode, no regroup shuffle; at 100 TB that is
    the difference between a scan filter and re-shuffling the fact table.
    Fixture: each order's lineitems as array<struct>, must-nested (a
    high-qty returned item) AND must_not-nested (no tiny 'A' item).  The
    oracle restates EXISTS-per-element as grouped bool_or over the same
    per-row conjunctions."""
    from .operators.payload_index import qdrant_filter

    li = load_table(spark, sf_dir, "lineitem")
    orders = li.groupBy("l_orderkey").agg(
        F.collect_list(
            F.struct(
                F.col("l_partkey").alias("part"),
                F.col("l_quantity").alias("qty"),
                F.col("l_returnflag").alias("rf"),
            )
        ).alias("items")
    )
    spec = {
        "must": [
            {
                "nested": {
                    "key": "items",
                    "filter": {
                        "must": [
                            {"key": "qty", "range": {"gt": 45.0}},
                            {"key": "rf", "match": {"value": "R"}},
                        ]
                    },
                }
            }
        ],
        "must_not": [
            {
                "nested": {
                    "key": "items",
                    "filter": {
                        "must": [
                            {"key": "rf", "match": {"value": "A"}},
                            {"key": "qty", "range": {"lt": 3.0}},
                        ]
                    },
                }
            }
        ],
    }
    return qdrant_filter(orders, spec, id_col="l_orderkey").select(
        F.col("l_orderkey").alias("order_id"), F.size("items").alias("n_items")
    )


@register(
    "context_pairs_search",
    f"""
WITH ctx(q_id, pos_id, neg_id) AS (VALUES {{ctx_values}}),
pairs AS (
  SELECT ctx.q_id, p.embedding AS pos_emb, n.embedding AS neg_emb
  FROM ctx JOIN embeddings p ON p.vec_id = ctx.pos_id
           JOIN embeddings n ON n.vec_id = ctx.neg_id
),
contrib AS (
  SELECT pr.q_id, e.vec_id,
         CAST(least(0e0, {_dcos('e.embedding', 'pr.pos_emb')}
                       - {_dcos('e.embedding', 'pr.neg_emb')})
              AS DECIMAL(18,12)) AS c
  FROM embeddings e CROSS JOIN pairs pr
),
scored AS (
  SELECT q_id, vec_id, CAST(sum(c) AS DOUBLE) AS score
  FROM contrib GROUP BY 1, 2
),
ranked AS (
  SELECT q_id, vec_id, score,
         row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank
  FROM scored
)
SELECT q_id, vec_id, CAST(rank AS INT) AS rank, score
FROM ranked WHERE rank <= 10
""".format(ctx_values=_CTX_VALUES),
)
def context_pairs_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 variant — Qdrant's context-ONLY query (``ContextQuery`` without a
    target): candidates rank by the summed pair loss
    ``Σ min(0, cos(c,pos) − cos(c,neg))`` — `discover`'s hard forall filter
    relaxed into a soft penalty.  Contributions sum through exact
    DECIMAL(18,12) (order-independent), so the score hashes identically
    under any partitioning."""
    corpus = load_table(spark, sf_dir, "embeddings")
    context = spark.createDataFrame(
        DISCOVER_CONTEXT, "q_id bigint, pos_id bigint, neg_id bigint"
    )
    return S.context_search(corpus, context, k=10)


@register(
    "search_groups_topk",
    f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 4
),
scored AS (
  SELECT q.q_id, e.vec_id, e.label, {_dcos('e.embedding', 'q.q_emb')} AS score
  FROM embeddings e CROSS JOIN q
),
hits AS (
  SELECT *, row_number() OVER (PARTITION BY q_id, label ORDER BY score DESC, vec_id) AS hit_rank
  FROM scored
),
kept AS (SELECT * FROM hits WHERE hit_rank <= 2),
gb AS (
  SELECT *, max(score) OVER (PARTITION BY q_id, label) AS group_best FROM kept
),
gr AS (
  SELECT *, dense_rank() OVER (PARTITION BY q_id ORDER BY group_best DESC, label) AS group_rank
  FROM gb
)
SELECT q_id, label, CAST(group_rank AS INT) AS group_rank, vec_id,
       CAST(hit_rank AS INT) AS hit_rank, round(score, 6) AS score
FROM gr WHERE group_rank <= 4
""",
)
def search_groups_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 grouped search: top-4 labels per probe by best hit, ≤2 hits each
    (public Qdrant search_groups API over the reference's payload field)."""
    corpus = load_table(spark, sf_dir, "embeddings")
    return S.search_groups(
        corpus, _probes(spark, sf_dir, 4), n_groups=4, group_size=2
    )


@register(
    "search_groups_lookup",
    f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 3
),
scored AS (
  SELECT q.q_id, e.vec_id, e.label, {_dcos('e.embedding', 'q.q_emb')} AS score
  FROM embeddings e CROSS JOIN q
),
hits AS (
  SELECT *, row_number() OVER (PARTITION BY q_id, label ORDER BY score DESC, vec_id) AS hit_rank
  FROM scored
),
kept AS (SELECT * FROM hits WHERE hit_rank <= 2),
gb AS (
  SELECT *, max(score) OVER (PARTITION BY q_id, label) AS group_best FROM kept
),
gr AS (
  SELECT *, dense_rank() OVER (PARTITION BY q_id ORDER BY group_best DESC, label) AS group_rank
  FROM gb
)
SELECT gr.q_id, gr.label, CAST(gr.group_rank AS INT) AS group_rank, gr.vec_id,
       CAST(gr.hit_rank AS INT) AS hit_rank, round(gr.score, 6) AS score,
       d.lang AS lookup_lang, d.source AS lookup_source
FROM gr LEFT JOIN documents d ON d.doc_id = gr.label
WHERE gr.group_rank <= 3
""",
)
def search_groups_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 + Qdrant's public ``with_lookup`` option: top-3 labels per probe
    (≤2 hits each), each group carrying the record of the point in the
    ``documents`` collection whose id equals the group value — Qdrant's
    group-id lookup contract.  The bounded grouped result is persisted so
    the ranking evaluates once; the lookup collection is reduced by a
    broadcast of the bounded group-key set (one streaming pass, no
    shuffle) before the left join attaches it."""
    corpus = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    groups = track_scratch(
        S.search_groups(
            corpus, _probes(spark, sf_dir, 3), n_groups=3, group_size=2
        ).persist()
    )
    return S.attach_group_lookup(
        groups, docs, group_col="label", lookup_id="doc_id",
        lookup_cols=["lang", "source"],
    )


@register(
    "random_sample_points",
    """
SELECT vec_id, label
FROM embeddings
WHERE label IN (1, 4, 7)
ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
LIMIT 25
""",
)
def random_sample_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant's public random-sampling query (``query_points`` with
    ``Sample.RANDOM``), with a payload filter — restated as a
    DETERMINISTIC pseudo-random draw: order by md5(id) and take N.  Same
    draw on any engine, any partitioning, any cluster size (the property
    Qdrant's server-side RNG lacks and reproducible pipelines need; the
    md5-draw discipline of workload_pipeline.py's samplers).  Plan: the
    label filter pushes to the scan; the draw is a distributed
    TakeOrderedAndProject — no global sort, no shuffle of the corpus."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.filter(F.col("label").isin(1, 4, 7))
        .select(
            "vec_id", "label", F.md5(F.col("vec_id").cast("string")).alias("__draw")
        )
        .orderBy("__draw", "vec_id")
        .limit(25)
        .select("vec_id", "label")
    )


@register(
    "scroll_payload_selector",
    """
WITH p AS (SELECT vec_id, label FROM embeddings ORDER BY vec_id LIMIT 80)
SELECT vec_id,
  CASE CAST(label % 3 AS INT) WHEN 0 THEN 'gold' WHEN 1 THEN 'silver' ELSE 'bronze' END AS tier,
  CAST(1 AS INT) AS n_keys_incl,
  CAST(2 AS INT) AS n_keys_excl
FROM p
""",
)
def scroll_payload_selector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant ``with_payload`` selectors on a scroll page: the include
    list keeps only the named keys (absent keys a no-op), the exclude
    list drops the named keys — both map-side ``map_filter`` projections
    (operators/search.py:apply_payload_selector), no shuffle beyond the
    page itself.  The oracle pins the per-selector key counts and the
    surviving key's value."""
    emb = load_table(spark, sf_dir, "embeddings")
    tier = (
        F.when(F.col("label") % 3 == 0, "gold")
        .when(F.col("label") % 3 == 1, "silver")
        .otherwise("bronze")
    )
    pts = emb.select(
        "vec_id",
        F.create_map(
            F.lit("tier"), tier,
            F.lit("seq"), F.col("vec_id").cast("string"),
            F.lit("src"), F.lit("emb"),
        ).alias("metadata"),
    )
    page = S.scroll_page(pts, page_size=80)
    inc = S.apply_payload_selector(page, ["tier", "absent"])
    exc = S.apply_payload_selector(page, {"exclude": ["seq"]})
    return (
        inc.select(
            "vec_id",
            F.element_at("metadata", "tier").alias("tier"),
            F.size("metadata").cast("int").alias("n_keys_incl"),
        )
        .join(
            F.broadcast(
                exc.select("vec_id", F.size("metadata").cast("int").alias("n_keys_excl"))
            ),
            "vec_id",
        )
    )


@register(
    "retrieve_points",
    """
SELECT vec_id,
  CASE CAST(label % 3 AS INT) WHEN 0 THEN 'gold' WHEN 1 THEN 'silver' ELSE 'bronze' END AS tier,
  CAST(vec_id AS VARCHAR) AS seq
FROM embeddings
WHERE vec_id IN (3, 7, 15, 42, 99, 123)
""",
)
def retrieve_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant ``retrieve``: fetch points by id with ``with_payload`` /
    ``with_vectors`` selectors.  The id list compiles to one pushed IN
    predicate (``has_id`` via the Filter compiler), the include selector
    is a map-side projection, ``with_vectors=False`` drops the embedding
    before anything moves — a point lookup reads id + payload bytes only,
    never the vectors."""
    from .operators.payload_index import build_filter

    emb = load_table(spark, sf_dir, "embeddings")
    tier = (
        F.when(F.col("label") % 3 == 0, "gold")
        .when(F.col("label") % 3 == 1, "silver")
        .otherwise("bronze")
    )
    pts = emb.select(
        "vec_id",
        "embedding",
        F.create_map(
            F.lit("tier"), tier,
            F.lit("seq"), F.col("vec_id").cast("string"),
            F.lit("src"), F.lit("emb"),
        ).alias("metadata"),
    )
    got = pts.filter(
        build_filter({"must": [{"has_id": [3, 7, 15, 42, 99, 123]}]}, id_col="vec_id")
    )
    got = got.drop("embedding")  # with_vectors=False
    got = S.apply_payload_selector(got, ["tier", "seq"])
    return got.select(
        "vec_id",
        F.element_at("metadata", "tier").alias("tier"),
        F.element_at("metadata", "seq").alias("seq"),
    )


@register(
    "scroll_keyset",
    """
WITH f AS (SELECT vec_id, label FROM embeddings WHERE label IN (1, 3)),
p1 AS (SELECT * FROM f ORDER BY vec_id LIMIT 50),
b AS (SELECT max(vec_id) AS _b FROM p1),
p2 AS (
  SELECT f.* FROM f, b WHERE f.vec_id > b._b ORDER BY f.vec_id LIMIT 50
)
SELECT CAST(1 AS INT) AS page, vec_id, label FROM p1
UNION ALL
SELECT CAST(2 AS INT) AS page, vec_id, label FROM p2
""",
)
def scroll_keyset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 scroll: two consecutive keyset pages of a filtered listing.  The
    page-2 cursor is derived relationally (max id of page 1, broadcast) —
    the id predicate pushes to the scan; each page is a
    TakeOrderedAndProject, no OFFSET skip-scan at any scale."""
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label")
        .filter(F.col("label").isin(1, 3))
    )
    p1 = S.scroll_page(emb, page_size=50).withColumn("page", F.lit(1))
    boundary = p1.agg(F.max("vec_id").alias("_b"))
    p2 = (
        emb.crossJoin(F.broadcast(boundary))
        .filter(F.col("vec_id") > F.col("_b"))
        .drop("_b")
        .orderBy("vec_id")
        .limit(50)
        .withColumn("page", F.lit(2))
    )
    return p1.unionByName(p2).select("page", "vec_id", "label")


@register(
    "scroll_filtered",
    """
WITH f AS (
  SELECT vec_id, label FROM embeddings
  WHERE (label IN (1, 3) OR label >= 8) AND ((vec_id % 10 = 0) IS NOT TRUE)
),
p1 AS (SELECT * FROM f ORDER BY vec_id LIMIT 30),
b AS (SELECT max(vec_id) AS bv FROM p1),
p2 AS (SELECT f.* FROM f, b WHERE f.vec_id > b.bv ORDER BY f.vec_id LIMIT 30)
SELECT CAST(1 AS INT) AS page, vec_id, label FROM p1
UNION ALL
SELECT CAST(2 AS INT) AS page, vec_id, label FROM p2
""",
)
def scroll_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 + the Filter model: Qdrant's ``scroll(scroll_filter=…)`` — two
    consecutive keyset pages over the subset a combinator filter carves
    out (should-disjunction + an IS-NOT-TRUE must_not on a derived key).
    The filter is stable across pages, so the id cursor stays disjoint +
    exhaustive over the matching subset; filter and cursor push to the
    scan together on the serving path (the page-2 cursor here is the
    relational broadcast form, like `scroll_keyset`)."""
    spec = {
        "should": [
            {"key": "label", "match": {"any": [1, 3]}},
            {"key": "label", "range": {"gte": 8}},
        ],
        "must_not": [{"key": "decile", "match": {"value": 0}}],
    }
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label")
        .withColumn("decile", F.col("vec_id") % 10)
    )
    p1 = S.scroll_page(emb, page_size=30, scroll_filter=spec).withColumn(
        "page", F.lit(1)
    )
    boundary = p1.agg(F.max("vec_id").alias("_b"))
    from .operators.payload_index import build_filter

    p2 = (
        emb.filter(build_filter(spec, id_col="vec_id"))
        .crossJoin(F.broadcast(boundary))
        .filter(F.col("vec_id") > F.col("_b"))
        .drop("_b")
        .orderBy("vec_id")
        .limit(30)
        .withColumn("page", F.lit(2))
    )
    return p1.unionByName(p2).select("page", "vec_id", "label")


@register(
    "scroll_order_by",
    """
WITH f AS (SELECT vec_id, label FROM embeddings WHERE label IS NOT NULL),
p1 AS (SELECT * FROM f ORDER BY label, vec_id LIMIT 40),
b AS (SELECT label AS bl, vec_id AS bv FROM p1 ORDER BY label DESC, vec_id DESC LIMIT 1),
p2 AS (
  SELECT f.* FROM f, b
  WHERE f.label > b.bl OR (f.label = b.bl AND f.vec_id > b.bv)
  ORDER BY f.label, f.vec_id LIMIT 40
)
SELECT CAST(1 AS INT) AS page, vec_id, label FROM p1
UNION ALL
SELECT CAST(2 AS INT) AS page, vec_id, label FROM p2
""",
)
def scroll_order_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 extension — Qdrant's ``scroll(order_by=…)``: two consecutive
    pages ordered by a payload field (label) with the point id as
    tiebreaker.  The page-2 cursor here is derived RELATIONALLY (page-1
    max, broadcast), so the predicate is evaluated as the broadcast-join
    condition rather than a scan pushdown — one job for both pages; the
    serving path passes the client-echoed cursor as literals via
    ``scroll_page_order_by(after=…)``, where the same predicate DOES push
    to the scan (plan test).  Each page is a TakeOrderedAndProject —
    same scale posture as `scroll_keyset`, generalized to an arbitrary
    sort field.  NULL-field points are skipped (Qdrant's order_by
    contract; enforced inside scroll_page_order_by and mirrored here for
    the inline page-2 path)."""
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label")
        .filter(F.col("label").isNotNull())
    )
    p1 = S.scroll_page_order_by(emb, "label", page_size=40).withColumn(
        "page", F.lit(1)
    )
    boundary = (
        p1.orderBy(F.desc("label"), F.desc("vec_id"))
        .limit(1)
        .select(F.col("label").alias("_bl"), F.col("vec_id").alias("_bv"))
    )
    p2 = (
        emb.crossJoin(F.broadcast(boundary))
        .filter(
            (F.col("label") > F.col("_bl"))
            | ((F.col("label") == F.col("_bl")) & (F.col("vec_id") > F.col("_bv")))
        )
        .drop("_bl", "_bv")
        .orderBy("label", "vec_id")
        .limit(40)
        .withColumn("page", F.lit(2))
    )
    return p1.unionByName(p2).select("page", "vec_id", "label")


@register(
    "scroll_order_by_desc",
    """
WITH f AS (SELECT vec_id, label FROM embeddings WHERE label IS NOT NULL),
p1 AS (SELECT * FROM f ORDER BY label DESC, vec_id DESC LIMIT 40),
b AS (SELECT label AS bl, vec_id AS bv FROM p1 ORDER BY label, vec_id LIMIT 1),
p2 AS (
  SELECT f.* FROM f, b
  WHERE f.label < b.bl OR (f.label = b.bl AND f.vec_id < b.bv)
  ORDER BY f.label DESC, f.vec_id DESC LIMIT 40
)
SELECT CAST(1 AS INT) AS page, vec_id, label FROM p1
UNION ALL
SELECT CAST(2 AS INT) AS page, vec_id, label FROM p2
""",
)
def scroll_order_by_desc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 extension — Qdrant's ``scroll(order_by={key, direction: desc})``
    (VERDICT r8 item 3): the descending composite keyset.  The cursor
    predicate mirrors the ascending one with every comparison flipped
    (``<``, tie ``<``) and the sort reversed; same NULL-field skip, same
    TakeOrderedAndProject page shape, same literal-cursor pushdown on the
    serving path (plan test in tests/test_plans.py).  Page 2's cursor
    here is derived relationally from page 1's MIN boundary (broadcast),
    matching `scroll_order_by`'s one-job two-page structure."""
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label")
        .filter(F.col("label").isNotNull())
    )
    p1 = S.scroll_page_order_by(
        emb, "label", page_size=40, direction="desc"
    ).withColumn("page", F.lit(1))
    boundary = (
        p1.orderBy("label", "vec_id")
        .limit(1)
        .select(F.col("label").alias("_bl"), F.col("vec_id").alias("_bv"))
    )
    p2 = (
        emb.crossJoin(F.broadcast(boundary))
        .filter(
            (F.col("label") < F.col("_bl"))
            | ((F.col("label") == F.col("_bl")) & (F.col("vec_id") < F.col("_bv")))
        )
        .drop("_bl", "_bv")
        .orderBy(F.desc("label"), F.desc("vec_id"))
        .limit(40)
        .withColumn("page", F.lit(2))
    )
    return p1.unionByName(p2).select("page", "vec_id", "label")


@register(
    "scroll_start_from",
    """
WITH f AS (SELECT vec_id, label FROM embeddings WHERE label IS NOT NULL)
SELECT CAST(1 AS INT) AS page, vec_id, label FROM
  (SELECT * FROM f WHERE label >= 3 ORDER BY label, vec_id LIMIT 40)
UNION ALL
SELECT CAST(2 AS INT) AS page, vec_id, label FROM
  (SELECT * FROM f WHERE label <= 6 ORDER BY label DESC, vec_id DESC LIMIT 40)
""",
)
def scroll_start_from(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 extension — Qdrant's ``scroll(order_by={key, start_from:
    value})`` (VERDICT r9 missing item 3): begin the ordered scroll AT a
    given order value instead of the field's edge — inclusive ``>=`` for
    asc (page 1, start_from=3) and ``<=`` for desc (page 2, start_from=6).
    Both bounds are column/literal predicates, so they push into the
    parquet scan alongside the NULL-skip conjunct (plan test); each page
    stays a TakeOrderedAndProject — the serving path's first-page
    analogue of the literal-cursor pushdown."""
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label")
        .filter(F.col("label").isNotNull())
    )
    p1 = S.scroll_page_order_by(emb, "label", start_from=3, page_size=40).withColumn(
        "page", F.lit(1)
    )
    p2 = S.scroll_page_order_by(
        emb, "label", start_from=6, page_size=40, direction="desc"
    ).withColumn("page", F.lit(2))
    return p1.unionByName(p2).select("page", "vec_id", "label")



@register(
    "discover_context",
    f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 2
),
ctx(q_id, pos_id, neg_id) AS (VALUES {_CTX_VALUES}),
pairs AS (
  SELECT ctx.q_id, p.embedding AS pos_emb, n.embedding AS neg_emb
  FROM ctx JOIN embeddings p ON p.vec_id = ctx.pos_id
           JOIN embeddings n ON n.vec_id = ctx.neg_id
),
ok AS (
  SELECT pr.q_id, e.vec_id,
         min(CASE WHEN {_dcos('e.embedding', 'pr.pos_emb')}
                     > {_dcos('e.embedding', 'pr.neg_emb')} THEN 1 ELSE 0 END) AS all_ok
  FROM embeddings e CROSS JOIN pairs pr
  GROUP BY pr.q_id, e.vec_id
),
scored AS (
  SELECT o.q_id, o.vec_id, {_dcos('e.embedding', 'q.q_emb')} AS score
  FROM ok o JOIN embeddings e ON e.vec_id = o.vec_id JOIN q ON q.q_id = o.q_id
  WHERE o.all_ok = 1
),
ranked AS (
  SELECT q_id, vec_id, score,
         row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank
  FROM scored
)
SELECT q_id, vec_id, CAST(rank AS INT) AS rank, round(score, 6) AS score
FROM ranked WHERE rank <= 10
""",
)
def discover_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 discovery search: rank by target similarity inside the region the
    context pairs carve out — every candidate must sit on the positive side
    of each pair's bisecting hyperplane (public Qdrant discover API)."""
    corpus = load_table(spark, sf_dir, "embeddings")
    targets = _probes(spark, sf_dir, 2)
    context = spark.createDataFrame(
        DISCOVER_CONTEXT, "q_id bigint, pos_id bigint, neg_id bigint"
    )
    return S.discover(corpus, targets, context, k=10)


@register(
    "similarity_matrix_topk",
    f"""
WITH f AS (SELECT vec_id, embedding FROM embeddings WHERE label IN (4, 7)),
scored AS (
  SELECT a.vec_id, b.vec_id AS other_id, {_dcos('a.embedding', 'b.embedding')} AS score
  FROM f a JOIN f b ON a.vec_id <> b.vec_id
),
ranked AS (
  SELECT vec_id, other_id, score,
         row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, other_id) AS rank
  FROM scored
)
SELECT vec_id, other_id, CAST(rank AS INT) AS rank, round(score, 6) AS score
FROM ranked WHERE rank <= 5
""",
)
def similarity_matrix_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 distance matrix: pairwise cosine among the filtered points, top-5
    neighbours per point, self excluded (public Qdrant search_matrix API).
    The label filter pushes to the scan on both legs."""
    corpus = load_table(spark, sf_dir, "embeddings").filter(
        F.col("label").isin(4, 7)
    )
    return S.similarity_matrix_topk(corpus, k=5)


@register(
    "matrix_offsets_coo",
    f"""
WITH f AS (SELECT vec_id, embedding FROM embeddings WHERE label IN (4, 7)),
offs AS (
  SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS off
  FROM f
),
scored AS (
  SELECT a.vec_id, b.vec_id AS other_id, {_dcos('a.embedding', 'b.embedding')} AS score
  FROM f a JOIN f b ON a.vec_id <> b.vec_id
),
ranked AS (
  SELECT vec_id, other_id, score,
         row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, other_id) AS rank
  FROM scored
)
SELECT o1.off AS row_offset, o2.off AS col_offset,
       r.vec_id AS row_id, r.other_id AS col_id, round(r.score, 6) AS score
FROM ranked r
JOIN offs o1 ON r.vec_id = o1.vec_id
JOIN offs o2 ON r.other_id = o2.vec_id
WHERE r.rank <= 5
""",
)
def matrix_offsets_coo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 distance matrix, offsets response shape (public Qdrant
    ``search_matrix_offsets``): the same sampled pairwise top-5, addressed
    by offsets into the sorted sample id list — the COO encoding clients
    hand to numpy/scipy.  The offsets dimension is the request-bounded
    sample itself, so both offset joins broadcast."""
    corpus = load_table(spark, sf_dir, "embeddings").filter(
        F.col("label").isin(4, 7)
    )
    return S.matrix_offsets(corpus, k=5)


@register(
    "facet_counts",
    """
SELECT source, CAST(count(*) AS BIGINT) AS n
FROM documents
WHERE lang = 'en' AND source IS NOT NULL
GROUP BY source
ORDER BY n DESC, source
LIMIT 10
""",
)
def facet_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10 facet counts: per-value cardinalities of a payload field under a
    filter (public Qdrant facet API, ``operators.payload_index.facet``) —
    a pushed scan predicate, a map-side-combined count, top values by
    count."""
    from .operators.payload_index import facet

    docs = load_table(spark, sf_dir, "documents")
    spec = {"must": [{"key": "lang", "match": {"value": "en"}}]}
    return facet(docs, "source", spec=spec, limit=10, id_col="doc_id").select(
        F.col("value").alias("source"), "n"
    )


@register(
    "facet_array_values",
    """
WITH t AS (
  SELECT doc_id,
         list_distinct(['t' || CAST(doc_id % 7 AS VARCHAR),
                        't' || CAST(doc_id % 11 AS VARCHAR),
                        lang]) AS tags
  FROM documents WHERE lang = 'en'
),
u AS (SELECT unnest(tags) AS value FROM t)
SELECT value, CAST(count(*) AS BIGINT) AS n
FROM u GROUP BY value
ORDER BY n DESC, value
LIMIT 12
""",
)
def facet_array_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Facet over an ARRAY-typed payload field (Qdrant facets an indexed
    array field per element, each matching POINT counted once per value —
    hence the per-point array_distinct before counting).  The tags fixture
    is derived deterministically from doc_id so every engine sees the same
    payload.  Plan: pushed lang filter, map-side explode of the distinct
    elements, one map-side-combined count exchange, top values — the same
    shape as facet_counts with a generator instead of a column ref; no
    per-point state crosses the shuffle except (value, partial count).
    Shares ``operators.payload_index.facet(is_array=True)`` with the
    scalar facet query."""
    from .operators.payload_index import facet

    docs = load_table(spark, sf_dir, "documents")
    tags = F.array(
        F.concat(F.lit("t"), (F.col("doc_id") % 7).cast("string")),
        F.concat(F.lit("t"), (F.col("doc_id") % 11).cast("string")),
        F.col("lang"),
    )
    spec = {"must": [{"key": "lang", "match": {"value": "en"}}]}
    return facet(
        docs.withColumn("tags", tags),
        "tags",
        spec=spec,
        limit=12,
        is_array=True,
        id_col="doc_id",
    )


# Qdrant FormulaQuery (query_points score boosting) — prefetch 50 dense
# hits per probe, rescore with a formula over the prefetch score, a
# condition indicator and a lin_decay over the point id (the pure-
# arithmetic decay — bit-parity safe; the transcendental exp/gauss decays
# are pinned against Python math in tests/test_formula.py).  The whole
# formula compiles to ONE fused projection (operators/formula.py); plan
# shape = plain knn + rerank (two ranking windows, corpus un-shuffled).
_FORMULA_AST = {
    "sum": [
        {"mult": [0.6, "$score"]},
        {"mult": [0.25, {"key": "label", "match": {"any": [2, 5]}}]},
        {"mult": [0.15, {"lin_decay": {"x": "vec_id", "target": 0.0,
                                       "scale": 250.0, "midpoint": 0.1}}]},
    ]
}


@register(
    "formula_rescore_topk",
    _ORACLE_SCORED
    + """
, pre AS (
  SELECT q_id, vec_id, score,
         row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS prerank
  FROM scored
),
resc AS (
  SELECT p.q_id, p.vec_id,
         0.6 * p.score
         + 0.25 * (CASE WHEN e.label IN (2, 5) THEN 1.0 ELSE 0.0 END)
         + 0.15 * greatest(0.0, 1.0 - abs(CAST(p.vec_id AS DOUBLE) - 0.0)
                                  * ((1.0 - 0.1) / 250.0)) AS new_score
  FROM pre p JOIN embeddings e USING (vec_id)
  WHERE p.prerank <= 50
),
ranked AS (
  SELECT q_id, vec_id, new_score,
         row_number() OVER (PARTITION BY q_id ORDER BY new_score DESC, vec_id) AS rank
  FROM resc
)
SELECT q_id, vec_id, CAST(rank AS INT) AS rank, round(new_score, 6) AS score
FROM ranked WHERE rank <= 10
""",
)
def formula_rescore_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.formula import formula_query

    corpus = load_table(spark, sf_dir, "embeddings")
    return formula_query(
        corpus, _probes(spark, sf_dir), _FORMULA_AST, prefetch_k=50, k=10
    )


# FormulaQuery geo_distance (r11 — the gate removed): rescore = prefetch
# score × lin_decay(haversine meters from a literal origin to the point's
# struct<lat,lon> payload).  The haversine is the SAME fused-codegen
# kernel the GeoRadius filter condition compiles to
# (payload_index.haversine_m) — trig builtins, no UDF, still one fused
# projection.  Float parity: trig is libm, so the unrounded score can
# differ in the last ulps cross-engine; the 6dp boundary round plus the
# pytest margin/gap audit (tests/test_formula.py) is the same discipline
# the geo filter fixtures use.
_FORMULA_GEO_AST = {
    "mult": [
        "$score",
        {"lin_decay": {
            "x": {"geo_distance": {"origin": {"lat": 45.0, "lon": 10.0},
                                   "to": "geo"}},
            "target": 0.0, "scale": 20000000.0, "midpoint": 0.5,
        }},
    ]
}

# One DuckDB haversine spelling shared by the oracle (mirrors
# payload_index.haversine_m term-for-term: h-formula, asin(sqrt), 2R).
_DHAV = (
    "(2.0 * 6371000.0 * asin(sqrt("
    "pow(sin((radians({lat}) - radians({olat})) / 2), 2) "
    "+ cos(radians({olat})) * cos(radians({lat})) "
    "* pow(sin((radians({lon}) - radians({olon})) / 2), 2))))"
)


@register(
    "formula_geo_decay_topk",
    _ORACLE_SCORED
    + f"""
, geo AS (
  SELECT vec_id,
         (vec_id * 7919 % 18000) / 100.0 - 90.0 AS lat,
         (vec_id * 104729 % 36000) / 100.0 - 180.0 AS lon
  FROM embeddings
),
pre AS (
  SELECT q_id, vec_id, score,
         row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS prerank
  FROM scored
),
resc AS (
  SELECT p.q_id, p.vec_id,
         p.score * greatest(0.0, 1.0 - abs({_DHAV.format(lat='g.lat', lon='g.lon', olat='45.0', olon='10.0')} - 0.0)
                                   * ((1.0 - 0.5) / 20000000.0)) AS new_score
  FROM pre p JOIN geo g USING (vec_id)
  WHERE p.prerank <= 50
),
ranked AS (
  SELECT q_id, vec_id, new_score,
         row_number() OVER (PARTITION BY q_id ORDER BY new_score DESC, vec_id) AS rank
  FROM resc
)
SELECT q_id, vec_id, CAST(rank AS INT) AS rank, round(new_score, 6) AS score
FROM ranked WHERE rank <= 10
""",
)
def formula_geo_decay_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FormulaQuery with a geo_distance input: boost nearby points.  The
    geo payload is the same deterministic lat/lon derivation the geo
    filter fixtures use (struct<lat,lon> column); plan shape is identical
    to formula_rescore_topk — the distance is just more codegen arithmetic
    in the one fused rescore projection."""
    from .operators.formula import formula_query

    corpus = load_table(spark, sf_dir, "embeddings").withColumn(
        "geo",
        F.struct(
            ((F.col("vec_id") * 7919 % 18000) / 100.0 - 90.0).alias("lat"),
            ((F.col("vec_id") * 104729 % 36000) / 100.0 - 180.0).alias("lon"),
        ),
    )
    return formula_query(
        corpus, _probes(spark, sf_dir), _FORMULA_GEO_AST, prefetch_k=50, k=10
    )


# FormulaQuery datetime decay (r11 — the datetime/datetime_key gates
# removed): freshness boost = lin_decay over the seconds between the
# point's TIMESTAMP payload and a literal RFC3339 target.  Epoch
# conversion is exact (integer seconds in double), lin_decay is pure
# arithmetic — hash-exact cross-engine, no rounding fuzz needed beyond
# the standard 6dp boundary round.
_TS_BASE_EPOCH = 1704067200  # 2024-01-01T00:00:00Z
_FORMULA_DT_AST = {
    "sum": [
        {"mult": [0.7, "$score"]},
        {"mult": [0.3, {"lin_decay": {
            "x": {"datetime_key": "ts"},
            "target": {"datetime": "2024-06-01T00:00:00Z"},  # epoch 1717200000
            "scale": 31536000.0, "midpoint": 0.5,
        }}]},
    ]
}


@register(
    "formula_datetime_decay_topk",
    _ORACLE_SCORED
    + f"""
, pre AS (
  SELECT q_id, vec_id, score,
         row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS prerank
  FROM scored
),
resc AS (
  SELECT p.q_id, p.vec_id,
         0.7 * p.score
         + 0.3 * greatest(0.0, 1.0 - abs(CAST({_TS_BASE_EPOCH} + e.vec_id * 3600 AS DOUBLE)
                                         - 1717200000.0)
                                   * ((1.0 - 0.5) / 31536000.0)) AS new_score
  FROM pre p JOIN embeddings e USING (vec_id)
  WHERE p.prerank <= 50
),
ranked AS (
  SELECT q_id, vec_id, new_score,
         row_number() OVER (PARTITION BY q_id ORDER BY new_score DESC, vec_id) AS rank
  FROM resc
)
SELECT q_id, vec_id, CAST(rank AS INT) AS rank, round(new_score, 6) AS score
FROM ranked WHERE rank <= 10
""",
)
def formula_datetime_decay_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FormulaQuery freshness boost: the point's ingest TIMESTAMP (fixture:
    base + vec_id hours, a real TimestampType column so datetime_key takes
    the cast path) decayed around a literal RFC3339 target.  Epoch math is
    exact; the decay is the pure-arithmetic lin_decay — bit-parity-safe."""
    from .operators.formula import formula_query

    corpus = load_table(spark, sf_dir, "embeddings").withColumn(
        "ts", F.timestamp_seconds(F.lit(_TS_BASE_EPOCH) + F.col("vec_id") * 3600)
    )
    return formula_query(
        corpus, _probes(spark, sf_dir), _FORMULA_DT_AST, prefetch_k=50, k=10
    )


# Euclid-metric top-k — completes the registered coverage of Qdrant's
# public Distance enum (cosine/dot throughout, manhattan above, euclid
# here; the reference pins COSINE, qdrant_client.py:105).  Same
# deterministic-fold discipline as _DL1: the seeded Spark fold and
# DuckDB's unseeded list_reduce agree because 0.0 + x == x exactly.
_DL2 = (
    "sqrt(list_reduce(list_transform(list_zip(CAST({a} AS DOUBLE[]), "
    "CAST({b} AS DOUBLE[])), p -> (p[1] - p[2]) * (p[1] - p[2])), "
    "(acc, x) -> acc + x))"
)


@register(
    "knn_euclid_topk",
    f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < {N_QUERIES}
),
scored AS (
  SELECT q.q_id, e.vec_id, {_DL2.format(a='e.embedding', b='q.q_emb')} AS score
  FROM embeddings e CROSS JOIN q
),
ranked AS (
  SELECT q_id, vec_id, score,
         row_number() OVER (PARTITION BY q_id ORDER BY score, vec_id) AS rank
  FROM scored
)
SELECT q_id, vec_id, CAST(rank AS INT) AS rank, round(score, 6) AS score
FROM ranked WHERE rank <= 10
""",
)
def knn_euclid_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 under Qdrant's Euclid metric: 10 nearest by L2 distance,
    ascending.  Same broadcast-probes plan as knn_topk — only the scoring
    projection and sort polarity change (operators/search.py METRICS)."""
    corpus = load_table(spark, sf_dir, "embeddings")
    return S.knn_search(corpus, _probes(spark, sf_dir), k=10, metric="euclid")


# ---------------------------------------------------------------------------
# Extended surfaces register themselves into this registry on import.
# ---------------------------------------------------------------------------

from . import workload_relational  # noqa: E402,F401
from . import workload_events  # noqa: E402,F401
from . import workload_text  # noqa: E402,F401
from . import workload_dedup  # noqa: E402,F401
from . import workload_ann  # noqa: E402,F401
from . import workload_sources  # noqa: E402,F401
from . import workload_pipeline  # noqa: E402,F401
from . import workload_graph  # noqa: E402,F401

# The driver's correctness pass records the FIRST 50 registry entries per
# round, so this list is rotated each round by recording provenance
# (VERDICT r3 item 1): (a) queries with NO green driver row in any round's
# CORRECTNESS artifact, cheapest first; (b) queries whose code changed this
# round (their old rows no longer certify the current plan); (c) the
# stalest remaining rows (r1-only).  Everything outside the 50-row window
# stays verified by the full local oracle replica
# (tools/run_correctness.py), whose per-round output is committed as
# CORRECTNESS_LOCAL_r{N}.json — ADVICE r3.
# Rotation r19 (no never-windowed rows remain): (a) the 25 queries whose
# engine path changed this optimization round — the rescore family's
# stage-2 fetch-by-id (IN pushdown + cached survivors), the two-pass
# scene cuts' endpoint-hash reuse, the near-dup gates' batch-conf +
# AvailableNow drains, the CDC/alias tails' batched triggers +
# overlapped per-version drains, the BPE driver-side small-vocab
# trainer, sessionization's 4 state shards, every single-drain stream's
# AvailableNow switch, and the store rows exercising the overlapped-
# write helper / rewrite-group threshold branch; (b) the 15 rows whose
# last driver window was r14, registry order; (c) the 10 oldest
# r15-stale rows, registry order, filling the window to exactly 50.
# After this round no driver row is staler than r15 (the 30 remaining
# r15 rows are re-certified by the committed CORRECTNESS_LOCAL_r19.json
# full replica and queue for r20; staleness recomputed from the
# committed CORRECTNESS_r{5..18}.json artifacts).
FRONT_QUERIES = [
    # (a) engine path changed this round
    "int8_rescore_topk",
    "matryoshka_rescore_topk",
    "bq_hamming_rescore",
    "store_quantized_search",
    "video_scene_cuts",
    "stream_neardup_pairs",
    "stream_embedding_neardups",
    "stream_store_changelog",
    "stream_alias_events",
    "bpe_merge_table",
    "bpe_encode_corpus",
    "bpe_sequence_packing",
    "stream_sessionization",
    "stream_media_gate",
    "stream_dedup_events",
    "stream_ops_stats",
    "stream_hourly_counts",
    "stateful_running_stats",
    "stream_pii_scrub",
    "stream_quality_gate",
    "stream_attribution_join",
    "stream_store_ingest",
    "upsert_merge",
    "points_update_batch",
    "update_vectors_points",
    # (b) last driver window r14, registry order
    "adaptive_search",
    "ann_ivfpq_topk",
    "ann_signlsh_topk",
    "benchmark_decontamination",
    "bm25_top_docs",
    "chunk_dedup_groups",
    "domain_balanced_sample",
    "domain_blocklist_filter",
    "npy_migration",
    "pii_redaction",
    "regex_token_profile",
    "repetition_profile",
    "rolling_hash_fp",
    "substring_dedup_spans",
    "substring_dup_fraction",
    # (c) oldest r15-stale rows, registry order
    "active_customer_balance",
    "ccnet_perplexity_buckets",
    "charlm_quality",
    "customers_without_orders",
    "delete_by_predicate",
    "doc_fingerprints",
    "doc_quality_filter",
    "dsir_importance_weights",
    "embedding_near_dups",
    "events_hourly_rollup",
]
