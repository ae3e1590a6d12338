"""The store's materialized companion index columns (r17 VERDICT item 1).

Every segment write derives e8 / e_pre16 / bq_code from the embedding
being written inside ``_write_segment`` — the single choke point all
ingest and rewrite paths funnel through — so the at-rest quantized copies
can never go stale, and the quantized serving path (``search(...,
quantization=...)``) rescores against them with stage 1 never reading the
float vectors (plan pin in tests/test_plans.py).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from robi_biometric_qdrant_vector_db_service_spark.operators.ann import (
    INT8_QUANT_EXPR,
    bq_words_dynamic_expr,
    bq_words_expr,
)
from robi_biometric_qdrant_vector_db_service_spark.operators.store import (
    STORE_PREFIX_DIMS,
    VectorStore,
)
from robi_biometric_qdrant_vector_db_service_spark.sources.catalog import load_table
from tests.conftest import SF_SMOKE


def _points(spark, n=60):
    emb = load_table(spark, SF_SMOKE, "embeddings").limit(n)
    return emb.select(
        F.col("vec_id").cast("string").alias("point_id"),
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("embedding"),
        F.concat(F.lit("u"), F.col("label")).alias("user_id"),
        F.lit(1.0).alias("ts"),
        F.create_map().cast("map<string,string>").alias("metadata"),
    )


def _assert_companions_consistent(store: VectorStore) -> None:
    """Zero rows where a companion column disagrees with a fresh
    derivation from the CURRENT embedding."""
    df = store.read(with_index=True)
    bad = df.filter(
        (
            F.col("e8")
            != F.expr(INT8_QUANT_EXPR.format(col="embedding")).cast(
                "array<tinyint>"
            )
        )
        | (F.col("e_pre16") != F.expr(f"slice(embedding, 1, {STORE_PREFIX_DIMS})"))
        | (F.col("bq_code") != F.expr(bq_words_dynamic_expr("embedding")))
    ).count()
    assert bad == 0


def test_companions_written_at_create_and_tracked_through_rewrites(
    spark, tmp_path
):
    store = VectorStore.create(spark, str(tmp_path / "s"), _points(spark))
    _assert_companions_consistent(store)

    # a vector rewrite must refresh the companions (stale e8 would make
    # quantized search rank by the OLD vector — silent wrong answers)
    new_vecs = (
        store.read()
        .limit(5)
        .select(
            "point_id",
            F.expr("transform(embedding, x -> -x)").alias("embedding"),
        )
    )
    n = store.update_vectors(new_vecs, normalize=False)
    assert n == 5
    _assert_companions_consistent(store)

    # upsert (bucket rewrite + append segment): both sides re-derive
    up = _points(spark, 10).withColumn(
        "embedding", F.expr("transform(embedding, x -> x * 0.5)")
    )
    store.upsert(up, normalize=False)
    _assert_companions_consistent(store)

    store.compact()
    _assert_companions_consistent(store)

    # the default read keeps the logical 5-column point schema
    assert store.read().columns == [
        "point_id",
        "embedding",
        "user_id",
        "ts",
        "metadata",
    ]
    assert set(store.read(with_index=True).columns) >= {"e8", "e_pre16", "bq_code"}


def test_quantized_search_full_oversample_equals_exact(spark, tmp_path):
    """With oversample × k covering the whole collection, stage 1 keeps
    every candidate, so the INT8 and BQ paths must return EXACTLY the
    exact search's top-k (same ids, same scores) — the rescore stage is
    the same cosine."""
    store = VectorStore.create(spark, str(tmp_path / "s"), _points(spark, 40))
    probes = (
        load_table(spark, SF_SMOKE, "embeddings")
        .filter(F.col("vec_id") < 3)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"))
    )
    exact = {
        (r["q_id"], r["point_id"], r["rank"]): r["score"]
        for r in store.search(probes, k=5).collect()
    }
    for mode in ("int8", "binary"):
        got = {
            (r["q_id"], r["point_id"], r["rank"]): r["score"]
            for r in store.search(
                probes, k=5, quantization=mode, oversample=40
            ).collect()
        }
        assert got == exact, mode

    with pytest.raises(ValueError, match="quantization must be"):
        store.search(probes, k=5, quantization="pq")


def test_quantized_search_prescreen_recall(spark, tmp_path):
    """At the production oversample (3× — settings.py:48-51) the INT8
    prescreen must keep high top-k agreement with exact search, and the
    score threshold must apply to the exact rescored score."""
    store = VectorStore.create(spark, str(tmp_path / "s"), _points(spark, 60))
    probes = (
        load_table(spark, SF_SMOKE, "embeddings")
        .filter(F.col("vec_id") < 4)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"))
    )
    exact = store.search(probes, k=5).collect()
    got = store.search(probes, k=5, quantization="int8", oversample=3).collect()
    e = {(r["q_id"], r["point_id"]) for r in exact}
    g = {(r["q_id"], r["point_id"]) for r in got}
    assert len(e & g) / len(e) >= 0.9

    thresh = store.search(
        probes, k=5, quantization="int8", oversample=3, score_threshold=0.0
    ).collect()
    assert all(r["score"] >= 0.0 for r in thresh)


def test_bq_dynamic_words_equal_static(spark):
    """``bq_words_dynamic_expr`` (word count from size() at run time —
    the store's dim-agnostic packer) produces the identical words as the
    compile-time ``bq_words_expr`` for every dims in 1..70."""
    import random

    random.seed(5)
    rows = []
    for dims in list(range(1, 12)) + [31, 32, 33, 63, 64, 65, 70]:
        rows.append(([random.uniform(-1, 1) for _ in range(dims)], dims))
    df = spark.createDataFrame(rows, "v array<double>, dims int")
    for _, dims in rows:
        one = df.filter(F.col("dims") == dims)
        bad = one.filter(
            F.expr(bq_words_dynamic_expr("v")) != F.expr(bq_words_expr("v", dims))
        ).count()
        assert bad == 0, dims
