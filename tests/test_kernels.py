"""Property-based kernel tests (hypothesis): the Catalyst fold kernels must
agree with NumPy reference math on arbitrary inputs, and the pandas_udf
twins must agree with the fold kernels (SURVEY §2.11 policy: same
semantics whichever physical strategy is chosen)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from robi_biometric_qdrant_vector_db_service_spark.functions.vector import (
    cosine_sql,
    dot_sql,
    l2_normalize_sql,
    norm_sql,
)

finite = st.floats(
    min_value=-1e3, max_value=1e3, allow_nan=False, allow_infinity=False, width=32
)
vec = st.lists(finite, min_size=1, max_size=16)


@pytest.fixture(scope="module")
def sql_eval(spark):
    from pyspark.sql import functions as F

    def run(a, b):
        df = spark.createDataFrame(
            [(a, b)], "a array<double>, b array<double>"
        ).select(
            F.expr(dot_sql("a", "b")).alias("dot"),
            F.expr(norm_sql("a")).alias("na"),
            F.expr(cosine_sql("a", "b")).alias("cos"),
            F.expr(l2_normalize_sql("a")).alias("unit"),
        )
        return df.collect()[0]

    return run


@settings(max_examples=25, deadline=None)
@given(a=vec, data=st.data())
def test_kernels_match_numpy(sql_eval, a, data):
    b = data.draw(st.lists(finite, min_size=len(a), max_size=len(a)))
    row = sql_eval(a, b)
    A, B = np.array(a, dtype=np.float64), np.array(b, dtype=np.float64)
    # fold == sequential accumulation; tolerance only for summation order
    assert math.isclose(row["dot"], float(np.dot(A, B)), rel_tol=1e-12, abs_tol=1e-9)
    assert math.isclose(row["na"], float(np.linalg.norm(A)), rel_tol=1e-12, abs_tol=1e-9)
    na = max(np.linalg.norm(A), 1e-12)
    nb = max(np.linalg.norm(B), 1e-12)
    assert math.isclose(row["cos"], float(np.dot(A, B) / (na * nb)), rel_tol=1e-9, abs_tol=1e-9)
    unit = np.array(row["unit"])
    assert np.allclose(unit, A / na, rtol=1e-12, atol=1e-12)
    if np.linalg.norm(A) > 1e-6:
        assert math.isclose(float(np.linalg.norm(unit)), 1.0, rel_tol=1e-9)


def test_pandas_udf_twins_match_fold(spark):
    """The Arrow/NumPy twins (dot_pudf, l2_normalize_pudf) agree with the
    codegen fold kernels on the real corpus (tolerance: summation order)."""
    from pyspark.sql import functions as F

    from robi_biometric_qdrant_vector_db_service_spark.functions.vector import (
        dot_pudf,
        l2_normalize_pudf,
    )
    from robi_biometric_qdrant_vector_db_service_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings").limit(200)
    two = emb.select(
        F.col("embedding").alias("a"),
        F.reverse("embedding").alias("b"),
    )
    rows = two.select(
        F.expr(dot_sql("a", "b")).alias("fold"),
        dot_pudf("a", "b").alias("pudf"),
        F.expr(l2_normalize_sql("a")).alias("unit_fold"),
        l2_normalize_pudf("a").alias("unit_pudf"),
    ).collect()
    for r in rows:
        assert math.isclose(r["fold"], r["pudf"], rel_tol=1e-12, abs_tol=1e-12)
        assert np.allclose(r["unit_fold"], r["unit_pudf"], rtol=1e-12, atol=1e-12)


def test_cosine_pudf_bit_equal_to_sql(spark):
    """cosine_pudf must be BIT-equal to cosine_sql at the fixture dims
    (sequential summation below NumPy's pairwise threshold + identical
    guarded division) — the LSH near-dup verify step depends on it."""
    from pyspark.sql import functions as F

    from robi_biometric_qdrant_vector_db_service_spark.functions.vector import (
        cosine_pudf,
        cosine_sql,
    )
    from robi_biometric_qdrant_vector_db_service_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings").limit(300)
    two = emb.select(
        F.col("embedding").alias("a"), F.reverse("embedding").alias("b")
    )
    rows = two.select(
        F.expr(cosine_sql("a", "b")).alias("fold"),
        cosine_pudf(F.col("a"), F.col("b")).alias("pudf"),
    ).collect()
    assert rows and all(r["fold"] == r["pudf"] for r in rows)
