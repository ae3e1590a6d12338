"""FormulaQuery compiler (operators/formula.py): node semantics, decay
pins against Python math, wire-format validation, and the plan shape that
makes formula rescoring free at scale (one fused projection, no UDF, no
extra shuffle beyond the two ranking windows)."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from robi_biometric_qdrant_vector_db_service_spark.operators.formula import (
    compile_formula,
    decay_py,
    formula_query,
)
from robi_biometric_qdrant_vector_db_service_spark.sources.catalog import load_table
from tests.conftest import SF_SMOKE


def _eval(spark, expr, rows=None, **kw):
    """Evaluate one formula AST over a tiny DataFrame, return column 'v'."""
    rows = rows if rows is not None else [(1,)]
    cols = ["x"] if rows and len(rows[0]) == 1 else ["x", "y"]
    df = spark.createDataFrame(rows, cols)
    return [
        r.v
        for r in df.select(
            compile_formula(expr, id_col="x", **kw).alias("v")
        ).orderBy("x").collect()
    ]


def test_arith_nodes(spark):
    ast = {"sum": [{"mult": [2.0, "x"]}, {"neg": 1.5}, {"abs": -2.0}]}
    assert _eval(spark, ast, rows=[(3,)]) == [2.0 * 3 - 1.5 + 2.0]
    assert _eval(spark, {"sqrt": "x"}, rows=[(9,)]) == [3.0]
    assert _eval(spark, {"pow": {"base": "x", "exponent": 3.0}}, rows=[(2,)]) == [8.0]
    assert _eval(spark, {"ln": {"exp": "x"}}, rows=[(2,)])[0] == pytest.approx(2.0)
    assert _eval(spark, {"log10": 1000.0})[0] == pytest.approx(3.0)


def test_div_by_zero_default(spark):
    ast = {"div": {"left": 1.0, "right": "x", "by_zero_default": 7.0}}
    assert _eval(spark, ast, rows=[(0,), (2,)]) == [7.0, 0.5]
    # unset default → NULL on /0 (Qdrant drops the point)
    ast = {"div": {"left": 1.0, "right": "x"}}
    assert _eval(spark, ast, rows=[(0,)]) == [None]


def test_condition_indicator_and_defaults(spark):
    df = spark.createDataFrame([(1, 5), (2, None)], "x int, y int")
    vals = [
        r.v
        for r in df.select(
            compile_formula(
                {"sum": [{"key": "y", "range": {"gte": 4}}, "y"]},
                id_col="x",
                defaults={"y": 100.0},
            ).alias("v")
        ).orderBy("x").collect()
    ]
    # row1: indicator 1 + y 5; row2: absent y → indicator 0 + default 100
    assert vals == [6.0, 100.0]


@pytest.mark.parametrize("op", ["lin_decay", "exp_decay", "gauss_decay"])
def test_decay_pins_match_python_math(spark, op):
    params = {"target": 10.0, "scale": 5.0, "midpoint": 0.25}
    xs = [0.0, 7.5, 10.0, 12.0, 40.0]
    got = _eval(
        spark, {op: {"x": "x", **params}}, rows=[(x,) for x in xs]
    )
    want = [decay_py(op, x, **params) for x in xs]
    assert got == pytest.approx(want, rel=1e-12)
    # decay is 1 at the target and = midpoint at distance scale (the
    # defining property of Qdrant's parameterization)
    assert decay_py(op, 10.0, **params) == pytest.approx(1.0)
    assert decay_py(op, 15.0, **params) == pytest.approx(0.25)
    assert decay_py(op, 5.0, **params) == pytest.approx(0.25)


def test_geo_distance_node(spark):
    """geo_distance = haversine meters, same kernel as GeoRadius; pinned
    against a pure-Python haversine at a known pair (Paris→origin)."""
    df = spark.createDataFrame(
        [(1, 48.8566, 2.3522), (2, 45.0, 10.0)], "x int, lat double, lon double"
    ).withColumn("geo", F.struct("lat", "lon"))
    ast = {"geo_distance": {"origin": {"lat": 45.0, "lon": 10.0}, "to": "geo"}}
    got = [
        r.v
        for r in df.select(compile_formula(ast, id_col="x").alias("v"))
        .orderBy("x")
        .collect()
    ]

    def hav(lat1, lon1, lat2, lon2):
        p1, p2 = math.radians(lat1), math.radians(lat2)
        dp, dl = p2 - p1, math.radians(lon2) - math.radians(lon1)
        h = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
        return 2 * 6371000.0 * math.asin(math.sqrt(h))

    assert got[0] == pytest.approx(hav(45.0, 10.0, 48.8566, 2.3522), rel=1e-9)
    assert got[1] == 0.0


def test_datetime_nodes(spark):
    """datetime literal → epoch seconds; datetime_key reads epoch doubles
    verbatim (schema-aware) and casts timestamp/string columns; their
    difference is a duration in seconds (the decay input contract)."""
    epoch = 1704067200.0  # 2024-01-01T00:00:00Z
    lit = {"datetime": "2024-01-01T00:00:00Z"}
    assert _eval(spark, lit) == [epoch]
    assert _eval(spark, {"datetime": "2024-01-01"}) == [epoch]
    # numeric column: taken as epoch seconds verbatim (no cast round-trip)
    df = spark.createDataFrame([(1, epoch + 0.5)], "x int, ts double")
    ast = {"sum": [{"datetime_key": "ts"}, {"neg": lit}]}
    v = df.select(
        compile_formula(ast, id_col="x", schema=df.schema).alias("v")
    ).collect()[0].v
    assert v == 0.5
    # string column: parsed as a timestamp (UTC), same epoch basis
    df2 = spark.createDataFrame([(1, "2024-01-01 00:00:30")], "x int, ts string")
    v2 = df2.select(
        compile_formula(ast, id_col="x", schema=df2.schema).alias("v")
    ).collect()[0].v
    assert v2 == 30.0


def test_score_binding_and_errors(spark):
    df = spark.createDataFrame([(1, 0.5)], "x int, s double")
    v = df.select(
        compile_formula("$score", score=F.col("s"), id_col="x").alias("v")
    ).collect()[0].v
    assert v == 0.5
    with pytest.raises(ValueError, match=r"\$score"):
        compile_formula("$score")  # no score bound
    with pytest.raises(NotImplementedError, match="prefetch leg"):
        compile_formula("$score[1]", score=F.col("s"))
    with pytest.raises(ValueError, match="geo_distance origin"):
        compile_formula({"geo_distance": {"origin": {}, "to": "f"}})
    with pytest.raises(ValueError, match="geo_distance needs"):
        compile_formula({"geo_distance": {"origin": {"lat": 0, "lon": 0}}})
    with pytest.raises(ValueError, match="RFC3339"):
        compile_formula({"datetime": "not-a-date"})
    with pytest.raises(ValueError, match="midpoint"):
        compile_formula({"gauss_decay": {"x": "x", "midpoint": 1.5}})
    with pytest.raises(ValueError, match="scale"):
        compile_formula({"lin_decay": {"x": "x", "scale": 0}})
    with pytest.raises(ValueError, match="ambiguous"):
        compile_formula({"sum": [1.0], "mult": [1.0]})
    with pytest.raises(ValueError, match="unsupported"):
        compile_formula({"frobnicate": 1.0})
    with pytest.raises(ValueError, match="at least one"):
        compile_formula({"sum": []})


def test_date_geo_nodes_respect_defaults_and_ambiguity(spark):
    """r11 advice: geo_distance/datetime/datetime_key are operator keys —
    they join the multi-op ambiguity check, and FormulaQuery.defaults
    fills a missing geo / datetime payload field instead of NULLing the
    point out of the ranking."""
    with pytest.raises(ValueError, match="ambiguous"):
        compile_formula({"datetime_key": "ts", "sum": [1.0]})
    with pytest.raises(ValueError, match="ambiguous"):
        compile_formula(
            {"geo_distance": {"origin": {"lat": 0, "lon": 0}, "to": "g"}, "neg": 1.0}
        )
    # datetime_key default (RFC3339 string form) fills a NULL payload
    epoch = 1704067200.0  # 2024-01-01T00:00:00Z
    df = spark.createDataFrame([(1, None), (2, epoch + 60.0)], "x int, ts double")
    ast = {"sum": [{"datetime_key": "ts"}, {"neg": {"datetime": "2024-01-01T00:00:00Z"}}]}
    got = {
        r.x: r.v
        for r in df.select(
            "x",
            compile_formula(
                ast, id_col="x", schema=df.schema, defaults={"ts": "2024-01-01T00:00:30Z"}
            ).alias("v"),
        ).collect()
    }
    assert got == {1: 30.0, 2: 60.0}
    # geo_distance default: a geo-point dict per component
    gdf = spark.createDataFrame(
        [(1, 48.8566, 2.3522), (2, None, None)], "x int, lat double, lon double"
    ).withColumn("geo", F.when(F.col("lat").isNotNull(), F.struct("lat", "lon")))
    gast = {"geo_distance": {"origin": {"lat": 45.0, "lon": 10.0}, "to": "geo"}}
    gv = {
        r.x: r.v
        for r in gdf.select(
            "x",
            compile_formula(
                gast, id_col="x", defaults={"geo": {"lat": 45.0, "lon": 10.0}}
            ).alias("v"),
        ).collect()
    }
    assert gv[2] == 0.0 and gv[1] > 0.0
    # without a default the missing field still yields NULL (Qdrant drop)
    gv_null = gdf.select(compile_formula(gast, id_col="x").alias("v")).collect()
    assert any(r.v is None for r in gv_null)


def test_geo_default_substitutes_whole_point_not_per_component(spark):
    """r12 advice: Qdrant's FormulaQuery.defaults replaces a missing geo
    VALUE as a unit.  A payload struct with lat present but lon NULL is
    missing — the whole default point substitutes; it must never score
    with a mixed (payload-lat, default-lon) point."""
    gdf = spark.createDataFrame(
        [
            (1, 48.8566, 2.3522),  # complete payload point
            (2, 48.8566, None),    # half-missing: lon NULL
            (3, None, 2.3522),     # half-missing: lat NULL
            (4, None, None),       # struct fully NULL
        ],
        "x int, lat double, lon double",
    ).withColumn(
        "geo",
        F.when(
            F.col("lat").isNotNull() | F.col("lon").isNotNull(),
            F.struct("lat", "lon"),
        ),
    )
    # origin == default point → every missing-value row must score 0.0
    gast = {"geo_distance": {"origin": {"lat": 45.0, "lon": 10.0}, "to": "geo"}}
    gv = {
        r.x: r.v
        for r in gdf.select(
            "x",
            compile_formula(
                gast, id_col="x", defaults={"geo": {"lat": 45.0, "lon": 10.0}}
            ).alias("v"),
        ).collect()
    }
    assert gv[1] > 0.0  # complete point scores with the payload value
    # per-component coalesce would give haversine(48.8566, 10) ≈ 430 km
    # for row 2 — as-a-unit substitution gives exactly the default point
    assert gv[2] == 0.0 and gv[3] == 0.0 and gv[4] == 0.0


def test_datetime_key_requires_utc_session(spark):
    """String-typed datetime payloads parse in the session timezone; the
    datetime literal base is UTC — compile refuses the divergence in a
    non-UTC session (r11 advice, formula.py:_epoch_seconds)."""
    df = spark.createDataFrame([(1, "2024-01-01 00:00:30")], "x int, ts string")
    ast = {"datetime_key": "ts"}
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        with pytest.raises(ValueError, match="session timezone"):
            compile_formula(ast, id_col="x", schema=df.schema)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    # UTC session: compiles, and numeric columns never need the check
    compile_formula(ast, id_col="x", schema=df.schema)
    ndf = spark.createDataFrame([(1, 0.0)], "x int, ts double")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        compile_formula(ast, id_col="x", schema=ndf.schema)  # no raise
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def _probes(spark, n=4):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    return emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )


def test_formula_query_plan_shape(spark):
    """The rescore is a fused projection: exactly the knn+rerank plan —
    one broadcast (probes), ≤2 non-broadcast exchanges (the two ranking
    windows share the q_id partitioning, so Spark reuses one), no
    Python eval nodes, vectors absent from the shuffle."""
    corpus = load_table(spark, SF_SMOKE, "embeddings")
    ast = {
        "sum": [
            {"mult": [0.6, "$score"]},
            {"mult": [0.4, {"lin_decay": {"x": "vec_id", "scale": 100.0}}]},
        ]
    }
    df = formula_query(corpus, _probes(spark), ast, prefetch_k=20, k=5)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastExchange" in plan
    assert len(re.findall(r"^\(\d+\) Exchange$", plan, re.M)) <= 2, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # identical-order rescore sanity: formula = 1.0 * $score reproduces knn
    ident = formula_query(corpus, _probes(spark), "$score", prefetch_k=20, k=5)
    from robi_biometric_qdrant_vector_db_service_spark.operators.search import knn_search

    base = knn_search(corpus, _probes(spark), k=5)
    got = {(r.q_id, r.vec_id, r.rank) for r in ident.collect()}
    want = {(r.q_id, r.vec_id, r.rank) for r in base.collect()}
    assert got == want


def test_formula_query_boost_reorders(spark):
    """A condition boost actually changes the ranking: boosted labels
    outrank un-boosted ones with equal base scores."""
    corpus = load_table(spark, SF_SMOKE, "embeddings")
    ast = {"sum": ["$score", {"mult": [10.0, {"key": "label", "match": {"value": 3}}]}]}
    out = formula_query(corpus, _probes(spark, 2), ast, prefetch_k=50, k=50)
    labels = load_table(spark, SF_SMOKE, "embeddings").select("vec_id", "label")
    joined = out.join(labels, "vec_id")
    rows = joined.filter(F.col("q_id") == 0).orderBy("rank").collect()
    n3 = sum(1 for r in rows if r.label == 3)
    assert n3 > 0
    # every label-3 point (score+10) ranks above every other point
    assert all(r.label == 3 for r in rows[:n3]), [(r.rank, r.label) for r in rows]


def test_formula_query_drops_null_scores(spark):
    """div with no by_zero_default → NULL new_score → the point is DROPPED
    (Qdrant semantics), never emitted as a NULL-score trailing row."""
    corpus = load_table(spark, SF_SMOKE, "embeddings")
    # divisor = the condition indicator (1.0 on label 3, else 0.0) → every
    # non-label-3 candidate divides by zero
    ast = {"div": {"left": "$score", "right": {"key": "label", "match": {"value": 3}}}}
    out = formula_query(corpus, _probes(spark), ast, prefetch_k=50, k=50).collect()
    assert out, "some label-3 candidates must survive"
    assert all(r.score is not None for r in out)
    labels = {r.vec_id: r.label for r in
              load_table(spark, SF_SMOKE, "embeddings").select("vec_id", "label").collect()}
    # every emitted point divided by indicator 1.0 → label 3 only
    assert all(labels[r.vec_id] == 3 for r in out)
    # with the default supplied, the dropped points come back (score 0)
    ast2 = {"div": {"left": "$score", "right": {"key": "label", "match": {"value": 3}},
                    "by_zero_default": 0.0}}
    out2 = formula_query(corpus, _probes(spark), ast2, prefetch_k=50, k=50).collect()
    assert len(out2) > len(out)


def test_geo_decay_float_margin(spark):
    """Libm-parity audit for formula_geo_decay_topk (the one formula query
    whose score path crosses trig): across the whole fixture corpus the
    UNROUNDED rescore must sit far from any 6dp rounding boundary, and
    within each probe's prefetch set adjacent scores must be separated by
    far more than cross-engine trig ulp noise (~1e-15 relative) — so the
    6dp round and the rank order are both stable under last-ulp drift."""
    from robi_biometric_qdrant_vector_db_service_spark.workload import REGISTRY

    # Re-derive the unrounded rescore exactly as the registered query does,
    # but keep full precision and the whole prefetch set.
    from robi_biometric_qdrant_vector_db_service_spark.workload import (
        _FORMULA_GEO_AST,
        _probes as _wprobes,
    )
    from robi_biometric_qdrant_vector_db_service_spark.operators.formula import compile_formula
    from robi_biometric_qdrant_vector_db_service_spark.operators.search import score_pairs
    from pyspark.sql import Window

    corpus = load_table(spark, SF_SMOKE, "embeddings").withColumn(
        "geo",
        F.struct(
            ((F.col("vec_id") * 7919 % 18000) / 100.0 - 90.0).alias("lat"),
            ((F.col("vec_id") * 104729 % 36000) / 100.0 - 180.0).alias("lon"),
        ),
    )
    scored = score_pairs(corpus, _wprobes(spark, SF_SMOKE)).drop("embedding", "q_emb")
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), "vec_id")
    pre = scored.withColumn("prerank", F.row_number().over(w)).filter(
        F.col("prerank") <= 50
    )
    resc = pre.withColumn(
        "ns",
        compile_formula(_FORMULA_GEO_AST, score=F.col("score"), id_col="vec_id"),
    )
    rows = resc.select("q_id", "ns").collect()
    # (1) rounding-boundary margin: |frac(ns * 1e6) - 0.5| >> trig noise
    margins = [abs((r.ns * 1e6) % 1.0 - 0.5) for r in rows]
    assert min(margins) > 1e-4, min(margins)
    # (2) adjacent-score gap inside each probe's candidate set
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append(r.ns)
    min_gap = min(
        b - a
        for vals in by_q.values()
        for a, b in zip(sorted(vals), sorted(vals)[1:])
    )
    assert min_gap > 1e-9, min_gap

    # and the registered query agrees with itself end-to-end (smoke)
    assert REGISTRY["formula_geo_decay_topk"].run(spark, SF_SMOKE).count() > 0
