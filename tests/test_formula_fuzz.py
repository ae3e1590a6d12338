"""Property-based differential fuzz of the FormulaQuery compiler.

Random Expression ASTs (Qdrant's public union: literals, $score, payload
refs with defaults, condition indicators, sum/mult/div/neg/abs/sqrt/exp/
ln/log10/pow and the decay trio) compile through ``compile_formula`` and
are compared row-for-row against an independent Python evaluator that
mirrors the engine's PROBED null/NaN semantics (each pinned by
test_edge_semantics_probes below so a Spark behavior change fails loudly
here, not silently in the fuzz):

- NULL propagates through +, *, neg, abs, sqrt, exp and pow;
- ln/log10 are NULL for input <= 0, NaN for NaN;
- sqrt(negative) and pow(neg, fractional) are NaN, pow(x, 0) = 1;
- ``div`` is try_divide (NULL on /0) unless by_zero_default, which fires
  whenever right == 0 — even when left is NULL;
- a condition indicator is when(cond, 1).otherwise(0): NULL verdict -> 0;
- lin_decay's greatest(0, ...) SKIPS a NULL operand (Spark greatest
  semantics), so lin_decay of a NULL x is 0.0 while exp/gauss decay of
  the same x stays NULL — a real wire-visible asymmetry worth pinning.

Transcendental results compare with 1e-12 relative tolerance (JVM vs
Python libm last-ulp drift, the SURVEY §7 risk-1 posture); everything
else compares exactly, including None-vs-value and NaN-vs-value."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from robi_biometric_qdrant_vector_db_service_spark.operators.formula import (
    compile_formula,
)

SCHEMA = "point_id string, s double, a double, b double, tag string"
ROWS = [
    {"point_id": str(i), "s": [0.1, 0.9, 0.5][i % 3],
     "a": [None, 0.0, -1.5, 2.0, 0.5][i % 5],
     "b": [3.0, None, 0.25, -2.0][i % 4],
     "tag": [None, "x", "y"][i % 3]}
    for i in range(12)
]
DEFAULTS = {"b": 7.0}  # 'a' deliberately has NO default: NULLs flow


@pytest.fixture(scope="module")
def formula_df(spark):
    df = spark.createDataFrame(
        [(r["point_id"], r["s"], r["a"], r["b"], r["tag"]) for r in ROWS], SCHEMA
    ).persist()
    df.count()
    yield df
    df.unpersist()


# ---------------------------------------------------------------------------
# Independent evaluator (None | float, NaN-aware)
# ---------------------------------------------------------------------------


def _ref(row, key):
    v = row.get(key)
    if v is None and key in DEFAULTS:
        return float(DEFAULTS[key])
    return None if v is None else float(v)


def ev(e, row):
    if isinstance(e, (int, float)) and not isinstance(e, bool):
        return float(e)
    if e == "$score":
        return row["s"]
    if isinstance(e, str):
        return _ref(row, e)
    (op, spec), = e.items()
    if op == "cond":  # generator wraps raw condition dicts for clarity
        v = row.get(spec["key"])
        m = spec["match"]["value"]
        return 1.0 if (v is not None and v == m) else 0.0
    if op in ("sum", "mult"):
        parts = [ev(p, row) for p in spec]
        if any(p is None for p in parts):
            return None
        acc = parts[0]
        for p in parts[1:]:
            acc = acc + p if op == "sum" else acc * p
        return acc
    if op == "div":
        left, right = ev(spec["left"], row), ev(spec["right"], row)
        if right is not None and right == 0.0 and "by_zero_default" in spec:
            return float(spec["by_zero_default"])  # fires even on NULL left
        if left is None or right is None or right == 0.0:
            return None
        return left / right
    v = ev(spec["x"], row) if op.endswith("_decay") else (
        None if op == "pow" else ev(spec, row))
    if op == "neg":
        return None if v is None else -v
    if op == "abs":
        return None if v is None else abs(v)
    if op == "sqrt":
        if v is None:
            return None
        return math.sqrt(v) if v >= 0 else float("nan")
    if op == "exp":
        if v is None:
            return None
        try:
            return math.exp(v)
        except OverflowError:
            return float("inf")  # JVM Math.exp saturates to Infinity
    if op in ("ln", "log10"):
        if v is None:
            return None
        if math.isnan(v):
            return float("nan")
        if v <= 0:
            return None
        return math.log(v) if op == "ln" else math.log10(v)
    if op == "pow":
        base, exp_ = ev(spec["base"], row), ev(spec["exponent"], row)
        if base is None or exp_ is None:
            return None
        try:
            return math.pow(base, exp_)  # Java Math.pow: pow(x, 0) = 1
        except ValueError:
            # Java: pow(0, negative) = +Inf; pow(neg, fractional) = NaN
            return float("inf") if base == 0.0 else float("nan")
        except OverflowError:
            return float("inf") if base > 1.0 or base < -1.0 else 0.0
    if op.endswith("_decay"):
        t = float(spec.get("target", 0.0))
        sc = float(spec.get("scale", 1.0))
        mid = float(spec.get("midpoint", 0.5))
        if op == "lin_decay":
            if v is None:
                return 0.0  # greatest() skips the NULL operand
            val = 1.0 - abs(v - t) * (1.0 - mid) / sc
            # Spark greatest: NaN is greater than any number (Python max
            # would return 0.0 here)
            return float("nan") if math.isnan(val) else max(0.0, val)
        if v is None:
            return None
        if op == "exp_decay":
            return math.exp(math.log(mid) / sc * abs(v - t))
        return math.exp(math.log(mid) / (sc * sc) * (v - t) ** 2)
    raise AssertionError(f"generator produced unknown op {op}")


def _unwrap(e):
    """Turn the generator's {'cond': leaf} marker into the wire format."""
    if isinstance(e, dict):
        if "cond" in e:
            return e["cond"]
        return {k: (_unwrap_spec(k, v)) for k, v in e.items()}
    return e


def _unwrap_spec(op, spec):
    if op in ("sum", "mult"):
        return [_unwrap(p) for p in spec]
    if op == "div":
        return {k: (_unwrap(v) if k in ("left", "right") else v)
                for k, v in spec.items()}
    if op == "pow":
        return {"base": _unwrap(spec["base"]), "exponent": _unwrap(spec["exponent"])}
    if op.endswith("_decay"):
        return {k: (_unwrap(v) if k == "x" else v) for k, v in spec.items()}
    return _unwrap(spec)


# ---------------------------------------------------------------------------
# AST generator: bounded values keep exp/pow finite
# ---------------------------------------------------------------------------

_lit = st.sampled_from([-2.0, -0.5, 0.0, 0.25, 1.0, 3.0])
_leaf = st.one_of(
    _lit,
    st.just("$score"),
    st.sampled_from(["a", "b"]),
    st.builds(lambda v: {"cond": {"key": "tag", "match": {"value": v}}},
              st.sampled_from(["x", "y", "z"])),
)


def _node(child):
    return st.one_of(
        st.builds(lambda ps: {"sum": ps}, st.lists(child, min_size=1, max_size=3)),
        st.builds(lambda ps: {"mult": ps}, st.lists(child, min_size=1, max_size=3)),
        st.builds(
            lambda l, r, d: {"div": {"left": l, "right": r, **d}},
            child, child,
            st.sampled_from([{}, {"by_zero_default": 5.0}]),
        ),
        st.builds(lambda x: {"neg": x}, child),
        st.builds(lambda x: {"abs": x}, child),
        st.builds(lambda x: {"sqrt": x}, child),
        st.builds(lambda x: {"exp": x}, child),
        st.builds(lambda x: {"ln": x}, child),
        st.builds(lambda x: {"log10": x}, child),
        st.builds(lambda b, x: {"pow": {"base": b, "exponent": x}}, child, _lit),
        st.builds(
            lambda x, t, sc, mid: {"lin_decay":
                                   {"x": x, "target": t, "scale": sc, "midpoint": mid}},
            child, _lit, st.sampled_from([0.5, 1.0, 2.0]),
            st.sampled_from([0.25, 0.5, 0.9]),
        ),
        st.builds(
            lambda op, x, sc: {op: {"x": x, "scale": sc}},
            st.sampled_from(["exp_decay", "gauss_decay"]),
            child, st.sampled_from([0.5, 1.0, 2.0]),
        ),
    )


ast = _node(st.one_of(_leaf, _node(_leaf)))


def _same(got, want):
    if got is None or want is None:
        return got is None and want is None
    if math.isnan(got) or math.isnan(want):
        return math.isnan(got) and math.isnan(want)
    if math.isinf(got) or math.isinf(want):
        return got == want
    return math.isclose(got, want, rel_tol=1e-12, abs_tol=1e-12)


@settings(max_examples=50, deadline=None)
@given(tree=ast)
def test_compiled_formula_matches_evaluator(formula_df, tree):
    import pyspark.sql.functions as F

    expr = _unwrap(tree)
    col = compile_formula(
        expr, score=F.col("s"), id_col="point_id",
        defaults=dict(DEFAULTS), schema=formula_df.schema,
    )
    got = {
        r["point_id"]: r["v"]
        for r in formula_df.select("point_id", col.alias("v")).collect()
    }
    for row in ROWS:
        want = ev(tree, row)
        assert _same(got[row["point_id"]], want), (
            f"expr={expr!r} row={row!r} got={got[row['point_id']]!r} want={want!r}"
        )


def test_edge_semantics_probes(spark):
    """Pin the Spark behaviors the evaluator encodes — if an engine
    upgrade shifts one, this fails with the exact probe, not a fuzz
    counterexample."""
    import pyspark.sql.functions as F

    r = spark.range(1).select(
        F.log(F.lit(0.0)).alias("ln0"),
        F.log(F.lit(-1.0)).alias("lnneg"),
        F.sqrt(F.lit(-1.0)).alias("sqneg"),
        F.pow(F.lit(-2.0), F.lit(0.5)).alias("pownegfrac"),
        F.pow(F.lit(0.0), F.lit(0.0)).alias("pow00"),
        F.greatest(F.lit(0.0), F.lit(None).cast("double")).alias("gnull"),
        F.try_divide(F.lit(1.0), F.lit(0.0)).alias("div0"),
        (F.lit(1.0) + F.lit(None).cast("double")).alias("addnull"),
        F.when(F.lit(None).cast("boolean"), F.lit(1.0)).otherwise(0.0).alias("condnull"),
    ).collect()[0]
    assert r["ln0"] is None and r["lnneg"] is None
    assert math.isnan(r["sqneg"]) and math.isnan(r["pownegfrac"])
    assert r["pow00"] == 1.0
    assert r["gnull"] == 0.0
    assert r["div0"] is None and r["addnull"] is None
    assert r["condnull"] == 0.0
