"""Qdrant ``FormulaQuery`` — score boosting as a compiled Catalyst projection.

Qdrant's ``query_points(query=FormulaQuery(...))`` (public API, 1.14+)
rescores prefetch results with an arithmetic formula over the prefetch
score, payload fields, constants and filter conditions.  The reference
pins plain cosine search (qdrant_client.py:311-405) but serves the same
client surface; the formula model is the public one.

Spark-first design: the formula AST is compiled ONCE to a single Catalyst
``Column`` expression — the rescore is a map-side projection fused into
whole-stage codegen, never a UDF and never an extra shuffle.  The only
shuffles in a formula query are the two ranking windows (prefetch top-N,
final top-k), identical to the plain knn plan.

Wire-format AST accepted (Qdrant's public ``Expression`` union):

- number literal                       → constant
- ``"$score"``                         → the prefetch score ("$score[0]"
                                          likewise; deeper prefetch ranks
                                          are gated — one prefetch leg here)
- any other string                     → payload field reference (typed,
                                          promoted column; ``defaults``
                                          supplies the missing-field value)
- a Filter condition dict              → 1.0 / 0.0 indicator
- ``{"mult": [e, ...]}``               → product
- ``{"sum": [e, ...]}``                → sum
- ``{"div": {"left", "right", "by_zero_default"?}}``
- ``{"neg": e}`` ``{"abs": e}`` ``{"sqrt": e}`` ``{"exp": e}``
  ``{"ln": e}`` ``{"log10": e}``
- ``{"pow": {"base": e, "exponent": e}}``
- ``{"lin_decay"|"exp_decay"|"gauss_decay":
      {"x": e, "target"?: e, "scale"?: e, "midpoint"?: e}}``
  with Qdrant's documented shapes (target defaults 0, scale 1 — must be
  positive, midpoint 0.5 — in (0, 1)):

    lin_decay:    max(0, 1 - |x - target| * (1 - midpoint) / scale)
    exp_decay:    exp(ln(midpoint) / scale * |x - target|)
    gauss_decay:  exp(ln(midpoint) / scale^2 * (x - target)^2)

- ``{"geo_distance": {"origin": {"lat","lon"}, "to": key}}`` → haversine
  meters from the literal origin to the point's ``struct<lat,lon>``
  payload column (the same fused-codegen kernel as the ``GeoRadius``
  filter condition — ``payload_index.haversine_m``).
- ``{"datetime": "<RFC3339>"}`` → the constant's epoch seconds (UTC,
  parsed at compile time — a plain double literal in the plan).
- ``{"datetime_key": key}`` → the payload column as epoch seconds.
  Schema-aware when the caller passes one (``formula_query`` does):
  numeric columns are taken as epoch seconds verbatim; timestamp/string
  columns go through one ``cast(timestamp)`` (microsecond precision).
  Differences between datetime expressions are therefore durations in
  seconds — Qdrant's documented decay semantics for datetime inputs.

Float-parity note (SURVEY §7 risk 1): +, *, /, abs, max compose
bit-identically across engines; ``exp``/``ln``/``pow`` are libm calls
whose last ulp may differ between the JVM and DuckDB — queries that need
hash-exact oracles should prefer ``lin_decay`` (pure arithmetic); the
transcendental decays are pinned against Python ``math`` in pytest
instead.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .payload_index import _CLAUSES, _condition

_OPS = (
    "mult",
    "sum",
    "div",
    "neg",
    "abs",
    "sqrt",
    "exp",
    "ln",
    "log10",
    "pow",
    "lin_decay",
    "exp_decay",
    "gauss_decay",
)
_DATE_GEO_OPS = ("geo_distance", "datetime", "datetime_key")
_CONDITION_KEYS = ("key", "has_id", "is_null", "is_empty") + _CLAUSES


def _rfc3339_epoch(s: str) -> float:
    """Parse one RFC3339 / ISO-8601 literal to epoch seconds (UTC).  A
    bare date or a timestamp without offset is UTC (Qdrant's convention
    for datetime payloads); the value becomes a plain double literal."""
    import datetime as _dt

    txt = str(s).strip()
    if txt.endswith(("Z", "z")):
        txt = txt[:-1] + "+00:00"
    try:
        dt = _dt.datetime.fromisoformat(txt)
    except ValueError as exc:
        raise ValueError(f"datetime literal {s!r} is not RFC3339") from exc
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=_dt.timezone.utc)
    return dt.timestamp()


def _epoch_seconds(key: str, schema) -> Column:
    """A payload column as epoch seconds.  With a schema: numeric columns
    are epoch seconds already (the engine's ``ts DOUBLE`` system field,
    SURVEY §1.1); timestamp/date/string columns take one cast.  Without a
    schema the cast chain is still correct for all three (double epoch →
    timestamp → double round-trips at microsecond precision).

    UTC contract: ``cast('timestamp')`` parses tz-NAIVE strings (and
    renders dates) in ``spark.sql.session.timeZone``, while the
    ``{"datetime": <literal>}`` path treats naive values as UTC
    (Qdrant's convention).  The two bases must agree, so the string/date
    path asserts the session is pinned to UTC (this repo pins it in
    every entry point; ``compile_formula`` is public, hence the check).
    Numeric and timestamp columns are timezone-independent and skip it."""
    from pyspark.sql.types import NumericType, TimestampType

    col = F.col(key)
    dtype = None
    if schema is not None:
        try:
            dtype = schema[key].dataType
        except Exception:
            dtype = None
    if isinstance(dtype, NumericType):
        return col.cast("double")
    if not isinstance(dtype, TimestampType):
        _assert_utc_session(key)
    return col.cast("timestamp").cast("double")


def _assert_utc_session(key: str) -> None:
    """Refuse to compile a session-timezone-dependent datetime cast in a
    non-UTC session — the ``datetime`` literal base is always UTC and the
    two bases would silently diverge (naive-string payloads parse in
    session tz).  Remediation is in the message."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:  # compile without a session: nothing to check yet
        return
    tz = (spark.conf.get("spark.sql.session.timeZone") or "").strip()
    if tz not in ("UTC", "Etc/UTC", "GMT", "+00:00", "Z"):
        raise ValueError(
            f"datetime_key {key!r} parses naive string payloads in the session "
            f"timezone ({tz!r}), but datetime literals are UTC — set "
            "spark.sql.session.timeZone=UTC (this repo's default) or store the "
            "field as epoch seconds / TIMESTAMP to use it in a formula"
        )


def _decay_params(spec: dict, *, op: str):
    """Validate and fetch the decay parameter dict (Qdrant's DecayParamsExpression)."""
    if "x" not in spec:
        raise ValueError(f"{op} requires 'x'")
    target = spec.get("target", 0.0)
    scale = spec.get("scale", 1.0)
    midpoint = spec.get("midpoint", 0.5)
    if isinstance(scale, (int, float)) and not scale > 0:
        raise ValueError(f"{op}.scale must be > 0, got {scale}")
    if isinstance(midpoint, (int, float)) and not (0.0 < midpoint < 1.0):
        raise ValueError(f"{op}.midpoint must be in (0, 1), got {midpoint}")
    return spec["x"], target, scale, midpoint


def compile_formula(
    expr,
    *,
    score: Column | None = None,
    id_col: str = "point_id",
    defaults: dict | None = None,
    schema=None,
) -> Column:
    """Compile one Qdrant ``Expression`` AST node to a Catalyst ``Column``.

    ``score`` binds ``"$score"``; ``defaults`` is the formula's
    missing-payload-value map (Qdrant ``FormulaQuery.defaults``);
    ``schema`` (optional StructType) types ``datetime_key`` references."""

    def rec(e) -> Column:
        if isinstance(e, bool):
            raise ValueError("bare booleans are not formula expressions")
        if isinstance(e, (int, float)):
            return F.lit(float(e))
        if isinstance(e, str):
            if e in ("$score", "$score[0]"):
                if score is None:
                    raise ValueError("formula references $score but no score is bound")
                return score
            if e.startswith("$score["):
                raise NotImplementedError(
                    f"{e!r}: only one prefetch leg is bound here — fuse multi-leg "
                    "prefetches first (workload.hybrid_search_rrf shows the pattern)"
                )
            col = F.col(e).cast("double")
            if defaults and e in defaults:
                return F.coalesce(col, F.lit(float(defaults[e])))
            return col
        if not isinstance(e, dict):
            raise ValueError(f"unsupported formula node: {type(e).__name__}")
        # operator-key scan FIRST: geo_distance/datetime/datetime_key are
        # operator keys like any other — a node mixing them with arithmetic
        # ops is ambiguous, not "whichever key we test first wins"
        ops = [k for k in e if k in _OPS or k in _DATE_GEO_OPS]
        if len(ops) > 1:
            raise ValueError(f"ambiguous formula node with ops {ops}: {e}")
        if ops == ["geo_distance"]:
            from .payload_index import _geo_struct, haversine_m

            spec = e["geo_distance"]
            if not isinstance(spec, dict) or "origin" not in spec or "to" not in spec:
                raise ValueError(f"geo_distance needs origin + to: {e}")
            try:
                g_lat, g_lon = _geo_struct(spec["origin"])
            except (KeyError, TypeError) as exc:
                raise ValueError(
                    f"geo_distance origin needs lat + lon: {spec['origin']!r}"
                ) from exc
            to_key = str(spec["to"])
            to_col = F.col(to_key)
            if defaults and to_key in defaults:
                # FormulaQuery.defaults replaces the missing VALUE as a
                # unit: a payload point with either component NULL (or the
                # struct NULL) is missing, and the WHOLE default point
                # substitutes — never a mixed payload-lat/default-lon point
                d_lat, d_lon = _geo_struct(defaults[to_key])
                missing = (
                    to_col.isNull()
                    | to_col["lat"].cast("double").isNull()
                    | to_col["lon"].cast("double").isNull()
                )
                to_col = F.when(
                    missing,
                    F.struct(
                        F.lit(d_lat).alias("lat"), F.lit(d_lon).alias("lon")
                    ),
                ).otherwise(
                    F.struct(
                        to_col["lat"].cast("double").alias("lat"),
                        to_col["lon"].cast("double").alias("lon"),
                    )
                )
            return haversine_m(to_col, g_lat, g_lon)
        if ops == ["datetime"]:
            return F.lit(_rfc3339_epoch(e["datetime"]))
        if ops == ["datetime_key"]:
            dt_key = str(e["datetime_key"])
            col = _epoch_seconds(dt_key, schema)
            if defaults and dt_key in defaults:
                d = defaults[dt_key]
                d_epoch = _rfc3339_epoch(d) if isinstance(d, str) else float(d)
                return F.coalesce(col, F.lit(d_epoch))
            return col
        if not ops:
            # not an operator → must be a Filter condition: 1.0 / 0.0 term
            if any(k in e for k in _CONDITION_KEYS):
                cond = _condition(e, id_col)
                return F.when(cond, F.lit(1.0)).otherwise(F.lit(0.0))
            raise ValueError(f"unsupported formula node: {e}")
        op = ops[0]
        spec = e[op]
        if op == "sum":
            parts = [rec(p) for p in spec]
            if not parts:
                raise ValueError("sum requires at least one operand")
            acc = parts[0]
            for p in parts[1:]:
                acc = acc + p
            return acc
        if op == "mult":
            parts = [rec(p) for p in spec]
            if not parts:
                raise ValueError("mult requires at least one operand")
            acc = parts[0]
            for p in parts[1:]:
                acc = acc * p
            return acc
        if op == "div":
            left, right = rec(spec["left"]), rec(spec["right"])
            q = F.try_divide(left, right)  # ANSI-safe: NULL on /0
            if "by_zero_default" in spec:
                return F.when(right == 0.0, F.lit(float(spec["by_zero_default"]))).otherwise(q)
            return q  # NULL on /0, like Qdrant's unset default dropping the point
        if op == "neg":
            return -rec(spec)
        if op == "abs":
            return F.abs(rec(spec))
        if op == "sqrt":
            return F.sqrt(rec(spec))
        if op == "exp":
            return F.exp(rec(spec))
        if op == "ln":
            return F.log(rec(spec))
        if op == "log10":
            return F.log10(rec(spec))
        if op == "pow":
            return F.pow(rec(spec["base"]), rec(spec["exponent"]))
        # decay trio
        x, target, scale, midpoint = _decay_params(spec, op=op)
        xc, tc = rec(x), rec(target)
        if op == "lin_decay":
            # pure arithmetic — bit-parity safe for hash-exact oracles
            lam = (F.lit(1.0) - rec(midpoint)) / rec(scale)
            return F.greatest(F.lit(0.0), F.lit(1.0) - F.abs(xc - tc) * lam)
        if op == "exp_decay":
            lam = F.log(rec(midpoint)) / rec(scale)
            return F.exp(lam * F.abs(xc - tc))
        lam = F.log(rec(midpoint)) / (rec(scale) * rec(scale))
        return F.exp(lam * (xc - tc) * (xc - tc))

    return rec(expr)


def decay_py(op: str, x: float, *, target: float = 0.0, scale: float = 1.0,
             midpoint: float = 0.5) -> float:
    """Reference Python evaluation of the decay trio (pytest pin for the
    transcendental paths — same formulas, ``math`` instead of Catalyst)."""
    if op == "lin_decay":
        return max(0.0, 1.0 - abs(x - target) * (1.0 - midpoint) / scale)
    if op == "exp_decay":
        return math.exp(math.log(midpoint) / scale * abs(x - target))
    if op == "gauss_decay":
        return math.exp(math.log(midpoint) / (scale * scale) * (x - target) ** 2)
    raise ValueError(op)


def formula_query(
    corpus: DataFrame,
    queries: DataFrame,
    formula,
    *,
    prefetch_k: int = 50,
    k: int = 10,
    defaults: dict | None = None,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "q_id",
    query_vec: str = "q_emb",
    metric: str = "cosine",
) -> DataFrame:
    """Qdrant ``query_points(prefetch=..., query=FormulaQuery(...))``:
    dense prefetch of ``prefetch_k`` per query, rescored by ``formula``,
    final top-``k`` by the new score (desc, id tiebreak).

    Plan shape: corpus never shuffles for scoring (broadcast probes);
    the formula is ONE fused projection over the prefetch survivors; two
    ranking windows total — identical shuffle count to plain knn + rerank.
    ``$score`` binds to the UNROUNDED prefetch score (ranking fidelity);
    the returned score is the formula value rounded 6dp at the boundary.
    """
    from pyspark.sql import Window

    from .search import resolve_metric, score_pairs

    _, lower_is_better = resolve_metric(metric)
    scored = score_pairs(
        corpus, queries, corpus_vec=corpus_vec, query_vec=query_vec, metric=metric
    ).drop(corpus_vec, query_vec)  # vectors don't cross the ranking shuffle
    order = F.asc("score") if lower_is_better else F.desc("score")
    wpre = Window.partitionBy(query_id).orderBy(order, F.col(corpus_id))
    prefetched = (
        scored.withColumn("prerank", F.row_number().over(wpre))
        .filter(F.col("prerank") <= int(prefetch_k))
        .drop("prerank")
    )
    new_score = compile_formula(
        formula,
        score=F.col("score"),
        id_col=corpus_id,
        defaults=defaults,
        schema=prefetched.schema,
    )
    # Qdrant DROPS a point whose formula evaluates to no value (div by
    # zero with no by_zero_default, ln of a non-positive, …) — a NULL
    # new_score must not ride into the top-k as a trailing row.
    rescored = prefetched.withColumn("new_score", new_score).filter(
        F.col("new_score").isNotNull()
    )
    wfin = Window.partitionBy(query_id).orderBy(F.desc("new_score"), F.col(corpus_id))
    return (
        rescored.withColumn("rank", F.row_number().over(wfin))
        .filter(F.col("rank") <= int(k))
        .select(
            F.col(query_id),
            F.col(corpus_id),
            F.col("rank"),
            F.round("new_score", 6).alias("score"),
        )
    )
