"""O1/P-surface: payload field indexes as typed-column promotion.

Reference semantics (file:line into /root/reference):
- ``setup_payload_indexes``  src/core/advanced_indexing.py:39-125 — declares
  per-field typed indexes (KEYWORD user_id/enrollment_group, DATETIME
  timestamp, FLOAT confidence_score, INTEGER face_quality) over the
  otherwise schemaless payload dict.
- ``create_advanced_filters`` src/core/advanced_indexing.py:127-210 —
  composes the conjunctive filter those indexes serve: user in-list
  (single-value fast path :150-164), timestamp range, confidence >=,
  quality >=, enrollment-group in-list.

Spark-first design (SURVEY §1.3): "creating a payload index" = PROMOTING a
``metadata`` map key to a typed top-level column.  A map access
(``metadata['k']``) is opaque to parquet — no pushdown, no row-group
min/max skipping; the promoted typed column gets both for free, plus
Catalyst constant folding and codegen comparisons.  Written sorted or
partitioned by the promoted field, row-group statistics become the
secondary index itself: a range predicate skips every non-overlapping
row group — the columnar analogue of Qdrant's RAM range index
(advanced_indexing.py:71-89 ``on_disk=False`` float/integer indexes).
At 100 TB the promotion is a one-off layout job (like the reference's
one-off ``create_payload_index`` calls), amortized across every
subsequent filtered scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# advanced_indexing.py:50-99 — the reference's payload type system.
# DATETIME is epoch-seconds DOUBLE at write time (qdrant_client.py:211
# stamps time.time()); promote to TimestampType only for calendar ops.
FIELD_TYPES: dict[str, str] = {
    "keyword": "string",
    "integer": "int",
    "float": "double",
    "datetime": "double",
}


def promote_payload_fields(df: DataFrame, fields: dict[str, str]) -> DataFrame:
    """Promote each ``metadata[key]`` to a typed top-level column named
    ``key`` (advanced_indexing.py:39-125: one declared index per field).
    ``fields`` maps key → reference field type (see FIELD_TYPES)."""
    out = df
    for key, ftype in fields.items():
        spark_t = FIELD_TYPES[ftype]
        out = out.withColumn(key, F.col("metadata")[key].cast(spark_t))
    return out


def advanced_filter(
    df: DataFrame,
    *,
    user_ids: list[str] | None = None,
    time_range: dict[str, float] | None = None,
    confidence_min: float | None = None,
    quality_min: int | None = None,
    enrollment_groups: list[str] | None = None,
) -> DataFrame:
    """The composite filter of create_advanced_filters
    (advanced_indexing.py:127-210), over promoted typed columns.  Each
    condition is a plain Catalyst predicate, so the conjunction pushes to
    the parquet scan as a whole; the single-user fast path (:150-157 —
    MatchValue instead of an any-list) falls out of Catalyst rewriting a
    1-element IN to an equality."""
    conds: list[Column] = []
    if user_ids:
        conds.append(
            F.col("user_id") == user_ids[0]
            if len(user_ids) == 1
            else F.col("user_id").isin(user_ids)
        )
    if time_range:
        if "start" in time_range:
            conds.append(F.col("ts") >= time_range["start"])
        if "end" in time_range:
            conds.append(F.col("ts") <= time_range["end"])
    if confidence_min is not None:
        conds.append(F.col("confidence_score") >= confidence_min)
    if quality_min is not None:
        conds.append(F.col("face_quality") >= quality_min)
    if enrollment_groups:
        conds.append(F.col("enrollment_group").isin(enrollment_groups))
    out = df
    for c in conds:
        out = out.filter(c)
    return out


# ---------------------------------------------------------------------------
# Qdrant public ``Filter`` combinators (should / must_not / min_should)
# ---------------------------------------------------------------------------
# The reference only ever builds must-only conjunctions
# (advanced_indexing.py:147-208, qdrant_client.py:355-363), but Qdrant's
# public Filter model composes three clause lists plus min_should:
#
#   must:     every condition TRUE              (AND)
#   should:   at least one condition TRUE       (OR; AND-combined with must)
#   must_not: no condition TRUE                 (NOT-ANY; a point with the
#             field ABSENT passes — Qdrant's negation is over matches, not
#             SQL 3VL, so must_not(c) compiles to ``c IS NOT TRUE``)
#   min_should: at least ``min_count`` of the conditions TRUE
#
# Conditions are the wire-format dicts: {"key", "match"|"range"},
# {"is_null": {"key"}}, {"is_empty": {"key"}}, {"has_id": [...]}, or a
# nested Filter dict (combinators recurse).  Every leaf lands on a typed
# (promoted) column, so the whole boolean tree stays a Catalyst predicate:
# disjunctions and IS-NOT-TRUE negations push to the parquet scan
# (Or/Not/IsNull all translate to data-source filters; the optimizer's
# NullPropagation rewrites IsNull(col op lit) to IsNull(col)).

_CLAUSES = ("must", "should", "must_not", "min_should")


def _condition(cond: dict, id_col: str) -> Column:
    """One Qdrant condition dict → a Catalyst predicate Column."""
    if not isinstance(cond, dict):
        raise ValueError(f"condition must be a dict, got {type(cond).__name__}")
    if "nested" in cond:
        # Qdrant NestedCondition targets array-of-objects payloads; the
        # engine's point payload is a flat map<string,string> (the
        # reference's metadata shape, qdrant_client.py:209-213), so there
        # is no nested array to address.  Model nested records as their
        # own table/columns (SURVEY §1.3 promotion) and filter relationally.
        raise NotImplementedError(
            "nested conditions need an array-of-objects payload column; this "
            "store's payload is a flat map — promote nested records to their "
            "own typed columns/table and express the filter relationally"
        )
    if any(k in cond for k in _CLAUSES):  # nested Filter
        return build_filter(cond, id_col=id_col)
    if "has_id" in cond:
        ids = list(cond["has_id"])
        return F.col(id_col) == ids[0] if len(ids) == 1 else F.col(id_col).isin(ids)
    if "is_null" in cond:
        return F.col(cond["is_null"]["key"]).isNull()
    if "is_empty" in cond:
        # Qdrant IsEmpty: field absent OR an empty array.
        c = F.col(cond["is_empty"]["key"])
        return c.isNull() | (F.size(c) == 0)
    key = cond.get("key")
    if key is None:
        raise ValueError(f"condition needs 'key' (or has_id/is_null/is_empty): {cond}")
    col = F.col(key)
    if "match" in cond:
        m = cond["match"]
        if "value" in m:
            return col == m["value"]
        if "any" in m:
            vals = list(m["any"])
            return col == vals[0] if len(vals) == 1 else col.isin(vals)
        if "except" in m:
            # MatchExcept: everything except these values — absent passes.
            return ~col.isin(list(m["except"])) | col.isNull()
        raise ValueError(f"match needs value/any/except: {m}")
    if "range" in cond:
        r = cond["range"]
        bounds = []
        if "gt" in r:
            bounds.append(col > r["gt"])
        if "gte" in r:
            bounds.append(col >= r["gte"])
        if "lt" in r:
            bounds.append(col < r["lt"])
        if "lte" in r:
            bounds.append(col <= r["lte"])
        if not bounds:
            raise ValueError(f"range needs at least one of gt/gte/lt/lte: {r}")
        out = bounds[0]
        for b in bounds[1:]:
            out = out & b
        return out
    raise ValueError(f"unsupported condition: {cond}")


def _negate(cond: dict, id_col: str) -> Column:
    """Qdrant ``must_not``: passes when the condition is FALSE **or the
    field is NULL** (absent) — ``IS NOT TRUE``, not SQL NOT.  Spelled
    per condition type so the null guard lands on the COLUMN
    (``Or(Not(...), IsNull(col))`` translates to a data-source filter;
    ``IsNull(col = lit)`` does not)."""
    if any(k in cond for k in _CLAUSES):  # nested Filter — generic IS NOT TRUE
        c = build_filter(cond, id_col=id_col)
        return ~c | c.isNull()
    if "has_id" in cond:  # point ids are never NULL
        return ~_condition(cond, id_col)
    if "is_null" in cond:
        return F.col(cond["is_null"]["key"]).isNotNull()
    if "is_empty" in cond:
        c = F.col(cond["is_empty"]["key"])
        return c.isNotNull() & (F.size(c) > 0)
    if "match" in cond and "except" in cond["match"]:
        # NOT(everything-except-these) = value IS one of these
        return F.col(cond["key"]).isin(list(cond["match"]["except"]))
    return ~_condition(cond, id_col) | F.col(cond["key"]).isNull()


def build_filter(spec: dict, *, id_col: str = "point_id") -> Column:
    """Compile a Qdrant ``Filter`` dict (must/should/must_not/min_should,
    conditions in wire format, nesting allowed) to one Catalyst predicate.

    3VL contract, pinned against the DuckDB oracle: must/should keep a row
    only when the clause is definitively TRUE (a NULL field never
    satisfies a match/range — same as Qdrant's absent-field behavior);
    must_not keeps rows where no condition is TRUE, **including** rows
    where the field is NULL (``IS NOT TRUE``, not SQL NOT)."""
    unknown = [k for k in spec if k not in _CLAUSES]
    if unknown:
        raise ValueError(f"unknown Filter clauses {unknown}; valid: {list(_CLAUSES)}")
    parts: list[Column] = []
    for cond in spec.get("must", []):
        parts.append(_condition(cond, id_col))
    should = [(_condition(c, id_col)) for c in spec.get("should", [])]
    if should:
        acc = should[0]
        for c in should[1:]:
            acc = acc | c
        parts.append(acc)
    for cond in spec.get("must_not", []):
        parts.append(_negate(cond, id_col))
    if "min_should" in spec:
        ms = spec["min_should"]
        conds = [(_condition(c, id_col)) for c in ms["conditions"]]
        if not conds:
            raise ValueError("min_should requires at least one condition")
        n = ms["min_count"]
        tally = None
        for c in conds:
            term = F.when(c, 1).otherwise(0)
            tally = term if tally is None else tally + term
        parts.append(tally >= int(n))
    if not parts:
        raise ValueError("empty Filter: provide at least one clause")
    out = parts[0]
    for p in parts[1:]:
        out = out & p
    return out


def qdrant_filter(df: DataFrame, spec: dict, *, id_col: str = "point_id") -> DataFrame:
    """Apply a Qdrant ``Filter`` dict to a DataFrame of promoted points."""
    return df.filter(build_filter(spec, id_col=id_col))


def count_points(
    df: DataFrame, spec: dict | None = None, *, id_col: str = "point_id"
) -> DataFrame:
    """Qdrant's ``count`` API (``client.count(collection, count_filter=…,
    exact=True)``): the number of points matching a Filter.  The engine is
    always ``exact=True`` — Qdrant's ``exact=False`` trades accuracy for
    its index internals; a columnar count under a pushed predicate IS the
    fast path here (map-side partial count, one exchange of partial
    counts, no row materialization).  ``spec=None`` counts the whole
    collection; ``spec={}`` raises (same as ``build_filter``) rather than
    silently counting all.  Returns a one-row (n BIGINT) DataFrame rather
    than a driver-side int so it composes and the driver contract can
    hash it."""
    out = qdrant_filter(df, spec, id_col=id_col) if spec is not None else df
    return out.agg(F.count("*").cast("bigint").alias("n"))
