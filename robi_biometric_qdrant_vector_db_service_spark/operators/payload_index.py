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
# Conditions are the wire-format dicts: {"key", "match"|"range"|
# "datetime_range"|"values_count"|"geo_bounding_box"|"geo_radius"},
# {"is_null": {"key"}}, {"is_empty": {"key"}}, {"has_id": [...]},
# {"has_vector": "space"}, or a nested Filter dict (combinators recurse).
# Every leaf lands on a typed (promoted) column, so the whole boolean tree
# stays a Catalyst predicate: disjunctions and IS-NOT-TRUE negations push
# to the parquet scan (Or/Not/IsNull all translate to data-source filters;
# the optimizer's NullPropagation rewrites IsNull(col op lit) to
# IsNull(col)).  Full-text / values-count / geo leaves compute over the
# column (split / size / haversine) so they evaluate post-scan — still
# codegen'd, shuffle-free filters, just not row-group-skippable; Qdrant
# pays the same shape (those condition types hit its secondary indexes,
# not the id-ordered store).

_CLAUSES = ("must", "should", "must_not", "min_should")

# Qdrant text-index defaults (TextIndexParams: tokenizer=word,
# lowercase=true): split on any non-letter/non-digit run, lowercase —
# unicode-aware, matching Qdrant's word tokenizer ('café' is one token).
# The SAME normalization is applied to the query string (Python) and the
# field (Catalyst split/regexp_replace), mirroring index-time vs
# query-time analysis in Qdrant.  Two spellings of one break class:
# Java regex has no [\W_]; Python re has no \p{L}.  Both break on
# underscore and keep unicode letters/digits (sole known divergence:
# non-decimal Nd/No digit forms like '²' — \p{N} keeps, Python \w
# breaks — irrelevant to word search).
_TOKEN_BREAK_RE_JVM = r"[^\p{L}\p{N}]+"  # Catalyst split/regexp_replace
_TOKEN_BREAK_RE_PY = r"[\W_]+"  # Python re (unicode by default)

# Qdrant ``multilingual`` tokenizer, best-effort (charabia's documented
# behavior for the scripts the fixtures cover): scripts without word
# boundaries segment CHARACTER-wise, everything else like ``word``.
# Implemented as space-injection around each CJK codepoint before the
# word break — one explicit codepoint-range class so the Java-regex
# (Catalyst), RE2 (DuckDB oracle), and Python-re (query analysis)
# spellings are the IDENTICAL literal: Han (CJK Unified + Ext A),
# Hiragana, Katakana, Hangul syllables.  Full ICU word-segmentation
# (Thai/Khmer/Lao, compound splitting) stays out of reach — those
# scripts raise via the tokenizer gate's remediation message.
_CJK_CHAR_CLASS = "[一-鿿㐀-䶿぀-ゟ゠-ヿ가-힯]"

# PERMANENT, TESTED DIVERGENCE (r12 VERDICT item 4): scripts that are
# unsegmentable without an ICU dictionary — Thai U+0E00-0E7F, Lao
# U+0E80-0EFF, Khmer U+1780-17FF.  charabia word-segments these;
# dictionary-free segmentation cannot reproduce its boundaries in any
# engine-portable way (Java regex / Python re / RE2 have no dictionary),
# so a MULTILINGUAL text-index query containing these codepoints raises
# with remediation instead of silently matching whole runs as single
# tokens.  tests/test_query_surface.py pins that the gate fires.
_ICU_ONLY_RE_PY = "[฀-໿ក-៿]"  # Thai + Lao + Khmer blocks


def _text_tokens(query: str) -> list[str]:
    import re

    toks = [t for t in re.split(_TOKEN_BREAK_RE_PY, str(query).lower()) if t]
    if not toks:
        raise ValueError(f"text/phrase match needs at least one token: {query!r}")
    return toks


def _match_text(col: Column, query: str, params: dict | None = None) -> Column:
    """Qdrant ``MatchText`` (full-text index): every query token present
    in the field's token set, any order.  ``params`` carries the field's
    ``TextIndexParams`` (the engine inlines the index declaration at the
    condition — there is no index catalog in a schema-free compile): with
    ``tokenizer: "prefix"`` a query token matches any field token it
    PREFIXES (Qdrant's prefix index, which stores min..max_token_len
    prefixes of every token).  ``tokenizer: "multilingual"`` adds
    character-wise segmentation of CJK runs (see _CJK_CHAR_CLASS) on BOTH
    the field and the query — Qdrant's charabia behavior for scripts
    without word boundaries."""
    p = dict(params or {})
    tok = p.get("tokenizer", "word")
    if tok not in ("word", "whitespace", "prefix", "multilingual"):
        raise NotImplementedError(
            f"tokenizer {tok!r} not supported (word/whitespace/prefix/"
            "multilingual; Thai/Khmer/Lao segmentation needs ICU — index "
            "those fields with tokenizer=word or pre-segment upstream)"
        )
    import re

    lower = p.get("lowercase", True)
    c = F.lower(col) if lower else col
    if tok == "multilingual":
        if re.search(_ICU_ONLY_RE_PY, str(query)):
            raise NotImplementedError(
                "multilingual MatchText on Thai/Khmer/Lao needs an ICU "
                "word-segmentation dictionary (charabia parity is not "
                "reproducible dictionary-free) — pre-segment the query and "
                "field upstream (inject spaces at word boundaries), or "
                "index the field with tokenizer=word for whole-run match "
                "semantics (permanent divergence, SURVEY §2.12)"
            )
        # index-time analysis: each CJK codepoint becomes its own token
        c = F.regexp_replace(c, f"({_CJK_CHAR_CLASS})", " $1 ")
    toks = F.split(c, r"\s+" if tok == "whitespace" else _TOKEN_BREAK_RE_JVM)
    mn = int(p.get("min_token_len") or 1)
    mx = p.get("max_token_len")
    # query-time analysis mirrors index-time analysis (same tokenizer +
    # same lowercasing), as in Qdrant
    qsrc = str(query).lower() if lower else str(query)
    if tok == "multilingual":
        qsrc = re.sub(f"({_CJK_CHAR_CLASS})", r" \1 ", qsrc)
    qbreak = r"\s+" if tok == "whitespace" else _TOKEN_BREAK_RE_PY
    qtoks = [t for t in re.split(qbreak, qsrc) if t]
    if not qtoks:
        raise ValueError(f"text match needs at least one token: {query!r}")
    out = None
    for t in qtoks:
        if len(t) < mn or (mx is not None and len(t) > int(mx)):
            # the index never stored tokens outside the bounds — no match
            term = F.lit(False)
        elif tok != "prefix" and mn <= 1 and mx is None:
            # unbounded exact-token path: keep the array_contains shape
            # (the r10 plan the match_text_filter plan audit pinned)
            term = F.array_contains(toks, t)
        else:

            def _term_fn(q: str, prefix: bool):
                def f(ft: Column) -> Column:
                    cond = F.length(ft) >= F.lit(mn)
                    if mx is not None:
                        cond = cond & (F.length(ft) <= F.lit(int(mx)))
                    return cond & (ft.startswith(q) if prefix else ft == F.lit(q))

                return f

            term = F.exists(toks, _term_fn(t, tok == "prefix"))
        out = term if out is None else out & term
    if tok == "multilingual":
        # FIELD-side gate (ADVICE r13): the query gate above cannot see
        # what the indexed column stores — a Latin query over a field row
        # carrying Thai/Lao/Khmer would silently match whole unsegmented
        # runs where charabia would dictionary-segment.  Same contract as
        # the query side: raise with remediation, per row, inside the
        # codegen'd predicate (the fixtures' corpus never trips it, so
        # the plan pin's zero-shuffle no-Python shape is unchanged).
        out = F.when(
            c.rlike(_ICU_ONLY_RE_PY),
            F.raise_error(
                F.lit(
                    "multilingual MatchText over a field value containing "
                    "Thai/Khmer/Lao needs an ICU word-segmentation "
                    "dictionary (charabia parity is not reproducible "
                    "dictionary-free) — pre-segment the field upstream or "
                    "index it with tokenizer=word (permanent divergence, "
                    "SURVEY §2.12)"
                )
            ).cast("boolean"),
        ).otherwise(out)
    return out


def _match_phrase(col: Column, query: str) -> Column:
    """Qdrant ``MatchPhrase``: the query tokens appear consecutively in
    order.  Normalize the field to single-space-joined tokens and test
    substring on token boundaries (space-padded Contains — codegen'd)."""
    norm = F.regexp_replace(F.lower(col), _TOKEN_BREAK_RE_JVM, " ")
    needle = " " + " ".join(_text_tokens(query)) + " "
    return F.concat(F.lit(" "), norm, F.lit(" ")).contains(needle)


def _range_predicate(col: Column, r: dict, *, bound=None) -> Column:
    """Shared gt/gte/lt/lte conjunction for ``range`` / ``datetime_range``
    / ``values_count``.  ``bound`` maps a wire bound value to a literal
    Column (datetime parsing); default is a plain literal."""
    bounds = []
    lit = bound or (lambda v: F.lit(v))
    if "gt" in r:
        bounds.append(col > lit(r["gt"]))
    if "gte" in r:
        bounds.append(col >= lit(r["gte"]))
    if "lt" in r:
        bounds.append(col < lit(r["lt"]))
    if "lte" in r:
        bounds.append(col <= lit(r["lte"]))
    if not bounds:
        raise ValueError(f"range needs at least one of gt/gte/lt/lte: {r}")
    out = bounds[0]
    for b in bounds[1:]:
        out = out & b
    return out


def _datetime_bound(v) -> Column:
    """A ``datetime_range`` bound: RFC3339/ISO strings parse via
    ``to_timestamp`` (constant-folded; '…Z' and offset forms included),
    numbers are epoch seconds (the reference's own stamp,
    qdrant_client.py:211)."""
    if isinstance(v, str):
        return F.to_timestamp(F.lit(v.replace("Z", "+00:00")))
    return F.timestamp_seconds(F.lit(v))


def _values_count(col: Column, r: dict, *, dtype=None) -> Column:
    """Qdrant ``ValuesCount``: bounds on the NUMBER of values under the
    key — an absent field counts 0, an array its size, a present scalar
    the trivial count 1.  The scalar arm needs the column's type (``size``
    on a non-array raises at analysis), so it only engages when the
    caller could supply a schema (``qdrant_filter``/``count_points`` —
    any entry point holding the DataFrame); a bare ``build_filter`` with
    no schema keeps the array-column requirement.  The count expression
    is never NULL, so negation is plain NOT."""
    from pyspark.sql.types import ArrayType

    if dtype is not None and not isinstance(dtype, ArrayType):
        n = F.when(col.isNull(), F.lit(0)).otherwise(F.lit(1))
    else:
        n = F.when(col.isNull(), F.lit(0)).otherwise(F.size(col))
    return _range_predicate(n, r)


def _geo_struct(v: dict) -> tuple[float, float]:
    return float(v["lat"]), float(v["lon"])


def _geo_bounding_box(col: Column, box: dict) -> Column:
    """Qdrant ``GeoBoundingBox``: field is a geo point (struct with
    ``lat``/``lon`` DOUBLE).  Latitude band plus a longitude interval
    that may wrap the antimeridian (top_left.lon > bottom_right.lon →
    OR of the two half-intervals), matching Qdrant's wrap semantics."""
    tl_lat, tl_lon = _geo_struct(box["top_left"])
    br_lat, br_lon = _geo_struct(box["bottom_right"])
    lat, lon = col["lat"], col["lon"]
    out = (lat <= F.lit(tl_lat)) & (lat >= F.lit(br_lat))
    if tl_lon <= br_lon:
        out = out & (lon >= F.lit(tl_lon)) & (lon <= F.lit(br_lon))
    else:  # antimeridian wrap
        out = out & ((lon >= F.lit(tl_lon)) | (lon <= F.lit(br_lon)))
    return out


_EARTH_RADIUS_M = 6371000.0  # mean radius, Qdrant's haversine basis


def _ring_points(ring) -> list[tuple[float, float]]:
    """A GeoPolygon ring (``{"points": [{"lat","lon"}, …]}``) → (lat, lon)
    tuples; Qdrant's wire format closes the ring (first == last) — the
    duplicate closing point is dropped."""
    pts = ring["points"] if isinstance(ring, dict) else ring
    out = [(float(p["lat"]), float(p["lon"])) for p in pts]
    if len(out) >= 2 and out[0] == out[-1]:
        out = out[:-1]
    if len(out) < 3:
        raise ValueError(f"geo_polygon ring needs >= 3 distinct points: {ring}")
    return out


def _point_in_ring(lat: Column, lon: Column, pts: list[tuple[float, float]]) -> Column:
    """Even-odd ray casting UNROLLED over the literal ring: one crossing
    indicator per edge (the ring is request-side data, so the loop runs at
    compile time), parity decides containment.  Every term is plain
    arithmetic on literals + the two coordinate columns — fused codegen,
    deterministic IEEE-754 on both engines (no libm), no UDF."""
    n = len(pts)
    tally = None
    for i in range(n):
        y1, x1 = pts[i]
        y2, x2 = pts[(i + 1) % n]
        if y1 == y2:
            continue  # horizontal edge: (y1 > lat) != (y2 > lat) is never true
        crosses = ((F.lit(y1) > lat) != (F.lit(y2) > lat)) & (
            lon
            < (lat - F.lit(y1)) * F.lit((x2 - x1) / (y2 - y1)) + F.lit(x1)
        )
        term = F.when(crosses, 1).otherwise(0)
        tally = term if tally is None else tally + term
    if tally is None:
        raise ValueError("geo_polygon ring is degenerate (all edges horizontal)")
    return tally % 2 == 1


def _geo_polygon(col: Column, spec: dict) -> Column:
    """Qdrant ``GeoPolygon``: inside the exterior ring and outside every
    interior ring (holes).  Compiled to per-edge crossing indicators over
    the literal rings — the polygon is request-bounded, so the expression
    is fixed-size; the predicate stays a single codegen filter, exactly
    like the box/radius conditions."""
    inside = _point_in_ring(col["lat"], col["lon"], _ring_points(spec["exterior"]))
    for hole in spec.get("interiors") or []:
        inside = inside & ~_point_in_ring(col["lat"], col["lon"], _ring_points(hole))
    return inside


def haversine_m(col: Column, c_lat: float, c_lon: float) -> Column:
    """Great-circle distance in meters from the literal origin to the
    ``struct<lat,lon>`` column, computed in fused codegen (radians/sin/
    cos/asin/sqrt are all Catalyst builtins — no UDF).  Shared by the
    ``GeoRadius`` filter condition and the FormulaQuery ``geo_distance``
    expression (operators/formula.py)."""
    lat1, lon1 = F.radians(F.lit(c_lat)), F.radians(F.lit(c_lon))
    lat2, lon2 = F.radians(col["lat"]), F.radians(col["lon"])
    h = (
        F.pow(F.sin((lat2 - lat1) / 2), 2)
        + F.cos(lat1) * F.cos(lat2) * F.pow(F.sin((lon2 - lon1) / 2), 2)
    )
    return 2 * F.lit(_EARTH_RADIUS_M) * F.asin(F.sqrt(h))


def _geo_radius(col: Column, spec: dict) -> Column:
    """Qdrant ``GeoRadius``: haversine great-circle distance from
    ``center`` <= ``radius`` meters."""
    c_lat, c_lon = _geo_struct(spec["center"])
    radius = float(spec["radius"])
    return haversine_m(col, c_lat, c_lon) <= F.lit(radius)


def _dtype(schema, key: str):
    """Resolve a key's Spark type from an optional StructType (None when
    the caller compiled without a DataFrame, or the key isn't promoted)."""
    if schema is None:
        return None
    try:
        return schema[key].dataType
    except Exception:
        return None


def _condition(cond: dict, id_col: str, *, schema=None, col_of=None) -> Column:
    """One Qdrant condition dict → a Catalyst predicate Column.

    ``col_of`` resolves a payload key to a Column — ``F.col`` at the top
    level, the lambda-variable getter inside a ``nested`` condition (so
    the same leaf compilers serve both contexts)."""
    nested_ctx = col_of is not None
    if col_of is None:
        col_of = F.col
    if not isinstance(cond, dict):
        raise ValueError(f"condition must be a dict, got {type(cond).__name__}")
    if "nested" in cond:
        # Qdrant NestedCondition: the key names an array-of-objects
        # payload column; the inner Filter must hold on the SAME element
        # for the point to pass.  Exactly Spark's EXISTS higher-order
        # function: exists(arr, e -> inner(e)) — per-element evaluation
        # fused in codegen, no explode, no shuffle, no lateral join.  At
        # 100 TB this is the difference between a predicate and an
        # explode+regroup (which would shuffle the full fact table).
        spec = cond["nested"]
        key, inner = spec["key"], spec["filter"]
        arr = col_of(key)
        return F.exists(
            arr,
            lambda e: build_filter(
                inner, id_col=id_col, _col_of=lambda k: e[k]
            ),
        )
    if any(k in cond for k in _CLAUSES):  # nested Filter
        return build_filter(
            cond, id_col=id_col, schema=schema,
            _col_of=col_of if nested_ctx else None,
        )
    if "has_id" in cond:
        if nested_ctx:
            # Qdrant rejects has_id inside nested: the element has no id.
            raise ValueError("has_id is not valid inside a nested condition")
        ids = list(cond["has_id"])
        return F.col(id_col) == ids[0] if len(ids) == 1 else F.col(id_col).isin(ids)
    if "is_null" in cond:
        return col_of(cond["is_null"]["key"]).isNull()
    if "is_empty" in cond:
        # Qdrant IsEmpty: field absent OR an empty array.  A present
        # SCALAR is never empty — needs the type (schema) to distinguish.
        from pyspark.sql.types import ArrayType

        key = cond["is_empty"]["key"]
        c = col_of(key)
        dt = _dtype(schema, key)
        if dt is not None and not isinstance(dt, ArrayType):
            return c.isNull()
        return c.isNull() | (F.size(c) == 0)
    if "has_vector" in cond:
        if nested_ctx:
            raise ValueError("has_vector is not valid inside a nested condition")
        # Qdrant HasVector: the point carries a vector in the named
        # space.  Column-per-space model (named_vector_search): the space
        # IS a column, so presence is a plain IsNotNull — pushable.
        return F.col(cond["has_vector"]).isNotNull()
    key = cond.get("key")
    if key is None:
        raise ValueError(
            f"condition needs 'key' (or has_id/is_null/is_empty/has_vector/nested): {cond}"
        )
    col = col_of(key)
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
        if "text" in m:
            return _match_text(col, m["text"], m.get("params"))
        if "phrase" in m:
            return _match_phrase(col, m["phrase"])
        raise ValueError(f"match needs value/any/except/text/phrase: {m}")
    if "range" in cond:
        return _range_predicate(col, cond["range"])
    if "datetime_range" in cond:
        return _range_predicate(col, cond["datetime_range"], bound=_datetime_bound)
    if "values_count" in cond:
        return _values_count(col, cond["values_count"], dtype=_dtype(schema, key))
    if "geo_bounding_box" in cond:
        return _geo_bounding_box(col, cond["geo_bounding_box"])
    if "geo_radius" in cond:
        return _geo_radius(col, cond["geo_radius"])
    if "geo_polygon" in cond:
        return _geo_polygon(col, cond["geo_polygon"])
    raise ValueError(f"unsupported condition: {cond}")


def _negate(cond: dict, id_col: str, *, schema=None, col_of=None) -> Column:
    """Qdrant ``must_not``: passes when the condition is FALSE **or the
    field is NULL** (absent) — ``IS NOT TRUE``, not SQL NOT.  Spelled
    per condition type so the null guard lands on the COLUMN
    (``Or(Not(...), IsNull(col))`` translates to a data-source filter;
    ``IsNull(col = lit)`` does not)."""
    resolve = col_of if col_of is not None else F.col
    if any(k in cond for k in _CLAUSES) or "nested" in cond:
        # nested Filter / NestedCondition — generic IS NOT TRUE
        c = _condition(cond, id_col, schema=schema, col_of=col_of)
        return ~c | c.isNull()
    if "has_id" in cond:  # point ids are never NULL
        return ~_condition(cond, id_col, schema=schema, col_of=col_of)
    if "is_null" in cond:
        return resolve(cond["is_null"]["key"]).isNotNull()
    if "is_empty" in cond:
        from pyspark.sql.types import ArrayType

        key = cond["is_empty"]["key"]
        c = resolve(key)
        dt = _dtype(schema, key)
        if dt is not None and not isinstance(dt, ArrayType):
            return c.isNotNull()  # present scalar is never empty
        return c.isNotNull() & (F.size(c) > 0)
    if "has_vector" in cond:  # no vector in the space — exact complement
        return F.col(cond["has_vector"]).isNull()
    if "values_count" in cond:
        # the count expression is 0 for absent fields, never NULL — and
        # Qdrant evaluates ValuesCount on the 0, so an absent field does
        # NOT get the blanket absent-passes treatment: plain NOT.
        return ~_condition(cond, id_col, schema=schema, col_of=col_of)
    if "match" in cond and "except" in cond["match"]:
        # NOT(everything-except-these) = value IS one of these
        return resolve(cond["key"]).isin(list(cond["match"]["except"]))
    return ~_condition(cond, id_col, schema=schema, col_of=col_of) | resolve(
        cond["key"]
    ).isNull()


def build_filter(
    spec: dict, *, id_col: str = "point_id", schema=None, _col_of=None
) -> Column:
    """Compile a Qdrant ``Filter`` dict (must/should/must_not/min_should,
    conditions in wire format, nesting allowed) to one Catalyst predicate.

    3VL contract, pinned against the DuckDB oracle: must/should keep a row
    only when the clause is definitively TRUE (a NULL field never
    satisfies a match/range — same as Qdrant's absent-field behavior);
    must_not keeps rows where no condition is TRUE, **including** rows
    where the field is NULL (``IS NOT TRUE``, not SQL NOT).

    ``schema`` (optional StructType) refines type-dependent leaves:
    values_count / is_empty on a SCALAR column (Qdrant counts a present
    scalar as 1) need it — entry points holding the DataFrame
    (``qdrant_filter``/``count_points``) pass it automatically.
    ``_col_of`` is the internal nested-element resolver."""
    unknown = [k for k in spec if k not in _CLAUSES]
    if unknown:
        raise ValueError(f"unknown Filter clauses {unknown}; valid: {list(_CLAUSES)}")
    parts: list[Column] = []
    for cond in spec.get("must", []):
        parts.append(_condition(cond, id_col, schema=schema, col_of=_col_of))
    should = [
        (_condition(c, id_col, schema=schema, col_of=_col_of))
        for c in spec.get("should", [])
    ]
    if should:
        acc = should[0]
        for c in should[1:]:
            acc = acc | c
        parts.append(acc)
    for cond in spec.get("must_not", []):
        parts.append(_negate(cond, id_col, schema=schema, col_of=_col_of))
    if "min_should" in spec:
        ms = spec["min_should"]
        conds = [
            (_condition(c, id_col, schema=schema, col_of=_col_of))
            for c in ms["conditions"]
        ]
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
    return df.filter(build_filter(spec, id_col=id_col, schema=df.schema))


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


def facet(
    df: DataFrame,
    key: str,
    *,
    spec: dict | None = None,
    limit: int = 10,
    is_array: bool = False,
    id_col: str = "point_id",
) -> DataFrame:
    """Qdrant's ``facet`` API (``client.facet(collection, key, facet_filter=…,
    limit=…)``): per-value exact counts of a payload field among the points
    matching ``spec``, top values first.  Array-typed indexes facet PER
    ELEMENT with each matching point counted once per distinct value —
    ``is_array=True`` applies the per-point ``array_distinct`` then
    explodes (Qdrant counts points, not occurrences).  Always
    ``exact=True``, like ``count_points``.

    Plan: the Filter pushes to the scan (``build_filter``), the optional
    explode is a shuffle-free generator, the count is map-side combined,
    and the top-``limit`` selection is a TakeOrderedAndProject — nothing
    but (value, partial count) crosses the one exchange."""
    out = qdrant_filter(df, spec, id_col=id_col) if spec is not None else df
    # Qdrant never indexes nulls — no NULL bucket from ANY path: the
    # scalar path must filter explicitly or groupBy keeps the null group
    # (the r13 fix), and the array path must drop NULL ELEMENTS before the
    # explode or a [x, NULL] payload mints a null-valued bucket (the r14
    # array-side twin, caught by the facet fuzz).  A row whose array
    # holds only nulls then explodes to nothing — skipped entirely, like
    # a missing field.
    out = out.filter(F.col(key).isNotNull())
    col = (
        F.explode(F.array_distinct(F.filter(F.col(key), lambda x: x.isNotNull())))
        if is_array
        else F.col(key)
    )
    return (
        out.select(col.alias("value"))
        .groupBy("value")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy(F.desc("n"), "value")
        .limit(int(limit))
    )
