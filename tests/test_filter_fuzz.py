"""Differential fuzz of the Qdrant Filter compiler (hypothesis).

Random Filter trees (must/should/must_not/min_should, nested combinators,
NestedCondition, every non-parsing leaf type) run through the Catalyst
compile (``payload_index.qdrant_filter``) over a fixed edge-case corpus
and are compared row-for-row against an INDEPENDENT pure-Python Kleene-3VL
evaluator of the documented semantics (build_filter's 3VL contract +
Qdrant's wire behavior): must/should keep a row only when definitively
TRUE; must_not is IS-NOT-TRUE (absent-field rows pass) except for the
documented carve-outs (has_id never NULL, values_count counts absent as 0,
MatchExcept complements to a plain IN); min_should tallies TRUEs only;
``exists`` over nested arrays follows Spark/Kleene (empty → FALSE, no
TRUE but a NULL element verdict → NULL).

This is the grammar-level complement of the per-condition example tests in
test_query_surface.py: the examples pin each leaf; the fuzz pins every
COMPOSITION the grammar can produce, where 3VL bugs actually live
(reference behavior anchor: qdrant_client.py:354-363 user filters +
advanced_indexing.py:127-210 composite filters)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from robi_biometric_qdrant_vector_db_service_spark.operators.payload_index import (
    qdrant_filter,
)

# ---------------------------------------------------------------------------
# Fixed edge-case corpus: every null/empty/typed combination the grammar can
# poke at.  Small value domains force collisions with the generated filters.
# ---------------------------------------------------------------------------

SCHEMA = (
    "point_id string, tag string, n int, score double, tags array<string>, "
    "vec array<double>, items array<struct<k: string, v: int>>"
)
ARRAY_KEYS = {"tags", "vec", "items"}

_tags_domain = [None, [], ["x"], ["x", "y"], ["y", "z", "z"]]
_items_domain = [
    None,
    [],
    [{"k": "a", "v": 1}],
    [{"k": "b", "v": None}],
    [{"k": "a", "v": 2}, {"k": "c", "v": 0}],
]


def _corpus():
    rows, i = [], 0
    for tag in [None, "a", "b"]:
        for n in [None, 0, 3]:
            for tags in _tags_domain[i % 3 :: 3] or [_tags_domain[0]]:
                rows.append(
                    {
                        "point_id": str(len(rows)),
                        "tag": tag,
                        "n": n,
                        "score": [None, 0.0, 0.5, 2.5][len(rows) % 4],
                        "tags": tags,
                        "vec": [None, [1.0]][len(rows) % 2],
                        "items": _items_domain[len(rows) % 5],
                    }
                )
            i += 1
    # a few hand-picked extremes
    rows.append({"point_id": str(len(rows)), "tag": "c", "n": 1, "score": 2.5,
                 "tags": ["x", "y"], "vec": [1.0], "items": _items_domain[4]})
    rows.append({"point_id": str(len(rows)), "tag": None, "n": None, "score": None,
                 "tags": None, "vec": None, "items": None})
    return rows


ROWS = _corpus()


@pytest.fixture(scope="module")
def corpus_df(spark):
    df = spark.createDataFrame(
        [tuple(r[k] for k in
               ("point_id", "tag", "n", "score", "tags", "vec", "items"))
         for r in ROWS],
        SCHEMA,
    ).persist()
    df.count()
    yield df
    df.unpersist()


# ---------------------------------------------------------------------------
# Independent 3VL evaluator (True / False / None)
# ---------------------------------------------------------------------------


def _and3(vals):
    if any(v is False for v in vals):
        return False
    if any(v is None for v in vals):
        return None
    return True


def _or3(vals):
    if any(v is True for v in vals):
        return True
    if any(v is None for v in vals):
        return None
    return False


_OPS = {"gt": lambda a, b: a > b, "gte": lambda a, b: a >= b,
        "lt": lambda a, b: a < b, "lte": lambda a, b: a <= b}

_CLAUSES = ("must", "should", "must_not", "min_should")


def ev_cond(cond, row):
    if "nested" in cond:
        arr = row.get(cond["nested"]["key"])
        if arr is None:
            return None
        return _or3([ev_filter(cond["nested"]["filter"], e) for e in arr])
    if any(k in cond for k in _CLAUSES):
        return ev_filter(cond, row)
    if "has_id" in cond:
        return row["point_id"] in [str(i) for i in cond["has_id"]]
    if "is_null" in cond:
        return row.get(cond["is_null"]["key"]) is None
    if "is_empty" in cond:
        v = row.get(cond["is_empty"]["key"])
        if cond["is_empty"]["key"] in ARRAY_KEYS:
            return v is None or len(v) == 0
        return v is None
    if "has_vector" in cond:
        return row.get(cond["has_vector"]) is not None
    v = row.get(cond["key"])
    if "match" in cond:
        m = cond["match"]
        if "value" in m:
            return None if v is None else v == m["value"]
        if "any" in m:
            return None if v is None else v in list(m["any"])
        if "except" in m:
            return True if v is None else v not in list(m["except"])
    if "range" in cond:
        if v is None:
            return None
        return all(_OPS[o](v, b) for o, b in cond["range"].items())
    if "values_count" in cond:
        n = 0 if v is None else (len(v) if isinstance(v, list) else 1)
        return all(_OPS[o](n, b) for o, b in cond["values_count"].items())
    raise AssertionError(f"generator produced unknown condition {cond}")


def ev_negate(cond, row):
    if any(k in cond for k in _CLAUSES) or "nested" in cond:
        return ev_cond(cond, row) is not True  # IS NOT TRUE
    if "has_id" in cond or "values_count" in cond:
        return not ev_cond(cond, row)  # never NULL: plain NOT
    if "is_null" in cond:
        return row.get(cond["is_null"]["key"]) is not None
    if "is_empty" in cond:
        v = row.get(cond["is_empty"]["key"])
        if cond["is_empty"]["key"] in ARRAY_KEYS:
            return v is not None and len(v) > 0
        return v is not None
    if "has_vector" in cond:
        return row.get(cond["has_vector"]) is None
    if "match" in cond and "except" in cond["match"]:
        v = row.get(cond["key"])
        return None if v is None else v in list(cond["match"]["except"])
    if row.get(cond["key"]) is None:
        return True  # NOT(c) OR col IS NULL
    return not ev_cond(cond, row)


def ev_filter(spec, row):
    parts = [ev_cond(c, row) for c in spec.get("must", [])]
    if spec.get("should"):
        parts.append(_or3([ev_cond(c, row) for c in spec["should"]]))
    parts.extend(ev_negate(c, row) for c in spec.get("must_not", []))
    if "min_should" in spec:
        hits = sum(
            1 for c in spec["min_should"]["conditions"] if ev_cond(c, row) is True
        )
        parts.append(hits >= spec["min_should"]["min_count"])
    return _and3(parts)


# ---------------------------------------------------------------------------
# Filter-tree generator
# ---------------------------------------------------------------------------

_tag_vals = st.sampled_from(["a", "b", "c", "d"])
_n_bounds = st.integers(min_value=-1, max_value=4)
_score_bounds = st.sampled_from([0.0, 0.25, 0.5, 1.0, 2.5])
_ops = st.lists(st.sampled_from(["gt", "gte", "lt", "lte"]),
                min_size=1, max_size=2, unique=True)


def _range_dict(ops, bound_st):
    return st.tuples(ops, st.lists(bound_st, min_size=2, max_size=2)).map(
        lambda t: dict(zip(t[0], t[1]))
    )


_inner_cond = st.one_of(
    st.builds(lambda v: {"key": "k", "match": {"value": v}}, _tag_vals),
    st.builds(lambda r: {"key": "v", "range": r}, _range_dict(_ops, _n_bounds)),
    st.builds(lambda k: {"is_null": {"key": k}}, st.sampled_from(["k", "v"])),
)

_inner_filter = st.fixed_dictionaries(
    {},
    optional={
        "must": st.lists(_inner_cond, min_size=1, max_size=2),
        "must_not": st.lists(_inner_cond, min_size=1, max_size=2),
    },
).filter(lambda d: d)

leaf_cond = st.one_of(
    st.builds(lambda v: {"key": "tag", "match": {"value": v}}, _tag_vals),
    st.builds(lambda vs: {"key": "tag", "match": {"any": vs}},
              st.lists(_tag_vals, min_size=1, max_size=3, unique=True)),
    st.builds(lambda vs: {"key": "tag", "match": {"except": vs}},
              st.lists(_tag_vals, min_size=1, max_size=3, unique=True)),
    st.builds(lambda r: {"key": "n", "range": r}, _range_dict(_ops, _n_bounds)),
    st.builds(lambda r: {"key": "score", "range": r},
              _range_dict(_ops, _score_bounds)),
    st.builds(lambda r: {"key": "tags", "values_count": r},
              _range_dict(_ops, st.integers(min_value=0, max_value=3))),
    st.builds(lambda r: {"key": "n", "values_count": r},
              _range_dict(_ops, st.integers(min_value=0, max_value=2))),
    st.builds(lambda k: {"is_null": {"key": k}},
              st.sampled_from(["tag", "n", "tags"])),
    st.builds(lambda k: {"is_empty": {"key": k}},
              st.sampled_from(["tags", "items", "tag", "score"])),
    st.builds(lambda ids: {"has_id": ids},
              st.lists(st.integers(min_value=0, max_value=len(ROWS) + 2).map(str),
                       min_size=1, max_size=4, unique=True)),
    st.just({"has_vector": "vec"}),
    st.builds(lambda f: {"nested": {"key": "items", "filter": f}}, _inner_filter),
)


def _filter_tree(cond):
    return st.fixed_dictionaries(
        {},
        optional={
            "must": st.lists(cond, min_size=1, max_size=3),
            "should": st.lists(cond, min_size=1, max_size=3),
            "must_not": st.lists(cond, min_size=1, max_size=3),
            "min_should": st.fixed_dictionaries(
                {
                    "conditions": st.lists(cond, min_size=1, max_size=3),
                    "min_count": st.integers(min_value=1, max_value=3),
                }
            ),
        },
    ).filter(lambda d: d)


# depth-2 trees: leaves, plus filters whose conditions may be depth-1 filters
filter_spec = _filter_tree(st.one_of(leaf_cond, _filter_tree(leaf_cond)))


@settings(max_examples=60, deadline=None)
@given(spec=filter_spec)
def test_compiled_filter_matches_3vl_evaluator(corpus_df, spec):
    got = sorted(
        r.point_id for r in qdrant_filter(corpus_df, spec).select("point_id").collect()
    )
    want = sorted(r["point_id"] for r in ROWS if ev_filter(spec, r) is True)
    assert got == want, f"spec={spec!r}\n got={got}\nwant={want}"


def test_corpus_covers_the_edges(corpus_df):
    """The fuzz is only as strong as its corpus: pin that every null/empty
    shape is present (a regressed corpus would silently weaken the fuzz)."""
    rows = ROWS
    assert any(r["tag"] is None for r in rows)
    assert any(r["tags"] == [] for r in rows)
    assert any(r["tags"] is None for r in rows)
    assert any(r["tags"] and len(r["tags"]) != len(set(r["tags"])) for r in rows)
    assert any(r["n"] is None for r in rows) and any(r["n"] == 0 for r in rows)
    assert any(r["items"] == [] for r in rows)
    assert any(r["items"] and any(e["v"] is None for e in r["items"]) for r in rows)
    assert any(r["vec"] is None for r in rows) and any(r["vec"] for r in rows)
    assert corpus_df.count() == len(rows)
