"""Differential fuzz of the facet operator
(``operators.payload_index.facet``) against a pure-Python reference of
Qdrant's facet semantics: per-value counts of an indexed payload field
among matching points, each point counted once per DISTINCT value, nulls
never indexed (no NULL bucket — not from a null field, not from a NULL
ARRAY ELEMENT), ties broken by value ascending, top-``limit`` only.

The r13 round fixed the scalar path's NULL bucket; the array path's twin
(a ``[x, NULL]`` payload minting a null-valued bucket through
explode(array_distinct)) was found and fixed in r14 BY THIS FUZZ —
random payloads place nulls at the row level, inside arrays, and as
all-null arrays."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from robi_biometric_qdrant_vector_db_service_spark.operators.payload_index import facet

VALUES = ["a", "b", "c", "d"]

_scalar = st.one_of(st.none(), st.sampled_from(VALUES))
_array = st.one_of(
    st.none(),
    st.lists(st.one_of(st.none(), st.sampled_from(VALUES)), max_size=4),
)


def ref_facet(vals: list, *, is_array: bool, limit: int) -> list[tuple]:
    cnt: Counter = Counter()
    for v in vals:
        if v is None:
            continue
        if is_array:
            for x in set(v):
                if x is not None:
                    cnt[x] += 1
        else:
            cnt[v] += 1
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:limit]


@settings(max_examples=8, deadline=None)
@given(vals=st.lists(_scalar, min_size=0, max_size=15),
       limit=st.integers(min_value=1, max_value=5))
def test_scalar_facet_matches_reference(spark, vals, limit):
    df = spark.createDataFrame(
        [(f"p{i}", v) for i, v in enumerate(vals)],
        "point_id string, tier string",
    )
    got = [(r["value"], r["n"]) for r in
           facet(df, "tier", limit=limit).collect()]
    assert got == ref_facet(vals, is_array=False, limit=limit), vals


@settings(max_examples=8, deadline=None)
@given(vals=st.lists(_array, min_size=0, max_size=15),
       limit=st.integers(min_value=1, max_value=5))
def test_array_facet_matches_reference(spark, vals, limit):
    df = spark.createDataFrame(
        [(f"p{i}", v) for i, v in enumerate(vals)],
        "point_id string, tags array<string>",
    )
    got = [(r["value"], r["n"]) for r in
           facet(df, "tags", is_array=True, limit=limit).collect()]
    assert got == ref_facet(vals, is_array=True, limit=limit), vals
