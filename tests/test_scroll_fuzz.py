"""Property-based pagination fuzz: ordered keyset scroll must PARTITION the
matching subset — pages disjoint, exhaustive, in cursor order — for every
combination of direction, page size, start_from bound, and filter, over a
corpus dense with ties and NULL order values (the off-by-one territory of
keyset cursors).  The walk drives ``scroll_page_order_by`` exactly as a
client would: echo the previous page's last (order_value, id) as the next
cursor (reference behavior anchor: Qdrant ``scroll(order_by=…)``;
qdrant_client.py's scroll surface).
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from robi_biometric_qdrant_vector_db_service_spark.operators.search import (
    scroll_page_order_by,
)

# ties everywhere: 40 rows over 4 order values (incl. NULL), 2 filter groups
ROWS = [
    {"vec_id": i, "ord": [0, 1, 1, 2, None][i % 5], "grp": ["a", "b"][i % 2]}
    for i in range(40)
]
SCHEMA = "vec_id bigint, ord int, grp string"


@pytest.fixture(scope="module")
def scroll_df(spark):
    df = spark.createDataFrame(
        [(r["vec_id"], r["ord"], r["grp"]) for r in ROWS], SCHEMA
    ).persist()
    df.count()
    yield df
    df.unpersist()


@settings(max_examples=12, deadline=None)
@given(
    direction=st.sampled_from(["asc", "desc"]),
    page_size=st.integers(min_value=1, max_value=7),
    start_from=st.sampled_from([None, 0, 1, 2, 3]),
    use_filter=st.booleans(),
)
def test_ordered_scroll_partitions_the_subset(
    scroll_df, direction, page_size, start_from, use_filter
):
    flt = {"must": [{"key": "grp", "match": {"value": "a"}}]} if use_filter else None
    desc = direction == "desc"

    # expected: NULL-ord rows skipped, start_from inclusive, cursor order
    subset = [r for r in ROWS if r["ord"] is not None]
    if use_filter:
        subset = [r for r in subset if r["grp"] == "a"]
    if start_from is not None:
        subset = [
            r for r in subset
            if (r["ord"] <= start_from if desc else r["ord"] >= start_from)
        ]
    expected = [
        r["vec_id"]
        for r in sorted(
            subset,
            key=lambda r: (r["ord"], r["vec_id"]),
            reverse=desc,
        )
    ]

    got, after = [], None
    for _ in range(len(ROWS) + 2):  # hard stop: a cursor bug must not loop
        page = scroll_page_order_by(
            scroll_df,
            "ord",
            after=after,
            start_from=start_from,
            page_size=page_size,
            direction=direction,
            scroll_filter=flt,
        ).collect()
        assert len(page) <= page_size
        got.extend(r["vec_id"] for r in page)
        if len(page) < page_size:
            break
        after = (page[-1]["ord"], page[-1]["vec_id"])
    else:
        raise AssertionError("scroll did not terminate")

    assert got == expected, (
        f"direction={direction} page_size={page_size} "
        f"start_from={start_from} filter={use_filter}\n got={got}\nwant={expected}"
    )
    assert len(set(got)) == len(got)  # pages disjoint
