"""Connected-components properties (operators.graph): the star-contraction
labelling must equal a reference union-find on every topology that stresses
a different part of the algorithm — chains (diameter), hubs (skew),
cliques (density), forests (many components)."""

from __future__ import annotations

import pytest

from robi_biometric_qdrant_vector_db_service_spark.operators.graph import connected_components


def _uf_labels(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _spark_labels(spark, edges):
    df = spark.createDataFrame(edges, schema="a long, b long")
    return {r.node: r.component for r in connected_components(df).collect()}


@pytest.mark.parametrize(
    "edges",
    [
        # chain: worst diameter, exercises O(log n) collapse
        [(i, i + 1) for i in range(1, 40)],
        # hub: one node adjacent to everything (large-star's skew case)
        [(100, i) for i in range(1, 40)],
        # two cliques + an isolated pair
        [(a, b) for a in range(1, 6) for b in range(a + 1, 6)]
        + [(a, b) for a in range(10, 15) for b in range(a + 1, 15)]
        + [(50, 51)],
        # duplicate / reversed / self edges must not confuse the contraction
        [(1, 2), (2, 1), (2, 2), (1, 2), (2, 3)],
        # forest of pairs (many tiny components)
        [(2 * i, 2 * i + 1) for i in range(1, 30)],
    ],
)
def test_components_match_union_find(spark, edges):
    assert _spark_labels(spark, edges) == _uf_labels(edges)


def test_empty_edges(spark):
    df = spark.createDataFrame([], schema="a long, b long")
    assert connected_components(df).count() == 0


def test_label_is_component_min(spark):
    edges = [(7, 3), (3, 9), (20, 21)]
    labels = _spark_labels(spark, edges)
    assert labels == {3: 3, 7: 3, 9: 3, 20: 20, 21: 20}


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=6, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(min_value=1, max_value=25),
                  st.integers(min_value=1, max_value=25)),
        min_size=1,
        max_size=60,
    )
)
def test_components_match_union_find_random(spark, edges):
    """Hypothesis over RANDOM multigraphs on a small id domain (dense
    merges, duplicate/reversed/self edges arise naturally) — the directed
    topologies above each stress one regime; this closes the gaps between
    them.  Reference: path-halving union-find with min-root labelling,
    over the operator's documented domain (self-loops are DROPPED before
    anything else — a node exists only via an edge to a distinct node,
    the dedup-pair shape where doc_a < doc_b always holds)."""
    proper = [(a, b) for a, b in edges if a != b]
    assert _spark_labels(spark, edges) == _uf_labels(proper)
