"""Distributed connected components over a pair graph (dup-group closure).

The near-dup detectors (`workload_dedup`) emit PAIRS; a curation pipeline
needs transitive GROUPS — if A~B and B~C, one canonical survivor for
{A, B, C}, even though (A, C) was never emitted.  That closure is connected
components, and at 100 TB it cannot be a driver-side union-find: the edge
list is itself a distributed table.

Algorithm: alternating large-star / small-star (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC 2014) expressed as DataFrame ops.

- ``large_star``: every node ``u`` connects each STRICTLY LARGER neighbor
  to ``m(u) = min(N(u) ∪ {u})``.  This is the skew-killer: a hub's huge
  neighborhood is re-pointed at the hub's min in ONE round, so chains
  collapse in O(log n) rounds, not O(diameter).
- ``small_star``: with every edge directed larger→smaller, each node and
  its smaller neighbors connect to their common min — turning local
  structure into stars.
- At the fixed point the edge set IS the component labelling: one edge
  ``(node, root)`` per non-root node, root = min id of the component.

Each round is two hash shuffles (a groupBy-min and a self-join on the
grouping key — co-partitioned, so AQE coalesces the exchange); the edge
set shrinks monotonically in expectation.  ``localCheckpoint`` truncates
lineage per round — without it round ``i`` replays rounds ``1..i-1`` and
total work goes quadratic in rounds.

Convergence is checked with a symmetric ``exceptAll`` probe (one job per
round, short-circuited by ``limit(1)``); the theoretical round bound for
any input is O(log² n) so ``max_rounds`` default 25 covers any corpus that
fits in a cluster (2^25 components deep would need > 10^7-diameter chains).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(e: DataFrame) -> DataFrame:
    """One large-star round.  ``e`` holds undirected edges as (src, dst)
    with src > dst; output preserves that invariant (m <= u < v)."""
    sym = e.select(F.col("src").alias("u"), F.col("dst").alias("v")).union(
        e.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    )
    m = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """One small-star round over larger→smaller edges: each node ``u`` and
    its smaller neighbors re-link to ``min(N⁻(u) ∪ {u})`` (= min(N⁻(u)),
    since every neighbor is already smaller than u)."""
    m = e.groupBy("src").agg(F.min("dst").alias("m"))
    relink = (
        e.join(m, "src")
        .filter(F.col("dst") != F.col("m"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )
    self_link = m.select("src", F.col("m").alias("dst"))
    return relink.union(self_link).distinct()


def connected_components(edges: DataFrame, *, max_rounds: int = 25) -> DataFrame:
    """Component labelling of an undirected edge list.

    ``edges``: two-column DataFrame (any names) of node-id pairs (bigint-
    castable).  Self-loops are dropped, direction is ignored.

    Returns (node bigint, component bigint) for every node incident to at
    least one edge, where ``component`` is the minimum node id reachable
    from ``node`` — the deterministic canonical representative.
    """
    a, b = edges.columns[:2]
    e = (
        edges.select(
            F.greatest(F.col(a).cast("bigint"), F.col(b).cast("bigint")).alias("src"),
            F.least(F.col(a).cast("bigint"), F.col(b).cast("bigint")).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    for _ in range(max_rounds):
        e2 = _small_star(_large_star(e)).localCheckpoint()
        changed = e2.exceptAll(e).union(e.exceptAll(e2)).limit(1).count()
        # superseded rounds' checkpoint blocks are released by the
        # ContextCleaner once the old DataFrame is unreachable
        e = e2
        if changed == 0:
            break
    else:
        raise RuntimeError(f"connected_components did not converge in {max_rounds} rounds")
    labels = e.select(F.col("src").alias("node"), F.col("dst").alias("component")).union(
        e.select(F.col("dst").alias("node"), F.col("dst").alias("component"))
    )
    return labels.distinct()
