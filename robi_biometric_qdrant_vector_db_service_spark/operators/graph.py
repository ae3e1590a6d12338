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

Convergence is detected STRUCTURALLY rather than by diffing edge sets: the
algorithm's fixed points are exactly the star labellings, i.e. edge sets
where (a) no dst ever appears as a src and (b) every src carries a single
dst.  (⇐: on such a set both stars are identities — a leaf's only, smaller
neighbor is its root so it emits nothing new, and a root's min is itself.
⇒: a violated (a) means some node still points above a smaller label; a
violated (b) means two labels for one node — either way the next
small-star changes the set.)  The test is one short-circuited job over the
just-checkpointed edges and — unlike an ``exceptAll`` diff, which must
compute round R+1 to observe "no change" — it certifies round R's output
directly, and certifies pair/star-shaped inputs (the common dup-graph
case) in zero rounds.  The theoretical round bound for any input is
O(log² n), so ``max_rounds`` default 25 covers any corpus that fits in a
cluster.
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


def _is_star_labelling(e: DataFrame) -> bool:
    """Fixed-point test (see module docstring): every src has exactly one
    dst AND no dst appears as a src — one short-circuited probe job."""
    multi_dst = (
        e.groupBy("src")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > 1)
        .select(F.lit(1).alias("v"))
    )
    dst_is_src = (
        e.select(F.col("dst").alias("n"))
        .join(e.select(F.col("src").alias("n")), "n", "left_semi")
        .select(F.lit(1).alias("v"))
    )
    return multi_dst.union(dst_is_src).limit(1).count() == 0


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
    for _ in range(max_rounds + 1):
        if _is_star_labelling(e):
            break
        # superseded rounds' checkpoint blocks are released by the
        # ContextCleaner once the old DataFrame is unreachable
        e = _small_star(_large_star(e)).localCheckpoint()
    else:
        raise RuntimeError(f"connected_components did not converge in {max_rounds} rounds")
    labels = e.select(F.col("src").alias("node"), F.col("dst").alias("component")).union(
        e.select(F.col("dst").alias("node"), F.col("dst").alias("component"))
    )
    return labels.distinct()
