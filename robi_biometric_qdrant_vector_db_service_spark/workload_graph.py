"""Dup-GROUP queries: transitive closure of the near-dup pair graph.

The pair detectors (`workload_dedup`) answer "which documents are similar";
a curation pipeline must answer "which documents do I KEEP" — one canonical
survivor per transitive dup-group.  These queries close the pair graph into
components with the distributed large-star/small-star algorithm
(`operators.graph`) and materialize the keep/drop decision.

Oracle: DuckDB computes the same closure with a recursive CTE (min
reachable id per node) over the identical capped-Jaccard pair set, so the
labelling is checked end-to-end, not just the pair stage.

Scale: the Spark side never materializes reachability (the recursive CTE's
frontier is |V|·|component| in the worst case — fine for an oracle at
sf0.01, quadratic death at 100 TB); it iterates O(log n) star rounds whose
shuffles carry only the (shrinking) edge list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.graph import connected_components
from .sources.catalog import load_table
from .workload import register
from .functions.textconst import DUCK_SHINGLES, DUCK_TOKENS

# Module-level sibling import is constants-only; workload_dedup binds
# these ABOVE its own registry-root import, so this resolves in every
# first-import order (jaccard_pairs / staged_shingle_index are imported
# inside the query functions for the same reason).
from .workload_dedup import DF_CAP, JACCARD_T

# Shared oracle text: capped-Jaccard pairs (identical to ngram_jaccard_dups)
# closed into components by a recursive min-label walk.
_DUCK_COMPONENTS_CTE = f"""
WITH RECURSIVE
t AS (SELECT doc_id, lang, {DUCK_TOKENS} AS toks FROM documents),
s AS (SELECT doc_id, lang, {DUCK_SHINGLES} AS sh FROM t),
ex AS (SELECT doc_id, lang, unnest(sh) AS shingle FROM s),
kept AS (
  SELECT doc_id, lang, shingle FROM (
    SELECT *, count(*) OVER (PARTITION BY lang, shingle) AS df FROM ex
  ) WHERE df <= {DF_CAP}
),
sizes AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
co AS (
  SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS inter
  FROM kept a JOIN kept b ON a.lang = b.lang AND a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT doc1, doc2
  FROM co JOIN sizes n1 ON n1.doc_id = co.doc1 JOIN sizes n2 ON n2.doc_id = co.doc2
  WHERE round(CAST(inter AS DOUBLE) / (n1.n + n2.n - inter), 6) >= {JACCARD_T}
),
edges AS (
  SELECT doc1 AS u, doc2 AS v FROM pairs
  UNION
  SELECT doc2 AS u, doc1 AS v FROM pairs
),
walk AS (
  SELECT u AS node, u AS reach FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT w.node, e.v FROM walk w JOIN edges e ON e.u = w.reach
),
lab AS (SELECT node, min(reach) AS component FROM walk GROUP BY node)
"""


@register(
    "dedup_group_components",
    _DUCK_COMPONENTS_CTE
    + """
SELECT CAST(node AS BIGINT) AS doc_id,
       CAST(component AS BIGINT) AS component,
       CAST(count(*) OVER (PARTITION BY component) AS BIGINT) AS group_size,
       node = component AS is_canonical
FROM lab
""",
)
def dedup_group_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive dup-groups over the capped-Jaccard pair graph: every
    document in a group labelled with the group's min doc_id (the canonical
    survivor), plus the group size.  Components via distributed
    large-star/small-star (`operators.graph.connected_components`)."""
    from .workload_dedup import jaccard_pairs, staged_shingle_index

    docs = load_table(spark, sf_dir, "documents")
    comp = connected_components(
        jaccard_pairs(docs, index=staged_shingle_index(spark, sf_dir)).select(
            "doc1", "doc2"
        )
    )
    sizes = comp.groupBy("component").agg(F.count("*").alias("gs"))
    return (
        comp.join(sizes, "component")
        .select(
            F.col("node").alias("doc_id"),
            "component",
            F.col("gs").cast("bigint").alias("group_size"),
            (F.col("node") == F.col("component")).alias("is_canonical"),
        )
    )


@register(
    "dedup_survivors",
    _DUCK_COMPONENTS_CTE
    + """
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(l.node) AS BIGINT) AS n_dropped,
       CAST(count(*) - count(l.node) AS BIGINT) AS n_kept
FROM documents d
LEFT JOIN (SELECT node FROM lab WHERE node <> component) l ON l.node = d.doc_id
GROUP BY d.source
""",
)
def dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation decision: drop every non-canonical dup-group member,
    keep everything else; reported per source.  Expressed as a left join +
    conditional count so kept/dropped come from one pass; no forced
    broadcast — the drop set is usually tiny but scales with the dup rate,
    so AQE picks the join strategy from its runtime size."""
    from .workload_dedup import jaccard_pairs, staged_shingle_index

    docs = load_table(spark, sf_dir, "documents")
    comp = connected_components(
        jaccard_pairs(docs, index=staged_shingle_index(spark, sf_dir)).select(
            "doc1", "doc2"
        )
    )
    dropped = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    j = docs.join(dropped.withColumn("is_dropped", F.lit(1)), "doc_id", "left")
    return j.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.count("is_dropped").cast("bigint").alias("n_dropped"),
        (F.count("*") - F.count("is_dropped")).cast("bigint").alias("n_kept"),
    )
