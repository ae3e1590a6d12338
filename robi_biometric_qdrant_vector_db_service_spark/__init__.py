"""PySpark-native analytics engine with the query / data-processing
capabilities of the ``mazleon/robi-biometric-qdrant-vector-db-service``
reference (read-only at /root/reference).

The reference is a Qdrant-backed biometric vector-search service (FastAPI +
client-side CUDA kernels).  This engine re-expresses its semantics —
L2-normalized embedding points, filtered top-k cosine search, weighted
multi-vector fusion, verify/identify, batch upsert and predicate deletes,
running operational statistics — as idiomatic Spark DataFrame/SQL plans,
and extends them with the LLM-data-pipeline operators the same machinery
implies (near-duplicate detection, similarity joins, text analysis,
multimodal column plumbing), every operator designed for 100 TB scale:
query-side broadcasts, JVM-side codegen'd scoring, bounded shuffles,
partition pruning, AQE.

Layout
------
- ``session``            SparkSession factory tuned for the workload
- ``sources.catalog``    table loader / view registration for the test corpus
- ``sources.points``     reference-shaped point-table generator + bulk loaders
- ``functions.vector``   vector kernels (normalize / dot / cosine) as
                         Catalyst higher-order functions + pandas_udf variants
- ``operators.search``   Q1-Q4: top-k search, fusion, verify, detect
- ``operators.store``    S2-S7: VectorStore add/upsert/delete with exact counts
- ``operators.relational`` joins / rollup / cube / windows over TPC-H-ish tables
- ``operators.events``   JSON payload parsing, time rollups, sessionization
- ``operators.text``     text stats, language heuristic, quality, fingerprints
- ``operators.dedup``    exact / MinHash-LSH / SimHash / n-gram Jaccard /
                         embedding-cosine near-dup
- ``operators.ann``      batch-built approximate indexes: IVF, sign-LSH,
                         INT8 quantize + rescore
- ``operators.multimodal`` binary-column plumbing (decode stubbed)
- ``plans.strategy``     exact-vs-ANN physical strategy policy
- ``streaming.stats``    Structured Streaming ops-stats analogue
"""

__version__ = "0.1.0"
