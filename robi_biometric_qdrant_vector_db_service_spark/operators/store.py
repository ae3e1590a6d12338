"""S1–S7: the reference's write/mutation surface as a batch VectorStore.

Reference semantics (file:line into /root/reference):
- S1 collection create        src/core/qdrant_client.py:60-151
- S2/S3 single/batch upsert   src/core/qdrant_client.py:174-309
  (normalize at write :200-202/:269, uuid4 default id :206/:276,
   timestamp payload stamp :211/:281)
- S6 delete by id             src/core/qdrant_client.py:407-432
- S7 delete by predicate      src/core/qdrant_client.py:434-469
  — the reference only APPROXIMATES the deleted count from the operation id
  (:461); we return exact counts (SURVEY §2.1 S7: a fidelity bug not copied).

Storage design (100 TB posture)
-------------------------------
Versioned parquet snapshots: every mutation writes a NEW snapshot directory
``<root>/v=<n>`` and bumps a pointer file — the poor-man's form of Delta's
log-structured table (the image has no Delta jars; SURVEY §2.1 maps S2/S3 to
``MERGE INTO`` when a lakehouse format is on the classpath).  Readers always
see a consistent snapshot; concurrent readers of v=n are unaffected by a
writer producing v=n+1.  This mirrors the reference's flush/segment model
(qdrant_client.py:117-127) where visibility is per flushed segment.

At real scale the rewrite cost of upsert/delete is bounded by partition
pruning: the store partitions by ``bucket(user_id)`` so a predicate delete
touches only matching partitions.  Local tests keep partition counts small.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vector import l2_normalize_sql

POINT_SCHEMA = (
    "point_id string, embedding array<double>, user_id string, ts double, "
    "metadata map<string,string>"
)


class VectorStore:
    """Batch analogue of QdrantVectorStore (src/core/qdrant_client.py:33-520).

    ``n_buckets`` controls the O1 layout: snapshots are written partitioned
    by ``ubucket = pmod(hash(user_id), n_buckets)`` so keyword-filtered
    reads and deletes prune partitions at scan time — the Spark analogue of
    the reference's RAM keyword index on user_id
    (src/core/advanced_indexing.py:52-59)."""

    def __init__(self, spark: SparkSession, root: str, *, n_buckets: int = 8):
        self.spark = spark
        self.root = root
        self.n_buckets = n_buckets
        os.makedirs(root, exist_ok=True)

    # -- snapshot plumbing --------------------------------------------------

    def _pointer(self) -> str:
        return os.path.join(self.root, "_LATEST")

    def _current_version(self) -> int:
        try:
            with open(self._pointer()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return -1

    def _snapshot_path(self, version: int) -> str:
        return os.path.join(self.root, f"v={version}")

    def _publish(self, df: DataFrame) -> int:
        new_v = self._current_version() + 1
        out = df.withColumn(
            "ubucket", F.pmod(F.hash("user_id"), F.lit(self.n_buckets))
        )
        # co-locate each bucket before the partitioned write: one file per
        # bucket instead of tasks × buckets small files (at scale, raise
        # n_buckets / add a second repartition key for more write tasks)
        out = out.repartition(self.n_buckets, "ubucket")
        out.write.mode("overwrite").partitionBy("ubucket").parquet(
            self._snapshot_path(new_v)
        )
        with open(self._pointer(), "w") as f:
            f.write(str(new_v))
        return new_v

    # -- S1 create ----------------------------------------------------------

    @classmethod
    def create(cls, spark: SparkSession, root: str, initial: DataFrame | None = None) -> "VectorStore":
        """S1: create/verify the collection (qdrant_client.py:60-151).
        Index params (HNSW/quantization) become batch index-build jobs in
        operators.ann, not table properties."""
        store = cls(spark, root)
        if store._current_version() < 0:
            df = initial if initial is not None else spark.createDataFrame([], POINT_SCHEMA)
            store._publish(df)
        return store

    def read(self, *, user_id: str | None = None) -> DataFrame:
        """Current snapshot.  With ``user_id``, the bucket predicate is a
        constant-foldable expression on the partition column, so the scan
        prunes to one bucket directory (PartitionFilters) before the exact
        ``user_id`` filter — the O1 index-assisted read path."""
        v = self._current_version()
        if v < 0:
            raise FileNotFoundError(f"store at {self.root} not initialized")
        # explicit schema: skips footer inference and keeps empty snapshots
        # readable (a partitioned empty write produces no data files)
        df = self.spark.read.schema(POINT_SCHEMA + ", ubucket int").parquet(
            self._snapshot_path(v)
        )
        if user_id is not None:
            df = df.filter(
                F.col("ubucket") == F.pmod(F.hash(F.lit(user_id)), F.lit(self.n_buckets))
            ).filter(F.col("user_id") == user_id)
        return df.select("point_id", "embedding", "user_id", "ts", "metadata")

    # -- S2/S3 add / upsert -------------------------------------------------

    def add_batch(self, batch: DataFrame, *, normalize: bool = True) -> int:
        """S3 (and S2 as the 1-row case): normalize → default ids/timestamps
        → append.  Returns number of rows written.

        Mirrors add_vectors_batch (qdrant_client.py:242-309): embeddings are
        L2-normalized at write (:269), ``point_id`` defaults to uuid()
        (:276), ``ts`` to current epoch seconds (:281).  Upsert-by-id
        semantics (same id replaces) via `upsert`.
        """
        cols = batch.columns
        out = batch
        if "point_id" not in cols:
            out = out.withColumn("point_id", F.expr("uuid()"))
        else:
            out = out.withColumn("point_id", F.coalesce("point_id", F.expr("uuid()")))
        if "ts" not in cols:
            out = out.withColumn("ts", F.unix_timestamp().cast("double"))
        if "metadata" not in cols:
            out = out.withColumn("metadata", F.create_map().cast("map<string,string>"))
        if normalize:
            out = out.withColumn("embedding", F.expr(l2_normalize_sql("embedding")))
        out = out.select("point_id", "embedding", "user_id", "ts", "metadata")
        n = out.count()
        # True append: write ONLY the new rows' files into the live
        # snapshot (qdrant upsert with fresh ids touches no existing
        # segment, qdrant_client.py:292-296); rewriting the corpus per
        # batch would never hold at scale.  Write-task count scales with
        # the batch, not the store: one task per ~10k rows, capped at the
        # bucket count (small batches → one file per touched bucket).
        v = self._current_version()
        tasks = max(1, min(self.n_buckets, n // 10_000 + 1))
        appended = out.withColumn(
            "ubucket", F.pmod(F.hash("user_id"), F.lit(self.n_buckets))
        ).repartition(tasks, "ubucket")
        appended.write.mode("append").partitionBy("ubucket").parquet(
            self._snapshot_path(v)
        )
        return n

    def upsert(self, updates: DataFrame, *, normalize: bool = True) -> int:
        """MERGE ON point_id: existing rows with matching ids are replaced,
        new ids appended (Qdrant upsert semantics, qdrant_client.py:292-296).
        Emulated as anti-join + union (pyspark_guide 'CDC' pattern); with
        Delta on the classpath this is a single ``MERGE INTO``."""
        up = updates
        if normalize:
            up = up.withColumn("embedding", F.expr(l2_normalize_sql("embedding")))
        if "ts" not in up.columns:
            up = up.withColumn("ts", F.unix_timestamp().cast("double"))
        if "metadata" not in up.columns:
            up = up.withColumn("metadata", F.create_map().cast("map<string,string>"))
        up = up.select("point_id", "embedding", "user_id", "ts", "metadata")
        current = self.read()
        survivors = current.join(F.broadcast(up.select("point_id")), "point_id", "left_anti")
        n = up.count()
        self._publish(survivors.unionByName(up))
        return n

    # -- S6/S7 deletes ------------------------------------------------------

    def delete_by_id(self, point_ids: list[str]) -> int:
        """S6 (qdrant_client.py:407-432). Exact deleted count."""
        current = self.read()
        ids = self.spark.createDataFrame([(i,) for i in point_ids], "point_id string")
        survivors = current.join(F.broadcast(ids), "point_id", "left_anti")
        before = current.count()
        after = survivors.count()
        self._publish(survivors)
        return before - after

    def delete_where(self, predicate: str) -> int:
        """S7 delete-by-predicate (qdrant_client.py:434-469) with an EXACT
        count — the reference returns an approximation derived from the
        operation id (:461).  ``predicate`` is a SQL boolean expression."""
        current = self.read()
        survivors = current.filter(f"NOT ({predicate})")
        before = current.count()
        after = survivors.count()
        self._publish(survivors)
        return before - after

    # -- Q1 search over the store -------------------------------------------

    def search(
        self,
        queries: DataFrame,
        k: int = 10,
        *,
        score_threshold: float | None = None,
        user_filter: str | None = None,
    ) -> DataFrame:
        """The reference's ``POST /vectors/search`` end-to-end over the
        store (qdrant_client.py:311-405): optional user filter (pruned to
        one bucket partition, O1), cosine top-k with threshold, result keyed
        by ``point_id``.  ``queries``: (q_id, q_emb)."""
        from .search import knn_search

        corpus = self.read(user_id=user_filter)
        return knn_search(
            corpus,
            queries,
            k,
            score_threshold=score_threshold,
            corpus_id="point_id",
        )

    # -- A1/A3 stats --------------------------------------------------------

    def count(self) -> int:
        """A1 (qdrant_client.py:471-482)."""
        return self.read().count()

    def stats(self) -> dict:
        """A3 operational stats analogue (qdrant_client.py:484-520): counts
        and norm health from the data itself rather than client-side
        accumulators (the ops-log/streaming form lives in streaming.stats)."""
        from ..functions.vector import norm_sql

        row = (
            self.read()
            .agg(
                F.count("*").alias("total_vectors"),
                F.countDistinct("user_id").alias("distinct_users"),
                F.round(F.avg(F.expr(norm_sql("embedding"))), 6).alias("avg_norm"),
            )
            .collect()[0]
        )
        return {
            "total_vectors": row["total_vectors"],
            "distinct_users": row["distinct_users"],
            "avg_norm": row["avg_norm"],
            "version": self._current_version(),
        }
