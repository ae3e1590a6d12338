"""S4/S5: bulk vector loaders + migration pipeline.

Reference semantics (file:line into /root/reference):
- ``load_faiss_data`` reads a ``.npy`` matrix or a FAISS index
  (``faiss.read_index`` + ``reconstruct_n``) plus JSON metadata in either
  list-form or dict-keyed form, truncating to a consistent length
  (scripts/migrate_from_faiss.py:57-115).
- ``run_migration`` loads in batches with progress and a verification
  search afterwards (scripts/migrate_from_faiss.py:153-255,257-321).

Spark-first restatement: the vector file is read DISTRIBUTED via
``binaryFile`` + Arrow-batched ``mapInPandas`` decode (the codec is NumPy's
own parser, not SQL); metadata rides ``spark.read.json``-compatible files;
the "batched migration loop" collapses to ONE ``df.write`` job — Spark's
task scheduler is the batching.  FAISS itself is not in this container, so
that branch is gated behind an import-try (the ``.npy`` path is the
fully-functional one, matching the reference's own fallback order).
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NPY_ROW_SCHEMA = "src_file string, row_idx bigint, embedding array<double>"


def read_npy_vectors(spark: SparkSession, path: str) -> DataFrame:
    """Distributed ``.npy`` reader: ``binaryFile`` scan → NumPy header parse
    per file inside ``mapInPandas`` (Arrow batches out).

    Returns (src_file, row_idx, embedding) with ``row_idx`` file-relative —
    the migration key the reference zips metadata against
    (migrate_from_faiss.py:105-109).  At 100 TB the input is many shards and
    each executor decodes its own files; a single mega-file should be
    re-sharded first (binary formats aren't splittable).
    """
    files = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        import numpy as np

        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                arr = np.load(io.BytesIO(bytes(content)))
                if arr.ndim != 2:
                    raise ValueError(f"{fpath}: expected (N, D) matrix, got {arr.shape}")
                yield pd.DataFrame(
                    {
                        "src_file": fpath,
                        "row_idx": np.arange(arr.shape[0], dtype=np.int64),
                        "embedding": list(arr.astype(np.float64)),
                    }
                )

    return files.select("path", "content").mapInPandas(parse, NPY_ROW_SCHEMA)


def read_faiss_vectors(spark: SparkSession, path: str) -> DataFrame:
    """FAISS-index branch of S4 (migrate_from_faiss.py:68-77:
    ``faiss.read_index`` + ``reconstruct_n``).  The faiss library is not in
    this container; with it installed, the decode below mirrors
    read_npy_vectors with the reconstruct call in place of ``np.load``."""
    try:
        import faiss  # noqa: F401
    except ImportError as e:  # pragma: no cover - no faiss in the image
        raise NotImplementedError(
            "faiss is not installed in this environment; use read_npy_vectors "
            "(.npy export) — the reference's own fallback path"
        ) from e
    files = spark.read.format("binaryFile").load(path)  # pragma: no cover

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
        import os
        import tempfile

        import faiss
        import numpy as np

        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                with tempfile.NamedTemporaryFile(suffix=".index", delete=False) as tmp:
                    tmp.write(bytes(content))
                    name = tmp.name
                try:
                    index = faiss.read_index(name)
                    arr = index.reconstruct_n(0, index.ntotal)
                finally:
                    os.unlink(name)
                yield pd.DataFrame(
                    {
                        "src_file": fpath,
                        "row_idx": np.arange(arr.shape[0], dtype=np.int64),
                        "embedding": list(arr.astype(np.float64)),
                    }
                )

    return files.select("path", "content").mapInPandas(parse, NPY_ROW_SCHEMA)  # pragma: no cover


def read_vector_metadata(spark: SparkSession, path: str) -> DataFrame:
    """Metadata JSON in the reference's two accepted shapes
    (migrate_from_faiss.py:80-101): a list (position-aligned with the vector
    matrix) or a dict keyed by row index.  Parsed driver-side — the metadata
    file is small relative to the vectors, the same assumption the reference
    makes by loading it whole — then parallelized.

    Returns (row_idx, user_id, metadata map<string,string>).
    """
    with open(path) as f:
        raw = json.load(f)
    if isinstance(raw, dict):
        items = [(int(k), v) for k, v in raw.items()]
    else:
        items = list(enumerate(raw))
    rows = []
    for idx, meta in sorted(items):
        meta = dict(meta or {})
        user_id = str(meta.pop("user_id", f"migrated_user_{idx}"))
        rows.append((idx, user_id, {k: str(v) for k, v in meta.items()}))
    return spark.createDataFrame(
        rows, "row_idx bigint, user_id string, metadata map<string,string>"
    )


def run_migration(
    spark: SparkSession,
    vectors_path: str,
    metadata_path: str | None,
    store_root: str,
    *,
    verify_samples: int = 8,
):
    """S5: bulk-load vectors (+ metadata) into a VectorStore, then run the
    reference's verification search on a sample (migrate_from_faiss.py:257-321:
    each sampled vector must retrieve ≥1 result — itself, since vectors are
    normalized at write).

    One distributed write job replaces the reference's client-side batch loop
    (:153-255); Spark partitioning is the batching.  Returns (store, report).
    """
    from ..operators.search import knn_search
    from ..operators.store import VectorStore

    vecs = read_npy_vectors(spark, vectors_path)
    if metadata_path is not None:
        meta = read_vector_metadata(spark, metadata_path)
        # Align by position and truncate to the common length, as the
        # reference does (migrate_from_faiss.py:105-109) — inner join IS the
        # truncation.
        batch = vecs.join(meta, "row_idx").select(
            F.col("row_idx").cast("string").alias("point_id"),
            "embedding",
            "user_id",
            "metadata",
        )
    else:
        batch = vecs.select(
            F.col("row_idx").cast("string").alias("point_id"),
            "embedding",
            F.concat(F.lit("migrated_user_"), F.col("row_idx")).alias("user_id"),
        )
    store = VectorStore.create(spark, store_root)
    n_migrated = store.add_batch(batch)

    corpus = store.read().select(
        F.col("point_id").alias("vec_id"), "embedding"
    )
    probes = corpus.limit(verify_samples).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    hits = knn_search(corpus, probes, k=1, corpus_id="vec_id").collect()
    report = {
        "n_migrated": n_migrated,
        "verify_samples": verify_samples,
        "verify_hits": len(hits),
        "verify_success": len(hits) >= min(verify_samples, n_migrated),
    }
    return store, report
