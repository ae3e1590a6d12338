"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries images/audio/video as opaque
``binary`` columns with typed metadata, processed by Arrow-batched Python
(mapInPandas) because codecs are not SQL.  This container has no
image/audio libraries, so the DECODE step is a deterministic fake (clearly
marked); everything Spark-side — schema, binary column handling, Arrow
batch shape, partition-parallel UDF execution — is real and tested.

Real-decoder integration point: replace ``_fake_decode_batch`` with e.g.
PIL/torchaudio calls; the plumbing (schema, batching, partitioning) does
not change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOB_SCHEMA = (
    "doc_id bigint, blob binary, media_type string, n_bytes bigint"
)

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, width int, height int, n_frames int, "
    "byte_checksum bigint"
)


def to_blob_table(docs: DataFrame) -> DataFrame:
    """Build the opaque-binary table from `documents` (utf-8 bytes stand in
    for encoded media; at scale this is `spark.read.format('binaryFile')`
    over an object store — SURVEY §2.1 S4)."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("blob"),
        F.lit("image/fake").alias("media_type"),
        F.length(F.encode("text", "UTF-8")).cast("bigint").alias("n_bytes"),
    )


def _fake_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """STUB DECODER (deterministic fake — no codec libs in this image).

    Derives "image" properties purely from the byte stream so results are
    reproducible and oracle-checkable:
      width  = n_bytes % 64 + 16
      height = n_bytes % 48 + 16
      n_frames = n_bytes // 100 + 1      (a fake video frame-sample count)
      byte_checksum = sum(bytes) % 1000003
    A real decoder would raise NotImplementedError here if bytes were a
    real codec stream; the arithmetic below exercises the same batch shape.
    """
    blobs = pdf["blob"]
    n_bytes = blobs.map(len)
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "n_bytes": n_bytes,
            "width": (n_bytes % 64 + 16).astype("int32"),
            "height": (n_bytes % 48 + 16).astype("int32"),
            "n_frames": (n_bytes // 100 + 1).astype("int32"),
            "byte_checksum": blobs.map(lambda b: sum(b) % 1000003).astype("int64"),
        }
    )


def decode_features(blobs: DataFrame) -> DataFrame:
    """mapInPandas decode/feature-extract: Arrow batches of binary rows in,
    typed feature rows out.  Partition-parallel, no shuffle — the decode is
    a projection; downstream aggs shuffle the (small) features only."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _fake_decode_batch(pdf)

    return blobs.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_blobs(blobs: DataFrame, factor: int = 2) -> DataFrame:
    """mapInPandas binary→binary transform — the RESIZE shape: row count
    preserved, payload shrunk, output schema == BLOB_SCHEMA so it chains
    with decode_features/sample_frames (resize → decode is two pipelined
    Arrow stages in ONE task, no shuffle between).  STUB: keeps every
    ``factor``-th byte (deterministic, oracle-checkable); a real
    implementation decodes, resamples pixels, re-encodes — same plumbing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf["blob"].map(lambda b: bytes(bytes(b)[::factor]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "blob": resized,
                    "media_type": pdf["media_type"],
                    "n_bytes": resized.map(len).astype("int64"),
                }
            )

    return blobs.mapInPandas(run, schema=BLOB_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_checksum bigint"


def sample_frames(blobs: DataFrame, stride: int = 4) -> DataFrame:
    """mapInPandas frame-sampler: each blob row EXPANDS to one row per
    sampled frame (every ``stride``-th of its ``n_bytes // 100 + 1`` fake
    frames) — the 1:N flatMap shape of real video frame extraction, vs the
    1:1 decode above.  Frame payload = its 100-byte slice; the checksum
    stands in for the decoded tensor.  Partition-parallel, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids, idxs, sums = [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                b = bytes(blob)
                n_frames = len(b) // 100 + 1
                for k in range(0, n_frames, stride):
                    seg = b[k * 100 : (k + 1) * 100]
                    doc_ids.append(doc_id)
                    idxs.append(k)
                    sums.append(sum(seg) % 1000003)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(doc_ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_checksum": pd.Series(sums, dtype="int64"),
                }
            )

    return blobs.mapInPandas(run, schema=FRAME_SCHEMA)
