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

import numpy as np
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


def _flatten(blobs: pd.Series) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """One Arrow batch of binary rows → a single contiguous uint8 buffer +
    per-row (start, end, len) offsets — the zero-per-row-Python batch shape
    a real vectorized codec needs (one frombuffer, C-speed everywhere
    after)."""
    n = len(blobs)
    lens = np.fromiter((len(b) for b in blobs), dtype=np.int64, count=n)
    data = (
        np.frombuffer(b"".join(bytes(b) for b in blobs), dtype=np.uint8)
        if n
        else np.empty(0, dtype=np.uint8)
    )
    ends = np.cumsum(lens)
    return data, ends - lens, ends, lens


def _segment_sums(data: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Per-segment byte sums via one int64 cumsum + two gathers (robust for
    empty segments, unlike add.reduceat)."""
    csum = np.concatenate(([0], np.cumsum(data, dtype=np.int64)))
    return csum[ends] - csum[starts]


def _fake_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """STUB DECODER (deterministic fake — no codec libs in this image).

    Derives "image" properties purely from the byte stream so results are
    reproducible and oracle-checkable:
      width  = n_bytes % 64 + 16
      height = n_bytes % 48 + 16
      n_frames = n_bytes // 100 + 1      (a fake video frame-sample count)
      byte_checksum = sum(bytes) % 1000003
    A real decoder would raise NotImplementedError here if bytes were a
    real codec stream; the arithmetic below exercises the same batch shape
    — fully vectorized (one flattened buffer, cumsum segment sums), no
    per-row Python.
    """
    data, starts, ends, lens = _flatten(pdf["blob"])
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "n_bytes": lens,
            "width": (lens % 64 + 16).astype("int32"),
            "height": (lens % 48 + 16).astype("int32"),
            "n_frames": (lens // 100 + 1).astype("int32"),
            "byte_checksum": _segment_sums(data, starts, ends) % 1000003,
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
            data, starts, ends, lens = _flatten(pdf["blob"])
            # keep every factor-th byte of each row, batch-wide: one
            # boolean mask over the flattened buffer (relative position
            # within the owning row ≡ 0 mod factor), then re-slice rows
            # out of the kept bytes — no per-row byte loops
            rel = np.arange(data.size, dtype=np.int64) - np.repeat(starts, lens)
            kept = data[rel % factor == 0]
            new_lens = (lens + factor - 1) // factor
            new_ends = np.cumsum(new_lens)
            new_starts = new_ends - new_lens
            resized = [
                kept[s:e].tobytes() for s, e in zip(new_starts, new_ends)
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "blob": resized,
                    "media_type": pdf["media_type"],
                    "n_bytes": new_lens,
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
            data, starts, ends, lens = _flatten(pdf["blob"])
            # expand rows to sampled frames entirely with offset
            # arithmetic: repeat each doc ceil(n_frames/stride) times, then
            # one cumsum gather scores every sampled 100-byte window
            n_frames = lens // 100 + 1
            n_samp = (n_frames + stride - 1) // stride
            doc_rep = np.repeat(np.arange(len(lens)), n_samp)
            samp_ends = np.cumsum(n_samp)
            within = np.arange(int(n_samp.sum()), dtype=np.int64) - np.repeat(
                samp_ends - n_samp, n_samp
            )
            frame_idx = within * stride
            fs = starts[doc_rep] + 100 * frame_idx
            fe = np.minimum(fs + 100, ends[doc_rep])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy()[doc_rep],
                    "frame_idx": frame_idx.astype("int32"),
                    "frame_checksum": _segment_sums(data, fs, fe) % 1000003,
                }
            )

    return blobs.mapInPandas(run, schema=FRAME_SCHEMA)
