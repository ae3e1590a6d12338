"""Streaming media-gate contracts: the drained gate equals the batch
plan on the same corpus (micro-batching must not change a stateless
gate's answer), the gate actually rejects, all-rejected drains keep the
schema, and a second drain is deterministic."""

from __future__ import annotations

from pyspark.sql import functions as F

from robi_biometric_qdrant_vector_db_service_spark.streaming.mediagate import (
    media_gate_batch_stats,
    media_gate_stream,
    staged_wav_path,
)
from robi_biometric_qdrant_vector_db_service_spark.workload_sources import (
    MEDIA_GATE_MIN_SPEECH,
    VAD_BLOCK_SEC,
    VAD_CORPUS_DOCS,
    _vad_corpus_blobs,
)
from tests.conftest import SF_SMOKE


def _rows(df):
    return sorted(
        (r["doc_id"], r["n_segments"], r["speech_blocks"]) for r in df.collect()
    )


def test_drain_equals_batch(spark):
    """The streamed gate must equal the identical batch plan + filter run
    directly over the corpus — micro-batch boundaries are invisible."""
    batch = media_gate_batch_stats(
        _vad_corpus_blobs(spark, SF_SMOKE), block_sec=VAD_BLOCK_SEC
    ).filter(F.col("speech_blocks") >= MEDIA_GATE_MIN_SPEECH)
    drained = media_gate_stream(
        spark,
        SF_SMOKE,
        block_sec=VAD_BLOCK_SEC,
        min_speech_blocks=MEDIA_GATE_MIN_SPEECH,
    )
    want = _rows(batch)
    assert _rows(drained) == want
    n_docs = min(
        VAD_CORPUS_DOCS,
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count(),
    )
    # the gate REJECTS the doc_id % 4 == 3 quarter — planted selectivity
    assert len(want) == sum(1 for d in range(n_docs) if d % 4 != 3)
    assert 0 < len(want) < n_docs
    # second drain: staged source and plan are deterministic
    assert _rows(
        media_gate_stream(
            spark,
            SF_SMOKE,
            block_sec=VAD_BLOCK_SEC,
            min_speech_blocks=MEDIA_GATE_MIN_SPEECH,
        )
    ) == want


def test_all_rejected_keeps_schema(spark):
    """An impossible gate admits nothing but the drained frame keeps the
    stats schema (the seed partition's contract)."""
    staged_wav_path(spark, SF_SMOKE)  # ensure staging happened
    drained = media_gate_stream(
        spark, SF_SMOKE, block_sec=VAD_BLOCK_SEC, min_speech_blocks=10_000
    )
    assert drained.count() == 0
    assert [f.name for f in drained.schema.fields] == [
        "doc_id", "n_segments", "speech_blocks",
    ]
