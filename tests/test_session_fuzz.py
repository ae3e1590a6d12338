"""Differential fuzz of gap-based sessionization
(``workload_events.sessionization``) against a pure-Python reference of
the documented semantics: per user, events ordered by (ts, event_id), a
new session starts when there is no previous event or the gap EXCEEDS 30
minutes (strictly — an exactly-1800s gap continues the session); per
session report n_events, min/max ts, and the value sum accumulated in
DECIMAL(18,2) (each value HALF_UP-quantized to cents first) cast back to
double.

Adversarial inputs the fixture corpus rarely produces: equal timestamps
(the engine's cumulative window orders by ts alone and leans on the
shared (ts, event_id) sort for deterministic tie placement), gaps of
exactly 1800s (the > boundary), and single-event users."""

from __future__ import annotations

import datetime as dt
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import example, given, settings
from hypothesis import strategies as st

import robi_biometric_qdrant_vector_db_service_spark.workload  # noqa: F401  (registry root first)
from robi_biometric_qdrant_vector_db_service_spark.workload import REGISTRY

# second offsets hugging the 1800s boundary plus equal-ts collisions
_SECS = [0, 1, 2, 1799, 1800, 1801, 3600, 3601, 5401]

_event = st.tuples(
    st.integers(min_value=1, max_value=2),      # user
    st.sampled_from(_SECS),                     # ts second
    st.floats(min_value=0.0, max_value=9.0, allow_nan=False),
)


def _ts(sec: int) -> dt.datetime:
    return dt.datetime(2026, 2, 1) + dt.timedelta(seconds=sec)


def _cents(x: float) -> Decimal:
    return Decimal(repr(x)).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)


def ref_sessions(events):
    """events: list of (event_id, user, sec, value) -> set of session rows
    (user, session_id, n_events, start_sec, end_sec, total_value)."""
    by_user: dict[int, list] = {}
    for eid, user, sec, val in events:
        by_user.setdefault(user, []).append((sec, eid, val))
    out = set()
    for user, evs in by_user.items():
        evs.sort()
        sid = 0
        prev = None
        groups: dict[int, list] = {}
        for sec, eid, val in evs:
            if prev is None or sec - prev > 1800:
                sid += 1
            prev = sec
            groups.setdefault(sid, []).append((sec, val))
        for sid, rows in groups.items():
            total = sum((_cents(v) for _, v in rows), Decimal(0))
            out.add((user, sid, len(rows), min(s for s, _ in rows),
                     max(s for s, _ in rows), float(total)))
    return out


@settings(max_examples=8, deadline=None)
@given(events=st.lists(_event, min_size=1, max_size=20))
def test_sessionization_matches_reference(spark, tmp_path_factory, events):
    rows = [(i, _ts(sec), user, "view", val, "{}")
            for i, (user, sec, val) in enumerate(events)]
    sf_dir = str(tmp_path_factory.mktemp("sess_sf"))
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{sf_dir}/events.parquet")

    got = {
        (r["user_id"], r["session_id"], r["n_events"],
         int((r["session_start"] - _ts(0)).total_seconds()),
         int((r["session_end"] - _ts(0)).total_seconds()),
         r["total_value"])
        for r in REGISTRY["sessionization"].run(spark, sf_dir).collect()
    }
    expect = ref_sessions(
        [(i, user, sec, val) for i, (user, sec, val) in enumerate(events)]
    )
    assert got == expect, (events, got, expect)


# ---------------------------------------------------------------------------
# session_window twins (r15): the batch session_window_rollup and the
# watermarked streaming drain (stream_sessionization) against a
# pure-Python reference of the engine-pinned rule — session windows MERGE
# when they overlap OR TOUCH, so an event at EXACTLY prev+1800s merges
# into the previous session and splits happen only on gap > 1800s.  This
# fuzz CAUGHT the session_window_rollup oracle documenting >= (latent:
# the fixture corpus never lands an exact 1800s gap); the falsifying
# two-event example is pinned below as a seed-independent @example.
# Adversarial corpora: boundary gaps, equal timestamps, single-event
# users; the streaming run drains REAL micro-batches + sentinel flush.
# ---------------------------------------------------------------------------

EXACT_GAP_EXAMPLE = [(1, 3601, 0.0), (1, 5401, 0.0)]  # gap == 1800s: merge


def ref_sessions_gt(events):
    """events: list of (user, sec, value) -> set of
    (user, n_events, start_sec, total_value) under the engine's strict
    > gap rule (touching windows merge)."""
    by_user: dict[int, list] = {}
    for user, sec, val in events:
        by_user.setdefault(user, []).append((sec, val))
    out = set()
    for user, evs in by_user.items():
        evs.sort(key=lambda t: t[0])
        groups: list[list] = []
        prev = None
        for sec, val in evs:
            if prev is None or sec - prev > 1800:
                groups.append([])
            prev = sec
            groups[-1].append((sec, val))
        for rows in groups:
            total = sum((_cents(v) for _, v in rows), Decimal(0))
            out.add((user, len(rows), min(s for s, _ in rows), float(total)))
    return out


def _write_events_sf(spark, tmp_path_factory, tag, events):
    rows = [(i, _ts(sec), user, "view", val, "{}")
            for i, (user, sec, val) in enumerate(events)]
    sf_dir = str(tmp_path_factory.mktemp(tag))
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{sf_dir}/events.parquet")
    return sf_dir


@settings(max_examples=8, deadline=None)
@example(events=EXACT_GAP_EXAMPLE)
@given(events=st.lists(_event, min_size=1, max_size=20))
def test_session_window_rollup_matches_reference(spark, tmp_path_factory, events):
    """The NATIVE session_window aggregation (batch) against the pure
    reference — in particular the exact-1800s merge the corrected oracle
    now states."""
    sf_dir = _write_events_sf(spark, tmp_path_factory, "swr_sf", events)
    got = {
        (r["user_id"], r["n_events"],
         int((r["session_start"] - _ts(0)).total_seconds()))
        for r in REGISTRY["session_window_rollup"].run(spark, sf_dir).collect()
    }
    expect = {
        (u, n, s) for (u, n, s, _total) in ref_sessions_gt(
            [(u, s, v) for u, s, v in events]
        )
    }
    assert got == expect, (events, got, expect)


@settings(max_examples=5, deadline=None)
@example(events=EXACT_GAP_EXAMPLE)
@given(events=st.lists(_event, min_size=1, max_size=16))
def test_stream_sessionization_matches_reference(spark, tmp_path_factory, events):
    sf_dir = _write_events_sf(spark, tmp_path_factory, "ssess_sf", events)
    got = {
        (r["user_id"], r["n_events"],
         int((r["session_start"] - _ts(0)).total_seconds()), r["total_value"])
        for r in REGISTRY["stream_sessionization"].run(spark, sf_dir).collect()
    }
    expect = ref_sessions_gt([(u, s, v) for u, s, v in events])
    assert got == expect, (events, got, expect)


def test_stream_sessionization_drain_equals_batch_session_window(spark):
    """The drained streaming result must equal the BATCH session_window
    aggregation over the same fixture — the all-data-is-streaming-data
    invariant, for the native session operator."""
    from pyspark.sql import functions as F

    from robi_biometric_qdrant_vector_db_service_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    got = {
        tuple(r)
        for r in REGISTRY["stream_sessionization"].run(spark, SF_SMOKE).collect()
    }
    ev = load_table(spark, SF_SMOKE, "events")
    want = {
        tuple(r)
        for r in ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select("user_id", "session_start", "n_events", "total_value")
        .collect()
    }
    assert got == want


def test_stream_sessionization_empty_events(spark, tmp_path_factory):
    """Zero events => zero sessions, not a crash: the sentinel-flush drain
    short-circuits when there is no max event time to anchor the sentinel
    (found by an r15 edge probe — a NULL-timestamped sentinel killed the
    streaming query)."""
    sf_dir = _write_events_sf(spark, tmp_path_factory, "empty_sf", [])
    out = REGISTRY["stream_sessionization"].run(spark, sf_dir)
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == [
        "user_id", "session_start", "n_events", "total_value",
    ]
