"""Differential fuzz of the ordered funnel
(``workload_events.funnel_stages``) against a pure-Python reference of
the documented semantics: a user reaches stage k iff their history
contains the subsequence signup < view < click < purchase in STRICT
event-time order, matched by earliest-occurrence greedy chaining (min ts
of stage k strictly after stage k-1's chosen ts — provably optimal for
subsequence existence).

Adversarial inputs: tiny timestamp domains so equal-timestamp
stage events collide constantly (strictly-> means a view at the signup's
exact second does NOT advance the funnel), missing stages, and
out-of-order arrivals."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

import robi_biometric_qdrant_vector_db_service_spark.workload  # noqa: F401  (registry root first)
from robi_biometric_qdrant_vector_db_service_spark.workload import REGISTRY

STAGES = ["signup", "view", "click", "purchase"]

_event = st.tuples(
    st.integers(min_value=1, max_value=3),   # user
    st.sampled_from(STAGES),
    st.integers(min_value=0, max_value=5),   # ts second
)


def _ts(sec: int) -> dt.datetime:
    return dt.datetime(2026, 3, 1) + dt.timedelta(seconds=sec)


def ref_counts(events) -> dict[str, int]:
    """events: (user, stage, sec) -> per-stage reached-user counts."""
    by_user: dict[int, list] = {}
    for user, stage, sec in events:
        by_user.setdefault(user, []).append((stage, sec))
    counts = dict.fromkeys(STAGES, 0)
    for user, evs in by_user.items():
        t_prev = None
        for k, stage in enumerate(STAGES):
            cand = [s for st_, s in evs
                    if st_ == stage and (t_prev is None or s > t_prev)]
            if not cand:
                break
            t_prev = min(cand)
            counts[stage] += 1
    return counts


@settings(max_examples=8, deadline=None)
@given(events=st.lists(_event, min_size=1, max_size=25))
def test_funnel_matches_greedy_subsequence_reference(spark, tmp_path_factory,
                                                     events):
    rows = [(i, _ts(sec), user, stage, 1.0, "{}")
            for i, (user, stage, sec) in enumerate(events)]
    sf_dir = str(tmp_path_factory.mktemp("funnel_sf"))
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{sf_dir}/events.parquet")

    got = {r["stage"]: r["n_users"]
           for r in REGISTRY["funnel_stages"].run(spark, sf_dir).collect()}
    expect = ref_counts(events)
    # the query reports every stage row (zero counts included) — compare
    # on the full stage map
    assert got == expect, (events, got, expect)
