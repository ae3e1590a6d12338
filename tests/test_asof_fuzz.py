"""Differential fuzz of the as-of (last-touch attribution) join
(``workload_events.purchase_attribution_asof``) against a pure-Python
reference of the documented semantics: each purchase matched to the
latest click by the same user AT-OR-BEFORE the purchase timestamp, with
equal-timestamp clicks INCLUDED (>= inclusive), clicks first deduped per
(user, ts) keeping the max event_id (value via max_by on event_id).

The engine's union-tag + carry-forward-window construction has three
boundary behaviors a range-probe implementation gets for free but the
tagged sort must earn: equal click/purchase timestamps (tag ordering),
multiple clicks at one (user, ts) (the arg_max dedup), and purchases
with no prior click (NULL attribution).  The fuzz generates tiny integer
timestamp domains so all three collide constantly, writes the corpus as
a synthetic sf_dir events table, and runs the REAL registered query."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

import robi_biometric_qdrant_vector_db_service_spark.workload  # noqa: F401  (registry root first)
from robi_biometric_qdrant_vector_db_service_spark.workload import REGISTRY

_event = st.tuples(
    st.sampled_from(["click", "purchase", "view"]),  # views are noise
    st.integers(min_value=1, max_value=3),           # user
    st.integers(min_value=0, max_value=6),           # ts second
    st.floats(min_value=0.0, max_value=9.0, allow_nan=False),
)


def _ts(sec: int) -> dt.datetime:
    return dt.datetime(2026, 1, 1) + dt.timedelta(seconds=sec)


def ref_attribution(events):
    """events: list of (event_id, type, user, sec, value)."""
    clicks: dict[tuple, tuple] = {}
    for eid, typ, user, sec, val in events:
        if typ != "click":
            continue
        k = (user, sec)
        if k not in clicks or eid > clicks[k][0]:
            clicks[k] = (eid, val)
    out = {}
    for eid, typ, user, sec, val in events:
        if typ != "purchase":
            continue
        prior = [(s, cid, cval) for (u, s), (cid, cval) in clicks.items()
                 if u == user and s <= sec]
        if prior:
            s, cid, cval = max(prior)  # latest ts, ties impossible after dedup
            out[eid] = (user, sec, val, cid, s, cval,
                        (sec - s) * 1_000_000)
        else:
            out[eid] = (user, sec, val, None, None, None, None)
    return out


@settings(max_examples=8, deadline=None)
@given(events=st.lists(_event, min_size=1, max_size=25))
def test_asof_attribution_matches_reference(spark, tmp_path_factory, events):
    rows = [(i, _ts(sec), user, typ, val, "{}")
            for i, (typ, user, sec, val) in enumerate(events)]
    sf_dir = str(tmp_path_factory.mktemp("asof_sf"))
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{sf_dir}/events.parquet")

    got = {}
    for r in REGISTRY["purchase_attribution_asof"].run(spark, sf_dir).collect():
        sec = int((r["purchase_ts"] - _ts(0)).total_seconds())
        csec = (None if r["click_ts"] is None
                else int((r["click_ts"] - _ts(0)).total_seconds()))
        got[r["purchase_id"]] = (r["user_id"], sec, r["purchase_value"],
                                 r["click_id"], csec, r["click_value"],
                                 r["gap_us"])
    expect = ref_attribution(
        [(i, typ, user, sec, val) for i, (typ, user, sec, val)
         in enumerate(events)]
    )
    assert got == expect, (events, got, expect)
