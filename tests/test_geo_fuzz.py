"""Property-based differential fuzz of the geo and datetime Filter
conditions (``payload_index``: GeoBoundingBox with antimeridian wrap,
GeoRadius haversine, datetime_range with mixed epoch/RFC3339 bounds)
against pure-Python references — extending ``test_filter_fuzz`` (which
covers the boolean grammar) to the condition families it leaves out.

GeoRadius compares trig computed by Catalyst (JVM libm) vs Python's
``math`` — ulp-level divergence is possible exactly AT the radius, so
the fuzz asserts only points whose reference distance differs from the
radius by more than 1e-6 relative (the fixture-margin discipline of
``geo_filter_search``); everything else (box comparisons, timestamp
equality) is exact and asserted exactly.  Reference behavior anchors:
Qdrant GeoBoundingBox/GeoRadius wrap + haversine semantics,
DatetimeRange RFC3339/epoch bounds.
"""

from __future__ import annotations

import math
from datetime import datetime, timezone

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from robi_biometric_qdrant_vector_db_service_spark.operators.payload_index import (
    _datetime_bound,
    _geo_bounding_box,
    _geo_radius,
    _range_predicate,
)

R_EARTH = 6371000.0

LATS = st.integers(min_value=-89, max_value=89)
LONS = st.integers(min_value=-180, max_value=179)


def haversine(lat1, lon1, lat2, lon2) -> float:
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp, dl = math.radians(lat2 - lat1), math.radians(lon2 - lon1)
    a = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
    return 2 * R_EARTH * math.asin(math.sqrt(a))


def _geo_df(spark, pts):
    return (
        spark.createDataFrame(pts, "i int, lat double, lon double")
        .withColumn("geo", F.struct("lat", "lon"))
    )


@settings(max_examples=15, deadline=None)
@given(
    pts=st.lists(st.tuples(LATS, LONS), min_size=3, max_size=8, unique=True),
    tl=st.tuples(LATS, LONS),
    br=st.tuples(LATS, LONS),
)
def test_geo_bounding_box_matches_reference_including_wrap(spark, pts, tl, br):
    tl_lat, br_lat = max(tl[0], br[0]), min(tl[0], br[0])  # ordered band
    tl_lon, br_lon = tl[1], br[1]  # tl_lon > br_lon => antimeridian wrap
    box = {
        "top_left": {"lat": tl_lat, "lon": tl_lon},
        "bottom_right": {"lat": br_lat, "lon": br_lon},
    }
    df = _geo_df(spark, [(i, float(la), float(lo)) for i, (la, lo) in enumerate(pts)])
    got = {
        r["i"]: bool(r["m"])
        for r in df.select("i", _geo_bounding_box(F.col("geo"), box).alias("m")).collect()
    }
    for i, (la, lo) in enumerate(pts):
        in_band = br_lat <= la <= tl_lat
        if tl_lon <= br_lon:
            in_lon = tl_lon <= lo <= br_lon
        else:
            in_lon = lo >= tl_lon or lo <= br_lon
        assert got[i] == (in_band and in_lon), (i, la, lo, box)


@settings(max_examples=15, deadline=None)
@given(
    pts=st.lists(st.tuples(LATS, LONS), min_size=3, max_size=8, unique=True),
    center=st.tuples(LATS, LONS),
    radius_km=st.integers(min_value=1, max_value=15000),
)
def test_geo_radius_matches_python_haversine(spark, pts, center, radius_km):
    radius = float(radius_km) * 1000.0
    cond = {"center": {"lat": center[0], "lon": center[1]}, "radius": radius}
    df = _geo_df(spark, [(i, float(la), float(lo)) for i, (la, lo) in enumerate(pts)])
    got = {
        r["i"]: bool(r["m"])
        for r in df.select("i", _geo_radius(F.col("geo"), cond).alias("m")).collect()
    }
    for i, (la, lo) in enumerate(pts):
        d = haversine(center[0], center[1], la, lo)
        if abs(d - radius) <= 1e-6 * radius:
            continue  # libm-divergence territory: both verdicts defensible
        assert got[i] == (d <= radius), (i, la, lo, d, radius)


EPOCHS = st.integers(min_value=1_500_000_000, max_value=1_800_000_000)


@settings(max_examples=15, deadline=None)
@given(
    ts=st.lists(EPOCHS, min_size=3, max_size=8, unique=True),
    ops=st.lists(
        st.sampled_from(["gt", "gte", "lt", "lte"]), min_size=1, max_size=2, unique=True
    ),
    bounds=st.lists(EPOCHS, min_size=2, max_size=2),
    as_string=st.booleans(),
)
def test_datetime_range_mixed_bound_forms_match_reference(
    spark, ts, ops, bounds, as_string
):
    def wire(epoch: int):
        if as_string:  # RFC3339 'Z' form — the to_timestamp parse path
            return (
                datetime.fromtimestamp(epoch, tz=timezone.utc)
                .strftime("%Y-%m-%dT%H:%M:%SZ")
            )
        return epoch  # epoch-seconds number form

    r = {op: wire(b) for op, b in zip(ops, bounds)}
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ts)], "i int, epoch bigint"
    ).withColumn("ts", F.timestamp_seconds(F.col("epoch")))
    got = {
        r_["i"]: bool(r_["m"])
        for r_ in df.select(
            "i", _range_predicate(F.col("ts"), r, bound=_datetime_bound).alias("m")
        ).collect()
    }
    py_ops = {"gt": lambda a, b: a > b, "gte": lambda a, b: a >= b,
              "lt": lambda a, b: a < b, "lte": lambda a, b: a <= b}
    for i, t in enumerate(ts):
        exp = all(py_ops[op](t, b) for op, b in zip(ops, bounds))
        assert got[i] == exp, (i, t, r)
