"""O1/P-surface: payload field indexes as typed-column promotion.

Reference semantics (file:line into /root/reference):
- ``setup_payload_indexes``  src/core/advanced_indexing.py:39-125 — declares
  per-field typed indexes (KEYWORD user_id/enrollment_group, DATETIME
  timestamp, FLOAT confidence_score, INTEGER face_quality) over the
  otherwise schemaless payload dict.
- ``create_advanced_filters`` src/core/advanced_indexing.py:127-210 —
  composes the conjunctive filter those indexes serve: user in-list
  (single-value fast path :150-164), timestamp range, confidence >=,
  quality >=, enrollment-group in-list.

Spark-first design (SURVEY §1.3): "creating a payload index" = PROMOTING a
``metadata`` map key to a typed top-level column.  A map access
(``metadata['k']``) is opaque to parquet — no pushdown, no row-group
min/max skipping; the promoted typed column gets both for free, plus
Catalyst constant folding and codegen comparisons.  Written sorted or
partitioned by the promoted field, row-group statistics become the
secondary index itself: a range predicate skips every non-overlapping
row group — the columnar analogue of Qdrant's RAM range index
(advanced_indexing.py:71-89 ``on_disk=False`` float/integer indexes).
At 100 TB the promotion is a one-off layout job (like the reference's
one-off ``create_payload_index`` calls), amortized across every
subsequent filtered scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# advanced_indexing.py:50-99 — the reference's payload type system.
# DATETIME is epoch-seconds DOUBLE at write time (qdrant_client.py:211
# stamps time.time()); promote to TimestampType only for calendar ops.
FIELD_TYPES: dict[str, str] = {
    "keyword": "string",
    "integer": "int",
    "float": "double",
    "datetime": "double",
}


def promote_payload_fields(df: DataFrame, fields: dict[str, str]) -> DataFrame:
    """Promote each ``metadata[key]`` to a typed top-level column named
    ``key`` (advanced_indexing.py:39-125: one declared index per field).
    ``fields`` maps key → reference field type (see FIELD_TYPES)."""
    out = df
    for key, ftype in fields.items():
        spark_t = FIELD_TYPES[ftype]
        out = out.withColumn(key, F.col("metadata")[key].cast(spark_t))
    return out


def advanced_filter(
    df: DataFrame,
    *,
    user_ids: list[str] | None = None,
    time_range: dict[str, float] | None = None,
    confidence_min: float | None = None,
    quality_min: int | None = None,
    enrollment_groups: list[str] | None = None,
) -> DataFrame:
    """The composite filter of create_advanced_filters
    (advanced_indexing.py:127-210), over promoted typed columns.  Each
    condition is a plain Catalyst predicate, so the conjunction pushes to
    the parquet scan as a whole; the single-user fast path (:150-157 —
    MatchValue instead of an any-list) falls out of Catalyst rewriting a
    1-element IN to an equality."""
    conds: list[Column] = []
    if user_ids:
        conds.append(
            F.col("user_id") == user_ids[0]
            if len(user_ids) == 1
            else F.col("user_id").isin(user_ids)
        )
    if time_range:
        if "start" in time_range:
            conds.append(F.col("ts") >= time_range["start"])
        if "end" in time_range:
            conds.append(F.col("ts") <= time_range["end"])
    if confidence_min is not None:
        conds.append(F.col("confidence_score") >= confidence_min)
    if quality_min is not None:
        conds.append(F.col("face_quality") >= quality_min)
    if enrollment_groups:
        conds.append(F.col("enrollment_group").isin(enrollment_groups))
    out = df
    for c in conds:
        out = out.filter(c)
    return out
