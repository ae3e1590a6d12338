"""Local replica of the driver's t2 correctness gate: run each registry
query on Spark AND its oracle SQL on DuckDB over the same parquet, compare
row count, column names, and the order-insensitive multiset of values
(columns sorted by name — mirrors CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import duckdb

from robi_biometric_qdrant_vector_db_service_spark.sources.catalog import TABLES


def _canon(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    return v


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def run_pair(spark, spec, sf_dir: str):
    sdf = spec.run(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r[c] for c in sorted(s_cols)) for r in sdf.collect()]

    con = duck_con(sf_dir)
    res = con.execute(spec.oracle)
    d_cols = [d[0] for d in res.description]
    d_raw = res.fetchall()
    idx = [d_cols.index(c) for c in sorted(d_cols)]
    d_rows = [tuple(r[i] for i in idx) for r in d_raw]
    con.close()
    return s_cols, s_rows, d_cols, d_rows


def value_hash(cols, rows) -> str:
    """Order-insensitive md5 over the canonicalized row multiset with both
    the column-name list AND each row's values in sorted-column order —
    the offline cross-check token CORRECTNESS_LOCAL_r{N}.json records per
    query (r12 VERDICT item 5) so a judge can compare the local replica's
    values against the driver's rows without re-running.

    Contract (ADVICE r13): ``rows`` are tuples aligned with ``cols`` in
    whatever order the caller has them; the permutation to sorted-column
    order happens HERE, so two callers holding the same data in different
    column orders derive the same hash."""
    import hashlib

    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(
        (tuple(_canon(r[i]) for i in idx) for r in rows), key=repr
    )
    payload = repr((sorted(cols), canon)).encode()
    return hashlib.md5(payload).hexdigest()


def check(spark, name: str, spec, sf_dir: str, out: dict | None = None) -> list[str]:
    """Returns a list of mismatch descriptions (empty == pass).  When
    ``out`` is given, records the Spark-side value hash + row count."""
    errs: list[str] = []
    s_cols, s_rows, d_cols, d_rows = run_pair(spark, spec, sf_dir)
    if out is not None:
        # s_rows come from run_pair in sorted-column order — pass the
        # matching sorted name list so value_hash's internal permutation
        # is the identity (same alignment contract either way)
        out["hash"] = value_hash(sorted(s_cols), s_rows)
        out["rows"] = len(s_rows)
    if sorted(s_cols) != sorted(d_cols):
        errs.append(f"{name}: columns differ spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return errs
    if len(s_rows) != len(d_rows):
        errs.append(f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}")
    s_set = sorted((tuple(_canon(v) for v in r) for r in s_rows), key=repr)
    d_set = sorted((tuple(_canon(v) for v in r) for r in d_rows), key=repr)
    if s_set != d_set:
        diff_s = [r for r in s_set if r not in d_set][:3]
        diff_d = [r for r in d_set if r not in s_set][:3]
        errs.append(
            f"{name}: value mismatch (cols={sorted(s_cols)}); "
            f"spark-only={diff_s} duck-only={diff_d}"
        )
    return errs
