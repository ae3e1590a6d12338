"""Property-based differential fuzz of the MinHash signature expressions
(``workload_dedup.SPARK_MINHASHES`` over ``spark_hash``): the md5 →
first-8-hex-chars → mod-P shingle id and the 16 deterministic affine
minima, against a pure-Python hashlib replica.

These expression strings are the shared hash core of batch MinHash-LSH
(``minhash_lsh_dups``), the streaming near-dup gate
(``streaming/neardup.py``), and their DuckDB oracle twins
(``DUCK_MINHASHES``) — the twin-spelling claim ("same values, 16× the
hashing") is exactly what an independent replica can falsify.  The fuzz
feeds arbitrary shingle strings (unicode included) and asserts all 16
signature components bit-equal per row.
"""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# registry root first — see test_c4_fuzz.py on the latent import ordering
from robi_biometric_qdrant_vector_db_service_spark import workload as _workload  # noqa: F401
from robi_biometric_qdrant_vector_db_service_spark.workload_dedup import (
    MINHASH_AB,
    P,
    SPARK_MINHASHES,
)


def py_hash(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % P


def ref_signature(shingles: list[str]) -> list[int]:
    hs = [py_hash(s) for s in shingles]
    return [min((a * h + b) % P for h in hs) for a, b in MINHASH_AB]


SHINGLE = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_characters="\x00"  # Spark strings are NUL-free UTF-8
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=12, deadline=None)
@given(
    docs=st.lists(
        st.lists(SHINGLE, min_size=1, max_size=6, unique=True),
        min_size=1,
        max_size=5,
    )
)
def test_minhash_signature_matches_hashlib_replica(spark, docs):
    df = spark.createDataFrame(
        [(i, sh) for i, sh in enumerate(docs)], "doc_id bigint, sh array<string>"
    )
    exprs = [F.expr(e).alias(f"m{j}") for j, e in enumerate(SPARK_MINHASHES)]
    got = {
        r["doc_id"]: [r[f"m{j}"] for j in range(len(SPARK_MINHASHES))]
        for r in df.select("doc_id", *exprs).collect()
    }
    assert got == {i: ref_signature(sh) for i, sh in enumerate(docs)}
