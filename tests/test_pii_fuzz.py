"""Property-based differential fuzz of the PII scrub frame
(``workload_pipeline.pii_scrub_frame``): random texts with planted
emails, phone numbers, and structured NEAR-misses (double @, missing
TLD, short area code) against a pure-Python replica — Python ``re`` on
the identical pattern literals (the Java-regex ∩ RE2 ∩ Python-re common
dialect the module pins), ``hashlib.md5`` for the redaction
fingerprint, and the same deterministic doc_id-residue augmentation.

What this crosses that the fixed-corpus oracle cannot: match counts > 1
per document, matches adjacent to the planted augmentation, redaction
order (phones first, then emails — an email containing digits must not
be half-redacted), and the matched-docs-only output filter.
"""

from __future__ import annotations

import hashlib
import re

from hypothesis import given, settings
from hypothesis import strategies as st

from robi_biometric_qdrant_vector_db_service_spark.workload_pipeline import (
    PII_EMAIL_RE,
    PII_PHONE_RE,
    pii_scrub_frame,
)

FRAGMENTS = [
    "plain words here",
    "alice.b+tag@mail.example.org",
    "x@y.io",
    "not..an@@email.com",      # double @: 'an@@email.com' still has no match? fuzz decides
    "user@nodot",               # no TLD: no match
    "+1-415-555-0000",
    "+1-41-555-0000",           # short area code: no match
    "call +1-202-555-1234 or mail bob@corp.net",
    "trailing dot b@x.co.",
]


def ref_rows(rows: list[tuple[int, str]]) -> dict[int, tuple]:
    out = {}
    for doc_id, text in rows:
        t = text
        if doc_id % 7 == 0:
            t += f" contact user{doc_id}@example.com now"
        if doc_id % 11 == 0:
            t += f" call +1-202-555-{doc_id % 10000:04d} today"
        n_e = len(re.findall(PII_EMAIL_RE, t))
        n_p = len(re.findall(PII_PHONE_RE, t))
        if n_e + n_p == 0:
            continue
        red = re.sub(PII_EMAIL_RE, "[EMAIL]", re.sub(PII_PHONE_RE, "[PHONE]", t))
        out[doc_id] = (n_e, n_p, hashlib.md5(red.encode()).hexdigest())
    return out


@settings(max_examples=12, deadline=None)
@given(
    texts=st.lists(
        st.lists(st.sampled_from(FRAGMENTS), min_size=1, max_size=4).map(" ".join),
        min_size=2,
        max_size=8,
    ),
    id_base=st.integers(min_value=0, max_value=80),
)
def test_pii_scrub_matches_python_re_replica(spark, texts, id_base):
    # ids straddle the %7 / %11 augmentation residues as id_base varies
    rows = [(id_base + 3 * i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (r["n_emails"], r["n_phones"], r["redacted_fp"])
        for r in pii_scrub_frame(df).collect()
    }
    assert got == ref_rows(rows)
