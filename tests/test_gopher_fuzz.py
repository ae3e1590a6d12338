"""Property-based differential fuzz of the Gopher quality gate
(``workload_text.gopher_frame``): random word mixes engineered to
straddle every rule boundary (word-count band 30–90, mean-word-length
band 4.2–10.0, ≥2 stop-word hits, ≥0.8 alphabetic fraction) against a
pure-Python replica — completing the quality-gate trio's fuzz coverage
(C4: test_c4_fuzz, CCNet: oracle-checked histogram cutoffs).

The replica applies the filter on the UNROUNDED metrics (the engine
filters before the 4 dp display round — the subtle part worth pinning)
and treats ``rlike '[a-z]'`` as contains-an-ascii-lowercase, matching
the Catalyst predicate.  Reference behavior anchor: Rae et al. 2021
§A1.1.
"""

from __future__ import annotations

import re
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

# registry root first — see test_c4_fuzz.py on the latent import ordering
from robi_biometric_qdrant_vector_db_service_spark import workload as _workload  # noqa: F401
from robi_biometric_qdrant_vector_db_service_spark.workload_text import (
    STOPWORDS,
    gopher_frame,
)

# mix engineered to straddle each band: stopwords (len 1-3 pull mwl down),
# mid/long alpha words, a 10-char word, caps-only and digit words (alpha
# misses), so 20-100-word docs land on both sides of every rule
POOL = list(STOPWORDS) + [
    "hello", "worlds", "quality", "absolutely", "documents",
    "XYZQW", "12345", "ox",
]


def _r4(x: float) -> float:
    return float(Decimal(x).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP))


def ref_rows(rows) -> dict[int, tuple]:
    out = {}
    for doc_id, lang, text in rows:
        words = text.split(" ")
        n = len(words)
        mwl = sum(len(w) for w in words) / n
        n_stop = sum(w in STOPWORDS for w in words)
        alpha = sum(bool(re.search("[a-z]", w)) for w in words) / n
        if 30 <= n <= 90 and 4.2 <= mwl <= 10.0 and n_stop >= 2 and alpha >= 0.8:
            out[doc_id] = (lang, n, _r4(mwl), n_stop, _r4(alpha))
    return out


@settings(max_examples=12, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(POOL), min_size=20, max_size=100).map(" ".join),
        min_size=1,
        max_size=6,
    )
)
def test_gopher_gate_matches_python_replica(spark, docs):
    rows = [(i, ["en", "de"][i % 2], t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    got = {
        r["doc_id"]: (
            r["lang"], r["n_words"], r["mean_word_len"], r["n_stop"], r["alpha_frac"]
        )
        for r in gopher_frame(df).collect()
    }
    assert got == ref_rows(rows)
