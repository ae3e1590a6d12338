"""Property-based differential fuzz of the near-dup detector kernels
(``workload_dedup``): capped-Jaccard pairs, SimHash signatures, and
bit-sliced banded candidate generation, each against a pure-Python
replica of the documented semantics.

What the fixed-corpus oracles cannot cross and this fuzz does: the
DF_CAP stop-shingle cap actually ENGAGING (the sf fixtures never exceed
it), per-language shingle isolation, single-shingle short documents
(< 3 tokens), SimHash vote ties (sum == 0 ⇒ bit 0) and the
two's-complement sign bit, and the pigeonhole sharpness of 4×16-bit
banding (candidates == pairs agreeing on ≥1 band — a superset of every
Hamming ≤ 3 pair).  Reference behavior anchors: Broder shingling,
Charikar SimHash, Manku et al. WWW'07 banding.
"""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

# registry root first — see test_c4_fuzz.py on the latent import ordering
from robi_biometric_qdrant_vector_db_service_spark import workload as _workload  # noqa: F401
from robi_biometric_qdrant_vector_db_service_spark.workload_dedup import (
    JACCARD_T,
    SIMHASH_BANDS,
    SIMHASH_BAND_BITS,
    jaccard_pairs,
    simhash_banded_candidates,
    simhash_signatures,
)

WORDS = ["red", "blue", "green", "ox", "owl"]


def _r6(x: float) -> float:
    return float(Decimal(x).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def ref_shingles(text: str) -> set[str]:
    toks = text.split(" ")
    if len(toks) >= 3:
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
    return {" ".join(toks)}


def ref_jaccard_pairs(rows, df_cap: int) -> dict[tuple, float]:
    sh = {doc: ref_shingles(text) for doc, _, text in rows}
    lang = {doc: lg for doc, lg, _ in rows}
    df = Counter((lang[d], s) for d, ss in sh.items() for s in ss)
    kept = {d: {s for s in ss if df[(lang[d], s)] <= df_cap} for d, ss in sh.items()}
    out = {}
    docs = sorted(kept)
    for i, d1 in enumerate(docs):
        for d2 in docs[i + 1 :]:
            if lang[d1] != lang[d2]:
                continue
            inter = len(kept[d1] & kept[d2])
            if inter == 0:
                continue
            j = _r6(inter / (len(kept[d1]) + len(kept[d2]) - inter))
            if j >= JACCARD_T:
                out[(d1, d2)] = j
    return out


@settings(max_examples=10, deadline=None)
@given(
    texts=st.lists(
        st.lists(st.sampled_from(WORDS), min_size=1, max_size=8).map(" ".join),
        min_size=2,
        max_size=7,
    ),
    df_cap=st.sampled_from([1, 2, 64]),
)
def test_capped_jaccard_matches_reference(spark, texts, df_cap):
    rows = [(i, ["en", "de"][i % 2], t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    got = {
        (r["doc1"], r["doc2"]): r["jaccard"]
        for r in jaccard_pairs(df, df_cap=df_cap).collect()
    }
    assert got == ref_jaccard_pairs(rows, df_cap)


def ref_simhash(text: str) -> int:
    votes = [0] * 64
    for tok in text.split(" "):
        m = hashlib.md5(tok.encode()).hexdigest()
        h1, h2 = int(m[:8], 16), int(m[8:16], 16)
        for b in range(64):
            bit = (h1 >> b) & 1 if b < 32 else (h2 >> (b - 32)) & 1
            votes[b] += 1 if bit == 1 else -1
    sig = sum(1 << b for b in range(64) if votes[b] > 0)
    return sig - (1 << 64) if sig >= (1 << 63) else sig  # two's complement


@settings(max_examples=10, deadline=None)
@given(
    texts=st.lists(
        st.lists(st.sampled_from(WORDS), min_size=1, max_size=10).map(" ".join),
        min_size=1,
        max_size=6,
    )
)
def test_simhash_signature_matches_python_replica(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    got = {r["doc_id"]: r["simhash"] for r in simhash_signatures(df).collect()}
    assert got == {i: ref_simhash(t) for i, t in enumerate(texts)}


SIGS = st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1)


@settings(max_examples=10, deadline=None)
@given(sigs=st.lists(SIGS, min_size=2, max_size=10, unique=True))
def test_banded_candidates_are_exactly_the_band_collisions(spark, sigs):
    # plant a near pair: sig[0] with its lowest bit flipped (hamming 1)
    sigs = sigs + [sigs[0] ^ 1]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sigs)], "doc_id bigint, simhash bigint"
    )
    got = {
        (r["doc1"], r["doc2"])
        for r in simhash_banded_candidates(df).collect()
    }
    mask = (1 << SIMHASH_BAND_BITS) - 1
    u = [s & ((1 << 64) - 1) for s in sigs]

    def bands(x):
        return [(x >> (b * SIMHASH_BAND_BITS)) & mask for b in range(SIMHASH_BANDS)]

    exp = {
        (i, j)
        for i in range(len(sigs))
        for j in range(i + 1, len(sigs))
        if any(a == b for a, b in zip(bands(u[i]), bands(u[j])))
    }
    assert got == exp
    # pigeonhole: every Hamming <= SIMHASH_BANDS-1 pair is a candidate
    for i in range(len(sigs)):
        for j in range(i + 1, len(sigs)):
            if bin(u[i] ^ u[j]).count("1") <= SIMHASH_BANDS - 1:
                assert (i, j) in exp
