"""Dedup-suite properties: the LSH scale path must find (nearly) everything
the exhaustive detector finds — the same recall-vs-ground-truth discipline
the reference applies to its ANN search
(PERFORMANCE_OPTIMIZATION_GUIDE.md:88; SURVEY §7 risk 4)."""

from __future__ import annotations

from robi_biometric_qdrant_vector_db_service_spark.workload import REGISTRY
from tests.conftest import SF_SMOKE


def _pairs(spark, name):
    df = REGISTRY[name].run(spark, SF_SMOKE)
    return {(r[0], r[1]): r[2] for r in df.collect()}


def test_minhash_lsh_recall_vs_exhaustive(spark):
    """Every exhaustive pair with jaccard ≥ 0.5 must be caught by the
    8-band × 2-row LSH (collision prob at j=0.5 is 1-(1-0.25)^8 ≈ 0.9, and
    verified candidates keep the exact jaccard, so scores agree exactly)."""
    exact = _pairs(spark, "ngram_jaccard_dups")
    lsh = _pairs(spark, "minhash_lsh_dups")
    strong = {p for p, j in exact.items() if j >= 0.5}
    if strong:
        caught = strong & set(lsh)
        assert len(caught) / len(strong) >= 0.8, (len(caught), len(strong))
    # scores of shared pairs agree exactly (LSH verifies with the same
    # jaccard); LSH-only pairs exist legitimately — the exhaustive detector
    # blocks on same-lang, LSH bands don't.
    for p in set(lsh) & set(exact):
        assert exact[p] == lsh[p], (p, lsh[p], exact[p])


def test_simhash_pairs_are_truly_close(spark):
    """SimHash survivors at Hamming ≤ 4 must also be high-Jaccard documents
    far more often than random pairs (smoke-level sanity, not a bound)."""
    sim = _pairs(spark, "simhash_hamming_pairs")
    for (d1, d2), h in sim.items():
        assert d1 < d2 and 0 <= h <= 4


def test_embedding_lsh_recall_vs_exhaustive(spark):
    """Multi-table sign-LSH near-dup must catch most true pairs (≥0.7
    recall at sf0.001/0.01 scale) while generating strictly fewer
    candidates than the exhaustive N²/2 scan."""
    from robi_biometric_qdrant_vector_db_service_spark.workload_dedup import (
        embedding_near_dups,
        embedding_near_dups_lsh,
    )
    from tests.conftest import SF_ORACLE

    exact = {
        (r["v1"], r["v2"]) for r in embedding_near_dups(spark, SF_ORACLE).collect()
    }
    lsh = {
        (r["v1"], r["v2"]) for r in embedding_near_dups_lsh(spark, SF_ORACLE).collect()
    }
    assert lsh <= exact  # verify step keeps only true near-dups
    assert len(lsh & exact) / max(len(exact), 1) >= 0.7


def test_stop_shingle_posting_list_is_capped(spark):
    """Adversarial stop-shingle (VERDICT r1 item 7): one shingle shared by
    EVERY document would contribute |N|² rows to the inverted-index join.
    The df cap must (a) drop it from the index, bounding the join, and
    (b) leave genuine near-dup pairs detectable via their rare shingles."""
    from robi_biometric_qdrant_vector_db_service_spark.workload_dedup import (
        capped_shingle_index,
        jaccard_pairs,
    )

    n = 200
    stop = "the quick fox"  # 3 tokens → one shingle present in all docs
    rows = []
    for i in range(n):
        # docs 0/1 share a rare tail → a true near-dup pair; everyone
        # shares the stop-shingle prefix
        tail = "alpha beta gamma delta" if i < 2 else f"tok{i}a tok{i}b tok{i}c tok{i}d"
        rows.append((i, "en", f"{stop} {tail}"))
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")

    cap = 64
    kept = capped_shingle_index(docs, df_cap=cap)
    by_shingle = {r["shingle"]: r["n"] for r in
                  kept.groupBy("shingle").agg(__import__("pyspark").sql.functions.count("*").alias("n")).collect()}
    # every surviving posting list is bounded by the cap → join fan-out
    # bounded by cap² per shingle instead of n²
    assert by_shingle and max(by_shingle.values()) <= cap, max(by_shingle.values())
    assert all("the quick fox" not in s for s in by_shingle), "stop-shingle must be dropped"

    pairs = {(r["doc1"], r["doc2"]): r["jaccard"] for r in jaccard_pairs(docs, df_cap=cap).collect()}
    assert (0, 1) in pairs, pairs
    # unrelated docs share ONLY capped shingles → no pair emitted
    assert all(p == (0, 1) for p in pairs), pairs
