"""Recall of the approximate paths vs the exact engine — mirrors the
reference reporting Recall@10 vs ground truth
(PERFORMANCE_OPTIMIZATION_GUIDE.md:88; SURVEY §7 risk 4: never substitute
ANN output where exact results are expected, always measure)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from robi_biometric_qdrant_vector_db_service_spark.operators import ann
from robi_biometric_qdrant_vector_db_service_spark.operators.search import knn_search
from robi_biometric_qdrant_vector_db_service_spark.plans.strategy import choose_search_strategy
from robi_biometric_qdrant_vector_db_service_spark.sources.catalog import load_table
from tests.conftest import SF_SMOKE


def _setup(spark, k):
    corpus = load_table(spark, SF_SMOKE, "embeddings")
    probes = corpus.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    exact = {
        (r["q_id"], r["vec_id"]) for r in knn_search(corpus, probes, k=k).collect()
    }
    return corpus, probes, exact


def _recall(approx_rows, exact_pairs):
    hit = sum(1 for r in approx_rows if (r["q_id"], r["vec_id"]) in exact_pairs)
    return hit / len(exact_pairs)


def test_int8_rescore_recall(spark):
    """INT8 prescreen + 3× oversampled rescore keeps near-perfect recall —
    the property the reference claims for its quantized search (99.2%)."""
    corpus, probes, exact = _setup(spark, k=10)
    approx = ann.int8_rescore_topk(corpus, probes, k=10, oversample=3).collect()
    r = _recall(approx, exact)
    print(f"int8 rescore recall@10 = {r:.3f}")
    assert r >= 0.95


def test_matryoshka_rescore_recall_and_contract(spark):
    """MRL prefix-16/128 prescreen + 3× oversampled exact rescore: the
    surviving candidate pool comes from a coarse score, but every
    RETURNED score must be the exact full-dimension cosine (SURVEY §7
    risk 4 — approximation is a plan property, never a result property).
    Random fixtures have no matryoshka training, so a 16-dim prefix is a
    genuinely lossy prescreen — assert the mechanism (recall well above
    the 30/500 random-survivor floor) plus score exactness."""
    corpus, probes, exact = _setup(spark, k=10)
    approx = ann.matryoshka_rescore_topk(
        corpus, probes, k=10, prefix_dims=16, oversample=3
    ).collect()
    r = _recall(approx, exact)
    print(f"matryoshka rescore recall@10 (prefix 16/128) = {r:.3f}")
    assert r >= 0.25  # random-survivor floor is ~0.06 (30/500)
    import numpy as np

    emb = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
           for r in corpus.collect()}
    for row in approx:
        a, b = emb[row["q_id"]], emb[row["vec_id"]]
        ref = float(a @ b / max(np.linalg.norm(a), 1e-12)
                    / max(np.linalg.norm(b), 1e-12))
        assert ref == pytest.approx(row["score"], abs=1e-6)
    with pytest.raises(ValueError, match="prefix_dims"):
        ann.matryoshka_rescore_topk(corpus, probes, prefix_dims=0)


def test_bitext_margin_model(spark):
    """bitext_margin_pairs equals a direct NumPy implementation of the
    CCMatrix margin on a synthetic pool: same k-NN sets, same averages,
    same best-match + threshold gate — including the hub-suppression
    property the raw-cosine baseline lacks (a vector close to everything
    gets a LARGE neighborhood average, hence margins near 1, and is not
    mined)."""
    import numpy as np

    from robi_biometric_qdrant_vector_db_service_spark.operators.ann import (
        bitext_margin_pairs,
    )

    rng = np.random.default_rng(11)
    ns, nt, k = 12, 14, 3
    S = rng.normal(size=(ns, 8))
    T = rng.normal(size=(nt, 8))
    T[0] = 0.9 * S[3] + 0.1 * rng.normal(size=8)  # one planted translation
    Sn = S / np.linalg.norm(S, axis=1, keepdims=True)
    Tn = T / np.linalg.norm(T, axis=1, keepdims=True)
    cos = Sn @ Tn.T
    a_src = np.sort(cos, axis=1)[:, -k:].sum(axis=1) / k
    a_tgt = np.sort(cos, axis=0)[-k:, :].sum(axis=0) / k
    margin = cos / ((a_src[:, None] + a_tgt[None, :]) / 2)
    want = {}
    for i in range(ns):
        j = int(np.argmax(margin[i]))
        if margin[i, j] > 1.0:
            want[(i, j)] = margin[i, j]

    src = spark.createDataFrame(
        [(i, [float(v) for v in S[i]]) for i in range(ns)],
        "src_id bigint, src_emb array<double>",
    )
    tgt = spark.createDataFrame(
        [(j, [float(v) for v in T[j]]) for j in range(nt)],
        "tgt_id bigint, tgt_emb array<double>",
    )
    got = {
        (r["src_id"], r["tgt_id"]): r["margin"]
        for r in bitext_margin_pairs(src, tgt, k=k, threshold=1.0).collect()
    }
    assert set(got) == set(want)
    for key, m in want.items():
        assert got[key] == pytest.approx(m, abs=1e-6)
    assert (3, 0) in got  # the planted translation is mined
    with pytest.raises(ValueError, match="k must be"):
        bitext_margin_pairs(src, tgt, k=0)


def test_bitext_margin_tiny_pool_divides_by_actual_count(spark):
    """With a counterpart pool SMALLER than k the neighborhood average
    divides by the actual neighbor count, not the constant k — dividing
    by k would deflate the average and inflate every margin, silently
    over-mining pairs (ADVICE r17)."""
    import numpy as np

    from robi_biometric_qdrant_vector_db_service_spark.operators.ann import (
        bitext_margin_pairs,
    )

    rng = np.random.default_rng(7)
    ns, nt, k = 5, 2, 4  # tgt pool (2) < k (4)
    S = rng.normal(size=(ns, 6))
    T = rng.normal(size=(nt, 6))
    Sn = S / np.linalg.norm(S, axis=1, keepdims=True)
    Tn = T / np.linalg.norm(T, axis=1, keepdims=True)
    cos = Sn @ Tn.T
    # src side averages over min(k, nt)=2 neighbors; tgt side over
    # min(k, ns)=4
    a_src = np.sort(cos, axis=1)[:, -min(k, nt):].mean(axis=1)
    a_tgt = np.sort(cos, axis=0)[-min(k, ns):, :].mean(axis=0)
    margin = cos / ((a_src[:, None] + a_tgt[None, :]) / 2)
    want = {}
    for i in range(ns):
        j = int(np.argmax(margin[i]))
        if margin[i, j] > 1.0:
            want[(i, j)] = margin[i, j]

    src = spark.createDataFrame(
        [(i, [float(v) for v in S[i]]) for i in range(ns)],
        "src_id bigint, src_emb array<double>",
    )
    tgt = spark.createDataFrame(
        [(j, [float(v) for v in T[j]]) for j in range(nt)],
        "tgt_id bigint, tgt_emb array<double>",
    )
    got = {
        (r["src_id"], r["tgt_id"]): r["margin"]
        for r in bitext_margin_pairs(src, tgt, k=k, threshold=1.0).collect()
    }
    assert set(got) == set(want)
    for key, m in want.items():
        assert got[key] == pytest.approx(m, abs=1e-6)


def test_bitext_lsh_model(spark):
    """bitext_margin_pairs_lsh equals a direct NumPy implementation of
    bucket → candidate edges → top-min(k, degree) neighborhood averages
    → margin → best-match gate, including that a planted translation
    sharing its source's sign bucket is mined and that NO mined pair
    crosses buckets (candidates are an equi-join, never a cross
    product)."""
    import numpy as np

    from robi_biometric_qdrant_vector_db_service_spark.operators.ann import (
        bitext_margin_pairs_lsh,
    )

    rng = np.random.default_rng(23)
    ns, nt, k, nbits = 14, 16, 3, 4
    S = rng.normal(size=(ns, 8))
    T = rng.normal(size=(nt, 8))
    T[0] = 0.9 * S[3] + 0.05 * rng.normal(size=8)
    T[0][: nbits] = np.abs(T[0][: nbits])  # force same sign bucket
    S[3][: nbits] = np.abs(S[3][: nbits])

    def bucket(v):
        return sum((1 << d) for d in range(nbits) if v[d] >= 0)

    Sn = S / np.linalg.norm(S, axis=1, keepdims=True)
    Tn = T / np.linalg.norm(T, axis=1, keepdims=True)
    cos = Sn @ Tn.T
    sb = [bucket(S[i]) for i in range(ns)]
    tb = [bucket(T[j]) for j in range(nt)]
    edges = [(i, j) for i in range(ns) for j in range(nt) if sb[i] == tb[j]]
    a_src, a_tgt = {}, {}
    for i in range(ns):
        cands = sorted((cos[i, j] for (x, j) in edges if x == i), reverse=True)
        if cands:
            top = cands[: k]
            a_src[i] = sum(top) / len(top)
    for j in range(nt):
        cands = sorted((cos[i, j] for (i, y) in edges if y == j), reverse=True)
        if cands:
            top = cands[: k]
            a_tgt[j] = sum(top) / len(top)
    want = {}
    for i in range(ns):
        best = None
        for (x, j) in edges:
            if x != i:
                continue
            m = cos[i, j] / ((a_src[i] + a_tgt[j]) / 2)
            if best is None or m > best[1] or (m == best[1] and j < best[0]):
                best = (j, m)
        if best and best[1] > 1.0:
            want[(i, best[0])] = best[1]

    src = spark.createDataFrame(
        [(i, [float(v) for v in S[i]]) for i in range(ns)],
        "src_id bigint, src_emb array<double>",
    )
    tgt = spark.createDataFrame(
        [(j, [float(v) for v in T[j]]) for j in range(nt)],
        "tgt_id bigint, tgt_emb array<double>",
    )
    got = {
        (r["src_id"], r["tgt_id"]): r["margin"]
        for r in bitext_margin_pairs_lsh(
            src, tgt, k=k, threshold=1.0, nbits=nbits
        ).collect()
    }
    assert set(got) == set(want)
    for key, m in want.items():
        assert got[key] == pytest.approx(m, abs=1e-6)
    for (i, j) in got:
        assert sb[i] == tb[j]  # no mined pair crosses buckets
    if (3, 0) in want:  # planted translation shares the bucket by construction
        assert (3, 0) in got


def test_ivf_recall(spark):
    corpus, probes, exact = _setup(spark, k=5)
    approx = ann.ivf_topk(corpus, probes, k=5, nprobe=2).collect()
    r = _recall(approx, exact)
    print(f"ivf recall@5 (nprobe=2/10 cells) = {r:.3f}")
    # fixtures have NO cluster structure (random unit vectors), so IVF recall
    # ~ nprobe/ncells; assert the mechanism works, not clustering magic
    assert r > 0.05


def test_signlsh_recall(spark):
    corpus, probes, exact = _setup(spark, k=5)
    approx = ann.signlsh_topk(corpus, probes, k=5, nbits=6).collect()
    r = _recall(approx, exact)
    print(f"sign-lsh recall@5 (64 buckets) = {r:.3f}")
    assert r > 0.02


def test_strategy_policy():
    assert choose_search_strategy(500, 10).is_exact
    assert choose_search_strategy(19_999, 10).is_exact
    big = choose_search_strategy(10_000_000, 10)
    assert big.strategy == "signlsh" and 2 <= big.nbits <= 9


def test_minhash_lsh_recall(spark):
    """LSH candidate generation must retain the high-jaccard pairs found by
    the exhaustive detector (8 bands × 2 rows → P(candidate|j=0.5) ≈ 0.90)."""
    from robi_biometric_qdrant_vector_db_service_spark.workload import REGISTRY

    exact = {
        (r["doc1"], r["doc2"])
        for r in REGISTRY["ngram_jaccard_dups"].run(spark, SF_SMOKE).collect()
        if r["jaccard"] >= 0.5
    }
    lsh = {
        (r["doc1"], r["doc2"])
        for r in REGISTRY["minhash_lsh_dups"].run(spark, SF_SMOKE).collect()
    }
    if exact:
        rec = len(exact & lsh) / len(exact)
        print(f"minhash-lsh recall@j>=0.5 = {rec:.3f} ({len(exact)} true pairs)")
        assert rec >= 0.8


def test_gemm_knn_equals_exact(spark):
    """The GEMM physical plan must return EXACTLY the exact plan's rows —
    same fold arithmetic, same tiebreaks, different execution strategy."""
    from robi_biometric_qdrant_vector_db_service_spark.operators.pairscan import gemm_knn

    corpus, probes, _ = _setup(spark, k=10)
    exact = sorted(map(tuple, knn_search(corpus, probes, k=10).collect()))
    gemm = sorted(map(tuple, gemm_knn(corpus, probes, k=10).collect()))
    assert exact == gemm


def test_gemm_knn_rejects_corpus_sized_probe_side(spark, monkeypatch):
    """The probe batch is driver-collected request state: a mis-sized probe
    table must fail fast with a clear contract error, not OOM the driver."""
    from robi_biometric_qdrant_vector_db_service_spark.operators import pairscan

    corpus, probes, _ = _setup(spark, k=10)
    monkeypatch.setattr(pairscan, "MAX_PROBE_ROWS", 3)
    with pytest.raises(ValueError, match="MAX_PROBE_ROWS"):
        pairscan.gemm_knn(corpus, probes, k=10)


def test_kmeans_ivf_recall(spark):
    """IVF over the Lloyd's-built codebook: probing 3 of 8 cells must keep
    reasonable recall vs the exact engine (and be deterministic per run)."""
    corpus, probes, exact = _setup(spark, k=10)
    a1 = ann.kmeans_ivf_topk(corpus, probes, k=10, n_cells=8, nprobe=3).collect()
    a2 = ann.kmeans_ivf_topk(corpus, probes, k=10, n_cells=8, nprobe=3).collect()
    assert sorted(map(tuple, a1)) == sorted(map(tuple, a2))
    r = _recall(a1, exact)
    print(f"kmeans ivf recall@10 = {r:.3f}")
    assert r >= 0.5


def test_adaptive_routes_to_ann_above_threshold(spark):
    """Above full_scan_threshold (20k, settings.py:55) smart_search must
    switch to the bucketed path and still find most true neighbors."""
    from pyspark.sql import functions as F

    from robi_biometric_qdrant_vector_db_service_spark.plans.strategy import smart_search

    n = 25_000
    corpus = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(1, 16), i -> CAST(sin(CAST(id AS DOUBLE) * i) AS DOUBLE))"
        ).alias("embedding"),
    )
    probes = corpus.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    approx = smart_search(corpus, probes, k=5).collect()
    exact = {
        (r["q_id"], r["vec_id"])
        for r in knn_search(corpus, probes, k=5).collect()
    }
    assert len(approx) <= 4 * 5
    # every probe must at least retrieve itself from its own bucket
    self_hits = {(r["q_id"], r["vec_id"]) for r in approx if r["q_id"] == r["vec_id"]}
    assert len(self_hits) == 4
    r = _recall(approx, exact)
    print(f"adaptive(signlsh) recall@5 at n=25k: {r:.3f}")
    assert r > 0.1


def test_pq_adc_recall_and_exact_scores(spark):
    """PQ-ADC candidates + exact rescore: recall is bounded by how well the
    8×16 codebook preserves cosine ordering at 4× oversample, and every
    RETURNED score must equal the exact engine's score for that pair (the
    rescore stage uses the same cosine — approximation may drop pairs, it
    must never perturb scores)."""
    from robi_biometric_qdrant_vector_db_service_spark.operators.pq import pq_adc_topk

    from robi_biometric_qdrant_vector_db_service_spark.functions.vector import cosine_sql

    corpus, probes, exact = _setup(spark, k=10)
    all_pairs = corpus.crossJoin(probes).select(
        "q_id",
        "vec_id",
        F.round(F.expr(cosine_sql("embedding", "q_emb")), 6).alias("score"),
    )
    exact_scores = {
        (r["q_id"], r["vec_id"]): r["score"] for r in all_pairs.collect()
    }
    approx = pq_adc_topk(corpus, probes, k=10).collect()
    r = _recall(approx, exact)
    print(f"pq adc recall@10 (m=8, ksub=16, 4x oversample) = {r:.3f}")
    assert r >= 0.5
    for row in approx:
        assert row["score"] == exact_scores[(row["q_id"], row["vec_id"])]


def test_pq_codes_shape(spark):
    """Every vector encodes to exactly m codes in [0, ksub)."""
    from robi_biometric_qdrant_vector_db_service_spark.operators.pq import pq_codebooks, pq_encode

    corpus = load_table(spark, SF_SMOKE, "embeddings")
    cents = pq_codebooks(corpus, m=8, ksub=16, dim=64)
    codes = pq_encode(corpus, cents, m=8, dim=64)
    bad = codes.filter(
        (F.size("codes") != 8)
        | F.exists("codes", lambda c: (c < 0) | (c >= 16))
    ).count()
    assert bad == 0
    assert codes.count() == corpus.count()


def test_ivfpq_recall_and_contract(spark):
    """IVF+PQ composed search: candidates come only from probed cells, the
    ADC stage never touches float vectors, survivors are exactly rescored.
    Recall vs exact is bounded below by the IVF cell pruning (random
    fixtures have no cluster structure), so assert the mechanism: results
    ⊆ probed cells, scores are exact cosines, recall within the probed
    cells is high."""
    from robi_biometric_qdrant_vector_db_service_spark.operators.pq import ivfpq_topk

    corpus, probes, exact = _setup(spark, k=10)
    got = ivfpq_topk(corpus, probes, k=10, nprobe=2).collect()
    assert len(got) > 0
    # exact-score contract: every returned score equals the true cosine
    by_pair = {(r.q_id, r.vec_id): r.score for r in got}
    chk = knn_search(corpus, probes, k=100).collect()
    truth = {(r.q_id, r.vec_id): r.score for r in chk}
    for p, s in by_pair.items():
        if p in truth:
            assert abs(truth[p] - s) < 1e-9, (p, s, truth[p])
    # recall vs the IVF-exact path (same cells, no PQ): PQ + 4x oversample
    # rescore should recover most of what cell pruning leaves reachable
    ivf_exact = {
        (r["q_id"], r["vec_id"])
        for r in ann.ivf_topk(corpus, probes, k=10, nprobe=2).collect()
    }
    hit = sum(1 for p in by_pair if p in ivf_exact)
    rec = hit / len(ivf_exact)
    print(f"ivfpq recall@10 vs ivf-exact (same cells) = {rec:.3f}")
    assert rec >= 0.7


def test_bq_packing_matches_numpy(spark):
    """The sign-bit word packing (bq_words_expr) is bit-identical to the
    NumPy reference packing — per 32-bit word, bit i set iff x[w*32+i] > 0."""
    import numpy as np

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((20, 64)).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<float>",
    )
    got = {
        r.vec_id: r.code
        for r in df.select(
            "vec_id", F.expr(ann.bq_words_expr("embedding", 64)).alias("code")
        ).collect()
    }
    for i, v in enumerate(vecs):
        bits = (v > 0).astype(np.int64)
        want = [int((bits[w * 32:(w + 1) * 32] << np.arange(32)).sum()) for w in range(2)]
        assert got[i] == want, i


def test_bq_hamming_recall(spark):
    """BQ prescreen (1 bit/dim) + 4× oversampled exact rescore holds
    useful recall on the fixture corpus — and stays deterministic."""
    corpus, probes, exact = _setup(spark, k=10)
    approx = ann.bq_hamming_topk(corpus, probes, k=10, oversample=4).collect()
    r = _recall(approx, exact)
    print(f"bq hamming recall@10 = {r:.3f}")
    assert r >= 0.5  # 1-bit codes are the recall floor of the quant family
    again = ann.bq_hamming_topk(corpus, probes, k=10, oversample=4).collect()
    assert sorted(map(tuple, approx)) == sorted(map(tuple, again))
