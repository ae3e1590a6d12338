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
    """SimHash survivors must sit inside the Hamming ball (≤ 3 over the
    64-bit signature) with ordered doc ids."""
    sim = _pairs(spark, "simhash_hamming_pairs")
    for (d1, d2), h in sim.items():
        assert d1 < d2 and 0 <= h <= 3


def test_simhash_band_bucket_cardinality(spark):
    """Scale-proofing the banding layout (VERDICT r5 item 1): 4 disjoint
    16-bit bands ⇒ bucket domain is exactly 2¹⁶ per band, and the top band
    (bits 48-63, crossing the sign bit) must use the full domain — a
    sign-extension bug would leak values outside [0, 65535]."""
    from pyspark.sql import functions as F

    from robi_biometric_qdrant_vector_db_service_spark.workload_dedup import (
        SIMHASH_BAND_BITS,
        SIMHASH_BANDS,
        simhash_banded_candidates,
    )

    assert SIMHASH_BANDS == 4 and SIMHASH_BAND_BITS == 16
    # signatures covering both sign-bit states, including min/max longs
    sig = spark.createDataFrame(
        [(1, -9223372036854775808), (2, 9223372036854775807), (3, -1), (4, 0)],
        "doc_id long, simhash long",
    )
    mask = (1 << SIMHASH_BAND_BITS) - 1
    banded = sig.select(
        "simhash",
        F.explode(F.array(*[F.lit(i) for i in range(SIMHASH_BANDS)])).alias("band"),
    ).withColumn("bucket", F.expr(f"(simhash >> (band * {SIMHASH_BAND_BITS})) & {mask}"))
    rows = banded.collect()
    assert len(rows) == 4 * SIMHASH_BANDS
    for r in rows:
        assert 0 <= r["bucket"] <= mask, r
    # -1 (all bits set) must land in bucket 65535 in every band
    assert all(r["bucket"] == mask for r in rows if r["simhash"] == -1)
    # the candidate path agrees with itself: identical signatures collide
    pairs = simhash_banded_candidates(
        spark.createDataFrame([(1, 42), (2, 42)], "doc_id long, simhash long")
    ).collect()
    assert len(pairs) == 1 and pairs[0]["doc1"] == 1 and pairs[0]["doc2"] == 2


def test_simhash_wide_bands_prune_candidates(spark):
    """The reason for 16-bit bands: on a corpus of mutually-distant
    signatures, 2¹⁶ buckets/band produce near-zero spurious candidates
    while 7-bit bands (the old 32-bit layout's 128 buckets) collide
    constantly.  True pairs (Hamming ≤ 3) are caught by both."""
    import random

    from robi_biometric_qdrant_vector_db_service_spark.workload_dedup import (
        simhash_banded_candidates,
    )

    rng = random.Random(7)
    n = 1500
    rows = [(i, rng.getrandbits(64) - (1 << 63)) for i in range(n)]
    # plant one true near-dup pair: flip 2 bits of doc 0's signature
    rows.append((n, rows[0][1] ^ 0b101))
    sig = spark.createDataFrame(rows, "doc_id long, simhash long")
    wide = simhash_banded_candidates(sig, n_bands=4, band_bits=16).count()
    narrow = simhash_banded_candidates(sig, n_bands=5, band_bits=7).count()
    # narrow bands: each of 5 bands buckets 1501 docs into ≤128 buckets →
    # expected collisions ~5 * C(1501,2)/128 ≈ 44k; wide bands: ~4 * C/65536 ≈ 69
    assert wide < narrow / 50, (wide, narrow)
    # the planted pair must be among the wide-band candidates
    planted = (
        simhash_banded_candidates(sig, n_bands=4, band_bits=16)
        .filter("doc1 = 0 AND doc2 = %d" % n)
        .count()
    )
    assert planted == 1


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


def test_hi_threshold_lsh_recall_and_candidate_fraction(spark):
    """Production operating point (cos >= 0.85, VERDICT r5 item 7): the
    fixture has no true pairs at this bar (max cos ~ 0.51), so plant 50
    jittered duplicates (cos ~ 0.93-0.97) and require recall >= 0.9 while
    the banding generates <= 5% of the N²/2 candidate pairs."""
    import numpy as np
    from pyspark.sql import functions as F

    from robi_biometric_qdrant_vector_db_service_spark.sources.catalog import load_table
    from robi_biometric_qdrant_vector_db_service_spark.workload_dedup import (
        HI_COSINE_T,
        HI_LSH_DIMS,
        sign_lsh_near_dups,
    )
    from tests.conftest import SF_ORACLE

    emb = load_table(spark, SF_ORACLE, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    E = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = np.array([r["vec_id"] for r in rows])
    n, d = E.shape
    rng = np.random.default_rng(5)
    idx = rng.choice(n, 50, replace=False)
    noise = (
        rng.standard_normal((50, d))
        * 0.33
        * np.linalg.norm(E[idx], axis=1)[:, None]
        / np.sqrt(d)
    )
    dup = E[idx] + noise
    base = int(ids.max()) + 1
    planted = spark.createDataFrame(
        [(int(base + i), [float(x) for x in dup[i]]) for i in range(50)]
        + [(int(ids[i]), [float(x) for x in E[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    # ground truth: exact cosine of every planted copy vs its source
    U = E / np.maximum(np.linalg.norm(E, axis=1), 1e-12)[:, None]
    Ud = dup / np.maximum(np.linalg.norm(dup, axis=1), 1e-12)[:, None]
    true_pairs = {
        (int(min(ids[idx[i]], base + i)), int(max(ids[idx[i]], base + i)))
        for i in range(50)
        if float((U[idx[i]] * Ud[i]).sum()) >= HI_COSINE_T
    }
    assert len(true_pairs) >= 45  # the jitter level keeps almost all above 0.85

    found = {
        (r["v1"], r["v2"]) for r in sign_lsh_near_dups(planted).collect()
    }
    recall = len(found & true_pairs) / len(true_pairs)
    assert recall >= 0.9, recall

    # candidate fraction: collisions in ANY table, before verify
    buckets = F.array(
        *[
            F.expr(
                "CAST("
                + " + ".join(
                    f"CASE WHEN element_at(embedding, {dd + 1}) >= 0 THEN {1 << i} ELSE 0 END"
                    for i, dd in enumerate(dims)
                )
                + " AS INT)"
            )
            for dims in HI_LSH_DIMS
        ]
    )
    keyed = planted.select("vec_id", F.posexplode(buckets).alias("table", "bucket"))
    a = keyed.select("table", "bucket", F.col("vec_id").alias("v1"))
    b = keyed.select("table", "bucket", F.col("vec_id").alias("v2"))
    n_cand = (
        a.join(b, ["table", "bucket"])
        .filter(F.col("v1") < F.col("v2"))
        .select("v1", "v2")
        .distinct()
        .count()
    )
    m = n + 50
    frac = n_cand / (m * (m - 1) / 2)
    assert frac <= 0.05, frac


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


def test_semdedup_subset_and_exact_scores(spark):
    """SemDeDup pairs are a SUBSET of the exhaustive detector's (cluster
    bounding can only drop cross-cluster pairs, never invent one) and
    every shared pair carries the identical exact cosine."""
    from robi_biometric_qdrant_vector_db_service_spark.workload_dedup import (
        embedding_near_dups,
        semdedup_pairs,
    )
    from tests.conftest import SF_ORACLE

    exact = {
        (r["v1"], r["v2"]): r["cos_sim"]
        for r in embedding_near_dups(spark, SF_ORACLE).collect()
    }
    sem = {
        (r["v1"], r["v2"]): r["cos_sim"]
        for r in semdedup_pairs(spark, SF_ORACLE).collect()
    }
    assert sem, "fixture corpus must produce within-cluster pairs"
    assert set(sem) <= set(exact)
    for p, s in sem.items():
        assert exact[p] == s, (p, s, exact[p])


def test_semdedup_recall_at_production_threshold(spark):
    """The paper's operating regime (arXiv:2303.09540): true duplicates are
    HIGH-similarity (cos >= 0.85), where a copy lands in its source's
    cluster, so the within-cluster scan catches nearly all planted pairs
    while comparing only Σ|c|² pairs (~1/k of N²/2 for balanced cells)."""
    import numpy as np

    from robi_biometric_qdrant_vector_db_service_spark.operators.ann import (
        _assign_cells,
        kmeans_centroids,
    )
    from robi_biometric_qdrant_vector_db_service_spark.sources.catalog import load_table
    from robi_biometric_qdrant_vector_db_service_spark.workload_dedup import (
        HI_COSINE_T,
        semdedup_pair_scan,
    )
    from tests.conftest import SF_ORACLE

    emb = load_table(spark, SF_ORACLE, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    E = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = np.array([r["vec_id"] for r in rows])
    n, d = E.shape
    rng = np.random.default_rng(11)
    idx = rng.choice(n, 50, replace=False)
    noise = (
        rng.standard_normal((50, d))
        * 0.33
        * np.linalg.norm(E[idx], axis=1)[:, None]
        / np.sqrt(d)
    )
    dup = E[idx] + noise
    base = int(ids.max()) + 1
    planted = spark.createDataFrame(
        [(int(base + i), [float(x) for x in dup[i]]) for i in range(50)]
        + [(int(ids[i]), [float(x) for x in E[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    U = E / np.maximum(np.linalg.norm(E, axis=1), 1e-12)[:, None]
    Ud = dup / np.maximum(np.linalg.norm(dup, axis=1), 1e-12)[:, None]
    true_pairs = {
        (int(min(ids[idx[i]], base + i)), int(max(ids[idx[i]], base + i)))
        for i in range(50)
        if float((U[idx[i]] * Ud[i]).sum()) >= HI_COSINE_T
    }
    assert len(true_pairs) >= 45

    from robi_biometric_qdrant_vector_db_service_spark.workload_dedup import SEMDEDUP_CELLS

    cents = planted.sparkSession.createDataFrame(
        kmeans_centroids(planted, k=SEMDEDUP_CELLS).collect(),
        schema="cell int, centroid array<double>",
    )
    found = {
        (r["v1"], r["v2"])
        for r in semdedup_pair_scan(planted, cents, tau=HI_COSINE_T).collect()
    }
    recall = len(found & true_pairs) / len(true_pairs)
    assert recall >= 0.9, recall

    # candidate work: Σ|c|² within-cluster pairs vs the exhaustive N²/2
    sizes = [
        r["count"] for r in _assign_cells(planted, cents).groupBy("cell").count().collect()
    ]
    m = sum(sizes)
    frac = sum(s * (s - 1) // 2 for s in sizes) / (m * (m - 1) / 2)
    assert frac <= 0.3, frac


def test_image_phash_planted_dup_recall(spark):
    """Planted-dup recall for the perceptual-hash image near-dup (r13):
    a lightly perturbed copy of an image blob (one byte changed flips at
    most 2 of the 64 dHash gradient bits) must surface as a pair, an
    unrelated blob must not, and the banded candidate join must find
    EVERY pair within the <=3-bit bar (pigeonhole recall 1.0) — checked
    against an exhaustive popcount over the same hashes."""
    import itertools

    from pyspark.sql import functions as F

    from robi_biometric_qdrant_vector_db_service_spark.operators.multimodal import (
        dhash_bands,
        phash_dup_pairs,
    )

    rng_docs = []
    base = bytes((37 * i * i + 11 * i + 5) % 256 for i in range(400))
    near = bytearray(base)
    near[200] = (near[200] + 90) % 256  # one-byte corruption: <=2 bits flip
    far = bytes((211 * i + 97) % 256 for i in reversed(range(400)))
    rng_docs = [(1, base), (2, bytes(near)), (3, far)]
    blobs = spark.createDataFrame(
        [(d, b, "image/fake", len(b)) for d, b in rng_docs],
        "doc_id bigint, blob binary, media_type string, n_bytes bigint",
    )
    hashes = dhash_bands(blobs)
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in phash_dup_pairs(hashes, max_hamming=3).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] <= 2
    assert (1, 3) not in pairs and (2, 3) not in pairs

    # exhaustive ground truth on the corpus: the banded join misses NO
    # pair within the bar (recall exactly 1.0 at <=3 of 64 bits)
    from robi_biometric_qdrant_vector_db_service_spark.operators.multimodal import to_blob_table
    from robi_biometric_qdrant_vector_db_service_spark.sources.catalog import load_table
    from robi_biometric_qdrant_vector_db_service_spark.workload_sources import (
        PHASH_MIN_BYTES,
    )

    corpus = load_table(spark, SF_SMOKE, "documents")

    h = dhash_bands(
        to_blob_table(corpus).filter(F.col("n_bytes") >= PHASH_MIN_BYTES)
    ).collect()
    def ham(a, b):
        return sum(
            bin((a[f"b{j}"] ^ b[f"b{j}"]) & 0xFFFF).count("1") for j in range(4)
        )

    truth = {
        (a["doc_id"], b["doc_id"]): ham(a, b)
        for a, b in itertools.combinations(sorted(h, key=lambda r: r["doc_id"]), 2)
        if ham(a, b) <= 3
    }
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in REGISTRY["image_phash_dups"].run(spark, SF_SMOKE).collect()
    }
    assert got == truth and len(truth) > 0


def test_stream_neardup_equals_batch_pair_set(spark):
    """The incremental LSH gate must drain to EXACTLY the full-corpus pair
    set — batch boundaries and arrival order may not change the answer.
    The staging fixture is pinned to 8 files at maxFilesPerTrigger=2, so
    the run genuinely crosses >= 4 micro-batches (a single-batch run would
    trivially equal the batch answer without exercising the state)."""
    import glob

    from robi_biometric_qdrant_vector_db_service_spark.streaming.neardup import (
        _banded,
        _shingled,
        _staged_neardup_docs,
        neardup_pairs_stream,
    )
    from robi_biometric_qdrant_vector_db_service_spark.workload_dedup import JACCARD_T
    from tests.conftest import SF_SMOKE

    staged = _staged_neardup_docs(spark, SF_SMOKE)
    assert len(glob.glob(staged + "/part-*")) == 8

    streamed = {
        (r["doc1"], r["doc2"]): r["jaccard"]
        for r in neardup_pairs_stream(spark, SF_SMOKE).collect()
    }

    # batch twin, computed inline with the same kernels (full-set jaccard)
    from robi_biometric_qdrant_vector_db_service_spark.sources.catalog import load_table
    from pyspark.sql import functions as F

    sh = _shingled(load_table(spark, SF_SMOKE, "documents"))
    bands = _banded(sh)
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
        .distinct()
    )
    inter = F.size(F.array_intersect("s1.sh", "s2.sh"))
    j = inter.cast("double") / (F.size("s1.sh") + F.size("s2.sh") - inter)
    batch = {
        (r["doc1"], r["doc2"]): r["jaccard"]
        for r in cand.join(sh.alias("s1"), F.col("doc1") == F.col("s1.doc_id"))
        .join(sh.alias("s2"), F.col("doc2") == F.col("s2.doc_id"))
        .select("doc1", "doc2", F.round(j, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_T)
        .collect()
    }
    assert streamed == batch and streamed, (len(streamed), len(batch))


def test_stream_embedding_neardup_equals_batch_pair_set(spark):
    """The incremental sign-LSH gate (embedding twin) must drain to EXACTLY
    the batch ``embedding_near_dups_lsh`` pair set — batch boundaries and
    arrival order may not change the answer.  Staged at 8 files /
    maxFilesPerTrigger=2, so the run genuinely crosses >= 4 micro-batches
    and the accumulated band/vector state is exercised."""
    import glob

    from robi_biometric_qdrant_vector_db_service_spark.streaming.neardup_embedding import (
        _staged_embeddings,
        embedding_neardup_stream,
    )
    from robi_biometric_qdrant_vector_db_service_spark.workload import REGISTRY
    from tests.conftest import SF_SMOKE

    staged = _staged_embeddings(spark, SF_SMOKE)
    assert len(glob.glob(staged + "/part-*")) == 8

    streamed = {
        (r["v1"], r["v2"]): r["cos_sim"]
        for r in embedding_neardup_stream(spark, SF_SMOKE).collect()
    }
    batch = {
        (r["v1"], r["v2"]): r["cos_sim"]
        for r in REGISTRY["embedding_near_dups_lsh"].run(spark, SF_SMOKE).collect()
    }
    assert streamed == batch and streamed, (len(streamed), len(batch))
