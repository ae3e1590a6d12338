"""Q5/Q6/S9 — recommend, grouped search, keyset scroll: behavior + the plan
properties that keep them viable at scale (single ranking shuffle, pushed
keyset cursor, no OFFSET skip-scan)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from robi_biometric_qdrant_vector_db_service_spark.operators.search import (
    knn_search,
    recommend,
    scroll_page,
    search_groups,
)
from robi_biometric_qdrant_vector_db_service_spark.sources.catalog import load_table
from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def _probes(spark, n=4):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    return emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )


# -- recommend ---------------------------------------------------------------


def test_recommend_matches_manual_probe(spark):
    """recommend(examples) ≡ knn_search with the hand-built average_vector
    probe, minus the example points themselves."""
    corpus = load_table(spark, SF_SMOKE, "embeddings")
    examples = spark.createDataFrame(
        [(0, 10, "pos"), (0, 11, "pos"), (0, 42, "neg")],
        "q_id int, vec_id bigint, polarity string",
    )
    got = recommend(corpus, examples, k=8).collect()

    rows = {r.vec_id: r.embedding for r in corpus.filter(F.col("vec_id").isin(10, 11, 42)).collect()}
    ap = [(float(a) + float(b)) / 2.0 for a, b in zip(rows[10], rows[11])]
    qv = [2.0 * p - float(n) for p, n in zip(ap, rows[42])]
    probe = spark.createDataFrame([(0, qv)], "q_id int, q_emb array<double>")
    manual = {
        r.vec_id: (r.rank, r.score)
        for r in knn_search(corpus, probe, k=11).collect()
        if r.vec_id not in (10, 11, 42)
    }
    # re-rank the manual result after exclusion
    manual_ranked = sorted(manual.items(), key=lambda kv: kv[1][0])[:8]
    assert [r.vec_id for r in sorted(got, key=lambda r: r.rank)] == [
        v for v, _ in manual_ranked
    ]
    assert all(r.vec_id not in (10, 11, 42) for r in got)


def test_recommend_positive_only_is_centroid_search(spark):
    """With no negatives the probe is just avg(positives)."""
    corpus = load_table(spark, SF_SMOKE, "embeddings")
    examples = spark.createDataFrame(
        [(7, 3, "pos"), (7, 4, "pos")], "q_id int, vec_id bigint, polarity string"
    )
    got = recommend(corpus, examples, k=5).collect()
    assert len(got) == 5 and all(r.q_id == 7 for r in got)
    assert all(r.vec_id not in (3, 4) for r in got)


# -- search_groups -----------------------------------------------------------


def test_search_groups_shape_and_limits(spark):
    corpus = load_table(spark, SF_SMOKE, "embeddings")
    df = search_groups(corpus, _probes(spark), n_groups=3, group_size=2)
    rows = df.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r.q_id, set()).add(r.label)
        assert 1 <= r.hit_rank <= 2 and 1 <= r.group_rank <= 3
    assert all(len(groups) <= 3 for groups in per_q.values())
    # groups are ordered by their best hit: group_rank 1 holds the global max
    for q in per_q:
        q_rows = [r for r in rows if r.q_id == q]
        best = max(q_rows, key=lambda r: r.score)
        assert best.group_rank == 1


def test_search_groups_single_ranking_shuffle(spark):
    """Grouping must not add exchanges: one hash(q_id) shuffle feeds the hit
    ranking, group_best and group ranking windows (subset satisfaction)."""
    corpus = load_table(spark, SF_SMOKE, "embeddings")
    df = search_groups(corpus, _probes(spark), n_groups=3, group_size=2)
    plan = _plan(df)
    non_broadcast = re.findall(r"^\(\d+\) Exchange$", plan, re.M)
    assert len(non_broadcast) <= 1, plan
    # per-(q,group) top-k evaluated map-side before the shuffle would be ideal;
    # at minimum the hit-rank filter must plan as a group limit, not a full sort
    assert "WindowGroupLimit" in plan, plan


# -- scroll ------------------------------------------------------------------


def test_scroll_pages_are_disjoint_and_exhaustive(spark):
    corpus = load_table(spark, SF_SMOKE, "embeddings").select("vec_id", "label")
    p1 = scroll_page(corpus, page_size=40).collect()
    after = max(r.vec_id for r in p1)
    p2 = scroll_page(corpus, after_id=after, page_size=40).collect()
    ids1 = [r.vec_id for r in p1]
    ids2 = [r.vec_id for r in p2]
    assert ids1 == sorted(ids1) and ids2 == sorted(ids2)
    assert not set(ids1) & set(ids2)
    expect = [r.vec_id for r in corpus.orderBy("vec_id").limit(80).collect()]
    assert ids1 + ids2 == expect


def test_scroll_cursor_pushes_to_scan_no_global_sort(spark):
    corpus = load_table(spark, SF_SMOKE, "embeddings").select("vec_id", "label")
    df = scroll_page(corpus, after_id=200, page_size=50)
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(vec_id), GreaterThan(vec_id,200)]" in plan, plan
    # keyset page = per-partition top-p merged on the driver, not a sort+offset
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange" not in plan, plan


# -- discover / matrix / facet ----------------------------------------------


def test_discover_candidates_satisfy_context(spark):
    """Every returned candidate must be strictly closer to each positive
    example than to its paired negative."""
    from robi_biometric_qdrant_vector_db_service_spark.operators.search import discover

    corpus = load_table(spark, SF_SMOKE, "embeddings")
    targets = _probes(spark, 1).withColumnRenamed("vec_id", "q_id")
    context = spark.createDataFrame(
        [(0, 5, 9), (0, 7, 11)], "q_id bigint, pos_id bigint, neg_id bigint"
    )
    got = discover(corpus, targets, context, k=10).collect()
    assert got, "discover returned no candidates"
    import math

    emb = {r.vec_id: [float(x) for x in r.embedding] for r in corpus.collect()}

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a)) or 1e-12
        nb = math.sqrt(sum(x * x for x in b)) or 1e-12
        return dot / (na * nb)

    for r in got:
        c = emb[r.vec_id]
        for pos, neg in [(5, 9), (7, 11)]:
            assert cos(c, emb[pos]) > cos(c, emb[neg]), (r.vec_id, pos, neg)


def test_discover_context_filter_is_map_side(spark):
    """The all-pairs conjunction must run as a scan-side forall filter —
    candidates are pruned before any exchange, so the ranking shuffle
    carries survivors only."""
    from robi_biometric_qdrant_vector_db_service_spark.operators.search import discover

    corpus = load_table(spark, SF_SMOKE, "embeddings")
    targets = _probes(spark, 1).withColumnRenamed("vec_id", "q_id")
    context = spark.createDataFrame(
        [(0, 5, 9)], "q_id bigint, pos_id bigint, neg_id bigint"
    )
    plan = _plan(discover(corpus, targets, context, k=5))
    assert "forall" in plan, plan


def test_similarity_matrix_no_self_pairs_and_ranks(spark):
    from robi_biometric_qdrant_vector_db_service_spark.operators.search import (
        similarity_matrix_topk,
    )

    corpus = load_table(spark, SF_SMOKE, "embeddings").filter(F.col("label").isin(1, 2))
    rows = similarity_matrix_topk(corpus, k=3).collect()
    n_points = corpus.count()
    assert rows
    per = {}
    for r in rows:
        assert r.vec_id != r.other_id
        per.setdefault(r.vec_id, []).append(r.rank)
    for v, ranks in per.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= min(3, n_points - 1)


def test_readme_counts_match_registry():
    """README's coverage claims must track the registry (VERDICT r3 item 7:
    the counts drifted twice; pin them so they can't again)."""
    import re

    from robi_biometric_qdrant_vector_db_service_spark.workload import REGISTRY

    text = open("/root/repo/README.md").read()
    m = re.search(r"(\d+) named queries", text)
    assert m and int(m.group(1)) == len(REGISTRY), (
        f"README says {m and m.group(1)} queries, registry has {len(REGISTRY)}"
    )
    m = re.search(r"all (\d+) registered queries", text)
    assert m and int(m.group(1)) == len(REGISTRY)
    # 'every one DuckDB-oracle-checked' claim: no oracle-less entries
    assert all(q.oracle is not None for q in REGISTRY.values())


def test_front_queries_rotation_is_well_formed():
    """FRONT_QUERIES is hand-rotated every round; a typo'd name would
    KeyError the whole driver contract at queries() time, and a duplicate
    would waste a slot of the driver's 50-row correctness window."""
    from robi_biometric_qdrant_vector_db_service_spark.workload import FRONT_QUERIES, REGISTRY

    unknown = [n for n in FRONT_QUERIES if n not in REGISTRY]
    assert not unknown, f"FRONT_QUERIES names not in REGISTRY: {unknown}"
    assert len(set(FRONT_QUERIES)) == len(FRONT_QUERIES), "duplicate rotation entries"
    assert len(FRONT_QUERIES) == 50, "window should exactly fill the driver's 50-row cap"
