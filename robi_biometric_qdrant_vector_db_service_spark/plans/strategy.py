"""Physical search-strategy policy (SURVEY §4 O2/O3).

The reference flips between brute-force and graph search around a corpus
threshold (``full_scan_threshold=20000``, src/config/settings.py:55, wired
at qdrant_client.py:112; exact search below 10k collections at
advanced_indexing.py:230-246) and tunes search effort with corpus size and
k (``ef = clamp(k*4, hnsw_ef, 512)``, qdrant_client.py:351;
size-tiered policy advanced_indexing.py:214-278).

The Spark analogue is plan-build-time control flow — not a Catalyst rule:
the choice swaps which DataFrame pipeline is constructed, and Catalyst
optimizes whichever is chosen.  This mirrors SURVEY §4's conclusion that no
custom optimizer hooks are needed for correctness.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

FULL_SCAN_THRESHOLD = 20_000  # settings.py:55
EXACT_SEARCH_THRESHOLD = 10_000  # advanced_indexing.py:230-246


@dataclass(frozen=True)
class SearchPlan:
    strategy: str  # "exact" | "signlsh" | "ivf"
    nbits: int = 0
    nprobe: int = 0

    @property
    def is_exact(self) -> bool:
        return self.strategy == "exact"


def choose_search_strategy(corpus_count: int, k: int) -> SearchPlan:
    """O2/O3: brute force below the threshold (it genuinely wins there —
    no bucketing overhead, perfect recall); above it, bucket so per-query
    candidates stay ~threshold-sized.  Effort (nbits/nprobe) scales with
    corpus size the way the reference scales ef with k and collection size.
    """
    if corpus_count < FULL_SCAN_THRESHOLD:
        return SearchPlan("exact")
    # bucket count ~ corpus/threshold, capped like ef is capped at 512
    import math

    nbits = min(max(math.ceil(math.log2(corpus_count / EXACT_SEARCH_THRESHOLD)), 2), 9)
    nprobe = min(max(k // 4, 2), 1 << (nbits - 1))
    return SearchPlan("signlsh", nbits=nbits, nprobe=nprobe)


def smart_search(
    corpus: DataFrame, probes: DataFrame, k: int = 10, *, force: str | None = None
) -> DataFrame:
    """Adaptive Q1: pick the physical strategy from corpus statistics, then
    delegate.  Answers are identical below the threshold (exact path); above
    it the ANN path trades recall for a partition-pruned scan, measured in
    tests/test_ann_recall.py.

    ``force`` pins the strategy ("exact" | "signlsh") regardless of corpus
    size — used where the caller owes a caller-visible exactness contract
    (e.g. an exact-oracle query that must stay correct at every sf)."""
    from ..operators import ann
    from ..operators.search import knn_search

    if force is not None:
        if force not in ("exact", "signlsh"):
            raise ValueError(f"force must be 'exact' or 'signlsh', got {force!r}")
        plan = SearchPlan(force) if force == "exact" else choose_search_strategy(
            max(corpus.count(), FULL_SCAN_THRESHOLD), k
        )
    else:
        plan = choose_search_strategy(corpus.count(), k)
    if plan.is_exact:
        return knn_search(corpus, probes, k)
    return ann.signlsh_topk(corpus, probes, k, nbits=plan.nbits)
