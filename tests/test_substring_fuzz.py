"""Property-based differential fuzz of the ExactSubstr span kernel
(``substring_spans``, Lee et al. 2022): random small-alphabet corpora —
where cross-document w-gram repeats arise naturally — against a
from-scratch covered-set reference: a token position is covered iff some
window containing it is a cross-document duplicate, and the expected
spans are exactly the maximal runs of covered positions.

This is the strongest statement of the r12-advice island-merge fix: the
gap>w break rule is correct iff merged spans equal the union of covered
windows — disjoint, maximal, never double-counting a token.  The fuzz
also re-derives the dup_fraction identity (sum of span lengths == covered
tokens <= n_tokens) that the 50% keep gate depends on.
"""

from __future__ import annotations

from collections import defaultdict

from hypothesis import given, settings
from hypothesis import strategies as st

from robi_biometric_qdrant_vector_db_service_spark.workload_pipeline import (
    substring_spans,
)

W = 4  # small window so tiny fuzz corpora exhibit real repeats


def ref_spans(docs: list[list[str]], w: int) -> set[tuple]:
    """(doc_id, start, end_exclusive, len) of maximal covered runs, where
    covered = any w-gram window over the position appears in >1 distinct
    documents."""
    gram_docs: dict[tuple, set[int]] = defaultdict(set)
    for doc_id, toks in enumerate(docs):
        for p in range(len(toks) - w + 1):
            gram_docs[tuple(toks[p : p + w])].add(doc_id)
    out = set()
    for doc_id, toks in enumerate(docs):
        covered = set()
        for p in range(len(toks) - w + 1):
            if len(gram_docs[tuple(toks[p : p + w])]) > 1:
                covered.update(range(p, p + w))
        run: list[int] = []
        for i in sorted(covered) + [-1]:
            if run and i != run[-1] + 1:
                out.add((doc_id, run[0], run[-1] + 1, run[-1] + 1 - run[0]))
                run = []
            run.append(i)
    return out


@settings(max_examples=10, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abc"), min_size=1, max_size=30),
        min_size=2,
        max_size=5,
    )
)
def test_spans_equal_covered_set_reference(spark, docs):
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id bigint, text string",
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_len"])
        for r in substring_spans(df, w=W).collect()
    }
    assert got == ref_spans(docs, W)

    # dup_fraction identity: spans are disjoint, so per-doc summed span
    # lengths equal the covered-token count and never exceed doc length
    per_doc: dict[int, list[tuple]] = defaultdict(list)
    for doc_id, s, e, ln in got:
        per_doc[doc_id].append((s, e, ln))
    for doc_id, spans in per_doc.items():
        spans.sort()
        assert all(b[0] >= a[1] for a, b in zip(spans, spans[1:])), spans
        assert sum(ln for _, _, ln in spans) <= len(docs[doc_id])


def test_gap_exactly_w_merges_touching_windows(spark):
    """Duplicated windows at positions p and p+w touch ([p,p+w) then
    [p+w,p+2w)): the union is one contiguous span and the island rule
    (break only on gap > w) must emit exactly one row for it."""
    # doc 0 and doc 1 share the 4-gram at pos 0 and the 4-gram at pos 4,
    # with the middle arranged so no other window repeats across docs
    d0 = "a a a a b b b b x y z w"
    d1 = "q a a a a r s t u b b b b"
    # d1's copies sit at different offsets, so windows 'a a a a' (d0 pos 0,
    # d1 pos 1) and 'b b b b' (d0 pos 4, d1 pos 9) are the only cross-doc
    # repeats; in d0 they are gap-w apart => ONE span [0, 8)
    df = spark.createDataFrame(
        [(0, d0), (1, d1)], "doc_id bigint, text string"
    )
    rows = {
        r["doc_id"]: (r["span_start"], r["span_end"])
        for r in substring_spans(df, w=4).collect()
        if r["doc_id"] == 0
    }
    assert rows == {0: (0, 8)}
