"""Differential fuzz of the winnowing fingerprint path
(``workload_pipeline._winnow_select`` + ``substring_spans(mode="winnow")``)
against a from-scratch pure-Python evaluator of the documented semantics.

The reference implementation shares NO code with the engine: gram hashes
are recomputed per window with ``pow()`` (no prefix sums, no NumPy), and
the selection is the literal Schleimer rule — in every window of
``window`` consecutive gram hashes select the minimum, breaking ties by
the RIGHTMOST position.  The engine's vectorized O(1)-per-window restated
algebra (modular-inverse prefix sums + strided argmin) must agree
position-for-position, and the end-to-end winnow-mode spans must equal a
reference pipeline built from the selected positions.
"""

from __future__ import annotations

from collections import defaultdict

from hypothesis import given, settings
from hypothesis import strategies as st

from robi_biometric_qdrant_vector_db_service_spark.workload_pipeline import (
    _WINNOW_B,
    _WINNOW_M,
    substring_spans,
)


def ref_gram_hash(h: list[int], p: int, w: int) -> int:
    """Window hash the docstring defines: sum h[p+j] * B^-j mod M —
    computed here the slow, obvious way (per-window, modular inverse via
    pow) so it shares nothing with the prefix-sum implementation."""
    binv = pow(_WINNOW_B, _WINNOW_M - 2, _WINNOW_M)
    acc = 0
    for j in range(w):
        acc = (acc + (h[p + j] % _WINNOW_M) * pow(binv, j, _WINNOW_M)) % _WINNOW_M
    return acc


def ref_winnow(h: list[int], w: int, window: int) -> list[int]:
    """Literal Schleimer selection: rightmost minimum per window of
    ``window`` consecutive gram hashes; short docs (fewer grams than one
    window) select their global rightmost minimum."""
    g = len(h) - w + 1
    if g <= 0:
        return []
    H = [ref_gram_hash(h, p, w) for p in range(g)]
    if g <= window:
        m = min(H)
        return [max(p for p in range(g) if H[p] == m)]
    picks = set()
    for s in range(g - window + 1):
        win = H[s : s + window]
        m = min(win)
        picks.add(s + max(i for i in range(window) if win[i] == m))
    return sorted(picks)


def _spark_hashes(spark, toks: list[str]) -> list[int]:
    """Per-token residues exactly as the engine computes them JVM-side."""
    row = spark.createDataFrame([(toks,)], "toks array<string>").selectExpr(
        f"transform(toks, x -> pmod(xxhash64(x), {_WINNOW_M})) AS th"
    ).collect()[0]
    return list(row["th"])


@settings(max_examples=8, deadline=None)
@given(
    toks=st.lists(st.sampled_from("abcde"), min_size=1, max_size=60),
    w=st.integers(min_value=2, max_value=6),
    window=st.integers(min_value=1, max_value=6),
)
def test_selector_positions_match_literal_schleimer(spark, toks, w, window):
    from robi_biometric_qdrant_vector_db_service_spark.workload_pipeline import (
        _winnow_select,
    )

    if window > w:
        window = w  # the engine enforces window <= w at the spans API
    th = _spark_hashes(spark, toks)
    expect = ref_winnow(th, w, window)
    # drive the very pandas_udf the plan runs, through Spark
    df = spark.createDataFrame([(0, toks)], "doc_id bigint, toks array<string>")
    sel = _winnow_select(w, window)
    got_rows = df.selectExpr(
        f"transform(toks, x -> pmod(xxhash64(x), {_WINNOW_M})) AS th"
    ).select(sel("th").alias("sel")).collect()
    got = list(got_rows[0]["sel"])
    assert got == expect, (toks, w, window, got, expect)


@settings(max_examples=6, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abc"), min_size=1, max_size=30),
        min_size=2,
        max_size=4,
    )
)
def test_winnow_spans_match_reference_pipeline(spark, docs):
    """substring_spans(mode=winnow) == reference: literal-Schleimer
    selection -> md5-free gram-text dup test across docs (>1 distinct
    doc) restricted to SELECTED positions -> gap>w island break ->
    (min, max+w) spans."""
    w, window = 4, 3
    gram_docs: dict[tuple, set[int]] = defaultdict(set)
    picked: dict[int, list[int]] = {}
    for doc_id, toks in enumerate(docs):
        th = _spark_hashes(spark, toks)
        picks = ref_winnow(th, w, window)
        picked[doc_id] = picks
        for p in picks:
            gram_docs[tuple(toks[p : p + w])].add(doc_id)
    expect = set()
    for doc_id, toks in enumerate(docs):
        dup_pos = [
            p for p in picked[doc_id]
            if len(gram_docs[tuple(toks[p : p + w])]) > 1
        ]
        run: list[int] = []
        for p in dup_pos + [None]:
            if run and (p is None or p - run[-1] > w):
                expect.add((doc_id, run[0], run[-1] + w, run[-1] + w - run[0]))
                run = []
            if p is not None:
                run.append(p)
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(docs)],
        "doc_id bigint, text string",
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_len"])
        for r in substring_spans(df, w=w, mode="winnow", window=window).collect()
    }
    assert got == expect, (docs, got, expect)
