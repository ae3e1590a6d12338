"""Property-based differential fuzz of the C4/RefinedWeb line-quality
frame (``c4_line_frame``): random multi-line documents assembled from a
line pool that covers every rule class (terminal punctuation, bullets,
ellipsis endings, blocklist words, neutral lines), checked against a
pure-Python re-derivation of the metrics and the conjunctive keep
verdict.  Rounding parity: the frame rounds fractions to 6 dp HALF_UP
(Spark ROUND on double = BigDecimal of the exact binary value) before the
threshold compare, so the reference quantizes the same exact
``Decimal(float)`` the same way.  Reference behavior anchor: Raffel et
al. 2020 §2.2; Penedo et al. 2023 line-wise filters.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

# the registry root must initialize before workload_text is imported
# directly (workload_pipeline's module-level registration pulls
# workload_text._STOP_SQL mid-import otherwise — a latent circular-import
# ordering every other consumer avoids by importing workload first)
from robi_biometric_qdrant_vector_db_service_spark import workload as _workload  # noqa: F401
from robi_biometric_qdrant_vector_db_service_spark.workload_text import (
    C4_BULLET_MAX,
    C4_ELLIPSIS_MAX,
    C4_MIN_LINES,
    C4_TERMINAL_MIN,
    c4_line_frame,
)

LINE_POOL = [
    "plain words with no signal",
    "a proper sentence.",
    "an exclamation!",
    "is this a question?",
    'a quoted ending"',
    "- a bullet line.",
    "* another bullet",
    "trailing off...",
    "- bullet that trails...",
    "contains JavaScript payload",
    "some Lorem Ipsum filler.",
    "",  # empty line: no terminal punct, no bullet, still counts in n_lines
]


def _r6(x: float) -> float:
    return float(Decimal(x).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def ref_metrics(lines: list[str]) -> dict:
    n = len(lines)
    term = _r6(
        sum(l.endswith((".", "!", "?", '"')) for l in lines) / n
    )
    bullet = _r6(sum(l.startswith(("- ", "* ")) for l in lines) / n)
    ell = _r6(sum(l.endswith("...") for l in lines) / n)
    block = any(
        "javascript" in l.lower() or "lorem ipsum" in l.lower() for l in lines
    )
    return {
        "n_lines": n,
        "frac_terminal": term,
        "frac_bullet": bullet,
        "frac_ellipsis": ell,
        "has_blocklist": block,
        "keep": (
            n >= C4_MIN_LINES
            and term >= C4_TERMINAL_MIN
            and bullet <= C4_BULLET_MAX
            and ell <= C4_ELLIPSIS_MAX
            and not block
        ),
    }


@settings(max_examples=10, deadline=None)
@given(
    corpus=st.lists(
        st.lists(st.sampled_from(LINE_POOL), min_size=1, max_size=12),
        min_size=1,
        max_size=6,
    )
)
def test_c4_frame_matches_reference_on_random_line_mixes(spark, corpus):
    df = spark.createDataFrame(
        [(i, "\n".join(lines)) for i, lines in enumerate(corpus)],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in c4_line_frame(df).collect()}
    for i, lines in enumerate(corpus):
        exp = ref_metrics(lines)
        row = got[i]
        for k, v in exp.items():
            assert row[k] == v, (i, k, row[k], v, lines)


def test_every_rule_class_can_flip_keep(spark):
    """Each predicate must be able to fail independently: too few lines,
    weak terminal fraction, bullet-heavy, ellipsis-heavy, blocklist hit —
    and a clean page passes."""
    cases = {
        0: (["one sentence."], False),                        # n_lines < 3
        1: (["a.", "b", "no punct here", "none", "nope"], False),  # term 1/5
        2: (["- a.", "- b.", "- c.", "d."], False),            # bullets 3/4
        3: (["a...", "b...", "c."], False),                    # ellipsis 2/3
        4: (["a.", "b.", "has lorem ipsum."], False),          # blocklist
        5: (["a.", "b.", "c!", "plain"], True),                # clean keep
    }
    df = spark.createDataFrame(
        [(i, "\n".join(lines)) for i, (lines, _) in cases.items()],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r["keep"] for r in c4_line_frame(df).collect()}
    assert got == {i: keep for i, (_, keep) in cases.items()}
