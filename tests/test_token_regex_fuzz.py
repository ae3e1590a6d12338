"""Property-based cross-engine fuzz of the BPE-ish pre-tokenizer regex
(``workload_text.TOKEN_RE`` — letter runs / digit runs / single
non-space punctuation, the GPT-2 pre-tokenizer shape shared by the
``regex_token_profile`` query and its DuckDB oracle): Spark's
``regexp_extract_all`` (Java regex) must produce the identical token
stream, class counts, and whitespace-token ratio as Python ``re`` on
the same literal — the three-dialect (Java ∩ RE2 ∩ Python) portability
claim the module pins in prose, here checked on adversarial mixes
(unicode letters OUTSIDE [a-zA-Z], multi-space runs, leading/trailing
punctuation, digit-letter boundaries).
"""

from __future__ import annotations

import re
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# registry root first — see test_c4_fuzz.py on the latent import ordering
from robi_biometric_qdrant_vector_db_service_spark import workload as _workload  # noqa: F401
from robi_biometric_qdrant_vector_db_service_spark.workload_text import TOKEN_RE

# adversarial fragments: ascii runs, digit-letter seams, unicode letters
# (must tokenize as per-char punctuation, NOT letter runs), punct clusters
FRAGMENTS = ["abc", "X9y", "42", "7", "...", "a-b", "café", "日本", "!?", " ", "  ", "_"]


def ref_profile(text: str) -> tuple:
    toks = re.findall(TOKEN_RE, text)
    n_bpe = len(toks)
    n_word = sum(bool(re.fullmatch("[a-zA-Z]+", t)) for t in toks)
    n_num = sum(bool(re.fullmatch("[0-9]+", t)) for t in toks)
    n_ws = len(text.split(" "))
    ratio = float(
        Decimal(n_bpe / max(n_ws, 1)).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP
        )
    )
    return toks, n_bpe, n_word, n_num, n_ws, ratio


@settings(max_examples=12, deadline=None)
@given(
    texts=st.lists(
        st.lists(st.sampled_from(FRAGMENTS), min_size=1, max_size=10).map("".join),
        min_size=1,
        max_size=8,
    )
)
def test_token_regex_matches_python_re(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i bigint, text string"
    )
    toks = F.expr(f"regexp_extract_all(text, '{TOKEN_RE}', 0)")
    n_bpe = F.size(toks)
    n_ws = F.size(F.split("text", " "))
    got = {
        r["i"]: (
            r["toks"], r["n_bpe"], r["n_word"], r["n_num"], r["n_ws"], r["ratio"]
        )
        for r in df.select(
            "i",
            toks.alias("toks"),
            n_bpe.cast("bigint").alias("n_bpe"),
            F.size(F.filter(toks, lambda t: t.rlike("^[a-zA-Z]+$")))
            .cast("bigint").alias("n_word"),
            F.size(F.filter(toks, lambda t: t.rlike("^[0-9]+$")))
            .cast("bigint").alias("n_num"),
            n_ws.cast("bigint").alias("n_ws"),
            F.round(
                n_bpe.cast("double") / F.greatest(n_ws, F.lit(1)), 6
            ).alias("ratio"),
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == ref_profile(t), (i, t)
