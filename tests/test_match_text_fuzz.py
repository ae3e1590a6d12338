"""Property-based differential fuzz of the MatchText compiler
(``operators/payload_index._match_text``) across every supported
tokenizer (word / whitespace / prefix / multilingual), lowercase flag,
and min/max token-length bound, against a pure-Python reference of the
documented Qdrant semantics: every query token present in the field's
token set (prefix: prefixing some field token), with index-time and
query-time analysis identical.

The compiler's subtle parts are exactly what the fuzz crosses: the
Java-regex vs Python-re spellings of the token break class (``[^\\p{L}
\\p{N}]+`` vs ``[\\W_]+``), the CJK space-injection applied to BOTH
sides for ``multilingual``, the unbounded exact path (array_contains)
vs the bounded/exists path, and the out-of-bounds query token => no
match rule.  Reference behavior anchor: Qdrant TextIndexParams
(tokenizer/lowercase/min_token_len/max_token_len) word-index semantics.
"""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from robi_biometric_qdrant_vector_db_service_spark.operators.payload_index import (
    _match_text,
)

_CJK = "[一-鿿㐀-䶿぀-ゟ゠-ヿ가-힯]"

# safe cross-engine chars only: no locale-sensitive case pairs, no
# non-decimal digit forms ('²') where \p{N} and Python \w disagree
WORD_POOL = ["hello", "world", "café", "Foo", "bar_baz", "x1", "42", "日本", "語", "한국"]
SEPS = [" ", ", ", "-", "  ", "! ", "\t"]


def py_tokens(s: str, tok: str, lower: bool) -> list[str]:
    if lower:
        s = s.lower()
    if tok == "multilingual":
        s = re.sub(f"({_CJK})", r" \1 ", s)
    pat = r"\s+" if tok == "whitespace" else r"[\W_]+"
    return [t for t in re.split(pat, s) if t]


def ref_match(field, query, tok, lower, mn, mx) -> bool:
    ftoks = [
        t
        for t in py_tokens(field, tok, lower)
        if len(t) >= mn and (mx is None or len(t) <= mx)
    ]
    for q in py_tokens(query, tok, lower):
        if len(q) < mn or (mx is not None and len(q) > mx):
            return False
        if tok == "prefix":
            if not any(f.startswith(q) for f in ftoks):
                return False
        elif q not in ftoks:
            return False
    return True


@st.composite
def match_case(draw):
    def text(n_min, n_max):
        words = draw(st.lists(st.sampled_from(WORD_POOL), min_size=n_min, max_size=n_max))
        seps = [draw(st.sampled_from(SEPS)) for _ in words]
        return "".join(w + s for w, s in zip(words, seps)).strip()

    fields = [text(1, 6) for _ in range(4)]
    query = text(1, 2)
    tok = draw(st.sampled_from(["word", "whitespace", "prefix", "multilingual"]))
    lower = draw(st.booleans())
    mn = draw(st.sampled_from([1, 2]))
    mx = draw(st.sampled_from([None, 3, 6]))
    return fields, query, tok, lower, mn, mx


@settings(max_examples=15, deadline=None)
@given(case=match_case())
def test_match_text_equals_python_reference(spark, case):
    fields, query, tok, lower, mn, mx = case
    params = {"tokenizer": tok, "lowercase": lower, "min_token_len": mn}
    if mx is not None:
        params["max_token_len"] = mx
    # the engine rejects queries that analyze to zero tokens — mirror it
    if not py_tokens(query, tok, lower):
        with pytest.raises(ValueError):
            _match_text(F.col("t"), query, params)
        return
    df = spark.createDataFrame(
        [(i, f) for i, f in enumerate(fields)], "i int, t string"
    )
    got = {
        r["i"]: bool(r["m"])
        for r in df.select("i", _match_text(F.col("t"), query, params).alias("m")).collect()
    }
    exp = {i: ref_match(f, query, tok, lower, mn, mx) for i, f in enumerate(fields)}
    assert got == exp, (query, tok, lower, mn, mx, fields)


def test_multilingual_segments_cjk_on_both_sides(spark):
    """'日本語' indexed multilingually must match the query '語' (char
    tokens), while tokenizer=word treats the whole run as ONE token and
    only the full-run query matches."""
    df = spark.createDataFrame([(0, "日本語 corpus")], "i int, t string")

    def hit(query, tok):
        return (
            df.select(
                _match_text(F.col("t"), query, {"tokenizer": tok}).alias("m")
            ).first()["m"]
        )

    assert hit("語", "multilingual") is True
    assert hit("日本", "multilingual") is True      # chars 日+本 both present
    assert hit("語", "word") is False                # one token '日本語'
    assert hit("日本語", "word") is True
    assert hit("日本語 corpus", "multilingual") is True  # mixed script query
