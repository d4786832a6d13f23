"""Property-based tests (hypothesis): the engine's pure compilers against
independent Python oracles, and batched Spark round-trips for the quirky
coercion/comparison semantics.

Spark jobs are expensive, so Spark-facing properties batch all generated
examples into ONE DataFrame per example set (few examples, many rows)."""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings, strategies as st

from pastash_spark.functions.coerce import coerce_numeric_str
from pastash_spark.functions.conditions import compile_condition
from pastash_spark.functions.grok import CORE_PATTERNS, GrokCompiler
from pastash_spark.functions.interpolate import compile_template


# --- pure-python properties (no Spark) --------------------------------------

@given(st.lists(st.sampled_from(sorted(CORE_PATTERNS)), min_size=1, max_size=5))
@settings(max_examples=50, deadline=None)
def test_grok_any_composition_compiles(names):
    pattern = " ".join(f"%{{{n}:f{i}}}" for i, n in enumerate(names))
    cg = GrokCompiler().compile(pattern)
    assert cg.compiled is not None
    assert "(?P<" not in cg.java_regex
    # group indexes must be resolvable for every declared field
    for f in cg.fields:
        assert cg.group_index(f) >= 1


@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
               max_size=30))
@settings(max_examples=50, deadline=None)
def test_grok_literal_text_passthrough(text):
    """Text without %{} refs must expand to itself."""
    if "%{" in text:
        return
    expanded, fields = GrokCompiler().expand(text)
    assert expanded == text and fields == []


# --- batched Spark properties ------------------------------------------------

def _py_coerce(s: str):
    """Python oracle of regex_helper.js:37-48."""
    if re.fullmatch(r"[0-9]+", s):
        return float(int(s))
    if re.fullmatch(r"[0-9]+[.,][0-9]+", s):
        return float(s.replace(",", "."))
    return None


NUMERIC_ISH = st.one_of(
    st.from_regex(r"[0-9]{1,10}", fullmatch=True),
    st.from_regex(r"[0-9]{1,5}[.,][0-9]{1,5}", fullmatch=True),
    st.from_regex(r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", fullmatch=True),
    st.text(alphabet="0123456789abc.,+- ", max_size=12),
)


@given(st.lists(NUMERIC_ISH, min_size=1, max_size=60))
@settings(max_examples=6, deadline=None)
def test_coercion_matches_python_oracle(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    got = [r.n for r in df.select(coerce_numeric_str("v").alias("n")).collect()]
    want = [_py_coerce(v) for v in values]
    assert got == want


def _py_parseint(s) -> int | None:
    # Java \s is ASCII-only (unlike Python's Unicode \s) — match that
    m = re.match(r"^[ \t\n\r\f\x0b]*([+-]?[0-9]+)", str(s))
    return int(m.group(1)) if m else None


@given(st.lists(st.one_of(
    st.from_regex(r"[ \t]{0,2}[+-]?[0-9]{1,8}[a-z]{0,3}", fullmatch=True),
    st.text(alphabet="xyz -", max_size=6),
    st.integers(-10**6, 10**6).map(str),
), min_size=1, max_size=60), st.integers(-1000, 1000))
@settings(max_examples=6, deadline=None)
def test_gt_comparison_matches_js_parseint_oracle(spark, values, rhs):
    ast = {"op": ">", "left": {"field": "v"}, "right": rhs}
    df = spark.createDataFrame([(v,) for v in values], "v string")
    got = [r.c for r in df.select(compile_condition(ast).alias("c")).collect()]
    want = []
    for v in values:
        lp = _py_parseint(v)
        want.append(bool(lp is not None and lp > rhs))
    assert got == want


@given(st.lists(
    st.tuples(st.text(alphabet="abcXYZ ", min_size=0, max_size=8),
              st.one_of(st.none(),
                        st.text(alphabet="abc123", max_size=6))),
    min_size=1, max_size=40))
@settings(max_examples=6, deadline=None)
def test_interpolation_matches_fstring_oracle(spark, rows):
    template = "pre-#{a}-mid-#{b}!"
    df = spark.createDataFrame(rows, "a string, b string")
    got = [r.t for r in df.select(compile_template(template).alias("t")).collect()]
    want = [None if (a is None or b is None) else f"pre-{a}-mid-{b}!"
            for a, b in rows]
    assert got == want
