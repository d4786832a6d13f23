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
    """NaN coerces to 0 in the reference's comparisons (force_number
    returns `false` -> JS treats it as 0), so `"abc" > -3` is TRUE."""
    ast = {"op": ">", "left": {"field": "v"}, "right": rhs}
    df = spark.createDataFrame([(v,) for v in values], "v string")
    got = [r.c for r in df.select(compile_condition(ast).alias("c")).collect()]
    want = []
    for v in values:
        lp = _py_parseint(v)
        want.append(bool((lp if lp is not None else 0) > rhs))
    assert got == want


# --- random condition-AST property vs a reference-semantics Python oracle ---

_LIT = st.one_of(st.text(alphabet="ab7 ", max_size=4),
                 st.integers(-20, 20))
_LEAF = st.one_of(st.just({"field": "a"}), st.just({"field": "b"}), _LIT)
_REGEXES = ["a", "b.", "^7", "[0-9]+", "a+b"]


def _cmp_nodes(children):
    return st.one_of(
        st.builds(lambda o, l, r: {"op": o, "left": l, "right": r},
                  st.sampled_from(["==", "!=", ">", "<", ">=", "<="]),
                  _LEAF, _LEAF),
        st.builds(lambda o, l, r: {"op": o, "left": l, "right": r},
                  st.sampled_from(["=~", "!~"]),
                  st.one_of(st.just({"field": "a"}), st.just({"field": "b"})),
                  st.sampled_from(_REGEXES)),
        st.builds(lambda o, l, r: {"op": o, "left": l, "right": r},
                  st.sampled_from(["in", "not in"]),
                  st.one_of(st.just({"field": "a"}), st.just({"field": "b"})),
                  st.lists(_LIT, min_size=1, max_size=3)),
        st.builds(lambda f: {"op": "miss", "operand": f},
                  st.one_of(st.just({"field": "a"}), st.just({"field": "b"}))),
        st.builds(lambda c: {"op": "!", "operand": c}, children),
        st.builds(lambda o, l, r: {"op": o, "left": l, "right": r},
                  st.sampled_from(["and", "or", "xor", "nand"]),
                  children, children),
    )


_AST = st.recursive(_cmp_nodes(st.just({"field": "a"})), _cmp_nodes,
                    max_leaves=8)


def _py_cond(ast, row) -> bool:
    """Independent Python oracle of condition_evaluator.js semantics (as
    functions/conditions.py documents them)."""
    def val(x):
        if isinstance(x, dict) and "field" in x:
            return row[x["field"]]
        return x

    def as_str(v):
        if v is None:
            return None
        if isinstance(v, bool):
            return "true" if v else "false"
        return str(v)

    if not (isinstance(ast, dict) and "op" in ast):
        v = val(ast)
        return v is not None and as_str(v) != ""
    op = ast["op"]
    if op == "!":
        return not _py_cond(ast["operand"], row)
    if op == "miss":
        return val(ast["operand"]) is None
    if op in ("and", "or", "xor", "nand"):
        l, r = _py_cond(ast["left"], row), _py_cond(ast["right"], row)
        return {"and": l and r, "or": l or r, "xor": l != r,
                "nand": not (l and r)}[op]
    def force_str(v):
        # condition_evaluator.js:42-47 — undefined force_strings to ''
        s = as_str(v)
        return "" if s is None else s

    l, r = val(ast["left"]), val(ast["right"])
    if op in ("==", "!="):
        eq = force_str(l) == force_str(r)
        return eq if op == "==" else not eq
    if op in (">", ">=", "<", "<="):
        # force_number NaN -> false -> JS comparisons coerce to 0
        li = _py_parseint(l) if l is not None else None
        ri = _py_parseint(r) if r is not None else None
        li, ri = (0 if li is None else li), (0 if ri is None else ri)
        return {">": li > ri, ">=": li >= ri,
                "<": li < ri, "<=": li <= ri}[op]
    if op in ("=~", "!~"):
        m = re.search(ast["right"], force_str(l)) is not None
        return m if op == "=~" else not m
    if op in ("in", "not in"):
        m = force_str(l) in [as_str(v) for v in ast["right"]]
        return m if op == "in" else not m
    raise AssertionError(op)


_FIELD_VAL = st.one_of(st.none(), st.text(alphabet="ab7 ", max_size=4),
                       st.integers(-20, 20).map(str))


@given(st.lists(_AST, min_size=1, max_size=6),
       st.lists(st.tuples(_FIELD_VAL, _FIELD_VAL), min_size=1, max_size=25))
@settings(max_examples=6, deadline=None)
def test_condition_compiler_matches_python_oracle(spark, asts, rows):
    from pyspark.sql import functions as F
    df = spark.createDataFrame(rows, "a string, b string")
    cols = [compile_condition(ast, df.schema).alias(f"c{i}")
            for i, ast in enumerate(asts)]
    got = df.select(*cols).collect()
    for j, (a, b) in enumerate(rows):
        row = {"a": a, "b": b}
        for i, ast in enumerate(asts):
            want = _py_cond(ast, row)
            assert got[j][f"c{i}"] == want, (ast, row)


# --- mustache: native escaped-concat fast path == the Python renderer --------

_M_TEXT = st.text(alphabet="xy <&\"'/=` .", max_size=6).filter(
    lambda s: "{{" not in s)
_M_TOK = st.one_of(_M_TEXT.map(lambda t: ("text", t)),
                   st.sampled_from([("var", "a"), ("var", "b"),
                                    ("raw", "a"), ("raw", "b")]))


@given(st.lists(_M_TOK, min_size=1, max_size=6),
       st.lists(st.tuples(
           st.one_of(st.none(), st.text(alphabet="v<&'x", max_size=5)),
           st.one_of(st.none(), st.text(alphabet="w>\"y", max_size=5))),
           min_size=1, max_size=15))
@settings(max_examples=6, deadline=None)
def test_mustache_native_path_matches_renderer(spark, toks, rows):
    """Two independent implementations must agree: the codegen
    escaped-concat fast path vs functions/mustache.py's render_row."""
    from pastash_spark.functions import mustache as MU
    from pastash_spark.operators.mutate import mustache as op_mustache
    template = "".join(
        t[1] if t[0] == "text"
        else ("{{%s}}" % t[1] if t[0] == "var" else "{{{%s}}}" % t[1])
        for t in toks)
    df = spark.createDataFrame(rows, "a string, b string")
    got = [r.o for r in op_mustache(df, "o", template).collect()]
    parsed = MU.parse_template(template)
    assert MU.only_simple_vars(parsed)      # ensures the native path ran
    want = [MU.render_row(parsed, {"a": a, "b": b}) for a, b in rows]
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


# --- bencode round-trip property ---------------------------------------------

def _bencode(v) -> bytes:
    if isinstance(v, int):
        return b"i%de" % v
    if isinstance(v, str):
        b = v.encode("utf-8")
        return b"%d:%s" % (len(b), b)
    if isinstance(v, list):
        return b"l" + b"".join(_bencode(x) for x in v) + b"e"
    if isinstance(v, dict):
        return b"d" + b"".join(
            _bencode(k) + _bencode(v[k]) for k in sorted(v)) + b"e"
    raise TypeError(type(v))


_BVAL = st.recursive(
    st.one_of(st.integers(-10**9, 10**9),
              st.text(alphabet=st.characters(min_codepoint=32,
                                             max_codepoint=0x2FF),
                      max_size=12)),
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(alphabet="abcdef", min_size=1, max_size=5),
                        children, max_size=4)),
    max_leaves=12)


@given(st.lists(_BVAL, min_size=1, max_size=20))
@settings(max_examples=6, deadline=None)
def test_bencode_roundtrip_property(spark, values):
    """encode (test-local) -> bencode_fields decode == canonical JSON of
    the original value, for arbitrary nested int/str/list/dict trees."""
    import json

    from pastash_spark.operators.parse import bencode_fields
    rows = [(_bencode(v),) for v in values]
    df = spark.createDataFrame(rows, "message binary")
    got = [r.decoded for r in bencode_fields(df).collect()]
    want = [json.dumps(v, sort_keys=True, separators=(",", ":"))
            for v in values]
    assert got == want


# --- pack_sequences vs a Python reference ------------------------------------

@given(st.lists(st.lists(st.integers(0, 1000), max_size=30),
                min_size=1, max_size=40),
       st.sampled_from([4, 16, 32]))
@settings(max_examples=5, deadline=None)
def test_pack_sequences_matches_python_reference(spark, token_lists, seq_len):
    import hashlib

    from pastash_spark.operators.dataset import pack_sequences
    rows = [(i, toks) for i, toks in enumerate(token_lists)]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<bigint>")
    got = {(r.bucket, r.seq_no): list(r.seq)
           for r in pack_sequences(df, seq_len=seq_len, n_buckets=4).collect()}
    want = {}
    per_bucket: dict[int, list[int]] = {}
    for i, _ in rows:
        b = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % 4
        per_bucket.setdefault(b, []).append(i)
    for b, ids in per_bucket.items():
        flat = [t for i in sorted(ids) for t in token_lists[i]]
        for s in range(len(flat) // seq_len):
            want[(b, s)] = flat[s * seq_len:(s + 1) * seq_len]
    assert got == want
