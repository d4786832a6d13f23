"""Expression-layer tests: coercion quirks, interpolation, condition DSL,
grok compiler.  Mirrors the reference's evaluator/parser unit suites
(/root/reference/test/test_105_condition_evaluator.js,
 test_202_filter_regex.js numeric-coercion cases)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pastash_spark.functions.coerce import coerce_numeric_str
from pastash_spark.functions.conditions import compile_condition
from pastash_spark.functions.grok import GrokCompiler
from pastash_spark.functions.interpolate import compile_template, moment_to_java


# --- coercion (regex_helper.js:37-48 quirks) --------------------------------

@pytest.mark.parametrize("raw,expected", [
    ("12", 12.0),
    ("12.3", 12.3),
    ("12,3", 12.3),      # comma decimal quirk
    ("abc", None),       # declared-numeric mismatch -> dropped (null)
    ("1.2.3", None),
    ("", None),
])
def test_coerce_numeric(spark, raw, expected):
    df = spark.createDataFrame([(raw,)], "v string")
    out = df.select(coerce_numeric_str("v").alias("n")).first().n
    assert out == expected


# --- interpolation (base_component.js:288-354) ------------------------------

def test_template_mixed_literal_and_fields(spark):
    df = spark.createDataFrame([("nginx", 7)], "type string, n int")
    out = df.select(compile_template("pre-#{type}-#{n}-post").alias("t")).first().t
    assert out == "pre-nginx-7-post"


def test_template_missing_field_suppresses(spark):
    df = spark.createDataFrame([("a", None)], "x string, y string")
    out = df.select(compile_template("#{x}/#{y}").alias("t")).first().t
    assert out is None


def test_template_now(spark):
    df = spark.createDataFrame([(1,)], "i int")
    out = df.select(compile_template("ts=#{now:YYYY}").alias("t")).first().t
    assert out.startswith("ts=20") and len(out) == len("ts=2026")


def test_moment_to_java():
    assert moment_to_java("YYYY-MM-DD") == "yyyy-MM-dd"
    assert moment_to_java("HH:mm:ss.SSS") == "HH:mm:ss.SSS"


# --- condition DSL (condition_evaluator.js truth tables) --------------------

CASES = [
    # == is string-compare (force_string)
    ({"op": "==", "left": {"field": "n"}, "right": "12"}, {"n": 12}, True),
    ({"op": "==", "left": {"field": "s"}, "right": "x"}, {"s": "x"}, True),
    ({"op": "!=", "left": {"field": "s"}, "right": "x"}, {"s": "y"}, True),
    # ordering coerces parseInt-style: "12abc" -> 12
    ({"op": ">", "left": {"field": "s"}, "right": "9"}, {"s": "12abc"}, True),
    ({"op": ">", "left": {"field": "s"}, "right": "9"}, {"s": "abc"}, False),
    ({"op": "<=", "left": {"field": "n"}, "right": "12"}, {"n": 12}, True),
    # regex
    ({"op": "=~", "left": {"field": "s"}, "right": "^ab"}, {"s": "abc"}, True),
    ({"op": "!~", "left": {"field": "s"}, "right": "^ab"}, {"s": "zbc"}, True),
    # membership (string compare)
    ({"op": "in", "left": {"field": "n"}, "right": [11, 12]}, {"n": 12}, True),
    ({"op": "not in", "left": {"field": "s"}, "right": ["a", "b"]}, {"s": "c"}, True),
    # connectives
    ({"op": "and",
      "left": {"op": "==", "left": {"field": "s"}, "right": "x"},
      "right": {"op": ">", "left": {"field": "n"}, "right": 5}},
     {"s": "x", "n": 7}, True),
    ({"op": "xor",
      "left": {"op": "==", "left": {"field": "s"}, "right": "x"},
      "right": {"op": "==", "left": {"field": "s"}, "right": "x"}},
     {"s": "x"}, False),
    ({"op": "nand",
      "left": {"op": "==", "left": {"field": "s"}, "right": "x"},
      "right": {"op": "==", "left": {"field": "s"}, "right": "x"}},
     {"s": "x"}, False),
    # truthiness / miss
    ({"op": "!", "operand": {"field": "s"}}, {"s": ""}, True),
    ({"op": "!", "operand": {"field": "s"}}, {"s": "v"}, False),
    ({"op": "miss", "operand": {"field": "s"}}, {"s": None}, True),
]


@pytest.mark.parametrize("ast,row,expected", CASES)
def test_condition(spark, ast, row, expected):
    fields = []
    if "s" in row:
        fields.append(T.StructField("s", T.StringType()))
    if "n" in row:
        fields.append(T.StructField("n", T.IntegerType()))
    schema = T.StructType(fields)
    df = spark.createDataFrame([tuple(row[f.name] for f in fields)], schema)
    got = df.select(compile_condition(ast, schema).alias("c")).first().c
    assert got == expected


def test_condition_missing_field_comparisons_false(spark):
    df = spark.createDataFrame([(None,)], "s string")
    ast = {"op": ">", "left": {"field": "s"}, "right": "1"}
    assert df.select(compile_condition(ast).alias("c")).first().c is False


def test_condition_numeric_sides_keep_fraction(spark):
    """force_number passes through values that are already numbers
    (condition_evaluator.js:49 `typeof x === 'number'`), and the jison
    lexer parseFloats numeric literals — so `[x] > 2.5` with x=2.6 is
    TRUE (NOT parseInt-truncated to 2 > 2)."""
    df = spark.createDataFrame([(2.6,)], "x double")
    gt = {"op": ">", "left": {"field": "x"}, "right": 2.5}
    lt = {"op": "<", "left": {"field": "x"}, "right": 2.5}
    assert df.select(compile_condition(gt, df.schema).alias("c")).first().c is True
    assert df.select(compile_condition(lt, df.schema).alias("c")).first().c is False
    # a STRING side still goes through parseInt: "2.6" -> 2, so 2 > 2.5 false
    df2 = spark.createDataFrame([("2.6",)], "x string")
    assert df2.select(compile_condition(gt, df2.schema).alias("c")).first().c is False
    # NULL in a numeric column still coerces to 0, never NULL
    df3 = spark.createDataFrame([(None,)], "x double")
    ge0 = {"op": ">=", "left": {"field": "x"}, "right": 0}
    assert df3.select(compile_condition(ge0, df3.schema).alias("c")).first().c is True


def test_condition_integral_double_stringifies_js_style(spark):
    """(2.0).toString() === '2' in JS, so `[x] == "2"` with double x=2.0
    is TRUE; same rule inside `in` literal lists."""
    df = spark.createDataFrame([(2.0,)], "x double")
    eq = {"op": "==", "left": {"field": "x"}, "right": "2"}
    assert df.select(compile_condition(eq, df.schema).alias("c")).first().c is True
    frac = spark.createDataFrame([(2.5,)], "x double")
    eq25 = {"op": "==", "left": {"field": "x"}, "right": "2.5"}
    assert frac.select(compile_condition(eq25, frac.schema).alias("c")).first().c is True
    inl = {"op": "in", "left": {"field": "x"}, "right": [2.0, 3.0]}
    assert df.select(compile_condition(inl, df.schema).alias("c")).first().c is True


def test_condition_in_array_field_ref(spark):
    """`"x" in [tags]` = membership in the tags ARRAY column (string-compare
    per element), mirroring condition_evaluator.js's array right-side."""
    df = spark.createDataFrame(
        [(["a", "x"], 1), (["a", "b"], 2), (None, 3), ([], 4)],
        "tags array<string>, id int")
    ast = {"op": "in", "left": "x", "right": {"field": "tags"}}
    got = {r.id: r.c for r in
           df.select("id", compile_condition(ast, df.schema).alias("c")).collect()}
    assert got == {1: True, 2: False, 3: False, 4: False}
    neg = {"op": "not in", "left": "x", "right": {"field": "tags"}}
    gotn = {r.id: r.c for r in
            df.select("id", compile_condition(neg, df.schema).alias("c")).collect()}
    assert gotn == {1: False, 2: True, 3: True, 4: True}
    # numeric left side string-compares against string elements
    ast_num = {"op": "in", "left": {"field": "id"}, "right": {"field": "tags"}}
    df2 = spark.createDataFrame([(["1", "z"], 1), (["2"], 3)],
                                "tags array<string>, id int")
    got2 = [r.c for r in
            df2.select(compile_condition(ast_num, df2.schema).alias("c")).collect()]
    assert got2 == [True, False]


def test_condition_in_non_array_field_is_false(spark):
    # the reference's instanceof-Array guard: a scalar right side -> false
    df = spark.createDataFrame([("xy",)], "tags string")
    ast = {"op": "in", "left": "x", "right": {"field": "tags"}}
    assert df.select(compile_condition(ast, df.schema).alias("c")).first().c is False


# --- grok compiler ----------------------------------------------------------

def test_grok_expand_simple():
    cg = GrokCompiler().compile(r"%{INT:n} %{WORD:w}")
    m = cg.compiled.search("42 hello")
    assert m.group("n") == "42" and m.group("w") == "hello"
    assert cg.fields == ["n", "w"]


def test_grok_recursive_and_java_flavour():
    cg = GrokCompiler().compile(r"%{NUMBER:val}")
    assert cg.compiled.search("3.14").group("val") == "3.14"
    assert "(?P<" not in cg.java_regex          # plain positional groups
    assert cg.group_index("val") == 1


def test_grok_syslog_line():
    line = "<13>Feb  5 17:32:18 host1 app[1234]: hello world"
    cg = GrokCompiler().compile(
        r"%{SYSLOGPRI}%{SYSLOGTIMESTAMP:ts} %{NOTSPACE:host} %{SYSLOGPROG}: %{GREEDYDATA:msg}")
    m = cg.compiled.search(line)
    assert m.group("syslog_pri") == "13"
    assert m.group("program") == "app"
    assert m.group("pid") == "1234"
    assert m.group("msg") == "hello world"


def test_grok_apache_combined():
    line = ('127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] '
            '"GET /apache_pb.gif HTTP/1.0" 200 2326 '
            '"http://www.example.com/start.html" "Mozilla/4.08"')
    cg = GrokCompiler().compile(r"%{COMBINEDAPACHELOG}")
    m = cg.compiled.search(line)
    assert m.group("clientip") == "127.0.0.1"
    assert m.group("verb") == "GET"
    assert m.group("response") == "200"
    assert m.group("agent") == '"Mozilla/4.08"'


def test_grok_unknown_pattern_raises():
    with pytest.raises(KeyError):
        GrokCompiler().compile(r"%{NOPE:x}")
