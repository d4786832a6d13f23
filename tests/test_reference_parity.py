"""Golden cases lifted from the reference's own test suites — same inputs,
same expected outputs, re-expressed on DataFrames.  File/case names cite the
reference test they mirror (semantics only; no code copied)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pastash_spark.operators import mutate as M
from pastash_spark.operators import parse as P
from pastash_spark.operators import route as R
from pastash_spark.plans.builder import build


def msgs(spark, *lines):
    return spark.createDataFrame([(l,) for l in lines], "message string")


class TestFilterRegex202:
    """/root/reference/test/test_202_filter_regex.js"""

    def test_unicode_capture(self, spark):
        # the reference asserts regex capture works on accented text
        df = msgs(spark, "été: çava éè")
        out = P.regex_extract(df, r"^(\w+): (.*)$", fields=["saison", "rest"])
        r = out.first()
        assert r.saison == "été" and r.rest == "çava éè"

    def test_numeric_coercion_triplet(self, spark):
        # int / dot-float / comma-float, exactly regex_helper.js:37-48
        df = msgs(spark, "a=12 b=12.3 c=12,3")
        out = P.regex_extract(df, r"a=(\S+) b=(\S+) c=(\S+)",
                              fields=["a", "b", "c"],
                              numerical_fields=["a", "b", "c"]).first()
        assert (out.a, out.b, out.c) == (12.0, 12.3, 12.3)

    def test_non_numeric_declared_field_dropped(self, spark):
        df = msgs(spark, "x=abc")
        out = P.regex_extract(df, r"x=(\S+)", fields=["x"],
                              numerical_fields=["x"]).first()
        assert out.x is None

    def test_no_match_leaves_event_unchanged(self, spark):
        df = msgs(spark, "will not match").withColumn("keep", F.lit("v"))
        out = P.regex_extract(df, r"^zzz(\d+)", fields=["n"]).first()
        assert out.keep == "v" and out.n is None


class TestFilterGrok218:
    """/root/reference/test/test_218_filter_grok.js"""

    def test_failure_tag_default(self, spark):
        out = P.grok(msgs(spark, "nope"), r"%{IP:ip}").first()
        assert out.tags == ["_grokparsefailure"]

    def test_ip_and_user_extraction(self, spark):
        out = P.grok(msgs(spark, "from 10.1.2.3 user frank"),
                     r"from %{IP:ip} user %{USER:user}").first()
        assert out.ip == "10.1.2.3" and out.user == "frank"

    def test_custom_extra_pattern(self, spark):
        out = P.grok(msgs(spark, "id=ab12"), r"id=%{MYID:the_id}",
                     extra_patterns={"MYID": r"[a-z]{2}\d{2}"}).first()
        assert out.the_id == "ab12"


class TestMessageFiltering206:
    """/root/reference/test/test_206_message_filtering.js — only_type gates."""

    def test_only_type_applies_and_skips(self, spark):
        df = spark.createDataFrame(
            [("nginx", "hello"), ("apache", "hello")],
            "type string, message string")
        out = M.only_type(df, "nginx",
                          lambda d: M.add_fields(d, {"tagged": "yes"}))
        got = {r.type: r.tagged for r in out.collect()}
        assert got == {"nginx": "yes", "apache": None}


class TestLogstash421:
    """/root/reference/test/test_421_logstash/* config fixtures."""

    def test_if_regex_shape(self, spark):
        # fixture if_regex: if [message] =~ /abc/ { add_field } else { other }
        df = msgs(spark, "abc here", "no match")
        out = build(df, [
            {"op": "if",
             "cond": {"op": "=~", "left": {"field": "message"}, "right": "abc"},
             "then": [{"op": "add_fields", "fields": {"cls": "matched"}}],
             "else": [{"op": "add_fields", "fields": {"cls": "other"}}]},
        ])
        got = {r.message: r.cls for r in out.collect()}
        assert got == {"abc here": "matched", "no match": "other"}

    def test_else_else_if_exclusivity(self, spark):
        # fixture else_else_if: exactly one branch fires per event
        df = spark.createDataFrame(
            [("a", 1), ("b", 2), ("c", 3)], "k string, n int")
        routed = R.route(df, [
            ("first", F.col("k") == "a"),
            ("second", F.col("n") > 1),        # b and c match this too
        ], default="fallthrough")
        got = {r.k: r[R.ROUTE_COL] for r in routed.collect()}
        # first-match-wins: 'a' never reaches the second branch
        assert got == {"a": "first", "b": "second", "c": "second"}

    def test_fields_tags_combination(self, spark):
        # fixtures fields_tags_*: add_fields + add_tags together
        df = msgs(spark, "x")
        out = build(df, [
            {"op": "add_fields", "fields": {"site": "main"}},
            {"op": "add_tags", "tags": ["t1", "t2"]},
            {"op": "remove_tags", "tags": ["t1"]},
        ]).first()
        assert out.site == "main" and out.tags == ["t2"]

    def test_upper_fixture_equivalent(self, spark):
        # fixture `upper`: eval-style transformation of the message
        out = build(msgs(spark, "shout"),
                    [{"op": "eval", "target": "message",
                      "expression": "upper(message)"}]).first()
        assert out.message == "SHOUT"


class TestConditionEvaluator105:
    """/root/reference/test/test_105_condition_evaluator.js ops."""

    @pytest.mark.parametrize("op,left,right,expected", [
        ("==", "5", 5, True),          # string-compare bridges types
        ("!=", "5", "6", True),
        (">=", "10", "10", True),
        ("<", "9", "10", True),        # numeric, not lexicographic
        ("in", "b", ["a", "b"], True),
        ("not in", "z", ["a", "b"], True),
    ])
    def test_op_table(self, spark, op, left, right, expected):
        from pastash_spark.functions.conditions import compile_condition
        df = spark.createDataFrame([(left,)], "v string")
        ast = {"op": op, "left": {"field": "v"}, "right": right}
        assert df.select(compile_condition(ast).alias("c")).first().c == expected
