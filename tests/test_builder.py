"""Pipeline-spec builder tests — the config-layer equivalent of the
reference's logstash-config e2e suite (/root/reference/test/test_421_logstash
fixtures: simple, if_regex, else_else_if, grep, fields_tags)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pastash_spark.operators import route as R
from pastash_spark.plans.builder import build, register


def test_simple_chain(spark):
    df = spark.createDataFrame(
        [("error 42 here",), ("ok 7 fine",)], "message string")
    out = build(df, [
        {"op": "regex", "regex": r"^(\w+) (\d+)", "fields": ["lvl", "code"],
         "numerical_fields": ["code"]},
        {"op": "add_fields", "fields": {"summary": "#{lvl}:#{code}"}},
        {"op": "add_tags", "tags": ["parsed"]},
    ])
    rows = {r.lvl: r for r in out.collect()}
    assert rows["error"].summary == "error:42.0"
    assert rows["ok"].tags == ["parsed"]


def test_if_else_chain_first_match_wins(spark):
    df = spark.createDataFrame(
        [("nginx", 1), ("apache", 2), ("other", 3)], "type string, n int")
    out = build(df, [
        {"op": "if",
         "cond": {"op": "==", "left": {"field": "type"}, "right": "nginx"},
         "then": [{"op": "add_fields", "fields": {"cls": "web-n"}}],
         "elif": [{"cond": {"op": "==", "left": {"field": "type"},
                            "right": "apache"},
                   "then": [{"op": "add_fields", "fields": {"cls": "web-a"}}]}],
         "else": [{"op": "add_fields", "fields": {"cls": "misc"}}]},
    ])
    got = {r.type: r.cls for r in out.collect()}
    assert got == {"nginx": "web-n", "apache": "web-a", "other": "misc"}


def test_if_branch_mutating_its_own_condition_field(spark):
    """A then-branch that rewrites the field its own condition tested must
    NOT re-trigger a later elif/else: branch choice is decided on the
    ORIGINAL row (config_mapper.js:32-58 first-match-wins)."""
    df = spark.createDataFrame([("a", 1), ("b", 2), ("c", 3)],
                               "x string, n int")
    out = build(df, [
        {"op": "if",
         "cond": {"op": "==", "left": {"field": "x"}, "right": "a"},
         # rewrites x -> 'b': the elif (x == 'b') must not also fire
         "then": [{"op": "add_fields", "fields": {"x": "b"}},
                  {"op": "add_fields", "fields": {"hit": "first"}}],
         "elif": [{"cond": {"op": "==", "left": {"field": "x"},
                            "right": "b"},
                   "then": [{"op": "add_fields", "fields": {"hit": "second"}}]}],
         "else": [{"op": "add_fields", "fields": {"hit": "none"}}]},
    ])
    got = {r.n: (r.x, r.hit) for r in out.collect()}
    assert got == {1: ("b", "first"), 2: ("b", "second"), 3: ("c", "none")}
    assert "_branch_idx" not in str(out.columns)


def test_nested_if_blocks(spark):
    """Nested if inside a then-branch: hidden index columns are per-block
    unique, so nesting cannot clobber the outer block's gating."""
    df = spark.createDataFrame([("a", 1), ("a", 20), ("b", 5)],
                               "x string, n int")
    out = build(df, [
        {"op": "if",
         "cond": {"op": "==", "left": {"field": "x"}, "right": "a"},
         "then": [
             {"op": "if",
              "cond": {"op": ">", "left": {"field": "n"}, "right": 10},
              "then": [{"op": "add_fields", "fields": {"cls": "a-big"}}],
              "else": [{"op": "add_fields", "fields": {"cls": "a-small"}}]}],
         "else": [{"op": "add_fields", "fields": {"cls": "other"}}]},
    ])
    got = {r.n: r.cls for r in out.collect()}
    assert got == {1: "a-small", 20: "a-big", 5: "other"}


def test_only_type_gating_in_spec(spark):
    df = spark.createDataFrame(
        [("nginx", "a b"), ("apache", "c d")], "type string, message string")
    out = build(df, [
        {"op": "gsub", "field": "message", "from_regex": " ", "to": "_",
         "only_type": "nginx"},
    ])
    got = {r.type: r.message for r in out.collect()}
    assert got == {"nginx": "a_b", "apache": "c d"}


def test_route_and_drop(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], "v int")
    out = build(df, [
        {"op": "drop", "cond": {"op": ">", "left": {"field": "v"},
                                "right": 7}},
        {"op": "route", "branches": [
            ["low", {"op": "<", "left": {"field": "v"}, "right": 3}]],
         "default": "rest"},
    ])
    got = {r.v: r[R.ROUTE_COL] for r in out.collect()}
    assert len(got) == 8                      # 8,9 dropped
    assert got[0] == "low" and got[5] == "rest"


def test_register_custom_op(spark):
    register("double_it", lambda d, field: d.withColumn(field, F.col(field) * 2))
    df = spark.createDataFrame([(21,)], "x int")
    assert build(df, [{"op": "double_it", "field": "x"}]).first().x == 42


def test_unknown_op_raises(spark):
    df = spark.createDataFrame([(1,)], "x int")
    with pytest.raises(KeyError, match="unknown pipeline op"):
        build(df, [{"op": "nope"}])


def test_only_field_exist_equal_match_gating(spark):
    """base_component.js:165-247: only_field_exist_<name> gates on JS
    TRUTHINESS (empty string fails too), only_field_equal_<name>=<v> on
    equality, only_field_match_<name>=<re> on regex; ALL conditions AND —
    composing with only_type."""
    df = spark.createDataFrame(
        [("nginx", "u1", "x"), ("nginx", None, "x"), ("nginx", "", "x"),
         ("nginx", "u1", "y"), ("apache", "u1", "x")],
        "type string, user string, env string")
    out = build(df, [{"op": "add_fields", "fields": {"hit": "1"},
                      "only_type": "nginx",
                      "only_field_exist_user": True,
                      "only_field_equal_env": "x"}])
    got = [(r.type, r.user, r.env, r.hit) for r in out.collect()]
    assert got == [("nginx", "u1", "x", "1"),
                   ("nginx", None, "x", None),    # user missing
                   ("nginx", "", "x", None),      # empty = falsy = filtered
                   ("nginx", "u1", "y", None),    # env != x
                   ("apache", "u1", "x", None)]   # wrong type
    m = build(df, [{"op": "add_fields", "fields": {"hit": "1"},
                    "only_field_match_user": "^u[0-9]+$"}])
    gotm = {(r.type, r.user, r.env): r.hit for r in m.collect()}
    assert gotm == {("nginx", "u1", "x"): "1", ("nginx", None, "x"): None,
                    ("nginx", "", "x"): None, ("nginx", "u1", "y"): "1",
                    ("apache", "u1", "x"): "1"}
