"""Condition DSL -> Catalyst Column compiler.

Reimplements the semantics of the reference's condition evaluator
(/root/reference/lib/lib/condition_evaluator.js:63-133) including its quirks:

  * ``==`` / ``!=`` compare **as strings** (force_string, :66); a missing
    field force_strings to '' (:42-47), so ``missing == ""`` is TRUE
  * ``> >= < <=`` coerce both sides JS-``parseInt``-style — leading integer
    prefix parsed; an unparseable/missing side coerces to **0**, not to
    "comparison false": force_number returns the boolean ``false`` on NaN
    (:49-61) and JS comparisons treat false as 0, so ``5 > 'abc'`` is TRUE
    and ``'x' >= 'y'`` is TRUE (0 >= 0)
  * ``=~`` / ``!~`` regex match on the force_string'd value ('' when
    missing — a ``a*`` pattern matches a missing field)
  * ``in`` / ``not in`` membership with string compare; right side may be
    a literal list or an ARRAY field ref
  * ``!`` JS truthiness negation; ``and or xor nand`` boolean connectives
  * ``miss`` true when the field is absent (here: NULL).  Deliberate
    repair: the reference's `miss` branch (:127-129) indexes
    ``data[cond.left]`` with the parsed ``{field:..}`` OBJECT, which is
    always undefined — dead code no reference test exercises; we implement
    the documented intent (field missing) instead.

AST shape (ours — the reference builds an equivalent tree from its jison
grammar, /root/reference/lib/logstash_config.jison:89-110):

  leaf       literal str/int/float/bool, or {"field": "name"}
  unary      {"op": "!", "operand": ast} | {"op": "miss", "operand": ast}
  binary     {"op": "==", "left": ast, "right": ast}   (right of in/not in
             is a list of literals)

The whole tree compiles to ONE Column expression, evaluated once per row
inside codegen — vs. the reference's per-plugin per-event tree walk.
"""

from __future__ import annotations

from typing import Any, Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# JS parseInt emulation: grab optional-signed leading digits; '' -> null (NaN).
_PARSEINT_RE = r"^\s*([+-]?[0-9]+)"


def _parseint(c: Column) -> Column:
    """JS parseInt + the evaluator's force_number quirk: NaN (unparseable
    or missing) becomes the boolean false, which JS comparison operators
    coerce to 0 (condition_evaluator.js:49-61) — so the column is 0, never
    NULL."""
    s = F.regexp_extract(c.cast("string"), _PARSEINT_RE, 1)
    return F.when(s.isNull() | (s == ""), F.lit(0).cast("long")) \
        .otherwise(s.cast("long"))


def _force_string(c: Column) -> Column:
    """force_string (condition_evaluator.js:42-47): undefined -> ''."""
    return F.coalesce(c.cast("string"), F.lit(""))


def _js_tostring(c: Column, dtype: T.DataType | None) -> Column:
    """force_string with JS Number.toString semantics: an integral double
    renders without the trailing '.0' ((2.0).toString() === '2'), unlike
    Spark's double->string cast.  Mirrors mustache._js_str for literals."""
    if isinstance(dtype, (T.DoubleType, T.FloatType, T.DecimalType)):
        d = c.cast("double")
        s = F.when(d.isNotNull() & (d == F.floor(d)) & (F.abs(d) < 1e15),
                   d.cast("long").cast("string")) \
             .otherwise(d.cast("string"))
        return F.coalesce(s, F.lit(""))
    return _force_string(c)


def truthy(c: Column, dtype: T.DataType | None = None) -> Column:
    """JS truthiness: null/''/0/false are falsy; everything else truthy."""
    if isinstance(dtype, T.BooleanType):
        return F.coalesce(c, F.lit(False))
    if isinstance(dtype, T.NumericType):
        return c.isNotNull() & (c != 0)
    if isinstance(dtype, T.StringType):
        return c.isNotNull() & (c != "")
    # unknown type: string-view semantics (covers the reference's usual
    # string-typed event fields); numeric 0 in an untyped context is "0"
    # which JS would call truthy-as-string anyway once serialized
    return c.isNotNull() & (c.cast("string") != "")


def _js_str(v: Any) -> str:
    """Literal -> its JS toString (booleans lowercase, integral floats
    without the trailing '.0' — Number.toString)."""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    return str(v)


def _is_leaf(ast: Any) -> bool:
    return not (isinstance(ast, Mapping) and "op" in ast)


def _leaf_column(ast: Any) -> Column:
    if isinstance(ast, Mapping) and "field" in ast:
        return F.col(ast["field"])
    return F.lit(ast)


def _leaf_dtype(ast: Any, schema: T.StructType | None) -> T.DataType | None:
    if isinstance(ast, Mapping) and "field" in ast:
        if schema is not None and ast["field"] in schema.fieldNames():
            return schema[ast["field"]].dataType
        return None
    if isinstance(ast, bool):
        return T.BooleanType()
    if isinstance(ast, (int, float)):
        return T.DoubleType()
    return T.StringType()


def compile_condition(ast: Any, schema: T.StructType | None = None) -> Column:
    """Compile a condition AST to a boolean Column (never NULL: missing
    operands make the comparison False, as in the reference)."""
    if _is_leaf(ast):
        return truthy(_leaf_column(ast), _leaf_dtype(ast, schema))

    op = ast["op"]
    if op == "!":
        return ~compile_condition(ast["operand"], schema)
    if op == "miss":
        return _leaf_column(ast["operand"]).isNull()

    if op in ("and", "or", "xor", "nand"):
        l = compile_condition(ast["left"], schema)
        r = compile_condition(ast["right"], schema)
        if op == "and":
            return l & r
        if op == "or":
            return l | r
        if op == "xor":
            return l != r
        return ~(l & r)

    l_col, r_col = _leaf_or_sub(ast["left"], schema), _leaf_or_sub(ast["right"], schema)
    l_dt = _leaf_dtype(ast["left"], schema) if _is_leaf(ast["left"]) else T.BooleanType()
    r_dt = _leaf_dtype(ast["right"], schema) if _is_leaf(ast["right"]) else T.BooleanType()

    if op in ("==", "!="):
        # force_string compare (condition_evaluator.js:66); missing -> '';
        # numbers stringify JS-style (integral doubles without '.0')
        eq = _js_tostring(l_col, l_dt) == _js_tostring(r_col, r_dt)
        return eq if op == "==" else ~eq
    if op in (">", ">=", "<", "<="):
        # force_number (condition_evaluator.js:49-61): a side that is
        # already a number passes through unchanged (the jison lexer
        # parseFloats numeric literals, logstash_config.jison:17, and
        # `typeof x === 'number'` short-circuits parseInt), so floats keep
        # their fraction; everything else goes through JS parseInt with
        # NaN/missing coerced to 0 — never NULL either way.
        def _force_number(c: Column, dt: T.DataType | None) -> Column:
            if isinstance(dt, T.NumericType):
                return F.coalesce(c.cast("double"), F.lit(0.0))
            return _parseint(c).cast("double")

        li, ri = _force_number(l_col, l_dt), _force_number(r_col, r_dt)
        return {">": li > ri, ">=": li >= ri,
                "<": li < ri, "<=": li <= ri}[op]
    if op in ("=~", "!~"):
        pat = ast["right"]
        if not isinstance(pat, str):
            raise ValueError("regex condition needs a literal pattern")
        m = _force_string(l_col).rlike(pat)
        return m if op == "=~" else ~m
    if op in ("in", "not in"):
        right = ast["right"]
        if isinstance(right, Mapping) and "field" in right:
            # field-ref right side: membership in an ARRAY column (the
            # reference requires the right operand to resolve to an array —
            # condition_evaluator.js; e.g. `if "x" in [tags]`).  Non-array
            # field -> membership is false, as in the reference's
            # instanceof-Array guard.
            dt = _leaf_dtype(right, schema)
            if dt is not None and not isinstance(dt, T.ArrayType):
                m = F.lit(False)
            else:
                l_str = _js_tostring(l_col, l_dt)
                m = F.coalesce(
                    F.exists(F.col(right["field"]),
                             lambda x: x.cast("string") == l_str),
                    F.lit(False))
        else:
            vals = [_js_str(v) for v in right]
            m = _js_tostring(l_col, l_dt).isin(vals)
        return m if op == "in" else ~m
    raise ValueError(f"unknown condition op: {op!r}")


def _leaf_or_sub(ast: Any, schema: T.StructType | None) -> Column:
    if _is_leaf(ast):
        return _leaf_column(ast)
    # nested expression used as a value -> its boolean result
    return compile_condition(ast, schema)
