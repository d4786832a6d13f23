"""Expression compilers: templates, conditions, coercion, grok.

These are the engine's "scalar function" layer.  Each compiler emits a
Catalyst ``Column`` expression — compiled once at plan time and executed
inside whole-stage codegen, replacing the reference's per-event interpreted
callbacks (template cache at /root/reference/lib/lib/base_component.js:288-329,
condition walker at /root/reference/lib/lib/condition_evaluator.js:63-133).
"""

from pastash_spark.functions.coerce import coerce_numeric_str, NUM_INT_RE, NUM_FLOAT_RE
from pastash_spark.functions.interpolate import compile_template, template_fields
from pastash_spark.functions.conditions import compile_condition, truthy
from pastash_spark.functions.grok import GrokCompiler, CORE_PATTERNS

__all__ = [
    "coerce_numeric_str", "NUM_INT_RE", "NUM_FLOAT_RE",
    "compile_template", "template_fields",
    "compile_condition", "truthy",
    "GrokCompiler", "CORE_PATTERNS",
]
