"""``#{field}`` template interpolation -> one Catalyst concat expression.

Reference semantics (/root/reference/lib/lib/base_component.js:288-354):
  * ``#{name}`` substitutes the event field (dotted ``a.b`` reaches into
    nested objects, :277-286)
  * ``#{now:FMT}`` substitutes the current time formatted with a moment.js
    format string
  * if ANY referenced field is missing the whole interpolation yields
    undefined — the caller suppresses the write.  Here: the expression
    returns NULL when any referenced column is null.

The reference caches the parsed template per filter instance
(``replace_cache``); here parsing happens once at plan-build time and the
result is a single codegen'd ``concat``.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_TOKEN_RE = re.compile(r"#\{([^}]+)\}")

# moment.js -> java.time format token translation for the subset paStash
# recipes use (regex_helper.js:20-29 default 'YYYY-MM-DDTHH:mm:ss.SSSZZ').
_MOMENT_TOKENS = [
    ("YYYY", "yyyy"), ("YY", "yy"),
    ("DDDD", "DDD"),
    ("DD", "dd"), ("D", "d"),
    ("HH", "HH"), ("H", "H"),
    ("hh", "hh"),
    ("mm", "mm"), ("m", "m"),
    ("ss", "ss"), ("s", "s"),
    ("SSS", "SSS"),
    ("ZZ", "xx"), ("Z", "xxx"),
    ("MMMM", "MMMM"), ("MMM", "MMM"), ("MM", "MM"), ("M", "M"),
    ("dddd", "EEEE"), ("ddd", "EEE"),
    ("A", "a"), ("a", "a"),
    ("X", "X"),
]


def moment_to_java(fmt: str) -> str:
    """Translate a moment.js format string to a java.time pattern."""
    out = []
    i = 0
    while i < len(fmt):
        for tok, rep in _MOMENT_TOKENS:
            if fmt.startswith(tok, i):
                out.append(rep)
                i += len(tok)
                break
        else:
            ch = fmt[i]
            # quote literal letters so java.time doesn't interpret them
            out.append(f"'{ch}'" if ch.isalpha() else ch)
            i += 1
    return "".join(out)


def template_fields(template: str) -> list[str]:
    """Field names referenced by a template (``now:`` refs excluded)."""
    return [m for m in _TOKEN_RE.findall(template) if not m.startswith("now:")]


def compile_template(template: str) -> Column:
    """Template string -> Column (null if any referenced field is null)."""
    parts: list[Column] = []
    fields: list[str] = []
    pos = 0
    for m in _TOKEN_RE.finditer(template):
        if m.start() > pos:
            parts.append(F.lit(template[pos:m.start()]))
        ref = m.group(1)
        if ref.startswith("now:"):
            parts.append(F.date_format(F.current_timestamp(),
                                       moment_to_java(ref[4:])))
        elif ref == "now":
            parts.append(F.date_format(F.current_timestamp(),
                                       moment_to_java("YYYY-MM-DDTHH:mm:ss.SSSZZ")))
        else:
            fields.append(ref)
            parts.append(F.col(ref).cast("string"))
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    if not parts:
        return F.lit("")
    expr = F.concat(*parts) if len(parts) > 1 else parts[0]
    if not fields:
        return expr
    # missing-field suppression: any null referenced field -> null result
    missing = None
    for f in fields:
        cond = F.col(f).isNull()
        missing = cond if missing is None else (missing | cond)
    return F.when(missing, F.lit(None).cast("string")).otherwise(expr)
