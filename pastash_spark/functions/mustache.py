"""Mini Mustache engine for the `mustache` filter — full template surface
(the reference renders with the npm `mustache` lib, filter_mustache.js:25-36):

  * ``{{var}}``          HTML-escaped variable (mustache.js entity map)
  * ``{{{var}}}`` / ``{{&var}}``  raw variable
  * ``{{#sec}}..{{/sec}}``  section: list -> iterate, dict -> push context,
                            other truthy -> render once, falsy/empty -> skip
  * ``{{^sec}}..{{/sec}}``  inverted section (render iff falsy/empty)
  * ``{{!comment}}``        dropped
  * dotted names (``a.b.c``) resolved through the context stack; ``{{.}}``
    is the current iteration item

Rendering happens in ONE Arrow pandas UDF over a struct of the referenced
top-level columns (template parsed once at plan-build; per-row work is a
token walk, same cost class as the reference's per-event Mustache.render).
Templates using only simple variables take the native-column fast path in
operators/mutate.py instead and never reach Python.
"""

from __future__ import annotations

import re
from typing import Any

_TAG = re.compile(r"\{\{\{\s*([\w.]+)\s*\}\}\}"      # {{{raw}}}
                  r"|\{\{!(?s:.*?)\}\}"              # comment, ANY content
                  r"|\{\{([#^/&!]?)\s*([\w.]*)\s*\}\}")

# mustache.js entity map
_ESCAPES = {"&": "&amp;", "<": "&lt;", ">": "&gt;", '"': "&quot;",
            "'": "&#39;", "/": "&#x2F;", "`": "&#x60;", "=": "&#x3D;"}
_ESC_RE = re.compile("|".join(re.escape(k) for k in _ESCAPES))


def html_escape(s: str) -> str:
    return _ESC_RE.sub(lambda m: _ESCAPES[m.group()], s)


# --- parse to a token tree ---------------------------------------------------
# token = ("text", str) | ("var", name, escaped: bool)
#       | ("section", name, inverted: bool, children: list)

def parse_template(template: str) -> list[tuple]:
    root: list[tuple] = []
    stack: list[tuple[str, list]] = [("", root)]
    pos = 0
    for m in _TAG.finditer(template):
        if m.start() > pos:
            stack[-1][1].append(("text", template[pos:m.start()]))
        pos = m.end()
        if m.group(1) is not None:                      # {{{raw}}}
            stack[-1][1].append(("var", m.group(1), False))
            continue
        sigil, name = m.group(2), m.group(3)
        if sigil is None or sigil == "!":               # comment -> dropped
            continue
        if sigil in ("#", "^"):
            children: list[tuple] = []
            stack[-1][1].append(("section", name, sigil == "^", children))
            stack.append((name, children))
        elif sigil == "/":
            if len(stack) < 2 or stack[-1][0] != name:
                raise ValueError(f"mustache: unbalanced section {name!r}")
            stack.pop()
        elif sigil == "&":
            stack[-1][1].append(("var", name, False))
        else:
            stack[-1][1].append(("var", name or ".", True))
    if len(stack) != 1:
        raise ValueError(f"mustache: unclosed section {stack[-1][0]!r}")
    if pos < len(template):
        root.append(("text", template[pos:]))
    return root


def referenced_roots(tokens: list[tuple]) -> set[str]:
    """Top-level names the template reads (for column pruning)."""
    roots: set[str] = set()
    for t in tokens:
        if t[0] == "var" and t[1] != ".":
            roots.add(t[1].split(".")[0])
        elif t[0] == "section":
            roots.add(t[1].split(".")[0])
            roots |= referenced_roots(t[3])
    return roots


def only_simple_vars(tokens: list[tuple]) -> bool:
    return all(t[0] == "text" or (t[0] == "var" and t[1] != ".")
               for t in tokens)


# --- render ------------------------------------------------------------------

def _lookup(name: str, stack: list[Any]) -> Any:
    if name == ".":
        return stack[-1]
    parts = name.split(".")
    for ctx in reversed(stack):
        cur = ctx
        found = True
        for p in parts:
            if isinstance(cur, dict) and p in cur:
                cur = cur[p]
            else:
                found = False
                break
        if found:
            return cur
    return None


def _falsy(v: Any) -> bool:
    return v is None or v is False or v == "" or v == [] or v == {} or v == 0


def _js_str(v: Any) -> str:
    """JS String(v) semantics for the value types Spark rows can carry:
    Array.toString = elements comma-joined (so [1,2] -> '1,2', the
    mustache.js rendering), plain objects -> '[object Object]', booleans
    lowercase, integral floats without the trailing .0."""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    if isinstance(v, (list, tuple)):
        return ",".join("" if x is None else _js_str(x) for x in v)
    if isinstance(v, dict):
        return "[object Object]"
    return str(v)


def render(tokens: list[tuple], stack: list[Any]) -> str:
    out: list[str] = []
    for t in tokens:
        if t[0] == "text":
            out.append(t[1])
        elif t[0] == "var":
            v = _lookup(t[1], stack)
            if v is None:
                continue
            s = _js_str(v)
            out.append(html_escape(s) if t[2] else s)
        else:  # section
            _, name, inverted, children = t
            v = _lookup(name, stack)
            if inverted:
                if _falsy(v):
                    out.append(render(children, stack))
            elif not _falsy(v):
                items = v if isinstance(v, list) else [v]
                for item in items:
                    stack.append(item)
                    out.append(render(children, stack))
                    stack.pop()
    return "".join(out)


def render_row(tokens: list[tuple], row: dict) -> str:
    return render(tokens, [row])
