"""Builtin regex pattern specs for the `regex` filter.

The reference resolves bare pattern names (``regex://http_combined``) to JSON
spec files shipped under lib/patterns/ via patterns_loader
(/root/reference/lib/lib/patterns_loader.js:14-46, filter_regex.js:28-44):
each spec carries the regex, the capture field names, the numeric fields and
a moment date format.  Same surface here: the specs below cover the shipped
names (written against the Apache combined-log and RFC 3164 syslog formats —
the same public formats the reference's files encode), and
``register_regex_pattern`` layers user-defined names over them the way extra
pattern directories do in the reference.
"""

from __future__ import annotations

from typing import Any

BUILTIN_REGEX_PATTERNS: dict[str, dict[str, Any]] = {
    # Apache/nginx combined log format
    "http_combined": {
        "regex": (r'^(\S+) \S+ (\S+) \[([^\]]+)\] "([^"]*)" (\d+) (\d+) '
                  r'"([^"]*)" "([^"]*)'),
        "fields": ["ip", "user", "@timestamp", "request", "status",
                   "bytes_sent", "referer", "user_agent"],
        "numerical_fields": ["status", "bytes_sent"],
        "date_format": "DD/MMM/YYYY:HH:mm:ss ZZ",
    },
    # combined log preceded by the canonical vhost column
    "http_vhost_combined": {
        "regex": (r'^(\S+) (\S+) \S+ (\S+) \[([^\]]+)\] "([^"]*)" (\d+) (\d+) '
                  r'"([^"]*)" "([^"]*)'),
        "fields": ["vhost", "ip", "user", "@timestamp", "request", "status",
                   "bytes_sent", "referer", "user_agent"],
        "numerical_fields": ["status", "bytes_sent"],
        "date_format": "DD/MMM/YYYY:HH:mm:ss ZZ",
    },
    # RFC 3164 syslog line with <PRI> prefix
    "syslog": {
        "regex": (r"^<(\S+)>(\S+\s+\S+\s+\d+:\d+:\d+) (\S+) ([^:\[]+)"
                  r"\[?(\d*)\]?:\s+(.*)$"),
        "fields": ["syslog_priority", "timestamp", "host", "syslog_program",
                   "syslog_pid", "message"],
        "numerical_fields": ["syslog_pid"],
        "date_format": "MMM DD HH:mm:ss Z",
    },
    # RFC 3164 without the <PRI> prefix
    "syslog_no_prio": {
        "regex": (r"^(\S+\s+\S+\s+\d+:\d+:\d+) (\S+) ([^:\[]+)"
                  r"\[?(\d*)\]?:\s+(.*)$"),
        "fields": ["timestamp", "host", "syslog_program", "syslog_pid",
                   "message"],
        "numerical_fields": ["syslog_pid"],
        "date_format": "MMM DD HH:mm:ss Z",
    },
    # permissive syslog variant keeping program+message only
    "syslogingate_all": {
        "regex": r"<(\S+)>(\S+\s+\S+\s+\d+:\d+:\d+)(\s\S+[^:]){1,2}(:.*|:)",
        "fields": ["syslog_priority", "timestamp", "syslog_program",
                   "message"],
        "numerical_fields": [],
        "date_format": "MMM DD HH:mm:ss Z",
    },
}


def register_regex_pattern(name: str, spec: dict[str, Any]) -> None:
    """User pattern directories: later registrations shadow builtins, same
    precedence as patterns_loader directory ordering."""
    BUILTIN_REGEX_PATTERNS[name] = dict(spec)


def lookup_regex_pattern(name: str) -> dict[str, Any]:
    if name not in BUILTIN_REGEX_PATTERNS:
        raise KeyError(
            f"unknown builtin regex pattern {name!r} "
            f"(known: {sorted(BUILTIN_REGEX_PATTERNS)})")
    return BUILTIN_REGEX_PATTERNS[name]
