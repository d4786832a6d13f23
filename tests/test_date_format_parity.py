"""moment.js -> java.time date-format parity (VERDICT r02 item 7).

The reference formats dates with moment() (regex_helper.js:20-29 default
'YYYY-MM-DDTHH:mm:ss.SSSZZ'; filter_compute_date_field.js:28-37 arbitrary
user formats; apache CLF 'DD/MMM/YYYY:HH:mm:ss ZZ').  compute_date_field
translates moment tokens to a java.time pattern; this test pins the mapping
for every token the reference's recipes use against an independent Python
oracle implementing moment's documented semantics.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import pytest
from pyspark.sql import functions as F

from pastash_spark.operators.mutate import compute_date_field

_MONTHS_ABBR = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
                "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
_MONTHS_FULL = ["January", "February", "March", "April", "May", "June",
                "July", "August", "September", "October", "November",
                "December"]
_DAYS_ABBR = ["Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun"]
_DAYS_FULL = ["Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
              "Saturday", "Sunday"]

# moment token -> renderer over a tz-aware UTC datetime (moment docs;
# session timezone is pinned UTC so ZZ='+0000', Z='+00:00')
_ORACLE = {
    "YYYY": lambda d: f"{d.year:04d}",
    "YY":   lambda d: f"{d.year % 100:02d}",
    "MMMM": lambda d: _MONTHS_FULL[d.month - 1],
    "MMM":  lambda d: _MONTHS_ABBR[d.month - 1],
    "MM":   lambda d: f"{d.month:02d}",
    "M":    lambda d: str(d.month),
    "DD":   lambda d: f"{d.day:02d}",
    "D":    lambda d: str(d.day),
    "dddd": lambda d: _DAYS_FULL[d.weekday()],
    "ddd":  lambda d: _DAYS_ABBR[d.weekday()],
    "HH":   lambda d: f"{d.hour:02d}",
    "H":    lambda d: str(d.hour),
    "hh":   lambda d: f"{(d.hour % 12) or 12:02d}",
    "mm":   lambda d: f"{d.minute:02d}",
    "m":    lambda d: str(d.minute),
    "ss":   lambda d: f"{d.second:02d}",
    "s":    lambda d: str(d.second),
    "SSS":  lambda d: f"{d.microsecond // 1000:03d}",
    "ZZ":   lambda d: "+0000",
    "Z":    lambda d: "+00:00",
}
_TOKENS_BY_LEN = sorted(_ORACLE, key=len, reverse=True)


def moment_render(dt: datetime, fmt: str) -> str:
    """Independent moment.js renderer: longest-token scan, unrecognized
    characters pass through literally (moment semantics)."""
    out, i = [], 0
    while i < len(fmt):
        for tok in _TOKENS_BY_LEN:
            if fmt.startswith(tok, i):
                out.append(_ORACLE[tok](dt))
                i += len(tok)
                break
        else:
            out.append(fmt[i])
            i += 1
    return "".join(out)


# deterministic timestamps covering month/day/hour boundaries, single-digit
# fields, noon/midnight, leap day, year wrap, sub-second values
_BASE = datetime(2023, 12, 31, 22, 58, 57, 987_000, tzinfo=timezone.utc)
_TIMES = [_BASE + timedelta(hours=7 * i, minutes=11 * i, seconds=13 * i,
                            milliseconds=37 * i)
          for i in range(40)]
_TIMES += [datetime(2024, 2, 29, 0, 0, 0, 1000, tzinfo=timezone.utc),
           datetime(2024, 3, 5, 4, 5, 6, 7000, tzinfo=timezone.utc),
           datetime(2024, 10, 9, 12, 0, 0, 0, tzinfo=timezone.utc)]

_FORMATS = [
    "YYYY-MM-DDTHH:mm:ss.SSSZZ",      # regex_helper.js default
    "DD/MMM/YYYY:HH:mm:ss ZZ",        # apache CLF
    "YYYY-MM-DD HH:mm:ssZ",
    "MMM D HH:mm:ss",                 # syslog-style
    "YY-M-D H:m:s",
    "MMMM dddd ddd",
    "YYYY.MM.DD-hh.mm.ss.SSS",
]


@pytest.mark.parametrize("fmt", _FORMATS)
def test_compute_date_field_matches_moment_oracle(spark, fmt):
    rows = [(i, t.replace(tzinfo=None)) for i, t in enumerate(_TIMES)]
    df = spark.createDataFrame(rows, "i int, `@timestamp` timestamp")
    got = {r.i: r.out for r in
           compute_date_field(df, "out", fmt).select("i", "out").collect()}
    want = {i: moment_render(t, fmt) for i, t in enumerate(_TIMES)}
    assert got == want


@pytest.mark.parametrize("tok", sorted(_ORACLE))
def test_every_reference_token_individually(spark, tok):
    """Each token in isolation, wrapped in parens — literal in BOTH
    engines ('[' is moment's literal-escape and java.time's optional
    section, so brackets are avoided)."""
    fmt = f"({tok})"
    rows = [(i, t.replace(tzinfo=None)) for i, t in enumerate(_TIMES[:8])]
    df = spark.createDataFrame(rows, "i int, `@timestamp` timestamp")
    got = {r.i: r.out for r in
           compute_date_field(df, "out", fmt).select("i", "out").collect()}
    want = {i: moment_render(t, fmt) for i, t in enumerate(_TIMES[:8])}
    assert got == want
