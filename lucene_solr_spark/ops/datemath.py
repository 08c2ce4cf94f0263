"""Solr DateMathParser port (solr/core/src/java/org/apache/solr/util/
DateMathParser.java) — the date arithmetic behind `NOW/DAY+6MONTHS`,
range-facet gaps, and date range endpoints.

Reference semantics reproduced exactly:
- The math string splits on Java's `\\b|(?<=\\d)(?=\\D)` pattern
  (DateMathParser.java:410) — word boundaries plus digit->non-digit
  seams — so `+6MONTHS/DAY` tokenizes to `+ 6 MONTHS / DAY` and a
  malformed run like `//` stays one multi-character token
  (ParseException "Multi character command").
- Commands `+`/`-` need an integer value and a unit; `/` rounds DOWN to
  the unit. Units are the CASE-SENSITIVE uppercase labels of
  CALENDAR_UNITS (YEAR(S), MONTH(S), DAY(S)/DATE, HOUR(S), MINUTE(S),
  SECOND(S), MILLI(S)/MILLISECOND(S)); WEEK is deliberately absent.
- Arithmetic is java.time LocalDateTime.plus: month/year addition CLAMPS
  the day-of-month (Jan 31 + 1MONTH = Feb 28/29), sub-day units are
  exact durations. Rounding truncates in the parser's TIMEZONE: the
  instant converts to local time (ZonedDateTime.ofInstant), the walk
  runs on local fields, and the result converts back
  (ZonedDateTime.of) — DST gaps push forward, ambiguous local times
  take the EARLIER offset, both matching Python's fold=0.
- `parseMath(now, val)` (the static form): `NOW...` applies math to
  `now`; otherwise the prefix up to the FIRST 'Z' (uppercase only —
  DateMathParser.java:232's indexOf('Z'), even though the instant
  parser itself is case-insensitive) parses as a lenient ISO instant
  and the rest is math. Missing 'Z' or a bad date raise.
- Precision is milliseconds (java.util.Date): fraction digits beyond 3
  TRUNCATE toward negative infinity (Instant.toEpochMilli floorDiv).

Pinned bit-for-bit against the patch-compiled reference class in
tests/test_lucene_ground_truth.py (GT round 67).
"""

from __future__ import annotations

import datetime as _dt
import re

__all__ = ["DateMathParseError", "parse_math", "parse_no_math", "date_math"]


class DateMathParseError(ValueError):
    """ParseException / SolrException(BAD_REQUEST) parity."""


_UNITS = {
    "YEAR": "Y", "YEARS": "Y",
    "MONTH": "M", "MONTHS": "M",
    "DAY": "D", "DAYS": "D", "DATE": "D",
    "HOUR": "h", "HOURS": "h",
    "MINUTE": "m", "MINUTES": "m",
    "SECOND": "s", "SECONDS": "s",
    "MILLI": "ms", "MILLIS": "ms",
    "MILLISECOND": "ms", "MILLISECONDS": "ms",
}

# Java Pattern "\b|(?<=\d)(?=\D)" — Python re supports both zero-width
# constructs; Java's split drops a leading zero-width match, Python's
# emits a leading '' (stripped below)
_SPLITTER = re.compile(r"\b|(?<=\d)(?=\D)")

_DAYS_IN_MONTH = (31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)


def _is_leap(y: int) -> bool:
    return y % 4 == 0 and (y % 100 != 0 or y % 400 == 0)


def _month_len(y: int, m: int) -> int:
    if m == 2 and _is_leap(y):
        return 29
    return _DAYS_IN_MONTH[m - 1]


def _zone(tz: str):
    if tz in ("UTC", "GMT", "Z"):
        return _dt.timezone.utc
    m = re.fullmatch(r"GMT([+-])(\d{1,2}):?(\d{2})?", tz)
    if m:
        sign = 1 if m.group(1) == "+" else -1
        mins = int(m.group(2)) * 60 + int(m.group(3) or 0)
        return _dt.timezone(sign * _dt.timedelta(minutes=mins))
    try:
        from zoneinfo import ZoneInfo

        return ZoneInfo(tz)
    except Exception:
        # TimeZone.getTimeZone returns GMT for unparseable ids
        return _dt.timezone.utc


def _add_months(t: _dt.datetime, months: int) -> _dt.datetime:
    # LocalDateTime.plusMonths: clamp day-of-month to the target month
    y = t.year
    m = t.month - 1 + months
    y += m // 12
    m = m % 12 + 1
    d = min(t.day, _month_len(y, m))
    return t.replace(year=y, month=m, day=d)


def _apply(t: _dt.datetime, command: str, val: int, unit: str) -> _dt.datetime:
    u = _UNITS.get(unit)
    if u is None:
        raise DateMathParseError(f'Unit not recognized: "{unit}"')
    if command == "/":
        if u == "Y":
            return t.replace(month=1, day=1, hour=0, minute=0, second=0,
                             microsecond=0)
        if u == "M":
            return t.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
        if u == "D":
            return t.replace(hour=0, minute=0, second=0, microsecond=0)
        if u == "h":
            return t.replace(minute=0, second=0, microsecond=0)
        if u == "m":
            return t.replace(second=0, microsecond=0)
        if u == "s":
            return t.replace(microsecond=0)
        # MILLIS: truncate to whole milliseconds
        return t.replace(microsecond=t.microsecond - t.microsecond % 1000)
    if u == "Y":
        return _add_months(t, 12 * val)
    if u == "M":
        return _add_months(t, val)
    delta = {
        "D": _dt.timedelta(days=val),
        "h": _dt.timedelta(hours=val),
        "m": _dt.timedelta(minutes=val),
        "s": _dt.timedelta(seconds=val),
        "ms": _dt.timedelta(milliseconds=val),
    }[u]
    return t + delta


def _local_of_instant(ms: int, zone) -> _dt.datetime:
    # exact integer arithmetic (no float epoch), then the zone's wall time
    aware = (_dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
             + _dt.timedelta(milliseconds=ms)).astimezone(zone)
    return aware.replace(tzinfo=None)


def _instant_of_local(t: _dt.datetime, zone) -> int:
    # ZonedDateTime.of: ambiguous local times take the EARLIER offset,
    # gap times shift forward by the gap — both are Python's fold=0
    aware = t.replace(tzinfo=zone, fold=0)
    utc = aware.astimezone(_dt.timezone.utc)
    epoch = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
    us = (utc - epoch) // _dt.timedelta(microseconds=1)
    return us // 1000  # Instant.toEpochMilli floors (floorDiv)


def date_math(now_ms: int, math: str, tz: str = "UTC") -> int:
    """DateMathParser(tz).setNow(now).parseMath(math) -> epoch millis."""
    if math == "":
        return int(now_ms)
    zone = _zone(tz)
    t = _local_of_instant(int(now_ms), zone)
    ops = _SPLITTER.split(math)
    if ops and ops[0] == "":
        ops = ops[1:]  # Java split drops the leading zero-width match
    while ops and ops[-1] == "":
        ops.pop()  # ...and removes trailing empty strings
    pos = 0
    while pos < len(ops):
        tok = ops[pos]
        if len(tok) != 1:
            raise DateMathParseError(f'Multi character command found: "{tok}"')
        command = tok
        pos += 1
        if command == "/":
            if len(ops) < pos + 1:
                raise DateMathParseError(
                    f'Need a unit after command: "{command}"')
            t = _apply(t, "/", 0, ops[pos])
            pos += 1
        elif command in "+-":
            if len(ops) < pos + 2:
                raise DateMathParseError(
                    f'Need a value and unit for command: "{command}"')
            try:
                val = int(ops[pos])
            except ValueError as exc:
                raise DateMathParseError(
                    f'Not a Number: "{ops[pos]}"') from exc
            pos += 1
            if command == "-":
                val = -val
            t = _apply(t, "+", val, ops[pos])
            pos += 1
        else:
            raise DateMathParseError(f'Unrecognized command: "{command}"')
    return _instant_of_local(t, zone)


_ISO_RE = re.compile(
    r"([+-]?\d{4,})-(\d{2})-(\d{2})[Tt](\d{2}):(\d{2}):(\d{2})"
    r"(?:\.(\d{1,9}))?[Zz]"
)


def parse_no_math(val: str) -> int:
    """The lenient case-insensitive ISO instant (DateMathParser.PARSER)
    -> epoch millis, truncating sub-milli fraction digits (Date.from)."""
    m = _ISO_RE.fullmatch(val)
    if m is None:
        raise DateMathParseError(f"Invalid Date String:'{val}'")
    y, mo, d = int(m.group(1)), int(m.group(2)), int(m.group(3))
    hh, mm, ss = int(m.group(4)), int(m.group(5)), int(m.group(6))
    frac = (m.group(7) or "").ljust(9, "0")
    nanos = int(frac) if frac else 0
    if not (1 <= mo <= 12 and 1 <= d <= _month_len(y, mo)
            and hh < 24 and mm < 60 and ss < 60):
        raise DateMathParseError(f"Invalid Date String:'{val}'")
    days = _days_from_civil(y, mo, d)
    total_ms = ((days * 86400 + hh * 3600 + mm * 60 + ss) * 1000
                + nanos // 1_000_000)
    return total_ms


def _days_from_civil(y: int, m: int, d: int) -> int:
    """Days since 1970-01-01, proleptic Gregorian (Howard Hinnant's
    civil_from_days inverse)."""
    y -= m <= 2
    era = (y if y >= 0 else y - 399) // 400
    yoe = y - era * 400
    doy = (153 * (m + (-3 if m > 2 else 9)) + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    return era * 146097 + doe - 719468


def parse_math(now_ms: int | None, val: str, tz: str = "UTC") -> int:
    """The static DateMathParser.parseMath(Date now, String val): `NOW`
    prefix applies math to `now`; otherwise everything up to the FIRST
    uppercase 'Z' is the date, the rest is math."""
    if val.startswith("NOW"):
        math = val[len("NOW"):]
        base = now_ms
        if base is None:
            raise ValueError("now is required for NOW-relative strings")
    else:
        zz = val.find("Z")
        if zz == -1:
            raise DateMathParseError(f"Invalid Date String:'{val}'")
        math = val[zz + 1:]
        base = parse_no_math(val[: zz + 1])
    if math == "":
        return int(base)
    return date_math(int(base), math, tz=tz)
