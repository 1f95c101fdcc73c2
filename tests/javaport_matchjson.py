"""Independent Python port of OperatorUtil.compareValue (reference
pipeline util/OperatorUtil.java:133-335) — the conformance oracle for
functions/match_json.py's SQL compiler, written directly from the Java
with NO shared code: digits come from unicodedata (the compiler replays
the JVM-dumped table), the SMART date resolver is modeled over
datetime + 400-year-cycle reduction (the compiler uses the toEpochDay
formula).

Fidelity includes the THROW channels (exceptions that escape
compareValue and would kill the reference job): raise JavaThrow(kind)
with the Java exception's simple name, so tests/test_kw_jvm_fixture.py
can compare against the JVM fixture's "THROW:<kind>" cells exactly.

Regexp cells are Java-dialect: `portable_pattern` marks the subset
where Python re is known to agree with java.util.regex (plain
literals/classes/anchors/quantifiers — no \\p, \\Q, POSIX classes,
possessive quantifiers); outside it the port abstains rather than
guess. Invalid-pattern classification (PatternSyntaxException) is
likewise modeled only inside the portable family.
"""

from __future__ import annotations

import re
import unicodedata
from datetime import date


class JavaThrow(Exception):
    def __init__(self, kind: str):
        super().__init__(kind)
        self.kind = kind


class Abstain(Exception):
    """The port declines to model this cell (non-portable regexp)."""


def _digit(c: str) -> int:
    """Character.digit(c, 10) via unicodedata — decimal value of any
    Nd char; -1 otherwise. BMP only (parseLong iterates UTF-16 chars,
    a supplementary digit is two surrogates = not a digit)."""
    if ord(c) > 0xFFFF:
        return -1
    try:
        return unicodedata.decimal(c)
    except (ValueError, TypeError):
        return -1


def java_long(s: str, bits: int = 64) -> int:
    """Long.parseLong / Integer.parseInt: ASCII sign + Unicode Nd
    digits, range-checked. Raises ValueError (Java: caught
    NumberFormatException in both numeric and date comparators)."""
    if not s:
        raise ValueError(s)
    neg, i = False, 0
    if s[0] < "0":
        if s[0] == "-":
            neg = True
        elif s[0] != "+":
            raise ValueError(s)
        if len(s) == 1:
            raise ValueError(s)
        i = 1
    n = 0
    lim = 2 ** (bits - 1)
    for c in s[i:]:
        d = _digit(c)
        if d < 0:
            raise ValueError(s)
        n = n * 10 + d
        if n > (lim if neg else lim - 1):
            raise ValueError(s)
    return -n if neg else n


def _i32(x: int) -> int:
    return (x + 2**31) % 2**32 - 2**31


def _i64(x: int) -> int:
    return (x + 2**63) % 2**64 - 2**63


def _nullish(v) -> bool:
    return v is None or v == "" or v.lower() == "null"


# --- java.util.regex portability gate -------------------------------

_PORTABLE_RE = re.compile(
    r"""^(?:[A-Za-z0-9 \u4e00-\u9fff_,:;=/%!~#<>-]
          | \\[dswDSWbB.^$*+?()\[\]{}|\\]
          | [.^$|]
          | [*+?](?!\+|\*)          # plain quantifiers, not possessive
          | \{\d+(,\d*)?\}
          | \( (\?[:=!])?           # groups incl. (?: (?= (?!
          | \)
          | \[ \^? (?:[A-Za-z0-9\u4e00-\u9fff-]|\\[dsw])* \]
         )*$""",
    re.VERBOSE,
)

# patterns whose INVALIDITY verdict matches Java's inside the corpus
_KNOWN_INVALID = {"(", "[z-a]", "a{", "**", "a{,", "+", "(()"}


def portable_pattern(pat: str) -> bool:
    """True when Python re and java.util.regex agree on this pattern
    (syntax validity AND match semantics) — the family the port and the
    RE2-backed DuckDB leg assert; everything else abstains (the Spark
    leg still covers it natively, Spark rlike IS java.util.regex)."""
    if pat in _KNOWN_INVALID:
        return True
    if not _PORTABLE_RE.match(pat):
        return False
    # balanced classes/groups only — dangling structure diverges
    try:
        re.compile(pat)
    except re.error:
        return False
    return True


def re2_portable(pat: str) -> bool:
    """The narrower family RE2 (DuckDB's regexp engine) shares with
    java.util.regex: the portable family MINUS lookarounds, which RE2
    rejects at compile time. The Spark leg needs no gate — Spark rlike
    IS java.util.regex."""
    return portable_pattern(pat) and "(?=" not in pat and "(?!" not in pat


def _regexp_find(v: str, pat: str) -> bool:
    """isMatch = Pattern.compile(pat).matcher(v).find()."""
    if pat in _KNOWN_INVALID:
        raise JavaThrow("PatternSyntaxException")
    if not portable_pattern(pat):
        raise Abstain(pat)
    return re.search(pat, v) is not None


# --- the comparators -------------------------------------------------

def _string(v: str, t: str, op) -> bool:
    if op is None:
        raise JavaThrow("NullPointerException")
    if op == "equal":
        return v == t
    if op == "regexp":
        return _regexp_find(v, t)
    if op == "contains":
        return t in v
    if op == "not regexp":
        return not _regexp_find(v, t)
    if op == "not equal":
        return v != t
    if op == "not contains":
        return t not in v
    if op == "begin with":
        return v.startswith(t)
    if op == "end with":
        return v.endswith(t)
    if op == "not begin with":
        return not v.startswith(t)
    if op == "not end with":
        return not v.endswith(t)
    if op == "is not null":
        return True
    return False


def _numeric(v: str, t: str, op) -> bool:
    if _nullish(v) or _nullish(t):
        return False
    try:
        a, b = java_long(v), java_long(t)
    except ValueError:
        return False  # NumberFormatException caught → false
    if op is None:
        return False  # .get on None op just misses
    return {"gt": a > b, "lt": a < b, "ge": a >= b, "le": a <= b,
            "equal": a == b, "not equal": a != b}.get(op, False)


def _smart_local_date_ms(s: str) -> int:
    """LocalDate.parse(s, 'yyyy-MM-dd') SMART + atStartOfDay(+08:00) in
    epoch ms. Raises JavaThrow(DateTimeParseException). Independent
    model: datetime for years <= 9999, 400-year Gregorian cycles
    (146097 days) above."""
    m = re.fullmatch(r"(\+?\d{4,19}|-\d{4,19})-(\d{2})-(\d{2})", s,
                     re.ASCII)
    if not m:
        raise JavaThrow("DateTimeParseException")
    ys = m.group(1)
    if ys.startswith("-"):
        raise JavaThrow("DateTimeParseException")  # year-of-era < 1
    if ys.startswith("+"):
        if len(ys) <= 5:  # EXCEEDS_PAD: sign only past the pad width
            raise JavaThrow("DateTimeParseException")
        y = int(ys[1:])
    elif len(ys) != 4:
        raise JavaThrow("DateTimeParseException")
    else:
        y = int(ys)
    mo, dd = int(m.group(2)), int(m.group(3))
    if not (1 <= y <= 999_999_999 and 1 <= mo <= 12 and 1 <= dd <= 31):
        raise JavaThrow("DateTimeParseException")
    cycles = 0
    while y > 9999:
        y -= 400
        cycles += 1
    try:
        d0 = date(y, mo, dd)
    except ValueError:
        # SMART clamps an overlong day-of-month to the month's last day
        from datetime import timedelta
        d0 = date(y + (mo == 12), mo % 12 + 1, 1) - timedelta(days=1)
    days = (d0 - date(1970, 1, 1)).days + cycles * 146_097
    return days * 86_400_000 - 8 * 3_600_000


def _date(v: str, values: list, op, now_ms: int) -> bool:
    if _nullish(v):
        return False
    try:
        sec = java_long(v)
    except ValueError:
        return False  # NumberFormatException caught
    ts = _i64(sec * 1000)  # Java long wrap, silent
    if op is None:
        return False
    if op == "relative":
        try:
            day = java_long(values[0], bits=32)
        except ValueError:
            return False  # parseInt NFE caught by the same catch
        except IndexError:
            raise JavaThrow("IndexOutOfBoundsException")
        win = _i32(_i32(_i32(day * 24) * 60) * 60) * 1000
        return ts >= now_ms - win
    if op == "absolute":
        try:
            lo = _smart_local_date_ms(values[0])
        except IndexError:
            raise JavaThrow("IndexOutOfBoundsException")
        try:
            hi = _smart_local_date_ms(values[1])
        except IndexError:
            raise JavaThrow("IndexOutOfBoundsException")
        return lo <= ts <= hi
    return False


def ref_compare_java(v, mj: dict, now_ms: int) -> bool:
    """compareValue(String, JSONObject) — the 2-arg production variant
    (usePatternMatch=true). `mj` may omit keys to model absent JSON
    fields. Raises JavaThrow for exceptions that escape the method."""
    has_values = "values" in mj
    values = mj.get("values")
    typ = mj.get("type")
    op = mj.get("operator")
    if v is not None and v != "":
        if not has_values:
            raise JavaThrow("NullPointerException")  # values.isEmpty()
        if values:
            t0 = str(values[0])
            if typ is None:
                raise JavaThrow("NullPointerException")  # type == 1 unbox
            if typ == 1:
                return _string(v, t0, op)
            if typ == 2:
                return _numeric(v, t0, op)
            if typ == 3:
                return _date(v, [str(x) for x in values], op, now_ms)
            return False
    # empty value or empty values → handleNullValue(v, operator)
    if op is None:
        raise JavaThrow("NullPointerException")
    if op == "is null":
        return _nullish(v)
    if op == "is not null":
        return not _nullish(v)
    return False
