"""ads_link_event `match_json` property predicates, compiled to SQL.

The reference gates ad-conversion send-back on a per-rule property
predicate: `AdvConvertEventFlatMapFunction.java:228-236` parses the
rule's match_json `{label, type, operator, values}` and evaluates it
against the conversion row's property bag via
`OperatorUtil.compareProValue` (pipeline `util/OperatorUtil.java:22-98`,
eventProp category: bag key `_label` else `$label`). This module
compiles the same document to a dual-dialect SQL boolean so the check
runs engine-side (codegen CASE/compare — no per-row interpreter).

Semantics mirrored from `OperatorUtil.java`:

- The tested value is `String.valueOf(bag entry)` — an absent key is
  `''`, a null entry the literal string `'null'` (callers model absence
  vs null when building `value_expr`; SQL NULL here = the null entry).
- Non-empty value + non-empty values list → the typed compare
  (`compareValue` :133-160): type 1 string (`compareStringValue`
  :170-216, usePatternMatch=true ⇒ regexp is Matcher.find — UNanchored),
  type 2 numeric (`compareNumericValue` :221-258: Long.parseLong both
  sides, any parse failure or null-ish value → false), type 3 date
  (`compareDateValue` :263-291: value is epoch SECONDS; `relative` =
  within the last N days of now; `absolute` = between the two
  yyyy-MM-dd dates' UTC+8 midnights, end midnight INclusive).
- Empty value (or empty values list) → `handleNullValue` (:296-308):
  only `is null` / `is not null` decide, everything else false.
- Quirk kept faithfully: a literal `'null'` value is NON-empty, so it
  takes the typed branch — `is null` on it is FALSE (no such case in
  compareStringValue), `is not null` TRUE.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone

_LONG_RE = r"^[+-]?[0-9]+$"  # exactly what Long.parseLong accepts

_NUM_OPS = {
    "gt": ">",
    "lt": "<",
    "ge": ">=",
    "le": "<=",
    "equal": "=",
    "not equal": "<>",
}

_CST = timezone(timedelta(hours=8))  # the reference parses dates at UTC+8


def _lit(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def value_str(d, expr: str) -> str:
    """String.valueOf of a (nullable) bag entry: SQL NULL → 'null'."""
    return f"CASE WHEN {expr} IS NULL THEN 'null' ELSE {expr} END"


def _string_pred(d, v: str, op: str, t: str) -> str:
    lit = _lit(t)
    if op == "equal":
        return f"{v} = {lit}"
    if op == "not equal":
        return f"{v} <> {lit}"
    if op == "regexp":
        return d.rlike(v, t)
    if op == "not regexp":
        return f"NOT {d.rlike(v, t)}"
    if op == "contains":
        return f"instr({v}, {lit}) > 0"
    if op == "not contains":
        return f"instr({v}, {lit}) = 0"
    if op == "begin with":
        return f"left({v}, {len(t)}) = {lit}"
    if op == "not begin with":
        return f"left({v}, {len(t)}) <> {lit}"
    if op == "end with":
        return f"right({v}, {len(t)}) = {lit}"
    if op == "not end with":
        return f"right({v}, {len(t)}) <> {lit}"
    if op == "is not null":
        return "TRUE"  # reached only on the non-empty branch
    return "FALSE"  # compareStringValue default


def _numeric_pred(d, v: str, op: str, t: str) -> str:
    sym = _NUM_OPS.get(op)
    if sym is None:
        return "FALSE"
    # Long.parseLong's grammar for the compile-time target: optional
    # sign + ASCII digits only — Python's int() also accepts whitespace
    # and underscores, which Java throws on → false
    if not re.fullmatch(r"[+-]?[0-9]+", t):
        return "FALSE"
    target = int(t)
    if not -(2**63) <= target <= 2**63 - 1:
        return "FALSE"  # Long.parseLong overflow → NumberFormatException
    digits = d.rlike(v, _LONG_RE)
    nv = f"CASE WHEN {digits} THEN TRY_CAST({v} AS BIGINT) END"
    # the digits gate also rejects '' and 'null' — exactly
    # isNullOrNullString + the parseLong failure path
    return f"COALESCE({nv} {sym} {target}, FALSE)"


def _date_pred(d, v: str, op: str, values: list[str], now_ms: str) -> str:
    # The reference's `Long.parseLong(v) * 1000` WRAPS silently when the
    # seconds value exceeds Long.MAX/1000 (~year 292M); SQL engines
    # instead raise on BIGINT overflow, so the multiply is gated to the
    # wrap-free range and out-of-range garbage compares FALSE. That
    # matches the Java outcome for positive overflow (wraps negative →
    # below any window); a negative seconds value whose wrap lands
    # INSIDE the window is the one contrived input where the reference
    # would say true and we say false — documented deviation.
    digits = d.rlike(v, _LONG_RE)
    sec = f"TRY_CAST({v} AS BIGINT)"
    in_range = (f"{digits} AND {sec} BETWEEN -9223372036854775 "
                f"AND 9223372036854775")
    ts = f"(CASE WHEN {in_range} THEN {sec} END * 1000)"
    if op == "relative":
        # Integer.parseInt's grammar for the day count — whitespace,
        # underscores, and 32-bit overflow all throw in Java → false.
        # (For day > ~89M the reference's `day * 24` wraps in int space
        # before promoting to long; we compute the window exactly —
        # deviation only on absurd configs.)
        if not values or not re.fullmatch(r"[+-]?[0-9]+", values[0]):
            return "FALSE"
        day = int(values[0])
        if not -(2**31) <= day <= 2**31 - 1:
            return "FALSE"
        return f"COALESCE({ts} >= {now_ms} - {day * 86_400_000}, FALSE)"
    if op == "absolute":
        try:
            lo = datetime.strptime(values[0], "%Y-%m-%d").replace(tzinfo=_CST)
            hi = datetime.strptime(values[1], "%Y-%m-%d").replace(tzinfo=_CST)
        except (ValueError, IndexError):
            return "FALSE"
        lo_ms = int(lo.timestamp() * 1000)
        hi_ms = int(hi.timestamp() * 1000)  # end-date MIDNIGHT, inclusive
        return f"COALESCE({ts} >= {lo_ms} AND {ts} <= {hi_ms}, FALSE)"
    return "FALSE"


def match_predicate(d, mj: dict, value_expr: str, now_ms: str = "0") -> str:
    """Compile one match_json doc against the SQL string expression of
    the label-resolved property value. `value_expr` must already be
    String.valueOf-shaped (never SQL NULL: absent key `''`, null entry
    `'null'` — see `value_str`). `now_ms` is the deterministic "now" for
    `relative` date rules (the reference uses System.currentTimeMillis —
    callers pass the spine's now_ref)."""
    v = f"({value_expr})"
    values = [str(x) for x in mj.get("values", [])]
    op = mj.get("operator", "")
    nullish = f"({v} = '' OR lower({v}) = 'null')"
    if not values:
        # values empty → handleNullValue for EVERY v (the 'null'-string
        # case-insensitive check included)
        if op == "is null":
            return nullish
        if op == "is not null":
            return f"(NOT {nullish})"
        return "FALSE"
    t = mj.get("type", 1)
    if t == 1:
        typed = _string_pred(d, v, op, values[0])
    elif t == 2:
        typed = _numeric_pred(d, v, op, values[0])
    elif t == 3:
        typed = _date_pred(d, v, op, values, now_ms)
    else:
        typed = "FALSE"
    # empty value falls to handleNullValue with v='' (is-empty is then
    # statically known): only is null / is not null decide
    null_pred = "TRUE" if op == "is null" else "FALSE"
    return f"(CASE WHEN {v} <> '' THEN {typed} ELSE {null_pred} END)"
