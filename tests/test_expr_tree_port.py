"""Random-tree triangulation for the expression compiler (V1/V2).

test_expr_fuzz.py pins each semantic KERNEL against a literal Python
port; this file pins arbitrary COMPOSITIONS. Two independent Python
evaluators walk the same parsed AST the emitters walk:

- ENGINE mode: a value-level mirror of the emitted SQL — the executable
  spec of the documented semantics (zero-coercion, throw-guards, Java
  truthiness, try_cast leniency). Both engines must agree with it on
  EVERY cell; a divergence is an emission bug in one dialect.
- REFERENCE mode: the Java evaluator's semantics, literally
  (VirtualAttributeExpressionEvaluator.java — eager operands :107-113,
  toBigDecimal null/''→ZERO :324-347, Boolean.TRUE.equals truthiness
  :216-222, lazy-but-throwing CASE conditions :729-749, scale-10
  HALF_UP divide :302-311, String.substring bounds :384-393). Where it
  returns a value or throws, the engine rendering must match — NULL for
  a throw — on every cell whose leaves avoid the documented leniency
  classes; cells whose comparisons sit within double-precision distance
  of a verdict flip are skipped via a FRAGILE sentinel (BigDecimal is
  exact, doubles are not — the documented 2^53/precision deviation).

Trees, rows, and assertions are fully seeded/deterministic.
"""

from __future__ import annotations

import math
import random
import re
from datetime import datetime, timedelta, timezone
from decimal import ROUND_DOWN, ROUND_HALF_UP, Decimal, localcontext

import duckdb
import pytest

# ~5 min re-verification of the 220 committed reference trees across
# three evaluators: run with --runslow when the expr compiler/emitters
# change (test_expr_compiler + test_expr_fuzz stay always-on)
pytestmark = pytest.mark.slow

from test_expr_fuzz import (
    COMPILER,
    DIRTY,
    NOW_DT,
    THROW,
    _JSON_PATHS,
    _gen,
    _lenient,
    _norm_eq,
    engine_num_cmp,
    ref_parse_datetime,
    SubMicroTail,
    ref_parse_long,
    ref_substring,
    try_cast_double,
)
from zg_etl_spark.functions.expr_compiler import (
    Case,
    Const,
    Field,
    Func,
    Op,
    TsConst,
    parse,
)

_BOOL_OPS = ("and", "or", "not", "=", "!=", "<", "<=", ">", ">=")
_NUMERIC_FUNCS = {"length", "abs", "round", "ceil", "floor", "date_diff"}
_VALUE_FUNCS = {"coalesce", "nullif", "get_json_string"}


# ---------------------------------------------------------------------------
# get_json_string — one navigation shared by both ports.
#
# extractJsonPathAsString (VirtualAttributeExpressionEvaluator.java
# :624-681): '$'-prefixed dotted paths, optional single non-negative
# bracket index per part, scalars rendered as text (numbers via
# Jackson's asText, booleans lowercase), objects/arrays re-rendered
# compact, every failure → null. Verified empirically that Spark's
# get_json_object and DuckDB's json_valid-gated json_extract_string
# produce the SAME values on this closed path grammar (the emitter
# normalizes the three spots they'd diverge from the reference at
# compile time: non-'$' paths, bare '$' verbatim passthrough, negative
# indices — expr_compiler.py emit_func 'get_json_string').
# ---------------------------------------------------------------------------
def _json_nav_render(jt: str, rest: str):
    """Navigate the already-'$'-stripped dotted path over parsed JSON;
    None = null. `rest` is non-empty (bare '$' is handled upstream as a
    verbatim passthrough in BOTH the reference and the emitted SQL)."""
    import json as _json

    try:
        cur = _json.loads(jt)  # Jackson readTree / both engines' parse
    except Exception:
        return None
    for part in rest.split("."):
        if cur is None:
            return None
        field, idx = part, None
        b = part.find("[")
        if b > -1 and part.endswith("]"):
            field = part[:b]
            sidx = part[b + 1:-1]
            # Integer.parseInt grammar; the emitter compile-times bad or
            # negative indices to NULL, so this branch mirrors both
            if not re.fullmatch(r"[+-]?[0-9]+", sidx) or \
                    not -2**31 <= int(sidx) < 2**31 or int(sidx) < 0:
                return None
            idx = int(sidx)
        if field != "":
            cur = cur.get(field) if isinstance(cur, dict) else None
        if idx is not None:
            if not isinstance(cur, list) or idx >= len(cur):
                return None
            cur = cur[idx]
    if cur is None:
        return None
    if isinstance(cur, bool):
        return "true" if cur else "false"
    if isinstance(cur, str):
        return cur
    if isinstance(cur, int):
        return str(cur)
    if isinstance(cur, float):
        # Double.toString ≡ repr on the closed alphabet (plain decimals
        # below the 1e7 scientific-notation threshold)
        return repr(cur)
    return _json.dumps(cur, separators=(",", ":"), ensure_ascii=False)


def _json_get_value(jt, jp: str):
    """The full get_json_string value semantics both ports share once
    their own argument coercions produced (jt, jp) strings: the
    reference's grammar, which the emitted SQL now matches exactly."""
    if jt is None or jt == "" or jp is None or jp == "":
        return None  # :578-580 null/empty pre-check; nullif('') in SQL
    if not jp.startswith("$"):
        return None  # :627-629; compile-timed to NULL in the emitters
    rest = jp[1:]
    if rest.startswith("."):
        rest = rest[1:]
    if rest == "":
        return jt  # VERBATIM, no JSON validation (:633-635)
    return _json_nav_render(jt, rest)


def _throwy(node) -> bool:
    """Mirror of Emitter._node_throwy."""
    if isinstance(node, (Const, Field, Case, TsConst)):
        return False
    if isinstance(node, Func) and node.name in _VALUE_FUNCS:
        return False
    return True


def _has_guards(node) -> bool:
    """Mirror of Emitter._throw_guards being non-empty."""
    if _throwy(node):
        return True
    if isinstance(node, Func) and node.name in _VALUE_FUNCS:
        return any(_has_guards(a) for a in node.args)
    if isinstance(node, Case):
        return _has_guards_case(node)
    return False


def _has_guards_case(node) -> bool:
    """Mirror of _throw_guards(Case) being non-empty: any throwy
    condition, or any branch value with guards of its own."""
    conds = [c for c, _ in node.whens]
    vals = [v for _, v in node.whens]
    if node.default is not None:
        vals.append(node.default)
    return any(_throwy(c) for c in conds) or any(_has_guards(v)
                                                 for v in vals)


# ---------------------------------------------------------------------------
# ENGINE mode: value-level mirror of the emitted SQL
# ---------------------------------------------------------------------------
def _operand_hint(other) -> str:
    if isinstance(other, Const):
        if isinstance(other.value, bool):
            return "any"
        if isinstance(other.value, (int, float)):
            return "number"
        if isinstance(other.value, str):
            return "string"
    if isinstance(other, Op) and other.op in ("+", "-", "*", "/", "%", "neg"):
        return "number"
    if isinstance(other, Func) and other.name in _NUMERIC_FUNCS:
        return "number"
    if isinstance(other, Func) and other.name in (
            "upper", "lower", "concat", "substring", "date_format",
            "get_json_string"):
        return "string"
    return "any"


def _e_cast_str(v):
    """CAST(x AS STRING/VARCHAR) of an engine value."""
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(v)
    return v


def _e_try_num(v):
    """TRY_CAST(value AS DOUBLE)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return 1.0 if v else 0.0
    if isinstance(v, float):
        return v
    return try_cast_double(v)


class EngineEval:
    """eval(node, hint) returns the value the emitted SQL produces:
    None = SQL NULL. Structured exactly like Emitter.emit/emit_op/
    emit_func so each branch mirrors one emission site."""

    def __init__(self, env):
        self.env = env

    def eval(self, node, hint="any"):
        if isinstance(node, Const):
            v = node.value
            return float(v) if isinstance(v, (int, float)) \
                and not isinstance(v, bool) else v
        if isinstance(node, Field):
            v = self.env[node.name]
            if hint == "number":  # the leg-3 resolver's try_cast
                return try_cast_double(v) if v is not None else None
            return v
        if isinstance(node, Op):
            return self.eval_op(node)
        if isinstance(node, Func):
            return self.eval_func(node)
        if isinstance(node, Case):
            for cond, val in node.whens:
                c, throwy = self.bool_operand(cond)
                if throwy and c is None:
                    return None
                if c is True:
                    return self.eval(val)
            return self.eval(node.default) if node.default is not None \
                else None
        raise AssertionError(f"cannot eval {node}")

    def _guards_null(self, node) -> bool:
        """Mirror of _throw_guards: any guard fragment NULL at runtime.
        For CASE, replays the lazy condition chain like the emitted
        guard expression does."""
        if _throwy(node):
            return self.eval(node, "any") is None
        if isinstance(node, Func) and node.name in _VALUE_FUNCS:
            return any(self._guards_null(a) for a in node.args)
        if isinstance(node, Case):
            for cond, val in node.whens:
                c, throwy = self.bool_operand(cond)
                if throwy and c is None:
                    return True
                if c is True:
                    return self._guards_null(val)
            if node.default is not None:
                return self._guards_null(node.default)
            return False
        return False

    def num_operand(self, node):
        if isinstance(node, Const):
            v = node.value
            if v is None:
                return 0.0
            if isinstance(v, bool):
                return None
            if isinstance(v, (int, float)):
                return float(v)
            if v.strip() == "":
                return 0.0
            return try_cast_double(v)
        if isinstance(node, Op):
            if node.op in ("+", "-", "*", "/", "%", "neg"):
                return self.eval(node, "number")
            return None  # boolean-valued op at a numeric boundary
        if isinstance(node, Func) and node.name in _NUMERIC_FUNCS:
            return self.eval(node, "number")
        s = _e_cast_str(self.eval(node, "string"))
        if _throwy(node):
            if s is None:
                return None
            return 0.0 if s.strip() == "" else try_cast_double(s)
        if self._guards_null(node):
            return None
        if s is None or s.strip() == "":
            return 0.0
        return try_cast_double(s)

    def bool_operand(self, node):
        if isinstance(node, Op) and node.op in _BOOL_OPS:
            return self.eval(node, "bool"), True
        if isinstance(node, Const):
            if isinstance(node.value, bool):
                return node.value, False
            return False, False
        if isinstance(node, Case):
            v = self.eval(node, "bool")
            frag = v if v is not None else False
            if _has_guards(node):
                return (None if self._guards_null(node) else frag), True
            return frag, False
        frag = self.eval(node, "any")
        if _throwy(node):
            return (None if frag is None else False), True
        if _has_guards(node):
            return (None if self._guards_null(node) else False), True
        return False, False

    def eval_op(self, node):
        op = node.op
        if op == "not":
            f, throwy = self.bool_operand(node.left)
            if throwy:
                return None if f is None else (not f)
            return not (f if f is not None else False)
        if op == "neg":
            v = self.num_operand(node.left)
            return None if v is None else -v
        if op in ("and", "or"):
            a, ta = self.bool_operand(node.left)
            b, tb = self.bool_operand(node.right)
            if (ta and a is None) or (tb and b is None):
                return None
            return (a and b) if op == "and" else (a or b)
        if op in ("+", "-", "*"):
            a, b = self.num_operand(node.left), self.num_operand(node.right)
            if a is None or b is None:
                return None
            try:
                return {"+": a + b, "-": a - b, "*": a * b}[op]
            except OverflowError:
                return math.inf
        if op == "%":
            a, b = self.num_operand(node.left), self.num_operand(node.right)
            if a is None or b is None or b == 0:
                return None
            # the 2^53 dividend guard (abs(NaN/inf) fails it too)
            if math.isnan(a) or abs(a) > 9.007199254740992e15:
                return None
            if math.isnan(b):
                return math.nan
            return math.fmod(a, b)
        if op == "/":
            a, b = self.num_operand(node.left), self.num_operand(node.right)
            if a is None or b is None or b == 0:
                return None
            return _sql_round(a / b, 10)
        if op in ("<", "<=", ">", ">="):
            a, b = self.num_operand(node.left), self.num_operand(node.right)
            if a is None or b is None:
                return None
            c = engine_num_cmp(a, b)
            return {"<": c < 0, "<=": c <= 0, ">": c > 0, ">=": c >= 0}[op]
        if op in ("=", "!="):
            lh = _operand_hint(node.right)
            rh = _operand_hint(node.left)
            lh = lh if lh != "any" else "string"
            rh = rh if rh != "any" else "string"
            a = self.eval(node.left, lh)
            b = self.eval(node.right, rh)
            if self._guards_null(node.left) or self._guards_null(node.right):
                return None
            if a is None and b is None:
                eq = True
            elif a is None or b is None:
                eq = False
            else:
                na, nb = _e_try_num(a), _e_try_num(b)
                if na is not None and nb is not None:
                    eq = (na == nb) or (math.isnan(na) and math.isnan(nb))
                else:
                    eq = _e_cast_str(a) == _e_cast_str(b)
            return eq if op == "=" else (not eq)
        raise AssertionError(op)

    def eval_func(self, node):
        name, args = node.name, node.args
        if name in ("upper", "lower"):
            v = self.eval(args[0], "string")
            if v is None:
                return None
            s = _e_cast_str(v)
            return s.upper() if name == "upper" else s.lower()
        if name == "length":
            v = _e_cast_str(self.eval(args[0], "string"))
            return None if v is None else float(len(v))
        if name == "concat":
            parts = [_e_cast_str(self.eval(x, "string")) for x in args]
            if any(p is None for p in parts):
                return None  # `||` propagates NULL in both dialects
            return "".join(parts)
        if name == "substring":
            s = _e_cast_str(self.eval(args[0], "string"))
            start = self._int_arg(args[1])
            ln = self._int_arg(args[2]) if len(args) > 2 else None
            if s is None or start is None or \
                    (len(args) > 2 and ln is None):
                return None
            if start > len(s) + 1 or (ln is not None and ln < 0):
                return None  # the Java-bounds guard
            b = start - 1
            return s[b:] if ln is None else s[b:b + ln]
        if name == "coalesce":
            if any(self._guards_null(x) for x in args):
                return None
            for x in args:
                v = self.eval(x)
                if v is not None:
                    return v
            return None
        if name == "nullif":
            if self._guards_null(args[0]) or self._guards_null(args[1]):
                return None
            a, b = self.eval(args[0]), self.eval(args[1])
            return None if a == b else a
        if name == "abs":
            v = self.num_operand(args[0])
            return None if v is None else abs(v)
        if name == "round":
            v = self.num_operand(args[0])
            n = int(args[1].value) if len(args) > 1 else 0
            return None if v is None else _sql_round(v, n)
        if name in ("ceil", "floor"):
            v = self.num_operand(args[0])
            if v is None:
                return None
            return float(math.ceil(v) if name == "ceil" else math.floor(v))
        if name == "get_json_string":
            # mirrors the emitted SQL: the path is a compile-time const,
            # the json argument renders through the string channel
            jt = _e_cast_str(self.eval(args[0], "string"))
            return _json_get_value(jt, args[1].value)
        raise AssertionError(f"tree generator never mints {name}")

    def _int_arg(self, node):
        v = self.eval(node, "number")
        v = _e_try_num(v)
        return None if v is None else int(v)


def _sql_round(x: float, n: int) -> float:
    """Mirror of Emitter.round_scaled: identity where x*10^n exceeds
    2^53 (the engines' round implementations lose ulps there and
    diverge), HALF_UP on the shortest decimal rendering below it."""
    if math.isnan(x) or math.isinf(x):
        return x
    if abs(x) >= 9.007199254740992e15 / (10.0 ** n):
        return x
    with localcontext() as ctx:
        ctx.prec = 60
        return float(Decimal(repr(x)).quantize(
            Decimal(1).scaleb(-n), rounding=ROUND_HALF_UP))


# ---------------------------------------------------------------------------
# REFERENCE mode: the Java semantics, literally
# ---------------------------------------------------------------------------
class Throw(Exception):
    """The reference raised → errData row (rendered NULL)."""


class Fragile(Exception):
    """A comparison's verdict sits within double-precision distance of a
    flip: BigDecimal decides exactly, the engines' doubles may not —
    the documented precision deviation. Skip the cell."""


def _bd(s: str) -> Decimal:
    """new BigDecimal(String): strict grammar."""
    import re
    if not re.fullmatch(
            r"[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)([eE][+-]?[0-9]+)?", s):
        raise Throw(f"BigDecimal({s!r})")
    return Decimal(s)


def _to_bd(v) -> Decimal:
    """OperationNode/FunctionNode toBigDecimal (:324-347, :682-694)."""
    if v is None:
        return Decimal(0)
    if isinstance(v, bool):
        raise Throw("BigDecimal(Boolean.toString())")
    if isinstance(v, Decimal):
        return v
    if isinstance(v, str):
        if v.strip() == "":
            return Decimal(0)
        return _bd(v)
    raise Throw(f"toBigDecimal({v!r})")


def _ref_str(v) -> str:
    """Object.toString()."""
    if v is None:
        raise Throw("NPE: null.toString()")
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, Decimal):
        return str(v)
    return v


def _fragile_gate(a: Decimal, b: Decimal):
    """compareNumbers verdicts the engines compute in double space: if
    the exact operands are closer than double-resolution, skip."""
    fa, fb = float(a), float(b)
    if fa == fb and a != b:
        raise Fragile((a, b))
    if fa != fb and abs(fa - fb) <= 1e-9 * max(abs(fa), abs(fb), 1.0):
        raise Fragile((a, b))


class RefEval:
    """eval(node) → None | bool | str | Decimal, or raises Throw."""

    def __init__(self, env):
        self.env = env

    def eval(self, node):
        if isinstance(node, Const):
            v = node.value
            if isinstance(v, (int, float)) and not isinstance(v, bool):
                return Decimal(str(v))
            return v
        if isinstance(node, Field):
            return self.env[node.name]
        if isinstance(node, Case):
            # ConditionNode :729-749: lazy, Boolean.TRUE.equals
            for cond, val in node.whens:
                c = self.eval(cond)  # a Throw propagates
                if c is True:
                    return self.eval(val)
            return self.eval(node.default) if node.default is not None \
                else None
        if isinstance(node, Op):
            return self.eval_op(node)
        if isinstance(node, Func):
            return self.eval_func(node)
        raise AssertionError(node)

    def eval_op(self, node):
        op = node.op
        # OperationNode :107-113: ALL operands evaluate before the op
        if op == "neg":
            return -_to_bd(self.eval(node.left))
        vals = [self.eval(node.left)]
        if node.right is not None:
            vals.append(self.eval(node.right))
        if op == "not":
            return not (vals[0] is True)
        if op == "and":
            return all(v is True for v in vals)
        if op == "or":
            return any(v is True for v in vals)
        if op in ("+", "-", "*"):
            a, b = _to_bd(vals[0]), _to_bd(vals[1])
            return {"+": a + b, "-": a - b, "*": a * b}[op]
        if op == "/":
            b = _to_bd(vals[1])
            if b == 0:
                raise Throw("/0")
            a = _to_bd(vals[0])
            with localcontext() as ctx:
                ctx.prec = 80
                return (a / b).quantize(Decimal("1e-10"),
                                        rounding=ROUND_HALF_UP)
        if op == "%":
            b = _to_bd(vals[1])
            if b == 0:
                raise Throw("remainder by zero")
            a = _to_bd(vals[0])
            with localcontext() as ctx:
                ctx.prec = 200
                return a - (a / b).to_integral_value(
                    rounding=ROUND_DOWN) * b
        if op in ("<", "<=", ">", ">="):
            # compareDates :115-142 → both strings/nulls → compareNumbers
            a, b = _to_bd(vals[0]), _to_bd(vals[1])
            _fragile_gate(a, b)
            c = (a > b) - (a < b)
            return {"<": c < 0, "<=": c <= 0, ">": c > 0, ">=": c >= 0}[op]
        if op in ("=", "!="):
            eq = self._is_equal(vals[0], vals[1])
            return eq if op == "=" else (not eq)
        raise AssertionError(op)

    def _is_equal(self, a, b) -> bool:
        """isEqual :230-265 — null-safe, numeric-first (isNumeric uses
        the STRICT BigDecimal grammar: '' is NOT numeric here)."""
        if a is None and b is None:
            return True
        if a is None or b is None:
            return False

        def numeric(v):
            if isinstance(v, Decimal):
                return v
            if isinstance(v, str):
                try:
                    return _bd(v)
                except Throw:
                    return None
            return None

        na, nb = numeric(a), numeric(b)
        if na is not None and nb is not None:
            _fragile_gate(na, nb)
            return na == nb
        if isinstance(a, str) and isinstance(b, str):
            return a == b
        if isinstance(a, bool) and isinstance(b, bool):
            return a == b
        return _ref_str(a) == _ref_str(b)

    def eval_func(self, node):
        name = node.name
        vals = [self.eval(x) for x in node.args]  # eager, :362-367
        if name in ("upper", "lower"):
            s = _ref_str(vals[0])
            return s.upper() if name == "upper" else s.lower()
        if name == "length":
            return Decimal(len(_ref_str(vals[0])))
        if name == "concat":
            return "".join(_ref_str(v) for v in vals)
        if name == "substring":
            s = _ref_str(vals[0])
            if not isinstance(vals[1], Decimal):
                raise Throw("ClassCastException: substring start")
            start = int(vals[1])
            ln = None
            if len(vals) > 2:
                if not isinstance(vals[2], Decimal):
                    raise Throw("ClassCastException: substring length")
                ln = int(vals[2])
            out = ref_substring(s, start, ln if ln is not None else len(s))
            if out is THROW:
                raise Throw("StringIndexOutOfBounds")
            return out
        if name == "coalesce":
            for v in vals:
                if v is not None:
                    return v
            return None
        if name == "nullif":
            a, b = vals
            if type(a) is type(b) and a == b:
                return None
            if a is None and b is None:
                return None
            return a
        if name == "abs":
            return _to_bd(vals[0]).copy_abs()
        if name == "round":
            n = int(vals[1]) if len(vals) > 1 else 0
            with localcontext() as ctx:
                ctx.prec = 200
                return _to_bd(vals[0]).quantize(Decimal(1).scaleb(-n),
                                                rounding=ROUND_HALF_UP)
        if name == "ceil":
            return _to_bd(vals[0]).to_integral_value(rounding="ROUND_CEILING")
        if name == "floor":
            return _to_bd(vals[0]).to_integral_value(rounding="ROUND_FLOOR")
        if name == "get_json_string":
            # :571-583 — params already evaluated eagerly; null params
            # short-circuit BEFORE toString, then extractJsonPathAsString
            jt = None if vals[0] is None else _ref_str(vals[0])
            jp = None if vals[1] is None else _ref_str(vals[1])
            return _json_get_value(jt, jp)
        raise AssertionError(f"tree generator never mints {name}")


# ---------------------------------------------------------------------------
# the harness
# ---------------------------------------------------------------------------
N_TREES = 120


@pytest.fixture(scope="module")
def tree_cells(spark):
    rng = random.Random(20260816)
    exprs = [_gen(rng, rng.randrange(1, 4)) for _ in range(N_TREES)]
    rows = [(a, b) for a, b in zip(DIRTY, DIRTY[11:] + DIRTY[:11])]

    s_cols = [f"CAST(({COMPILER.to_spark_sql(e)}) AS STRING) AS c{i}"
              for i, e in enumerate(exprs)]
    d_cols = [f"CAST(({COMPILER.to_duckdb_sql(e)}) AS VARCHAR) AS c{i}"
              for i, e in enumerate(exprs)]

    spark.createDataFrame(rows, "f string, g string") \
        .createOrReplaceTempView("tree_rows")
    s_rows = spark.sql(
        "SELECT f, g, " + ", ".join(s_cols) + " FROM tree_rows").collect()

    con = duckdb.connect()
    con.execute("CREATE TABLE tree_rows (f VARCHAR, g VARCHAR)")
    con.executemany("INSERT INTO tree_rows VALUES (?, ?)", rows)
    d_rows = con.execute(
        "SELECT f, g, " + ", ".join(d_cols) + " FROM tree_rows").fetchall()

    s_map = {(r[0], r[1]): tuple(r[2:]) for r in s_rows}
    d_map = {(r[0], r[1]): tuple(r[2:]) for r in d_rows}
    return exprs, rows, s_map, d_map


def _render_engine(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(v)
    return v


def test_trees_match_engine_port(tree_cells):
    """Every cell, both dialects ≡ the value-level mirror of the emitted
    SQL — the executable spec of the documented semantics."""
    exprs, rows, s_map, d_map = tree_cells
    asts = [parse(e) for e in exprs]
    bad = []
    for key in rows:
        env = {"f": key[0], "g": key[1]}
        ev = EngineEval(env)
        for i, ast in enumerate(asts):
            want = _render_engine(ev.eval(ast))
            for which, got in (("spark", s_map[key][i]),
                               ("duck", d_map[key][i])):
                if not _norm_eq(got, want):
                    bad.append((exprs[i], key, which, got, want))
    assert not bad, f"{len(bad)} divergences, first 5: {bad[:5]}"


def test_trees_match_reference_port(tree_cells):
    """Cells whose leaves avoid the documented leniency classes: the
    engines must render exactly what the Java evaluator computes — NULL
    where it throws — for arbitrary compositions. Fragile cells (verdict
    within double-precision of a flip) are the documented precision
    deviation and are skipped."""
    exprs, rows, s_map, _ = tree_cells
    asts = [parse(e) for e in exprs]
    checked = 0
    bad = []
    for key in rows:
        if _lenient(key[0]) or _lenient(key[1]):
            continue
        env = {"f": key[0], "g": key[1]}
        rv = RefEval(env)
        for i, ast in enumerate(asts):
            got = s_map[key][i]
            try:
                want = rv.eval(ast)
            except Throw:
                if got is not None:
                    bad.append((exprs[i], key, got, "THROW"))
                continue
            except Fragile:
                continue
            if want is None:
                ok = got is None
            elif isinstance(want, bool):
                ok = got == ("true" if want else "false")
            elif isinstance(want, Decimal):
                if abs(want) >= Decimal(2) ** 53:
                    continue  # documented precision bound
                ok = got is not None and _norm_eq(got, str(want))
            else:
                ok = got == want
            if not ok:
                bad.append((exprs[i], key, got, want))
            else:
                checked += 1
    assert not bad, f"{len(bad)} divergences, first 5: {bad[:5]}"
    assert checked > 2000, f"port coverage too thin: {checked}"


# ---------------------------------------------------------------------------
# date-surface compositions: from_unixtime / date_format / now flowing
# through CASE, string funcs, value funcs, compares, and boolean ops —
# the kernels are fuzz-pinned one at a time in test_expr_fuzz.py; these
# templates pin their COMPOSITION. DT below is the reference's datetime
# OBJECT (LocalDateTime / DateTimeResult — toString is the
# 'yyyy-MM-dd HH:mm:ss' rendering, DateTimeResult.java:13).
# ---------------------------------------------------------------------------
DATE_TEMPLATES = [
    "from_unixtime(f) = from_unixtime(g)",
    "now() < from_unixtime(f)",
    "from_unixtime(f) >= date_format(g, 'yyyy-MM-dd HH:mm:ss')",
    "CASE WHEN f < g THEN from_unixtime(f) ELSE now() END"
    " <= '2024-08-10 00:00:00'",
    "upper(date_format(f, 'yyyy-MM-dd HH:mm:ss'))",
    "coalesce(date_format(f, 'yyyy-MM-dd HH:mm:ss'), 'none')",
    "date_format(f, 'yyyy-MM-dd HH:mm:ss') = g",
    "from_unixtime(f, 'yyyyMMdd')",
    "length(from_unixtime(f))",
    "from_unixtime(f) + 1",
    "now() >= now()",
    "CASE WHEN from_unixtime(f) > '2024-08-10 00:00:00' THEN 'after'"
    " ELSE 'before' END",
    "substring(from_unixtime(f), 1, 4)",
    "from_unixtime(f) < '2024-08-10'",
    "from_unixtime(1722470400) <= g",
    "(now() < from_unixtime(f)) AND (f < g)",
    "NOT (from_unixtime(f) > g)",
    "TIMESTAMP '2024-08-10T00:00:00' > f",
    "now() = TIMESTAMP '2024-08-15T12:00:00'",
    "from_unixtime(f) = TIMESTAMP '2024-08-10T05:30:15'",
    "coalesce(nullif(upper(f), ''), TIMESTAMP '2024-08-10T05:30:00')",
    "CASE WHEN f < g THEN TIMESTAMP '2024-08-10T05:30:00'"
    " ELSE now() END <= g",
    # date_diff compositions (ports implement the r9 integer-µs DIV):
    # string/object args are exactly comparable; epoch-digit strings and
    # Number args raise the documented Deviation in the ref port
    "datediff(f, g)",
    "datediff(from_unixtime(f), '2024-08-01 00:00:00')",
    "datediff(now(), f) > 3",
    "datediff(TIMESTAMP '2024-08-10T00:00:00', f)",
    # composed first arg: ts_from_any inlines the CASE ~11x — bounded
    # here as a single fixed template (the random generators keep
    # date_diff args leaf-shaped for exactly this emission-size reason)
    "datediff(CASE WHEN f < g THEN now()"
    " ELSE TIMESTAMP '2024-08-10T00:00:00' END, '2024-08-01 00:00:00')",
    # JSON-bearing value-function compositions over the same rows
    "get_json_string(f, '$.b.c[1]')",
    "coalesce(get_json_string(f, '$.a'), get_json_string(g, '$.a'), 'nj')",
    "nullif(get_json_string(f, '$.a'), 'x')",
    "length(get_json_string(f, '$.b'))",
]

_EPOCH_MS_MAX = 253_402_300_799_999
_EPOCH_S_MIN = -62_135_596_800
NOW_TS = NOW_DT  # the pinned now() literal, as an engine value


class Deviation(Exception):
    """A cell in a DOCUMENTED deviation class the per-kernel fuzz pins
    separately — here the stringly-typing choice: from_unixtime of a
    decimal epoch is valid for a JSON NUMBER (longValue truncates) and a
    throw for a JSON STRING (Long.parseLong); the wide model carries
    only strings and takes the number interpretation."""


class OutOfWindow(Exception):
    """Representable in Java's unbounded LocalDateTime (and in Python's
    bounded datetime it is NOT) — the engines render NULL there, the
    documented years-0001-9999 deviation."""


def _java_fmt(dt, pattern: str) -> str:
    if pattern == "yyyy-MM-dd HH:mm:ss":
        return (f"{dt.year:04d}-{dt.month:02d}-{dt.day:02d} "
                f"{dt.hour:02d}:{dt.minute:02d}:{dt.second:02d}")
    if pattern == "yyyyMMdd":
        return f"{dt.year:04d}{dt.month:02d}{dt.day:02d}"
    if pattern == "yyyy-MM-dd":
        return f"{dt.year:04d}-{dt.month:02d}-{dt.day:02d}"
    raise AssertionError(pattern)


def _epoch_to_dt_or_window(ts: int):
    """sec/ms heuristic (:526-535) then construct; Python's datetime
    range IS the engines' documented window, so construction failure ⟺
    engine NULL."""
    ms = ts if ts > 10_000_000_000 else ts * 1000
    try:
        return (datetime(1970, 1, 1, tzinfo=timezone.utc)
                + timedelta(milliseconds=ms))
    except OverflowError:
        raise OutOfWindow(ts)


class DT:
    """The reference's DateTimeResult: toString is the
    'yyyy-MM-dd HH:mm:ss' rendering (DateTimeResult.java:13)."""

    def __init__(self, dt):
        self.dt = dt

    def formatted(self):
        return _java_fmt(self.dt, "yyyy-MM-dd HH:mm:ss")


class LDT(DT):
    """A bare LocalDateTime (now(), date constants): toString is the
    ISO 'T' form with seconds dropped when zero, and isEqual's first
    branch (:230-232) accepts it where DateTimeResult falls through."""

    def formatted(self):
        v = self.dt
        base = (f"{v.year:04d}-{v.month:02d}-{v.day:02d}"
                f"T{v.hour:02d}:{v.minute:02d}")
        return base if v.second == 0 else f"{base}:{v.second:02d}"


# --- EngineEval date extensions (value mirrors of the emitted SQL) ---------
def _e_ts_from_num(v):
    """ts_from_num: try_num → ±9.2e18 gate → trunc toward zero →
    epoch-ms window rule → naive-UTC timestamp value (None = NULL)."""
    d = _e_try_num(v)
    if d is None or math.isnan(d) or not (-9.2e18 <= d <= 9.2e18):
        return None
    return _e_ms_to_ts(_e_epoch_ms(int(d)))


def _e_epoch_ms(v):
    if v is None:
        return None
    if v > _EPOCH_MS_MAX:
        return None
    if v > 10_000_000_000:
        return v
    if v >= _EPOCH_S_MIN:
        return v * 1000
    return None


def _e_ms_to_ts(ms):
    if ms is None:
        return None
    return (datetime(1970, 1, 1, tzinfo=timezone.utc)
            + timedelta(milliseconds=ms))


_LONG_RE_FULL = re.compile(r"[+-]?[0-9]{1,18}$")


def _e_ts_from_any(v, with_date_only=True):
    """ts_from_any: the LONG_RE epoch gate first, else the regex-gated
    datetime formats."""
    if v is None:
        return None
    s = _e_cast_str(v)
    if _LONG_RE_FULL.fullmatch(s):
        return _e_ms_to_ts(_e_epoch_ms(int(s)))
    dt = ref_parse_datetime(s, with_date_only=with_date_only)
    return dt


def _e_fmt_ts(ts, pattern):
    return None if ts is None else _java_fmt(ts, pattern)


class EngineEvalDates(EngineEval):
    """EngineEval + the date-function emission mirrors."""

    def eval(self, node, hint="any"):
        if isinstance(node, TsConst):
            return node.java_str()  # the toString rendering
        return super().eval(node, hint)

    def _ldt_operand(self, node):
        """Mirror of Emitter._ldt_operand: a LocalDateTime OBJECT —
        TsConst or now() — as a timestamp value, else None."""
        if isinstance(node, TsConst):
            return node.value.replace(tzinfo=timezone.utc)
        if isinstance(node, Func) and node.name == "now" and not node.args:
            return NOW_TS
        return None

    def eval_func(self, node):
        name, args = node.name, node.args
        if name == "now":
            # value context: the Java toString rendering (mirror of
            # ldt_render over the pinned literal)
            v = NOW_TS
            base = (f"{v.year:04d}-{v.month:02d}-{v.day:02d}"
                    f"T{v.hour:02d}:{v.minute:02d}")
            return base if v.second == 0 else f"{base}:{v.second:02d}"
        if name == "from_unixtime":
            ts = _e_ts_from_num(self.eval(args[0], "number"))
            fmt = args[1].value if len(args) > 1 else "yyyy-MM-dd HH:mm:ss"
            return _e_fmt_ts(ts, fmt)
        if name == "date_format":
            ts = _e_ts_from_any(self.eval(args[0], "any"),
                                with_date_only=False)
            return _e_fmt_ts(ts, args[1].value)
        if name == "date_diff":
            # mirror of datediff_days: full 24-hour periods truncated
            # toward zero, computed in EXACT integer microseconds (the
            # emitters' BIGINT DIV/`//` forms)
            a = _e_ts_from_any(self.eval(args[0], "any"))
            b = _e_ts_from_any(self.eval(args[1], "any"))
            if a is None or b is None:
                return None
            td = a - b
            us = (td.days * 86_400 + td.seconds) * 10**6 + td.microseconds
            q = abs(us) // 86_400_000_000
            return float(q if us >= 0 else -q)
        return super().eval_func(node)

    def _ts_operand(self, node):
        """Mirror of Emitter._ts_operand: a timestamp VALUE (None = the
        fragment's NULL) or the sentinel 'not-a-ts-operand' (False)."""
        if isinstance(node, TsConst):
            return node.value.replace(tzinfo=timezone.utc)
        if isinstance(node, Func) and node.name == "now" and not node.args:
            return NOW_TS
        if (isinstance(node, Func) and node.name == "from_unixtime"
                and len(node.args) == 1):
            return _e_ts_from_num(self.eval(node.args[0], "number"))
        if isinstance(node, Case) and node.whens and node.default is not None:
            shapes = [self._ts_shape(v) for _, v in node.whens]
            if all(shapes) and self._ts_shape(node.default):
                for cond, val in node.whens:
                    c, throwy = self.bool_operand(cond)
                    if throwy and c is None:
                        return None
                    if c is True:
                        return self._ts_operand(val)
                return self._ts_operand(node.default)
        return False

    def num_operand(self, node):
        # mirror: Emitter.num_operand checks _ts_operand FIRST — a
        # datetime object at a numeric boundary is an unconditional NULL
        if self._ts_shape(node):
            return None
        return super().num_operand(node)

    def _ts_shape(self, node) -> bool:
        """Compile-time: would Emitter._ts_operand return a fragment?"""
        if isinstance(node, TsConst):
            return True
        if isinstance(node, Func) and node.name == "now" and not node.args:
            return True
        if (isinstance(node, Func) and node.name == "from_unixtime"
                and len(node.args) == 1):
            return True
        if isinstance(node, Case) and node.whens and node.default is not None:
            return (all(self._ts_shape(v) for _, v in node.whens)
                    and self._ts_shape(node.default))
        return False

    def eval_op(self, node):
        if node.op in ("=", "!="):
            llt = self._ldt_operand(node.left)
            rlt = self._ldt_operand(node.right)
            if llt is not None and rlt is not None:
                eq = llt == rlt
                return eq if node.op == "=" else (not eq)
        if node.op in ("<", "<=", ">", ">="):
            lt = self._ts_operand(node.left)
            rt = self._ts_operand(node.right)
            if lt is not False or rt is not False:
                a = lt if lt is not False else ref_parse_datetime(
                    _e_cast_str(self.eval(node.left, "string")) or "\0",
                    with_date_only=False)
                b = rt if rt is not False else ref_parse_datetime(
                    _e_cast_str(self.eval(node.right, "string")) or "\0",
                    with_date_only=False)
                if a is None or b is None:
                    return None
                return {"<": a < b, "<=": a <= b,
                        ">": a > b, ">=": a >= b}[node.op]
        return super().eval_op(node)


# --- RefEval date extensions ------------------------------------------------
class RefEvalDates(RefEval):
    def eval(self, node):
        if isinstance(node, TsConst):
            return LDT(node.value.replace(tzinfo=timezone.utc))
        return super().eval(node)

    def eval_func(self, node):
        name = node.name
        if name == "now":
            return LDT(NOW_DT)
        if name in ("from_unixtime", "date_format"):
            vals = [self.eval(x) for x in node.args]
            if name == "from_unixtime":
                v = vals[0]
                if isinstance(v, Decimal):
                    ts = int(v)  # Number.longValue truncation
                elif isinstance(v, str):
                    got = ref_parse_long(v)
                    if got is THROW:
                        if try_cast_double(v) is not None:
                            raise Deviation(v)  # number-vs-string typing
                        raise Throw("from_unixtime parseLong")
                    ts = got
                else:
                    raise Throw("from_unixtime param type")
                dt = _epoch_to_dt_or_window(ts)
                if len(vals) > 1:
                    return _java_fmt(dt, node.args[1].value)
                return DT(dt)
            # date_format (:441-501): DT passthrough, Number/parseLong
            # epoch heuristic, else the inline formats (NO date-only)
            v = vals[0]
            if isinstance(v, DT):
                dt = v.dt
            elif isinstance(v, Decimal):
                dt = _epoch_to_dt_or_window(int(v))
            elif isinstance(v, str):
                got = ref_parse_long(v)
                if got is not THROW:
                    dt = _epoch_to_dt_or_window(got)
                else:
                    dt = ref_parse_datetime(v, with_date_only=False)
                    if dt is None:
                        raise Throw("date_format unparseable")
            else:
                raise Throw("date_format param type")
            return _java_fmt(dt, node.args[1].value)
        if name == "date_diff":
            # :407-440 — ChronoUnit.DAYS.between on the parsed pair.
            # The reference's OWN argument forms are internally
            # inconsistent (epoch-digit strings throw :407-410, Number
            # args are ALWAYS millis with no >1e10 heuristic :413-415);
            # the engines are documented-harmonized onto ts_from_any, so
            # those two arg classes raise Deviation (skip), like
            # from_unixtime's stringly case. Datetime STRINGS (incl. the
            # strict-ISO date-only fallback, :588-622) and datetime
            # OBJECTS agree in both worlds and are checked exactly.
            vals = [self.eval(x) for x in node.args]

            def to_dt(v):
                if isinstance(v, DT):
                    return v.dt
                if isinstance(v, Decimal):
                    raise Deviation("date_diff Number arg: always-millis "
                                    "vs the harmonized >1e10 heuristic")
                if isinstance(v, str):
                    if ref_parse_long(v) is not THROW:
                        raise Deviation("date_diff epoch-digit string: "
                                        "ref throws, engines parse")
                    try:
                        dt = ref_parse_datetime(v, with_date_only=True,
                                                submicro="raise")
                    except SubMicroTail:
                        raise Fragile("sub-µs fraction tail")
                    if dt is None:
                        raise Throw("date_diff unparseable string")
                    return dt
                raise Throw("date_diff param type")

            a, b = to_dt(vals[0]), to_dt(vals[1])
            td = a - b
            us = (td.days * 86_400 + td.seconds) * 10**6 + td.microseconds
            q = abs(us) // 86_400_000_000
            return Decimal(q if us >= 0 else -q)
        return super().eval_func(node)

    def eval_op(self, node):
        if node.op in ("<", "<=", ">", ">="):
            a = self.eval(node.left)
            b = self.eval(node.right)
            c = self._compare_dates(a, b)
            return {"<": c < 0, "<=": c <= 0,
                    ">": c > 0, ">=": c >= 0}[node.op]
        return super().eval_op(node)

    def _compare_dates(self, a, b) -> int:
        """compareDates :115-142, full: datetime objects first, then the
        mixed parse (no date-only), then compareNumbers (where a DT
        throws in toBigDecimal)."""
        da = a.dt if isinstance(a, DT) else None
        db = b.dt if isinstance(b, DT) else None
        if da is not None and db is not None:
            return (da > db) - (da < db)
        if da is not None:
            s = _ref_str(b)  # b.toString() — NPE on null, :126
            try:
                pd = ref_parse_datetime(s, with_date_only=False,
                                        submicro="raise")
            except SubMicroTail:
                raise Fragile("sub-µs fraction tail")
            if pd is not None:
                return (da > pd) - (da < pd)
        if db is not None:
            s = _ref_str(a)
            try:
                pd = ref_parse_datetime(s, with_date_only=False,
                                        submicro="raise")
            except SubMicroTail:
                raise Fragile("sub-µs fraction tail")
            if pd is not None:
                return (pd > db) - (pd < db)
        xa, xb = _to_bd(a), _to_bd(b)
        _fragile_gate(xa, xb)
        return (xa > xb) - (xa < xb)

    def _is_equal(self, a, b) -> bool:
        # both LocalDateTime OBJECTS → isEqual's first branch (:230-232);
        # DateTimeResult is NOT a LocalDateTime: it misses that branch
        # and falls through to toString equality (:230-265)
        if isinstance(a, LDT) and isinstance(b, LDT):
            return a.dt == b.dt
        if isinstance(a, DT) or isinstance(b, DT):
            if a is None or b is None:
                return False
            return _ref_str(a) == _ref_str(b)
        return super()._is_equal(a, b)


def _ref_str_dt(v):
    return v.formatted() if isinstance(v, DT) else v


# patch _ref_str/_to_bd to understand DT (toString renders the
# formatted form; toBigDecimal throws on datetime objects, :327-335)
_orig_ref_str = _ref_str


def _ref_str(v):  # noqa: F811
    if isinstance(v, DT):
        return v.formatted()
    return _orig_ref_str(v)


_orig_to_bd = _to_bd


def _to_bd(v):  # noqa: F811
    if isinstance(v, DT):
        raise Throw("datetime in numeric op")  # :327-335
    return _orig_to_bd(v)


@pytest.fixture(scope="module")
def date_cells(spark):
    rows = [(a, b) for a, b in zip(DIRTY, DIRTY[5:] + DIRTY[:5])]
    s_cols = [f"CAST(({COMPILER.to_spark_sql(e)}) AS STRING) AS c{i}"
              for i, e in enumerate(DATE_TEMPLATES)]
    d_cols = [f"CAST(({COMPILER.to_duckdb_sql(e)}) AS VARCHAR) AS c{i}"
              for i, e in enumerate(DATE_TEMPLATES)]

    spark.createDataFrame(rows, "f string, g string") \
        .createOrReplaceTempView("date_rows")
    s_rows = spark.sql(
        "SELECT f, g, " + ", ".join(s_cols) + " FROM date_rows").collect()

    con = duckdb.connect()
    con.execute("CREATE TABLE date_rows (f VARCHAR, g VARCHAR)")
    con.executemany("INSERT INTO date_rows VALUES (?, ?)", rows)
    d_rows = con.execute(
        "SELECT f, g, " + ", ".join(d_cols) + " FROM date_rows").fetchall()

    s_map = {(r[0], r[1]): tuple(r[2:]) for r in s_rows}
    d_map = {(r[0], r[1]): tuple(r[2:]) for r in d_rows}
    return rows, s_map, d_map


def test_date_compositions_match_engine_port(date_cells):
    rows, s_map, d_map = date_cells
    asts = [parse(e) for e in DATE_TEMPLATES]
    bad = []
    for key in rows:
        ev = EngineEvalDates({"f": key[0], "g": key[1]})
        for i, ast in enumerate(asts):
            want = _render_engine(ev.eval(ast))
            for which, got in (("spark", s_map[key][i]),
                               ("duck", d_map[key][i])):
                if not _norm_eq(got, want):
                    bad.append((DATE_TEMPLATES[i], key, which, got, want))
    assert not bad, f"{len(bad)} divergences, first 5: {bad[:5]}"


def test_date_compositions_match_reference_port(date_cells):
    rows, s_map, _ = date_cells
    asts = [parse(e) for e in DATE_TEMPLATES]
    checked = 0
    bad = []
    for key in rows:
        if _lenient(key[0]) or _lenient(key[1]):
            continue
        rv = RefEvalDates({"f": key[0], "g": key[1]})
        for i, ast in enumerate(asts):
            got = s_map[key][i]
            try:
                want = rv.eval(ast)
            except (Throw, OutOfWindow):
                # a throw is errData; an out-of-window datetime is the
                # documented years-0001-9999 deviation — NULL either way
                if got is not None:
                    bad.append((DATE_TEMPLATES[i], key, got, "THROW/OOW"))
                continue
            except (Fragile, Deviation):
                continue
            want = _ref_str_dt(want)
            if want is None:
                ok = got is None
            elif isinstance(want, bool):
                ok = got == ("true" if want else "false")
            elif isinstance(want, Decimal):
                ok = got is not None and _norm_eq(got, str(want))
            else:
                ok = got == want
            if not ok:
                bad.append((DATE_TEMPLATES[i], key, got, want))
            else:
                checked += 1
    assert not bad, f"{len(bad)} divergences, first 5: {bad[:5]}"
    assert checked > 120, f"port coverage too thin: {checked}"


# ---------------------------------------------------------------------------
# seeded RANDOM date-trees — the fixed DATE_TEMPLATES' generator form.
# This leg found the now()-rendering bug (a timestamp fragment reaching
# the equality's numeric probe instead of Java's toString fallthrough).
# ---------------------------------------------------------------------------
def _gen_d_ts(rng, d):
    p = rng.random()
    if p < 0.3:
        return f"from_unixtime({rng.choice(['f', 'g', '1722470400'])})"
    if p < 0.5:
        return "now()"
    if p < 0.7:
        return (f"TIMESTAMP '2024-08-{rng.randrange(1, 28):02d}"
                f"T{rng.randrange(0, 24):02d}:30:00'")
    if d <= 0:
        return "now()"
    return (f"CASE WHEN {_gen_d_bool(rng, 0)} THEN {_gen_d_ts(rng, d - 1)}"
            f" ELSE {_gen_d_ts(rng, d - 1)} END")


def _gen_d_str(rng, d):
    p = rng.random()
    if p < 0.2:
        return f"date_format({rng.choice(['f', 'g'])}, 'yyyy-MM-dd HH:mm:ss')"
    if p < 0.32:
        return f"from_unixtime({rng.choice(['f', 'g'])}, 'yyyyMMdd')"
    if p < 0.42:
        return rng.choice(["f", "g", "'2024-08-10 05:30:00'", "'x'"])
    if p < 0.5:
        # JSON-bearing leaf: fields carry the DIRTY alphabet's JSON
        # values; the path pool is the compile-time-normalized grammar
        return (f"get_json_string({rng.choice(['f', 'g'])}, "
                f"'{rng.choice(_JSON_PATHS)}')")
    if d <= 0:
        return "f"
    q = rng.random()
    if q < 0.25:
        return f"upper({_gen_d_str(rng, d - 1)})"
    if q < 0.45:
        return f"concat({_gen_d_str(rng, d - 1)}, '!')"
    if q < 0.6:
        return f"coalesce(nullif({_gen_d_str(rng, d - 1)}, ''), 'none')"
    if q < 0.7:
        # the value-function arg matrix: nullif over two live subtrees,
        # coalesce over three
        return (f"coalesce(nullif({_gen_d_str(rng, d - 1)}, "
                f"{_gen_d_str(rng, d - 1)}), {_gen_d_str(rng, 0)}, 'z')")
    if q < 0.8:
        # field leaves only — composed strings can mint trailing-garbage
        # JSON, the documented engine divergence
        return (f"get_json_string({rng.choice(['f', 'g'])}, "
                f"'{rng.choice(_JSON_PATHS)}')")
    return f"substring({_gen_d_str(rng, d - 1)}, 1, 8)"


def _gen_d_bool(rng, d):
    ops = ["<", "<=", ">", ">=", "=", "!="]
    if d <= 0 or rng.random() < 0.5:
        q = rng.random()
        if q < 0.4:
            return f"{_gen_d_ts(rng, 0)} {rng.choice(ops)} {_gen_d_str(rng, 0)}"
        if q < 0.7:
            return f"{_gen_d_ts(rng, 0)} {rng.choice(ops)} {_gen_d_ts(rng, 0)}"
        return f"{_gen_d_str(rng, 0)} {rng.choice(ops)} {_gen_d_str(rng, 0)}"
    a, b = _gen_d_bool(rng, d - 1), _gen_d_bool(rng, d - 1)
    return rng.choice([f"({a} AND {b})", f"({a} OR {b})", f"NOT {a}"])


def _gen_date_tree(rng):
    p = rng.random()
    d = rng.randrange(1, 3)
    if p < 0.45:
        return _gen_d_bool(rng, d)
    if p < 0.75:
        return _gen_d_str(rng, d)
    return f"CASE WHEN {_gen_d_bool(rng, d - 1)} THEN {_gen_d_str(rng, 0)} ELSE 'z' END"


def test_random_date_trees_triangulate(spark):
    rng = random.Random(55550001)
    exprs = [_gen_date_tree(rng) for _ in range(100)]
    asts = [parse(e) for e in exprs]
    rows = [(a, b) for a, b in zip(DIRTY, DIRTY[23:] + DIRTY[:23])]

    s_cols = [f"CAST(({COMPILER.to_spark_sql(e)}) AS STRING) AS c{i}"
              for i, e in enumerate(exprs)]
    d_cols = [f"CAST(({COMPILER.to_duckdb_sql(e)}) AS VARCHAR) AS c{i}"
              for i, e in enumerate(exprs)]
    spark.createDataFrame(rows, "f string, g string") \
        .createOrReplaceTempView("dtree_rows")
    s_rows = spark.sql(
        "SELECT f, g, " + ", ".join(s_cols) + " FROM dtree_rows").collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE dtree_rows (f VARCHAR, g VARCHAR)")
    con.executemany("INSERT INTO dtree_rows VALUES (?, ?)", rows)
    d_rows = con.execute(
        "SELECT f, g, " + ", ".join(d_cols) + " FROM dtree_rows").fetchall()
    s_map = {(r[0], r[1]): tuple(r[2:]) for r in s_rows}
    d_map = {(r[0], r[1]): tuple(r[2:]) for r in d_rows}

    bad = []
    checked = 0
    for key in rows:
        ev = EngineEvalDates({"f": key[0], "g": key[1]})
        rv = RefEvalDates({"f": key[0], "g": key[1]})
        for i, ast in enumerate(asts):
            want = _render_engine(ev.eval(ast))
            s, d = s_map[key][i], d_map[key][i]
            if not _norm_eq(s, d) or not _norm_eq(s, want):
                bad.append(("engine", exprs[i], key, s, d, want))
            if _lenient(key[0]) or _lenient(key[1]):
                continue
            try:
                rw = _ref_str_dt(rv.eval(ast))
            except (Throw, OutOfWindow):
                rw = None
            except (Fragile, Deviation):
                continue
            if rw is None:
                ok = s is None
            elif isinstance(rw, bool):
                ok = s == ("true" if rw else "false")
            else:
                ok = s is not None and _norm_eq(s, str(rw))
            if not ok:
                bad.append(("ref", exprs[i], key, s, rw))
            else:
                checked += 1
    assert not bad, f"{len(bad)} divergences, first 5: {bad[:5]}"
    assert checked > 800, f"port coverage too thin: {checked}"
