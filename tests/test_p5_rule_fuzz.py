"""End-to-end RANDOM-RULE fuzz for p5's pipeline integration.

The expression triangulation (test_expr_fuzz / test_expr_tree_port /
test_deep_sweep) pins CELL semantics over a synthetic f/g relation.
This file pins the remaining seam — the pipeline INTEGRATION the cells
flow through (plans/pipeline.py _p5):

- rule compilation with the PIPELINE resolver (_va_resolver_for):
  envelope fields resolve to native-typed columns (k/sid BIGINT,
  value DOUBLE, event_type/pl/cuid VARCHAR), '_'-prefixed keys through
  the custom property bag's SQL expressions with TRY_CAST on numeric
  hints;
- the event-scope gate CASE (dt IN ('evt','abp') AND event_type = X);
- the user-scope isAllProp field-presence gate (_is_all_prop) incl.
  dotted spellings and the empty-list vacuous-true form;
- boolean→1/0 convertValue (CAST AS INT, throw-NULL preserved);
- writeback column naming (one aliased CASE column per rule).

Rules are SEEDED RANDOM ASTs over the p5 field alphabet, minting all
FOUR constant types (string, number, boolean, TIMESTAMP/'date') plus
now(), date/JSON/value functions, boolean and non-boolean roots. The
seed rotates with BUILD_ROUND like the deep sweep. Checks, per the
triangulation pattern:

1. ENGINE ≡ ENGINE: the full generated p5 SELECT runs through BOTH
   pipelines (spark_pipeline_df vs duck_pipeline_sql) and every output
   cell must agree — this is exactly the shape the driver's oracle
   hash-compares for the declared p5.
2. ENGINE ≡ ENGINE-PORT: a typed-env extension of EngineEvalDates
   replays every rule row-by-row on a sample of the same spine rows,
   gates included.
3. ≡ REFERENCE PORT: RefEvalDates — the literal Java port
   (VirtualAttributeExpressionEvaluator + VirtualPropertyOperator
   convertValue :231-235 + isAllProp :186-203) — on rows whose field
   values avoid the documented leniency classes.

Green at sf0.001 and sf0.01 (ZG_TEST_SF_DIR; the sf0.01 parity
rehearsal covers the second).
"""

from __future__ import annotations

import random

import pytest

from test_expr_fuzz import NOW_SQL, _lenient, _norm_eq, try_cast_double
from test_expr_tree_port import (
    Deviation,
    EngineEvalDates,
    Fragile,
    OutOfWindow,
    RefEvalDates,
    Throw,
    _ref_str_dt,
    _render_engine,
)
from zg_etl_spark.buildinfo import BUILD_ROUND
from zg_etl_spark.functions.expr_compiler import parse, returns_boolean
from zg_etl_spark.operators.domain import (
    DUCK,
    custom_attrs,
    duck_pipeline_sql,
    spark_pipeline_df,
)
from zg_etl_spark.oracle import duck_connection
from zg_etl_spark.plans.pipeline import _is_all_prop, _va_frag

SEED = 54_030_000 + BUILD_ROUND
N_EVT_RULES = 30
N_USR_RULES = 15
PORT_SAMPLE = 1500  # rows the two Python ports replay (engines: ALL)

# the p5 field alphabet, typed like the spine: native numerics render
# '42'/'87.13' identically in both engines (BIGINT always; DOUBLE while
# plain-decimal — the spine's value stays < 1e3)
_NUM_NATIVE = {"k", "value", "sid"}
_STR_ENV = ("event_type", "pl", "cuid")
_BAG = [name for name, _, _ in custom_attrs(DUCK)]
_NUM_LEAVES = ["k", "value", "sid", "_k", "_vbucket"]
_STR_LEAVES = ["event_type", "pl", "cuid", "_etype", "_plat", "_band",
               "_k", "_vbucket"]
_EVENTS = ["purchase", "click", "view", "error"]
_GATE_FIELDS = ["t.k", "usr.cuid", "sid", "pl", "usr._band", "_plat",
                "table._vbucket", "cuid", "_etype"]


# --- typed rule generator ----------------------------------------------------
def _g_num(rng, d):
    if d <= 0:
        return rng.choice(_NUM_LEAVES + ["42", "3.5", "0.7", "10"])
    p = rng.random()
    a, b = _g_num(rng, d - 1), _g_num(rng, d - 1)
    if p < 0.35:
        return f"({a} {rng.choice(['+', '-', '*', '/', '%'])} {b})"
    if p < 0.5:
        return f"round({a}, {rng.randrange(0, 3)})"
    if p < 0.6:
        return f"abs({a})"
    if p < 0.7:
        return f"length({_g_str(rng, d - 1)})"
    if p < 0.85:
        return f"datediff(from_unixtime({a}), '2024-08-01 00:00:00')"
    # CASE value branches must stay FAMILY-homogeneous — the documented
    # engine deviation (expr_compiler.py module docstring): DuckDB types
    # CASE statically and rejects a VARCHAR/numeric branch mix that the
    # reference's Object values would carry. A bare BAG leaf at a branch
    # root is VARCHAR; force the numeric family the documented way
    # (x * 1). The round-10 fresh seed minted three mixed rules and the
    # bind failed loudly, exactly as documented — reference-shipped
    # rules are homogeneous, so the generator stays in contract.
    fa, fb = (f"({x} * 1)" if x in _BAG else x for x in (a, b))
    return f"CASE WHEN {_g_bool(rng, d - 1)} THEN {fa} ELSE {fb} END"


def _g_str(rng, d):
    if d <= 0:
        return rng.choice(_STR_LEAVES + ["'hi'", "'2024-08-10'", "'x'"])
    p = rng.random()
    a = _g_str(rng, d - 1)
    if p < 0.2:
        return f"upper({a})"
    if p < 0.35:
        return f"concat({a}, '-', {_g_str(rng, d - 1)})"
    if p < 0.45:
        return f"substring({a}, 1, {rng.randrange(2, 8)})"
    if p < 0.55:
        return f"coalesce(nullif({a}, ''), {_g_str(rng, d - 1)}, 'none')"
    if p < 0.65:
        # non-JSON field values: the legit-NULL channel end to end
        return (f"get_json_string({rng.choice(_STR_LEAVES)}, "
                f"'$.{rng.choice(['a', 'b.c[0]'])}')")
    if p < 0.8:
        return f"date_format(from_unixtime({_g_num(rng, 0)}), 'yyyyMMdd')"
    return f"CASE WHEN {_g_bool(rng, d - 1)} THEN {a} ELSE 'z' END"


def _g_bool(rng, d):
    ops = ["<", "<=", ">", ">=", "=", "!="]
    if d <= 0 or rng.random() < 0.45:
        q = rng.random()
        if q < 0.4:
            return f"{_g_num(rng, 0)} {rng.choice(ops)} {_g_num(rng, 0)}"
        if q < 0.6:
            return f"{_g_str(rng, 0)} {rng.choice(['=', '!='])} {_g_str(rng, 0)}"
        if q < 0.8:
            # the 4th constant type: a TIMESTAMP/'date' rule constant
            # against now() or a field — chrono OBJECT semantics
            ts = (f"TIMESTAMP '2024-08-{rng.randrange(1, 28):02d}"
                  f"T{rng.randrange(0, 24):02d}:30:00'")
            lhs = rng.choice(["now()", ts, f"from_unixtime({_g_num(rng, 0)})"])
            return f"{lhs} {rng.choice(ops)} {ts}"
        return f"{_g_num(rng, 0)} {rng.choice(ops)} {_g_str(rng, 0)}"
    a, b = _g_bool(rng, d - 1), _g_bool(rng, d - 1)
    return rng.choice([f"({a} AND {b})", f"({a} OR {b})", f"NOT {a}"])


def _g_rule(rng):
    p = rng.random()
    d = rng.randrange(1, 3)
    if p < 0.35:
        return _g_bool(rng, d)  # boolean root → convertValue 1/0
    if p < 0.65:
        return _g_num(rng, d)
    if p < 0.9:
        return _g_str(rng, d)
    return (f"CASE WHEN {_g_bool(rng, 0)} THEN {_g_str(rng, 0)} "
            f"WHEN {_g_bool(rng, 0)} THEN 'w2' END")


def _gen_rules(rng):
    evt = [(rng.choice(_EVENTS), _g_rule(rng)) for _ in range(N_EVT_RULES)]
    usr = []
    for _ in range(N_USR_RULES):
        nf = rng.randrange(0, 3)  # 0 = the ungated vacuous-true form
        fields = ", ".join(rng.sample(_GATE_FIELDS, nf))
        usr.append((_g_rule(rng), fields))
    return evt, usr


# --- the generated p5-shaped query (mirrors plans/pipeline.py _p5) ----------
def _p5_sql(d, evt, usr):
    cols = []
    # the engines' clock is pinned to the ports' NOW constant (r9's seed
    # agreed between live and pinned clocks by luck; r10's
    # 'now() > 2024-08-25' rule split them — 82 row divergences)
    for i, (ev, rule) in enumerate(evt):
        cond = f"dt IN ('evt', 'abp') AND event_type = '{ev}'"
        cols.append(
            f"CAST((CASE WHEN {cond} THEN ({_va_frag(d, rule, NOW_SQL)}) END)"
            f" AS {'STRING' if d.name == 'spark' else 'VARCHAR'}) AS r{i}")
    for i, (rule, fields) in enumerate(usr):
        cond = f"dt = 'usr' AND {_is_all_prop(d, fields)}"
        cols.append(
            f"CAST((CASE WHEN {cond} THEN ({_va_frag(d, rule, NOW_SQL)}) END)"
            f" AS {'STRING' if d.name == 'spark' else 'VARCHAR'}) AS u{i}")
    return ("SELECT event_id, dt, event_type, "
            + ",\n       ".join(cols)
            + "\nFROM resolved WHERE dt IN ('evt', 'abp', 'usr')")


# --- typed-env engine port ---------------------------------------------------
def _num_str(v):
    return str(v) if isinstance(v, int) else repr(float(v))


class P5Eval(EngineEvalDates):
    """EngineEvalDates over the pipeline's TYPED env: native numeric
    columns resolve exactly on the number channel and render like the
    engines' CAST AS STRING on the string channel; bag fields are the
    reference's Map<String,String> strings (TRY_CAST on number hints,
    like _va_resolver_for emits)."""

    def eval(self, node, hint="any"):
        from zg_etl_spark.functions.expr_compiler import Field

        if isinstance(node, Field):
            v = self.env[node.name]
            if v is None:
                return None
            if node.name in _NUM_NATIVE:
                return float(v) if hint == "number" else _num_str(v)
            if hint == "number":
                return try_cast_double(v)
            return v
        return super().eval(node, hint)


def _port_cell(ev, ast, boolean_root):
    v = ev.eval(ast)
    if boolean_root:
        # convertValue: Boolean → 1/0; a throw-NULL stays NULL
        v = None if v is None else (1.0 if v else 0.0)
    return _render_engine(v)


def _ref_cell(rv, ast, boolean_root):
    try:
        v = _ref_str_dt(rv.eval(ast))
    except (Throw, OutOfWindow):
        return None, True
    except (Fragile, Deviation):
        return None, False
    if boolean_root:
        v = None if v is None else ("1" if v is True else
                                    "0" if v is False else v)
    elif isinstance(v, bool):
        v = "true" if v else "false"
    return v, True


# --- the test ----------------------------------------------------------------
@pytest.fixture(scope="module")
def p5_fuzz(spark, sf_dir):
    rng = random.Random(SEED)
    evt, usr = _gen_rules(rng)
    from zg_etl_spark.operators.domain import SPARK

    s_rows = spark_pipeline_df(spark, sf_dir, _p5_sql(SPARK, evt, usr)) \
        .collect()
    con = duck_connection(sf_dir)
    d_rows = con.execute(duck_pipeline_sql(_p5_sql(DUCK, evt, usr))) \
        .fetchall()

    # the typed env for the ports, from the SAME relation
    bag_cols = ", ".join(
        f"({expr}) AS {name}" for name, expr, _ in custom_attrs(DUCK))
    env_rows = con.execute(duck_pipeline_sql(
        "SELECT event_id, dt, event_type, k, value, pl, cuid, sid, "
        + bag_cols
        + " FROM resolved WHERE dt IN ('evt', 'abp', 'usr')")).fetchall()
    env_cols = ["event_id", "dt", "event_type", "k", "value", "pl",
                "cuid", "sid"] + _BAG
    envs = {r[0]: dict(zip(env_cols, r)) for r in env_rows}
    return evt, usr, s_rows, d_rows, envs


def test_p5_rule_fuzz_engine_parity(p5_fuzz):
    """Every generated-rule output cell agrees across the two pipelines
    on EVERY spine row — the driver-oracle shape."""
    evt, usr, s_rows, d_rows, _ = p5_fuzz
    assert len(s_rows) == len(d_rows) and len(s_rows) > 100
    s_map = {r[0]: tuple(r) for r in s_rows}
    d_map = {r[0]: tuple(r) for r in d_rows}
    assert set(s_map) == set(d_map)
    names = [f"r{i}" for i in range(len(evt))] + \
            [f"u{i}" for i in range(len(usr))]
    rules = [r for _, r in evt] + [r for r, _ in usr]
    bad = []
    for eid, srow in s_map.items():
        drow = d_map[eid]
        for j in range(3, len(srow)):
            if not _norm_eq(srow[j], drow[j]):
                bad.append((eid, names[j - 3], rules[j - 3],
                            srow[j], drow[j]))
    assert not bad, (
        f"round-{BUILD_ROUND} p5 fuzz (seed {SEED}): {len(bad)} "
        f"engine divergences, first 5: {bad[:5]}")


def test_p5_rule_fuzz_port_replay(p5_fuzz):
    """Row-by-row replay: gates in Python + the typed-env engine port on
    a deterministic sample; the reference port on clean rows."""
    evt, usr, s_rows, _, envs = p5_fuzz
    evt_asts = [(ev, parse(r), returns_boolean(parse(r))) for ev, r in evt]
    usr_asts = []
    for rule, fields in usr:
        ast = parse(rule)
        gate = [f.strip().split(".")[-1]
                for f in fields.split(",") if f.strip()]
        usr_asts.append((ast, returns_boolean(ast), gate))

    sample = sorted(s_rows, key=lambda r: r[0])[:PORT_SAMPLE]
    bad, ref_checked = [], 0
    for row in sample:
        env = envs[row[0]]
        ev_port = P5Eval(env)
        clean = not any(
            isinstance(env[f], str) and _lenient(env[f])
            for f in _STR_ENV + tuple(_BAG))
        rv = RefEvalDates(
            {k: (None if v is None else
                 _num_str(v) if k in _NUM_NATIVE else v)
             for k, v in env.items()})
        cells = list(row)[3:]
        for j, (ev_name, ast, broot) in enumerate(evt_asts):
            got = cells[j]
            fires = env["dt"] in ("evt", "abp") and \
                env["event_type"] == ev_name
            _check(bad, got, fires, ev_port, rv, ast, broot, clean,
                   row[0], evt[j][1])
            ref_checked += 1
        for j, (ast, broot, gate) in enumerate(usr_asts):
            got = cells[len(evt_asts) + j]
            fires = env["dt"] == "usr" and \
                all(env[f] is not None for f in gate)
            _check(bad, got, fires, ev_port, rv, ast, broot, clean,
                   row[0], usr[j][0])
            ref_checked += 1
    assert not bad, (
        f"round-{BUILD_ROUND} p5 fuzz (seed {SEED}): {len(bad)} port "
        f"divergences, first 5: {bad[:5]}")
    assert ref_checked > 10_000, ref_checked


def _check(bad, got, fires, ev_port, rv, ast, broot, clean, eid, rule):
    if not fires:
        if got is not None:
            bad.append((eid, rule, "gate", got))
        return
    want = _port_cell(ev_port, ast, broot)
    if not _norm_eq(got, want):
        bad.append((eid, rule, "engine-port", got, want))
        return
    if not clean:
        return
    rw, usable = _ref_cell(rv, ast, broot)
    if not usable:
        return
    if rw is None:
        ok = got is None
    elif isinstance(rw, bool):
        ok = got == ("true" if rw else "false")
    else:
        ok = got is not None and _norm_eq(got, str(rw))
    if not ok:
        bad.append((eid, rule, "ref-port", got, rw))
