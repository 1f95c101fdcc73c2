"""The expression engine's ground-truth layer: the REFERENCE's own
evaluator, executed.

tests/data/refeval_jvm_fixture.jsonl.gz holds 17,500 (expr, row) cells
evaluated by the reference's SqlToJsonExpressionConverter +
VirtualAttributeExpressionEvaluator, compiled UNMODIFIED from
/root/reference and run on this container's JDK 17 (generator recipe:
tests/tools/gen_refeval_fixture.py). This test re-evaluates every cell
with the Python reference port (RefEvalDates) and demands exact
agreement outside the documented sentinel classes — the definitive
answer to "is the port a correct reading of the Java?", which three
independent re-readings could never quite give.

Round-9 findings this layer produced (each now encoded in the port AND
both SQL emitters): SMART-resolver hour 24 ('2024-08-10 24:00:00' →
next-day midnight in the ofPattern parse bodies), ISO fractions of 7-9
digits parsing (ISO_LOCAL_DATE_TIME nanos; sub-µs tails are the
engines' documented resolution deviation), the SQL surface spelling
DATEDIFF (date_diff is only the JSON AST name), and the LEN/SUBSTR/
CURRENT_TIMESTAMP aliases with case-insensitive lookup.
"""

from __future__ import annotations

import gzip
import json
import os
from decimal import Decimal

import pytest

from test_expr_fuzz import _lenient
import test_expr_tree_port as T
from zg_etl_spark.functions.expr_compiler import parse

FIXTURE = os.path.join(os.path.dirname(__file__), "data",
                       "refeval_jvm_fixture.jsonl.gz")


def _matches(want, got):
    if want is None:
        return got == "NULL"
    if isinstance(want, bool):
        return got == f"BOOL:{str(want).lower()}"
    if isinstance(want, Decimal):
        if got.startswith(("DEC:", "NUM:")):
            try:
                return Decimal(got.split(":", 1)[1]) == want
            except Exception:
                return False
        return False
    if isinstance(want, T.LDT):
        return got == "LDT:" + want.formatted()
    if isinstance(want, T.DT):
        return got.startswith("DTR:") and got[4:] == want.formatted()
    if isinstance(want, str):
        return got == "STR:" + want
    if isinstance(want, (int, float)):
        if got.startswith(("DEC:", "NUM:")):
            return Decimal(got.split(":", 1)[1]) == Decimal(str(want))
        return False
    return False


def test_reference_port_reproduces_jvm_fixture():
    with gzip.open(FIXTURE, "rt", encoding="utf-8") as fh:
        header = json.loads(fh.readline())
        cells = [json.loads(l) for l in fh]
    values = header["values"]
    assert len(cells) == header["n_cells"]

    ast_cache = {}
    stats = {"value": 0, "throw": 0, "lenient": 0, "fragile": 0,
             "deviation": 0, "oow": 0, "missing": 0}
    bad = []
    for e, fi, gi, jvm in cells:
        f, g = values[fi], values[gi]
        if _lenient(f) or _lenient(g):
            stats["lenient"] += 1
            continue
        ast = ast_cache.get(e)
        if ast is None:
            ast = ast_cache[e] = parse(e)
        ev = T.RefEvalDates({"f": f, "g": g})
        try:
            want = ev.eval(ast)
        except T.Throw:
            stats["throw"] += 1
            if not jvm.startswith("THROW:"):
                bad.append((e, f, g, jvm, "THROW"))
            continue
        except T.Fragile:
            stats["fragile"] += 1
            continue
        except T.Deviation:
            stats["deviation"] += 1
            continue
        except T.OutOfWindow:
            stats["oow"] += 1
            continue
        except KeyError:
            stats["missing"] += 1
            continue
        stats["value"] += 1
        if not _matches(want, jvm):
            bad.append((e, f, g, jvm, repr(want)))

    assert not bad, (f"{len(bad)} divergences vs the JVM fixture, "
                     f"first 5: {bad[:5]}")
    # the skip classes must not silently hollow the check out
    assert stats["value"] >= 8000, stats
    assert stats["throw"] >= 4500, stats
