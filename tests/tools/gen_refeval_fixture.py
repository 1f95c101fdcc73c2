"""Generate tests/data/refeval_jvm_fixture.jsonl.gz — ground truth from
the REFERENCE's own expression engine, executed on this container's JDK.

Recipe (run from the repo root; requires /root/reference and JAVA_HOME):

1. Copy the reference sources UNMODIFIED into a scratch dir (they are
   never committed here — the fixture records their BEHAVIOR only):
       VirtualAttributeManager.java
       VirtualAttributeExpressionEvaluator.java
       SqlToJsonExpressionConverter.java     (etl-flink-pipeline …/virtualAttribute/)
       DateTimeResult.java                   (etl-flink-common …/util/)
2. javac -encoding UTF-8 them + tests/tools/RefEvalMain.java with
   pyspark's bundled jackson-{core,databind,annotations} jars on the
   classpath (the only non-JDK dependency).
3. python tests/tools/gen_refeval_fixture.py <classes-dir>
   — streams every (expr, row) cell through RefEvalMain and writes the
   gzip fixture tests/test_expr_jvm_fixture.py verifies the Python
   reference port against.

Cell set: every committed template (test_expr_fuzz.TEMPLATES +
test_expr_tree_port.DATE_TEMPLATES) plus 300 seeded random trees, ×
seed-424242-sampled DIRTY pairs. now()-bearing expressions are excluded
(the JVM clock cannot be pinned); TIMESTAMP literals are excluded
(verified separately: the reference SQL converter has no such token —
they model the JSON AST's dataType:"date" constant).
"""

from __future__ import annotations

import glob
import gzip
import json
import random
import subprocess
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from test_expr_fuzz import DIRTY, TEMPLATES, _gen  # noqa: E402
import test_expr_tree_port as T  # noqa: E402
from zg_etl_spark.functions.expr_compiler import parse  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "data",
                   "refeval_jvm_fixture.jsonl.gz")


def cell_set():
    num_exprs = list(TEMPLATES)
    for i in range(150):
        num_exprs.append(_gen(random.Random(900000 + i), 2))
    date_exprs = [e for e in T.DATE_TEMPLATES
                  if "now()" not in e and "TIMESTAMP" not in e]
    for i in range(150):
        e = T._gen_date_tree(random.Random(910000 + i))
        if "now()" not in e and "TIMESTAMP" not in e:
            date_exprs.append(e)
    exprs = sorted(
        {e for e in set(num_exprs) | set(date_exprs) if _parses(e)})
    rng = random.Random(424242)
    pairs = set()
    while len(pairs) < 70:
        pairs.add((rng.choice(DIRTY), rng.choice(DIRTY)))
    pairs = sorted(pairs, key=lambda p: (str(p[0]), str(p[1])))
    return exprs, pairs


def _parses(e):
    try:
        parse(e)
        return True
    except Exception:
        return False


def main():
    classes = sys.argv[1]
    jars = [j for j in glob.glob(
        "/root/.pyenv/versions/3.11.7/lib/python3.11/site-packages/"
        "pyspark/jars/jackson-*.jar")
        if any(k in j for k in ("databind", "core-", "annotations"))]
    cp = classes + ":" + ":".join(jars)

    exprs, pairs = cell_set()
    lines, meta = [], []
    for e in exprs:
        for f, g in pairs:
            row = {}
            if f is not None:
                row["_f"] = f
            if g is not None:
                row["_g"] = g
            lines.append(json.dumps({"expr": e, "row": row},
                                    ensure_ascii=False))
            meta.append((e, f, g))

    proc = subprocess.run(
        ["java", "-Dfile.encoding=UTF-8", "-cp", cp, "RefEvalMain"],
        input="\n".join(lines), capture_output=True, text=True)
    outs = [json.loads(l) for l in proc.stdout.splitlines() if l.strip()]
    assert len(outs) == len(meta), (len(outs), len(meta),
                                    proc.stderr[-1000:])

    with gzip.open(OUT, "wt", encoding="utf-8") as fh:
        fh.write(json.dumps({"values": DIRTY, "n_cells": len(meta)},
                            ensure_ascii=False) + "\n")
        for (e, f, g), r in zip(meta, outs):
            fh.write(json.dumps(
                [e, DIRTY.index(f), DIRTY.index(g), r],
                ensure_ascii=False) + "\n")
    print("wrote", OUT, len(meta), "cells")


if __name__ == "__main__":
    main()
