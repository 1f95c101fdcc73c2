"""Capture .explain('formatted') output for declared queries.

Usage:
    python tests/tools/capture_plans.py OUTDIR SUFFIX q1 p54 l14 ...

Writes OUTDIR/<query>_<SUFFIX>.txt for each named query. Used to produce
the plans/r11/<query>_{before,after}.txt deliverables (run once from the
pre-optimization commit in a worktree, once from HEAD).

Streaming s-queries return a post-run batch DataFrame (the streamed
result read back); their .explain shows the final batch plan, which is
still useful for claims about the read-back side, and the streaming
internals are covered by the engine's own job metrics instead.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from zg_etl_spark import plans
    from zg_etl_spark.session import get_spark

    spark = get_spark("plan-capture")
    all_queries = plans.all_queries()
    full = {n.split("_", 1)[0]: n for n in all_queries}

    for short in names:
        name = full.get(short, short)
        df = all_queries[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{short}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} @ {sf_dir} ({suffix})\n")
            fh.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
