"""Scale rehearsal runner — one process per SF, wall + driver RSS.

    python tests/tools/rehearse_scale.py <sf_dir> [q1,q2,...]

Runs the listed queries (default: the rehearsal set from BASELINE.md's
round-9 note plus the round-10/11 surfaces p7/p8 UTM lane, p30/g1 DBCS
decode lane, p56 path analysis) against <sf_dir> on one fresh session,
prints one line per query with the wall and row count, and the driver
python peak RSS at the end. Compare two invocations (sf0.1 vs /tmp/sf1
from build_sf1.py) to read the scale exponents."""
from __future__ import annotations

import os
import resource
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

DEFAULT = ("p0_envelope", "p8_wide_table", "p7_enrichment",
           "p30_search_keywords", "g1_wire_roundtrip", "p53_ipv6_geo",
           "p56_event_paths", "p54_click_consumption",
           "p54d_replay_rollup", "l5_minhash_signatures",
           "l6_lsh_candidates", "l16_dedup_groups", "l18_split_sample",
           "l33_lm_quality_score", "l36_sequence_packing")


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else DEFAULT

    from zg_etl_spark import plans
    from zg_etl_spark.session import get_spark

    spark = get_spark("rehearse")
    qs = plans.all_queries()
    for name in names:
        t0 = time.monotonic()
        n = qs[name](spark, sf_dir).count()
        print(f"{name} {time.monotonic() - t0:.2f}s rows={n}",
              flush=True)
    peak_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
    print(f"driver_python_peak_mb {peak_mb}")


if __name__ == "__main__":
    main()
