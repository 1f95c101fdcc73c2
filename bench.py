"""Benchmark harness: runs the declared query suite at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line with per-query wall seconds.

Each query is forced with a count() action (full plan execution, no
driver-side collect of wide results)."""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd  # module-level: pandas-UDF type hints resolve by name


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from zg_etl_spark import plans
    from zg_etl_spark.session import get_spark

    spark = get_spark("zg-etl-bench")
    all_queries = plans.all_queries()

    # warm the JVM + parquet footers once with a trivial action
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    # warm the Python/Arrow lane: spawn the per-core pandas-UDF workers
    # (numpy+pandas import per worker) so per-query times measure queries,
    # not one-time worker startup a long-lived cluster never repays
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _noop(s: pd.Series) -> pd.Series:
        import numpy as _np  # noqa: F401 — force the hot-path import

        return s

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.range(cpus * 4, numPartitions=cpus).select(_noop("id")).count()

    per_query: dict[str, float] = {}
    t_suite = time.perf_counter()
    for name in sorted(all_queries):
        t0 = time.perf_counter()
        try:
            all_queries[name](spark, sf_dir).count()
            per_query[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001 — record failure, keep suite
            per_query[name] = -1.0
            print(f"bench: {name} failed: {exc}", file=sys.stderr)
    total = round(time.perf_counter() - t_suite, 3)

    print(
        json.dumps(
            {
                "metric": "declared_query_suite_wall",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
