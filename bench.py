#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the engine's headline queries (registry entries tagged ``bench``) at
``$SPARK_GRAFT_SF_DIR`` (default ``/root/testdata/sf0.1``) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced with a cheap ``count()`` (full plan execution, no
driver-side result materialization cost) after a warm-up of the input scans.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from reddit_data_pipeline_engineering_spark.plans.queries import REGISTRY, queries
    from reddit_data_pipeline_engineering_spark.session import get_spark

    queries()  # force full registration (imports queries_llm etc.)
    spark = get_spark(app_name="rdpe-bench")

    bench_names = [n for n, s in sorted(REGISTRY.items()) if "bench" in s.tags]

    # Warm up the JVM + file listing so t0 isn't dominated by session start.
    from reddit_data_pipeline_engineering_spark.sources.tables import load_table

    for t in ("lineitem", "events", "customer", "documents", "embeddings"):
        load_table(spark, sf_dir, t).count()

    # One untimed pass first: JIT/codegen warm-up dominates cold first
    # executions (observed 2-4x inflation on the first run of a query).
    for name in bench_names:
        REGISTRY[name].fn(spark, sf_dir).count()

    # Min of two timed runs per query: a single pass occasionally eats a
    # ~25s stop-the-world GC pause on one arbitrary query, which would
    # misreport that query by 10-50x.
    timings: dict[str, float] = {}
    for name in bench_names:
        spec = REGISTRY[name]
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    # sf from the dir name (e.g. .../sf0.1 -> 0.1); fall back to 0.1.
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        sf = float(base.replace("sf", ""))
    except ValueError:
        sf = 0.1

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "bench_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
