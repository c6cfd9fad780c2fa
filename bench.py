#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the engine's headline queries (registry entries tagged ``bench``) at
``$SPARK_GRAFT_SF_DIR`` (default ``/root/testdata/sf0.1``) on
``local[$SPARK_GRAFT_CPUS]``.

Output contract (r04 lesson — BENCH_r04.json came back ``parsed: null``
because the single per-query JSON line grew past the driver's tail
capture, truncating the suite total off the FRONT): the full per-query
dict is written to ``bench_full.json`` and printed as an intermediate
line, then the LAST stdout line is a compact summary (< 1 KB at any
registry size) the driver can always parse::

    {"metric": "bench_suite_total", "value": N, "unit": "sec",
     "sf": ..., "n_queries": N, "queries_file": "bench_full.json"}

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

    # Host-contention telemetry (VERDICT r09 #3): BENCH_r09's closing run
    # breached the streaming floor under co-tenant load; recording the
    # 1-minute loadavg at start/end lets a reader separate host noise
    # from regression inside the artifact itself.
    host = {"cpus": os.cpu_count(), "load1_start": round(os.getloadavg()[0], 2)}

    queries()  # force full registration (imports queries_llm etc.)
    spark = get_spark(app_name="rdpe-bench")
    local_dir = spark.conf.get("spark.local.dir")

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

    # Streaming throughput leg (VERDICT r06 #9): the streaming family
    # asserts correctness and state carry elsewhere; this measures the
    # performance leg — sustained drained rows/s per streaming query at
    # this sf. Each registry streaming query stages the 7-day event
    # slice as NDJSON and drains it with availableNow, so
    # rows/s = staged input rows / end-to-end wall (staging + drain +
    # sink rollup) — a conservative LOWER bound on pure drain
    # throughput. One pass each (the batch loop's warm-up already paid
    # the JIT cost for the shared scan/codegen paths).
    streaming = streaming_throughput(spark, sf_dir, REGISTRY)

    # sf from the dir name (e.g. .../sf0.1 -> 0.1); fall back to 0.1.
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        sf = float(base.replace("sf", ""))
    except ValueError:
        sf = 0.1

    host["load1_end"] = round(os.getloadavg()[0], 2)
    full_line, compact_line = emit_lines(timings, sf, _REPO_DIR, streaming, host)
    print(full_line)
    # LAST line: compact summary, bounded size regardless of registry
    # growth — this is what the driver's tail capture records.
    print(compact_line)
    spark.stop()
    assert_local_dir_hygiene(local_dir, _REPO_DIR)


def assert_local_dir_hygiene(
    local_dir: str, repo_dir: str, wait_s: float = 20.0
) -> None:
    """Tested invariant form of the r08 #4 spill-dir pin (VERDICT r09 #8):
    the bench session's shuffle/spill dir must be repo-scoped (never OS
    /tmp, where a reaper can race live shuffle files) and empty after a
    clean ``spark.stop()`` (Spark removes the blockmgr/spark-* subdirs it
    created). A leftover means an unclean shutdown leaked spill data.

    Two r10-verdict/advice refinements:

    - ``spark.stop()`` returns before the JVM's shutdown hooks finish
      deleting blockmgr-*/spark-* subdirs, so the emptiness check polls
      with a bounded backoff (the r10 artifact recorded rc=1 for a dir
      that was empty moments later).
    - the repo-scope assert is skipped when the operator explicitly
      pointed the session elsewhere via ``RDPE_SPARK_LOCAL_DIR`` (the
      pin protects the *default* placement, not a deliberate override).
    """
    import time

    override = os.environ.get("RDPE_SPARK_LOCAL_DIR")
    if not override:
        assert local_dir and os.path.realpath(local_dir).startswith(
            os.path.realpath(repo_dir) + os.sep
        ), f"bench spark.local.dir escaped the repo: {local_dir}"
    deadline = time.monotonic() + wait_s
    delay = 0.25
    while True:
        leftovers = os.listdir(local_dir) if os.path.isdir(local_dir) else []
        if not leftovers or time.monotonic() >= deadline:
            break
        time.sleep(delay)
        delay = min(delay * 2, 4.0)
    # Distinguish the two leftover classes (r11, second rc=1 artifact):
    # blockmgr-* spill FILES after stop are a real leak (the invariant
    # this assert exists for), but an empty `spark-<uuid>` driver temp
    # dir is deleted by JVM-EXIT shutdown hooks, not by spark.stop() —
    # it can legitimately outlive any wait while the py4j gateway holds
    # the JVM. Sweep empty trees ourselves; assert only on file content.
    import shutil

    leaked_files = []
    for entry in list(leftovers):
        full = os.path.join(local_dir, entry)
        if os.path.isdir(full):
            contents = [
                os.path.join(dp, f)
                for dp, _, fs in os.walk(full)
                for f in fs
            ]
            if not contents:
                shutil.rmtree(full, ignore_errors=True)
                continue
            leaked_files.extend(contents[:5])
        else:
            leaked_files.append(full)
    assert not leaked_files, (
        f"bench local dir leaked spill data after stop: {leaked_files}"
    )
    if not override and os.path.isdir(local_dir):
        os.rmdir(local_dir)  # reclaim the per-pid dir itself


def streaming_throughput(spark, sf_dir: str, registry) -> dict[str, dict]:
    """Drained-rows/s per streaming registry query — best of two passes,
    the batch loop's min-of-two rationale: a single drain occasionally
    eats a stop-the-world GC pause or a co-tenant load burst (the r09
    closing bench breached the 2k floor on four legs under exactly such
    a burst), which would misreport the leg by up to ~9x."""
    from pyspark.sql import functions as F

    from reddit_data_pipeline_engineering_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    week_rows = (
        ev.crossJoin(F.broadcast(ev.agg(F.min("ts").alias("t0"))))
        .filter(F.col("ts") < F.col("t0") + F.expr("INTERVAL 7 DAYS"))
        .count()
    )
    out: dict[str, dict] = {}
    for name, spec in sorted(registry.items()):
        if "streaming" not in spec.tags:
            continue
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        out[name] = {
            "sec": round(best, 3),
            "input_rows": week_rows,
            "drained_rows_per_s": round(week_rows / best, 1),
        }
    return out


def emit_lines(
    timings: dict[str, float],
    sf: float,
    repo_dir: str | None,
    streaming: dict[str, dict] | None = None,
    host: dict | None = None,
) -> tuple[str, str]:
    """Build the two output lines and persist the full dict.

    Contract (tests/test_bench_contract.py): the SECOND (last-printed)
    line stays under 1 KB at ANY registry size and always parses to a
    dict holding the suite total — the r04 failure was the single
    per-query line outgrowing the driver's tail capture, truncating the
    total off the front.
    """
    total = round(sum(timings.values()), 3)
    full = {
        "metric": "bench_suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if streaming:
        full["streaming"] = streaming
    if host:
        full["host"] = host
    # Full per-query detail: persisted to a file AND printed as an
    # intermediate line (human-visible, but never the line the driver
    # must parse).
    if repo_dir is not None:
        with open(os.path.join(repo_dir, "bench_full.json"), "w") as f:
            json.dump(full, f, indent=1, sort_keys=True)
            f.write("\n")
    compact = {
        "metric": "bench_suite_total",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "queries_file": "bench_full.json",
    }
    if host:
        # ~60 bytes — fits the 1 KB compact budget with ample headroom.
        compact["host"] = host
    return json.dumps(full), json.dumps(compact)


if __name__ == "__main__":
    main()
