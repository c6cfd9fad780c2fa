#!/usr/bin/env python
"""Load-insensitive second-decade certification (VERDICT r05 #1): per-query
SHUFFLE BYTES / RECORDS and stage counts at sf1.0 vs sf10, instead of wall
time.

Why: the r05 sf10 probes produced 1.9x-16.6x wall-time bands across five
identical-code runs on this shared host — wall time cannot certify the
second decade for short iterative kernels. Shuffle write volume is a
property of the PLAN + DATA, not of host load: for a scale-correct kernel
it must grow at most linearly in the input (10x data -> <= ~10x bytes,
equal stage counts modulo data-dependent round counts).

Mechanism: snapshot the AppStatusStore stage list before each execution,
run the query once, and sum shuffleWriteBytes/shuffleWriteRecords over the
stages the execution added (construction-time jobs - persists, bisection
rounds, k-means fits - are deliberately included: they are part of the
query's data movement). No warm-up or best-of-N is needed because the
metric is load-invariant; one timed pass doubles as a wall-time footnote.

Usage: RDPE_DRIVER_MEMORY=48g python tools/scale_metrics.py \
          [SF1_DIR] [SF10_DIR] [query,query,...]
Defaults: /tmp/scaledata/sf1.0 /tmp/scaledata/sf10 and the five iterative
graph kernels from VERDICT r05 #1. Prints one JSON object; the sf10/sf1.0
bytes ratio is the certification number (<= ~11 = linear with slack).

The 48 GB heap note from tools/scale_probe_sf10.py applies: the probe JVM
stands in for a whole cluster at 240M edges.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

PROBE = [
    "pagerank_topk",
    "ppr_topk",
    "lpa_communities",
    "kcore_peel_counts",
    "sssp_weighted_hist",
]


def _stage_list(spark):
    """All stages in the AppStatusStore (py4j call with Scala defaults)."""
    store = spark._jsparkSession.sparkContext().statusStore()
    args = [getattr(store, f"stageList$default${i}")() for i in (2, 3, 4, 5)]
    seq = store.stageList(None, *args)
    it = seq.iterator()
    out = []
    while it.hasNext():
        out.append(it.next())
    return out


def stage_snapshot(spark) -> set[tuple[int, int]]:
    """(stageId, attemptId) pairs currently known to the status store."""
    return {(s.stageId(), s.attemptId()) for s in _stage_list(spark)}


def stage_metrics_since(spark, before: set[tuple[int, int]]) -> dict:
    """Aggregate data-movement metrics over stages not in ``before``.

    SKIPPED stages (reused exchanges / cached results) contribute no new
    movement and are excluded from the stage count but their (zero)
    metrics are summed harmlessly.
    """
    out = {
        "n_stages": 0,
        "n_tasks": 0,
        "shuffle_write_bytes": 0,
        "shuffle_write_records": 0,
        "shuffle_read_bytes": 0,
        "input_bytes": 0,
    }
    for s in _stage_list(spark):
        if (s.stageId(), s.attemptId()) in before:
            continue
        if s.status().toString() != "SKIPPED":
            out["n_stages"] += 1
            out["n_tasks"] += s.numTasks()
        out["shuffle_write_bytes"] += s.shuffleWriteBytes()
        out["shuffle_write_records"] += s.shuffleWriteRecords()
        out["shuffle_read_bytes"] += s.shuffleReadBytes()
        out["input_bytes"] += s.inputBytes()
    return out


def measure(spark, fn, sf_dir: str) -> dict:
    """Run one query end-to-end and return its stage-diff metrics.

    RDPE_STAGE_DETAIL=1 additionally prints one line per non-skipped
    stage (id, write records/bytes, truncated callsite name) to stderr —
    the attribution view for decomposing a >10x records ratio into
    which stages grew (e.g. map-side combine effectiveness declining as
    distinct keys per partition rise).

    RDPE_SCALE_EVAL=noop evaluates through the noop data-source sink
    instead of ``.count()``. The count() action lets Catalyst PRUNE
    1:1 operators whose outputs the count never reads — a Window with
    no surviving output column is eliminated along with its exchange —
    so window-shaped queries under-report movement by the whole
    windowed relation (found r11: compaction_bin_plan recorded 21
    shuffled records under count() vs the true 50k/500k under noop).
    The noop sink keeps every output column live, so nothing prunes.
    """
    before = stage_snapshot(spark)
    t0 = time.perf_counter()
    if os.environ.get("RDPE_SCALE_EVAL") == "noop":
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    else:
        fn(spark, sf_dir).count()
    wall = time.perf_counter() - t0
    m = stage_metrics_since(spark, before)
    m["wall_sec"] = round(wall, 3)  # footnote only - load-sensitive
    if os.environ.get("RDPE_STAGE_DETAIL"):
        for s in sorted(_stage_list(spark), key=lambda s: s.stageId()):
            if (s.stageId(), s.attemptId()) in before:
                continue
            if s.status().toString() == "SKIPPED":
                continue
            print(
                f"  stage {s.stageId():4d} wrec={s.shuffleWriteRecords():>12d} "
                f"wbytes={s.shuffleWriteBytes():>13d} "
                f"tasks={s.numTasks():4d} {s.name()[:70]}",
                file=sys.stderr,
                flush=True,
            )
    return m


def main() -> None:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaledata/sf1.0"
    sf10 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scaledata/sf10"
    probe = sys.argv[3].split(",") if len(sys.argv) > 3 else PROBE

    from reddit_data_pipeline_engineering_spark.plans.queries import (
        REGISTRY,
        queries,
    )
    from reddit_data_pipeline_engineering_spark.session import get_spark
    from reddit_data_pipeline_engineering_spark.sources.tables import load_table

    queries()
    spark = get_spark(app_name="rdpe-scale-metrics")

    out: dict[str, dict] = {}
    for sf_name, sf_dir in (("sf1.0", sf1), ("sf10", sf10)):
        for t in ("lineitem", "documents"):
            load_table(spark, sf_dir, t).count()
        for name in probe:
            m = measure(spark, REGISTRY[name].fn, sf_dir)
            out.setdefault(name, {})[sf_name] = m
            print(
                f"{name} @ {sf_name}: {m['shuffle_write_bytes'] / 1e6:.1f} MB "
                f"shuffled over {m['n_stages']} stages "
                f"({m['wall_sec']:.1f}s wall)",
                file=sys.stderr,
                flush=True,
            )
            spark._jvm.System.gc()  # release shuffle files (see probe tool)

    for name, d in out.items():
        a, b = d["sf1.0"], d["sf10"]
        d["bytes_ratio"] = (
            round(b["shuffle_write_bytes"] / a["shuffle_write_bytes"], 2)
            if a["shuffle_write_bytes"]
            else None
        )
        d["records_ratio"] = (
            round(b["shuffle_write_records"] / a["shuffle_write_records"], 2)
            if a["shuffle_write_records"]
            else None
        )
        d["stage_ratio"] = (
            round(b["n_stages"] / a["n_stages"], 2) if a["n_stages"] else None
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
