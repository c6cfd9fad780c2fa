#!/usr/bin/env python
"""Per-query optimization profiler (r11 optimization round).

For each named query at $SPARK_GRAFT_SF_DIR (default sf0.1):

- warm-up pass, then min-of-N wall via the noop sink (guide §1.4 —
  computes every column, no driver materialization, no count()-pruning);
- stage-diff metrics from the AppStatusStore (n_stages / n_tasks /
  shuffle bytes+records / input bytes) reusing tools/scale_metrics.py;
- optionally (`--plans DIR`) the `.explain("formatted")` text saved to
  DIR/<query>_<tag>.txt for the judge's plan-claim check.

Usage:
    python tools/profile_bench.py q1,q2,...      [--runs 2]
        [--plans plans/r11 --tag before] [--json OUT.json]
    python tools/profile_bench.py TOP:25          # 25 slowest per bench_full.json
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from tools.scale_metrics import stage_metrics_since, stage_snapshot  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--plans", default=None)
    ap.add_argument("--tag", default="before")
    ap.add_argument("--json", dest="json_out", default=None)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from reddit_data_pipeline_engineering_spark.plans.queries import (
        REGISTRY,
        queries,
    )
    from reddit_data_pipeline_engineering_spark.session import get_spark
    from reddit_data_pipeline_engineering_spark.sources.tables import load_table

    queries()
    if args.queries.startswith("TOP:"):
        k = int(args.queries.split(":")[1])
        with open(os.path.join(_REPO, "bench_full.json")) as f:
            full = json.load(f)["queries"]
        names = [n for n, _ in sorted(full.items(), key=lambda x: -x[1])[:k]]
    else:
        names = args.queries.split(",")
    unknown = [n for n in names if n not in REGISTRY]
    assert not unknown, f"unknown queries: {unknown}"

    spark = get_spark(app_name="rdpe-profile")
    for t in ("lineitem", "events", "customer", "documents", "embeddings"):
        load_table(spark, sf_dir, t).count()

    out: dict[str, dict] = {}
    for name in names:
        fn = REGISTRY[name].fn
        spark.sparkContext.setJobDescription(f"profile:{name}")
        df = fn(spark, sf_dir)
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(
                os.path.join(args.plans, f"{name}_{args.tag}.txt"), "w"
            ) as f:
                f.write(buf.getvalue())
        # warm-up (fresh plan object per run: queries build/persist
        # internally, so reuse of `df` would hide construction jobs)
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best, metrics = float("inf"), None
        for _ in range(args.runs):
            before = stage_snapshot(spark)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            if wall < best:
                best = wall
                metrics = stage_metrics_since(spark, before)
        metrics["wall_sec"] = round(best, 3)
        out[name] = metrics
        print(
            f"{name:35s} {best:7.2f}s  stages={metrics['n_stages']:3d} "
            f"tasks={metrics['n_tasks']:5d} "
            f"shuf={metrics['shuffle_write_bytes'] / 1e6:8.2f}MB "
            f"recs={metrics['shuffle_write_records']}",
            flush=True,
        )
        spark.sparkContext.setJobDescription(None)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
