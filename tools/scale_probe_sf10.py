#!/usr/bin/env python
"""Second-decade scaling probe (VERDICT r04 #5): time the sf1.0 curve's
WORST scalers at sf10 (100x the bench scale) — the kernels whose
sublinearity is most at risk as their candidate/band/label relations
grow with the corpus:

- minhash_lsh_pairs  (7.4x at the first decade: band-bucket pair emit)
- lsh_quality_eval   (5.0x: exact PPJoin + LSH side-by-side)
- lpa_communities    (4.6x: per-round edge-label join)
- kcore_peel_counts  (2.6x after the bounded-storage fix; sf10 drives
  ~240M directed co-purchase edges through the bounded path — the
  regime the fix targets)

Methodology matches tools/scale_curve.py (§9c): engine session, input
scans warmed, one untimed warm-up execution per query, then min of two
timed runs. sf10 is produced by running tools/gen_scale_data.py on the
sf1.0 output (10 key-shifted shards of 10 key-shifted shards — token
spaces stay disjoint thanks to the '§copy' suffix chain).

Usage: RDPE_DRIVER_MEMORY=48g python tools/scale_probe_sf10.py \
           [SF1_DIR] [SF10_DIR] [query,query,...]
Defaults: /tmp/scaledata/sf1.0 /tmp/scaledata/sf10 (all four probes)

Shuffle-file hygiene: a JVM System.gc() runs between executions —
at this scale each pass of the heavier queries leaves tens of GB of
shuffle files whose cleanup waits on the ShuffleDependency being
garbage-collected, and with a 48 GB heap ordinary GC may never trigger
before the disk fills (measured: 62 GB of accumulated blockmgr files
killed the first probe run with SPILL_OUT_OF_MEMORY / no-space-left).

Heap note: the probe JVM stands in for an entire cluster. At sf10 the
co-purchase graph holds ~240M directed edges; the kcore bounded path
keeps two persisted generations (~8 GB columnar) while 32 concurrent
tasks need execution memory, which overflows the engine's default 8 GB
single-JVM heap (measured: UNABLE_TO_ACQUIRE_MEMORY in the first kcore
pass). 48 GB fits comfortably — in cluster terms, 240M edges want
> 8 GB of AGGREGATE executor storage, which any real deployment of this
data size has by orders of magnitude.
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
    "kcore_peel_counts",
    "minhash_lsh_pairs",
    "lpa_communities",
    "lsh_quality_eval",
]


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
    spark = get_spark(app_name="rdpe-scale-probe-sf10")

    out: dict[str, dict[str, float]] = {}
    for sf_name, sf_dir in (("sf1.0", sf1), ("sf10", sf10)):
        for t in ("lineitem", "documents"):
            load_table(spark, sf_dir, t).count()
        for name in probe:
            REGISTRY[name].fn(spark, sf_dir).count()  # warm-up pass
            best = float("inf")
            for _ in range(2):
                spark._jvm.System.gc()  # release prior runs' shuffle files
                t0 = time.perf_counter()
                REGISTRY[name].fn(spark, sf_dir).count()
                best = min(best, time.perf_counter() - t0)
            out.setdefault(name, {})[sf_name] = round(best, 3)
            print(f"{name} @ {sf_name}: {best:.3f}s", file=sys.stderr, flush=True)
            spark._jvm.System.gc()

    for name, d in out.items():
        d["ratio"] = round(d["sf10"] / d["sf1.0"], 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
