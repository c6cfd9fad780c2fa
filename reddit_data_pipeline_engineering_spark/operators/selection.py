"""Distributed exact order statistics by iterative bucket bisection.

The window-rank formulation of an exact per-group median
(plans/queries_ext.py `grouped_median`) funnels each group through one
task's sort — the documented SCALE.md §10 weakness for LOW-cardinality
groups, exactly the regime (5 event types, country codes, source tags)
a warehouse rollup hits. This module computes the same exact order
statistics with NOTHING but mergeable conditional aggregates:

1. one profile pass per group: count / min / max;
2. repeated bucket passes: partition each group's live value range
   [lo, hi] into B equal sub-ranges, count rows per (group, bucket)
   map-side (a conditional aggregation — fully partial-aggregated, one
   keyed shuffle of G*B counters), then narrow [lo, hi] to the bucket
   containing the target rank. Width shrinks by B per round, so ~6
   rounds of B=1024 exceed double precision (B^6 = 2^60 > 2^52 ulps);
3. one final pass aggregating the few DISTINCT values left in [lo, hi]
   per group (after step 2 the bracket spans a handful of ulps — a
   single distinct value unless two neighbors straddle the boundary),
   from which the k-th value is read off directly.

Every pass is a map-side-combinable aggregate over the FULL input (no
cross-round set consistency to maintain; bounds are recomputed against
the raw values each round), so the plan scales like any groupBy — no
single task ever sorts a group. Driver state is G * (lo, hi, rank)
bounds — model-sized for the low-cardinality regime this targets; for
high-cardinality groups use the window variant, whose per-group sorts
are then small.

Determinism: bucket edges are pure double arithmetic from (lo, hi)
computed identically on the driver; ranks select VALUES (the multiset
middle), so id tiebreaks cannot change the result. The selected values
are exact input doubles — the same values the rank-window oracle
selects — so the final (sum of middles)/count matches the SQL replay
bit-for-bit.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BUCKETS = 1024
MAX_ROUNDS = 8


def _kth_targets(n: int) -> list[int]:
    """1-based middle ranks: one for odd n, two for even n (the rows the
    rank-window median formulation selects)."""
    if n % 2:
        return [(n + 1) // 2]
    return [n // 2, n // 2 + 1]


def grouped_median_selection(
    df: DataFrame,
    group_col: str,
    value_col: str,
    buckets: int = BUCKETS,
    max_rounds: int = MAX_ROUNDS,
) -> DataFrame:
    """Exact per-group median via bucket bisection; returns a DataFrame
    (group, n_values BIGINT, median_value DOUBLE) matching the
    rank-window formulation row-for-row.

    Null values are ignored (matching ``WHERE value IS NOT NULL``).
    """
    spark = df.sparkSession
    src = df.select(
        F.col(group_col).alias("g"), F.col(value_col).alias("v")
    ).filter(F.col("v").isNotNull()).persist()

    prof = {
        r["g"]: (r["n"], float(r["lo"]), float(r["hi"]))
        for r in src.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }

    # (group, rank) -> live bracket; resolved[group] -> list of values in
    # middle-rank order.
    want: dict[object, list[int]] = {g: _kth_targets(n) for g, (n, _, _) in prof.items()}
    state: dict[tuple[object, int], tuple[float, float]] = {}
    resolved: dict[tuple[object, int], float] = {}
    for g, (n, lo, hi) in prof.items():
        for k in want[g]:
            if lo == hi:
                resolved[(g, k)] = lo
            else:
                state[(g, k)] = (lo, hi)

    for _ in range(max_rounds):
        live = {key: b for key, b in state.items() if key not in resolved}
        if not live:
            break
        # One conditional-aggregation pass for ALL live (group, rank)
        # brackets: a bounds row per bracket broadcast-joined on group,
        # bucket index computed from the raw value each round.
        gtype = "bigint" if isinstance(next(iter(live))[0], int) else "string"
        bounds = spark.createDataFrame(
            [(g, k, lo, hi) for (g, k), (lo, hi) in live.items()],
            f"g {gtype}, k long, lo double, hi double",
        )
        width = F.col("hi") - F.col("lo")
        bucket = F.least(
            F.lit(buckets - 1),
            F.greatest(
                F.lit(0),
                F.floor((F.col("v") - F.col("lo")) / width * buckets).cast("int"),
            ),
        )
        counts = (
            src.join(F.broadcast(bounds), "g")
            .select(
                "g",
                "k",
                F.when(F.col("v") < F.col("lo"), F.lit(-1))
                .when(F.col("v") > F.col("hi"), F.lit(buckets))
                .otherwise(bucket)
                .alias("b"),
            )
            .groupBy("g", "k", "b")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        per_key: dict[tuple[object, int], dict[int, int]] = {}
        for r in counts:
            per_key.setdefault((r["g"], r["k"]), {})[r["b"]] = r["c"]
        for (g, k), bc in per_key.items():
            lo, hi = state[(g, k)]
            cum = bc.get(-1, 0)
            w = hi - lo
            for b in range(buckets):
                c = bc.get(b, 0)
                if cum + c >= k:
                    new_lo = lo + (w * b) / buckets
                    new_hi = lo + (w * (b + 1)) / buckets if b < buckets - 1 else hi
                    if new_lo >= new_hi:
                        # Bracket collapsed to a single representable
                        # double — every value in it IS that double.
                        resolved[(g, k)] = new_lo
                    state[(g, k)] = (new_lo, min(new_hi, hi))
                    break
                cum += c

    # Final pass: distinct values inside each remaining bracket (a few
    # ulps wide -> a handful of rows per group), k-th read off exactly.
    live = [key for key in state if key not in resolved]
    if live:
        bounds = spark.createDataFrame(
            [(g, k, *state[(g, k)]) for (g, k) in live],
            f"g {'bigint' if isinstance(live[0][0], int) else 'string'}, k long, lo double, hi double",
        )
        rows = (
            src.join(F.broadcast(bounds), "g")
            .groupBy("g", "k")
            .agg(
                F.sum(F.when(F.col("v") < F.col("lo"), 1).otherwise(0)).alias(
                    "below"
                ),
                F.sort_array(
                    F.collect_set(
                        F.when(
                            (F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi")),
                            F.col("v"),
                        )
                    )
                ).alias("vals"),
                F.collect_list(
                    F.when(
                        (F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi")),
                        F.col("v"),
                    )
                ).alias("all_in"),
            )
            .collect()
        )
        for r in rows:
            g, k = r["g"], r["k"]
            remaining = k - r["below"]
            cnt = Counter(r["all_in"])
            cum = 0
            for v in r["vals"]:
                cum += cnt[v]
                if cum >= remaining:
                    resolved[(g, k)] = v
                    break

    src.unpersist()
    # Mean of the 1-2 middle values with plain IEEE a+b (commutative for
    # two terms), mirroring the rank-window oracle's SUM/COUNT.
    out = []
    for g, (n, _, _) in sorted(prof.items(), key=lambda x: str(x[0])):
        vals = [resolved[(g, k)] for k in want[g]]
        out.append((g, n, (vals[0] + vals[-1]) / len(vals) if len(vals) == 2 else vals[0]))
    gtype = "bigint" if out and isinstance(out[0][0], int) else "string"
    return spark.createDataFrame(
        out, f"{group_col} {gtype}, n_values bigint, median_value double"
    )
