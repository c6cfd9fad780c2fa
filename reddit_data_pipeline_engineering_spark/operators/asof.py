"""As-of and range joins — time-series operators Spark lacks natively.

No reference counterpart (SURVEY.md §2.3: "no theta/range/as-of/interval
joins"); these are the canonical time-series operators a measurement store
grows into, implemented as compositions of existing DataFrame ops (no
Pandas fallback needed):

- ``asof_join``: for each left row (key, t) attach the latest right row
  with right_ts <= t (backward direction). Implemented as the union +
  keyed-window + last(ignorenulls) composition: one shuffle on the key,
  one per-key sort — the same cost profile as a window function, with
  NONE of the O(n*m) blowup a naive inequality join has. At 100 TB both
  sides shuffle once on the join key; state per key is a single carried
  struct.
- ``range_join``: rows-into-intervals with an equi-key prefix, planned as
  a hash join on the key plus a post-join range filter — never a
  broadcast-nested-loop. For interval tables without a usable equi key,
  bucket both sides by time-chunk first (``bucket_minutes``) so the join
  key becomes (key?, chunk) and each row meets only nearby intervals.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] = (),
    suffix: str = "_right",
    tolerance_seconds: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join (pandas merge_asof / DuckDB ASOF JOIN semantics,
    inclusive: right_ts == left_ts matches in either direction).

    ``direction="backward"`` (default) matches the most recent right row
    at-or-before the left timestamp; ``"forward"`` the earliest right
    row at-or-after it (pandas merge_asof's direction= parity — the
    next-shipment / next-purchase attribution shape).

    ``right_cols`` are the payload columns carried from the matched right
    row (each emitted as ``<name><suffix>``, plus ``<right_ts><suffix>``).
    Rows with no match keep NULL payloads; ``tolerance_seconds``
    additionally voids matches outside the window. Right rows sharing an
    exact (key, ts) should be pre-deduplicated — ordering among them is
    otherwise not deterministic (same contract in both directions).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r} (backward|forward)")
    from pyspark.sql import types as T

    on = [on] if isinstance(on, str) else list(on)
    payload = F.struct(
        F.col(right_ts).alias("__ts"), *[F.col(c) for c in right_cols]
    )
    left_struct = F.struct(*[F.col(c) for c in left.columns])
    left_type = T.StructType(left.schema.fields)

    r = right.select(
        *on,
        F.col(right_ts).alias("__evt_ts"),
        F.lit(0).alias("__src"),
        payload.alias("__payload"),
        F.lit(None).cast(left_type).alias("__left"),
    )
    l = left.select(
        *on,
        F.col(left_ts).alias("__evt_ts"),
        F.lit(1).alias("__src"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        left_struct.alias("__left"),
    )

    # The whole left row rides the union as a struct, so no re-join is
    # needed afterwards (a (key, ts) re-join would multiply duplicate
    # left timestamps). At equal timestamps the right row sorts first
    # (src 0 < 1), making the match inclusive; last(ignorenulls) carries
    # the most recent right payload forward.
    merged = l.unionByName(r)
    if direction == "backward":
        w = (
            Window.partitionBy(*on)
            .orderBy("__evt_ts", "__src")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        match = F.last("__payload", ignorenulls=True)
    else:
        # Forward: left rows (src 1) sort BEFORE right rows (src 0) at
        # equal timestamps, so a following-frame first(ignorenulls)
        # still sees the tied right row — inclusive, mirrored.
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("__evt_ts"), F.col("__src").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        match = F.first("__payload", ignorenulls=True)
    carried = merged.withColumn("__match", match.over(w)).filter(
        F.col("__src") == 1
    )

    if tolerance_seconds is not None:
        delta = F.expr(f"INTERVAL {int(tolerance_seconds)} SECONDS")
        in_window = (
            F.col("__match.__ts") >= (F.col("__evt_ts") - delta)
            if direction == "backward"
            else F.col("__match.__ts") <= (F.col("__evt_ts") + delta)
        )
        carried = carried.withColumn(
            "__match", F.when(in_window, F.col("__match"))
        )

    return carried.select(
        "__left.*",
        F.col("__match.__ts").alias(f"{right_ts}{suffix}"),
        *[F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str | Sequence[str],
    point_ts: str,
    interval_start: str,
    interval_end: str,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join with an equi-key prefix: hash join on the
    key(s), range predicate applied as the join residual. Inclusive start,
    exclusive end (half-open, the streaming-window convention)."""
    on = [on] if isinstance(on, str) else list(on)
    # Explicit aliases: when both inputs share lineage (self-derived
    # intervals), points[k] == intervals[k] resolves to the SAME attribute
    # and collapses to a trivially-true predicate — the join silently
    # becomes a per-key cross join.
    p = points.alias("__pts")
    i = intervals.alias("__itv")
    cond = None
    for k in on:
        c = F.col(f"__pts.{k}") == F.col(f"__itv.{k}")
        cond = c if cond is None else cond & c
    cond = (
        cond
        & (F.col(f"__pts.{point_ts}") >= F.col(f"__itv.{interval_start}"))
        & (F.col(f"__pts.{point_ts}") < F.col(f"__itv.{interval_end}"))
    )
    keep_itv = [c for c in intervals.columns if c not in on]
    return p.join(i, cond, how).select(
        "__pts.*", *[F.col(f"__itv.{c}") for c in keep_itv]
    )
