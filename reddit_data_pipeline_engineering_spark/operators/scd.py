"""Type-2 slowly-changing-dimension build from an event/change stream.

No reference counterpart (SURVEY.md §2: the reference materializes
point-in-time snapshots only); SCD2 is the canonical warehouse operator a
mart layer grows into once history matters: collapse an ordered change
stream into versioned validity intervals (valid_from / valid_to /
is_current) per entity.

Scale shape: everything is keyed windows over the entity id —
change detection (lag), version numbering (running sum), interval close
(lead) — so the whole build is ONE shuffle on the entity key. The
version group-by re-uses the same hash partitioning (grouping keys are a
superset of the window partition key), so Catalyst plans no second
exchange. No driver materialization, no iteration: state per entity is a
single carried row, which is what survives 100 TB of history.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2(
    df: DataFrame,
    key: str,
    attr: str,
    ts: str = "ts",
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Collapse an ordered change stream into SCD2 validity intervals.

    For each entity ``key``, consecutive rows with the same tracked
    attribute value merge into one version; each version row carries
    ``valid_from`` (first ts at that value), ``valid_to`` (next version's
    valid_from, NULL for the open current version), ``is_current``, and
    ``n_events`` (collapsed source-row count).

    ``order_cols`` are appended to ``ts`` as deterministic tie-breakers
    (pass the source's unique id so re-runs are bit-identical).
    """
    order = [F.col(ts), *[F.col(c) for c in order_cols]]
    w = Window.partitionBy(key).orderBy(*order)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    prev = F.lag(attr).over(w)
    changed = F.when(prev.isNull() | (prev != F.col(attr)), 1).otherwise(0)
    versioned = df.withColumn("version", F.sum(changed).over(run))

    grouped = versioned.groupBy(key, "version").agg(
        F.min(attr).alias(attr),
        F.min(ts).alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wv = Window.partitionBy(key).orderBy("version")
    valid_to = F.lead("valid_from").over(wv)
    return grouped.select(
        key,
        "version",
        attr,
        "valid_from",
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
        "n_events",
    )
