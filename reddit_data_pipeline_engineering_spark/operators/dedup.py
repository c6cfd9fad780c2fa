"""Relational deduplication operators.

Reference: window-rank dedup (``glue_jobs/process_openaq_raw.py:131-135``,
W1 in SURVEY.md §2.5) and distinct-by-key dim builds
(``process_openaq_raw.py:185``, A2).

Design decisions vs the reference (SURVEY.md §2.5):
- dedup key includes the parameter column — the production job's
  ``(location_id, datetime)`` key silently discards co-timestamped
  pollutants; the reference's own full-flow test uses the 3-part key.
- the reference orders the dedup window by its own partition key (a no-op:
  "first" is nondeterministic). We require an explicit tiebreak column so
  results are deterministic and oracle-checkable.

Scale: ``row_number`` dedup is one hash-partition shuffle on the key
columns; at 100 TB prefer ``dropDuplicates(keys)`` when any survivor is
acceptable (partial map-side dedup, no sort), and the window form only when
the survivor must be deterministic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def window_dedup(
    df: DataFrame,
    keys: Sequence[str],
    tiebreak: Sequence[str],
    keep: str = "first",
) -> DataFrame:
    """Keep exactly one row per `keys`, chosen deterministically by `tiebreak`.

    Equivalent to the reference's row_number-over-window filter
    (process_openaq_raw.py:131-135) with the nondeterminism fixed.
    """
    order = [F.col(c).asc() if keep == "first" else F.col(c).desc() for c in tiebreak]
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def distinct_by_key(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Arbitrary-survivor dedup (reference's dropDuplicates dim build, A2).

    Cheaper than window_dedup at scale: Spark plans it as a hash aggregate
    with map-side partial dedup, no per-partition sort.
    """
    return df.dropDuplicates(list(keys))


def exact_hash_dedup(
    df: DataFrame, content_col: str, id_col: str
) -> DataFrame:
    """Exact content dedup via hash-groupBy (LLM-pipeline extension).

    Groups by md5(content) and keeps the lowest id as canonical; returns
    (content_hash, canonical_id, n_copies). At 100 TB this is one shuffle
    on a 128-bit key with map-side combine — the standard exact-dedup plan.
    """
    return (
        df.select(F.md5(F.col(content_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )
