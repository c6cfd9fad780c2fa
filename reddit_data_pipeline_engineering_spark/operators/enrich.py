"""Dimension-enrichment joins.

Reference: the Glue job's left join of the wide fact onto a
dropDuplicates-built location dim (``glue_jobs/process_openaq_raw.py:
179-198``, J1) and the Lambda's dict-lookup join (``extract_api.py:374-422``,
J2), plus the hardcoded LOCATION_CITY_MAP coalesce (``extract_api.py:
355-372, 390``, J3) and null-fill defaults (``process_openaq_raw.py:
195-198``, P5).

Spark-first reformulation: all three collapse into one broadcast hash join
plus column expressions. The dim side is explicitly ``F.broadcast()``-hinted
— at 100 TB the fact side never shuffles for this join; the dim (even a few
million rows) ships to executors once.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def broadcast_enrich(
    fact: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str],
    how: str = "left",
) -> DataFrame:
    """Left-join small dimension metadata onto a large fact (J1/J2)."""
    on = [on] if isinstance(on, str) else list(on)
    return fact.join(F.broadcast(dim), on=on, how=how)


def map_literal(mapping: Mapping, key: Column) -> Column:
    """A broadcast map-literal lookup column (J3's LOCATION_CITY_MAP).

    Builds F.create_map(lit(k1), lit(v1), ...)[key] — evaluated JVM-side,
    no Python per-row cost, no join.
    """
    if not mapping:
        return F.lit(None)
    pairs: list[Column] = []
    for k, v in mapping.items():
        pairs.append(F.lit(k))
        pairs.append(F.lit(v))
    return F.create_map(*pairs)[key]


def coalesce_defaults(df: DataFrame, defaults: Mapping[str, object]) -> DataFrame:
    """Apply null-fill defaults (P5: fillna Unknown/VN/0.0)."""
    return df.na.fill(dict(defaults))
