"""Datetime column expressions.

Reference: ISO-8601 (with offset) -> UTC timestamp cast
(``glue_jobs/process_openaq_raw.py:118-121``, F1), date-part derivation
with zero-padded month/day partition strings (``process_openaq_raw.py:
124-127``, F2/F3), and invalid-datetime drops (``etls/openaq_etl.py:
293-297``, P3).

All are built-in JVM expressions inside whole-stage codegen — no UDFs.
Session timezone must be UTC (session.py pins it) so `+07:00` offsets
normalize identically to the reference's documented behavior
(doc/GLUE_JOBS_GUIDE.md:195-199).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def parse_iso_timestamp(col: Column | str) -> Column:
    """Permissive ISO-8601 parse; malformed strings become NULL (not errors).

    Mirrors pd.to_datetime(errors='coerce') (openaq_etl.py:293) via
    try_cast — the batch *and* streaming safe form of F1+P3.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("timestamp")


def drop_invalid_datetime(df: DataFrame, src: str, out: str = "datetime") -> DataFrame:
    """Parse `src` into timestamp `out`, dropping unparseable rows (P3)."""
    return (
        df.withColumn(out, parse_iso_timestamp(src))
        .filter(F.col(out).isNotNull())
    )


def time_bucket(col: Column | str, minutes: int) -> Column:
    """Fixed-width time bucketing (TimescaleDB time_bucket / date_trunc
    generalization): floor the timestamp to an N-minute boundary.

    Pure integer arithmetic on the epoch — stays in whole-stage codegen,
    and the bucket column is a shuffle/partition key that any engine
    reproduces bit-for-bit (oracle mirror: epoch // N * N).
    """
    c = F.col(col) if isinstance(col, str) else col
    secs = minutes * 60
    # TIMESTAMP_NTZ (tz-naive parquet timestamp[us]) cannot cast straight
    # to long; route through TIMESTAMP first. Session tz is pinned UTC, so
    # the epoch is identical for both types and matches the DuckDB oracle.
    epoch = c.cast("timestamp").cast("long")
    return F.timestamp_seconds(epoch - F.pmod(epoch, F.lit(secs)))


def derive_partitions(df: DataFrame, ts_col: str = "datetime") -> DataFrame:
    """Add year(int), month/day (zero-padded strings) partition columns.

    Verbatim semantics of process_openaq_raw.py:124-127: year stays int,
    month/day become lpad'ed strings ("01".."12"/"01".."31").
    """
    ts = F.col(ts_col)
    return (
        df.withColumn("year", F.year(ts))
        .withColumn("month", F.lpad(F.month(ts).cast("string"), 2, "0"))
        .withColumn("day", F.lpad(F.dayofmonth(ts).cast("string"), 2, "0"))
    )
