"""Local DuckDB-oracle differential harness.

Mirrors the driver's correctness gate (BASELINE.json t2): run each
registered query through Spark AND its oracle SQL through DuckDB on the
same parquet tables, then compare row count, column names, and values
(order-insensitive, column-name-sorted) — the same canonicalization the
driver applies before hashing. Used by tests/test_oracle_parity.py so
mismatches are caught before the driver ever sees them.
"""

from __future__ import annotations

import datetime as _dt
import math
from dataclasses import dataclass

import duckdb
from pyspark.sql import SparkSession

from reddit_data_pipeline_engineering_spark.sources.tables import TABLE_NAMES


def duckdb_connection(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir.rstrip('/')}/{t}.parquet')"
        )
    return con


def _canon_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None)
    return v


def _canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return out


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str
    spark_rows: int = 0
    oracle_rows: int = 0


def compare(
    name: str,
    spark: SparkSession,
    sf_dir: str,
    fn,
    oracle: str,
    con=None,
) -> CompareResult:
    sdf = fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    close = con is None
    con = con or duckdb_connection(sf_dir)
    try:
        cur = con.execute(oracle)
        ocols = [d[0] for d in cur.description]
        orows = cur.fetchall()
    finally:
        if close:
            con.close()

    if sorted(scols) != sorted(ocols):
        return CompareResult(
            name, False,
            f"column mismatch: spark={sorted(scols)} oracle={sorted(ocols)}",
            len(srows), len(orows),
        )
    if len(srows) != len(orows):
        return CompareResult(
            name, False,
            f"row count mismatch: spark={len(srows)} oracle={len(orows)}",
            len(srows), len(orows),
        )
    cs = _canon_rows(scols, srows)
    co = _canon_rows(ocols, orows)
    for i, (a, b) in enumerate(zip(cs, co)):
        if a != b:
            # Pinpoint the first differing cell for debuggability.
            for j, (x, y) in enumerate(zip(a, b)):
                if x != y:
                    colname = sorted(scols)[j]
                    diff = ""
                    if isinstance(x, float) and isinstance(y, float):
                        diff = f" (abs diff {abs(x - y):.3e})"
                    return CompareResult(
                        name, False,
                        f"value mismatch at sorted-row {i} col {colname}: "
                        f"spark={x!r} oracle={y!r}{diff}",
                        len(srows), len(orows),
                    )
            return CompareResult(
                name, False, f"row mismatch at sorted-row {i}: {a!r} != {b!r}",
                len(srows), len(orows),
            )
    return CompareResult(name, True, "ok", len(srows), len(orows))
