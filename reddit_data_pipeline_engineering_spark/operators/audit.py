"""Data-quality audit operators.

Reference: the Glue job's critical-column presence check
(``glue_jobs/process_openaq_raw.py:213-226``, P7) and one-pass null counts
(``process_openaq_raw.py:228-231``, P6).

The reference triggers five separate full materializations for its audits
(SURVEY.md §4 anti-pattern). Here auditing is a single aggregate job — or,
via ``observe()``, zero extra jobs: metrics ride along with whatever action
runs next. That distinction is what keeps auditing viable at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def null_counts(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """One-row DataFrame of null counts per requested column (single pass)."""
    aggs = [
        F.count(F.when(F.col(c).isNull(), F.lit(1))).alias(f"{c}_nulls")
        for c in cols
    ]
    return df.agg(*aggs)


def observe_nulls(df: DataFrame, cols: Sequence[str], name: str = "audit") -> DataFrame:
    """Attach null-count metrics without an extra job (collected via listener
    or ``DataFrame.observe`` result after the next action)."""
    aggs = [
        F.count(F.when(F.col(c).isNull(), F.lit(1))).alias(f"{c}_nulls")
        for c in cols
    ]
    return df.observe(name, *aggs)


def range_violations(df: DataFrame, rules: dict[str, tuple]) -> DataFrame:
    """One-row violation counts for range rules {col: (lo, hi)} — the
    reference's data-quality invariants (F10: lat in [-90,90], lon in
    [-180,180], value >= 0 — tests/test_glue_transformation.py:45-47)
    as a single aggregate pass instead of one scan per rule.

    ``None`` bounds are open; NULLs don't count as violations (use
    null_counts for those).
    """
    aggs = []
    for c, (lo, hi) in rules.items():
        cond = F.lit(False)
        if lo is not None:
            cond = cond | (F.col(c) < F.lit(lo))
        if hi is not None:
            cond = cond | (F.col(c) > F.lit(hi))
        aggs.append(F.count(F.when(cond, F.lit(1))).alias(f"{c}_violations"))
    return df.agg(*aggs)


def assert_columns(df: DataFrame, required: Sequence[str]) -> None:
    """Fail fast if contract columns are missing (P7)."""
    missing = [c for c in required if c not in df.columns]
    if missing:
        raise ValueError(f"missing critical columns: {missing}")


def assert_schema(df: DataFrame, contract: StructType) -> None:
    """Strict name/type contract check (replaces the reference's test-only
    15-column schema assertions, test_glue_output_schema.py:44-60)."""
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    expected = {f.name: f.dataType.simpleString() for f in contract.fields}
    problems = []
    for name, dt in expected.items():
        if name not in actual:
            problems.append(f"missing column {name}:{dt}")
        elif actual[name] != dt:
            problems.append(f"type mismatch {name}: {actual[name]} != {dt}")
    extras = set(actual) - set(expected)
    if extras:
        problems.append(f"unexpected columns: {sorted(extras)}")
    if problems:
        raise ValueError("; ".join(problems))
