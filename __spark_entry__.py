"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``reddit_data_pipeline_engineering_spark``
(see plans/queries.py for the registry; every entry cites the
reference operator it rebuilds).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from reddit_data_pipeline_engineering_spark.plans import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (the full marts kernel) on /root/testdata/sf0.001."""
    return _q.REGISTRY["marts_kernel"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ LLM ops)."""
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for every query (all are SQL-expressible so far)."""
    return _q.oracle_sql()
