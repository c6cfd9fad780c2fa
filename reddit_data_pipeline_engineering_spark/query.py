"""SQL query surface (replaces the Athena submit/poll/fetch client,
reference S10).

The reference's Athena path (``utils/athena_utils.py:38-175``) is
``start_query_execution`` -> poll up to 30x -> ``get_query_results`` with
every cell stringly-typed ``VarCharValue`` -> pandas. ``spark.sql`` returns
a typed DataFrame synchronously; this module keeps the same convenience
surface so reference users can switch call-for-call.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def execute_query(spark: SparkSession, sql: str) -> DataFrame:
    """Typed, synchronous query execution (athena_utils.execute_query +
    wait_for_query_completion + get_query_results in one call)."""
    return spark.sql(sql)


def query_to_dataframe(spark: SparkSession, sql: str):
    """Query -> pandas DataFrame (athena_utils.query_to_dataframe:148-175),
    with real types instead of VarCharValue strings.

    Driver-side materialization — only for dashboard-sized results; large
    results should stay distributed (use execute_query)."""
    return spark.sql(sql).toPandas()


def validate_connection(spark: SparkSession) -> bool:
    """Liveness check (athena_utils.py:235-258): can we run SELECT 1."""
    try:
        return spark.sql("SELECT 1 AS ok").collect()[0][0] == 1
    except Exception:
        return False
