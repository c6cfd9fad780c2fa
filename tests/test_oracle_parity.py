"""Differential tests: every registered query vs its DuckDB oracle.

This mirrors the driver's t2 correctness gate locally (sf0.001 for speed;
the driver runs sf0.01). A failure here means the driver's hash compare
would fail too.
"""

import pytest

from reddit_data_pipeline_engineering_spark import oracle as ora
from reddit_data_pipeline_engineering_spark.plans.queries import REGISTRY, queries

from .conftest import SF_SMALL

queries()  # force registration of all query modules

NAMES = sorted(REGISTRY)


@pytest.fixture(scope="module")
def duck():
    con = ora.duckdb_connection(SF_SMALL)
    yield con
    con.close()


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(name, spark, duck):
    spec = REGISTRY[name]
    if spec.oracle is None:
        df = spec.fn(spark, SF_SMALL)
        assert df.count() >= 0  # rows-only check (non-SQL-expressible op)
        return
    res = ora.compare(name, spark, SF_SMALL, spec.fn, spec.oracle, con=duck)
    assert res.ok, f"{name}: {res.detail}"
    assert res.spark_rows > 0, f"{name}: query returned no rows"
