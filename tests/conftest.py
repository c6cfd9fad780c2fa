import os
import sys

import pytest

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    from reddit_data_pipeline_engineering_spark.session import get_spark

    s = get_spark(
        app_name="rdpe-tests",
        master="local[8]",
        shuffle_partitions=4,
        extra_conf={
            "spark.driver.memory": "4g",
            # Static conf: managed-table tests need a throwaway warehouse.
            "spark.sql.warehouse.dir": str(tmp_path_factory.mktemp("warehouse")),
        },
    )
    yield s
    s.stop()
