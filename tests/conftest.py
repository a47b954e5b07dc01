from __future__ import annotations

import pytest

from parquet_combiner_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pcs-tests", shuffle_partitions=8)
    yield s


def make_data_a(spark, rows):
    """rows: (loc_oid, camera_oid, detection_oid, item_name, ts)."""
    from parquet_combiner_spark.schemas import DATA_A_SCHEMA

    return spark.createDataFrame(rows, DATA_A_SCHEMA)


def make_data_b(spark, rows):
    """rows: (loc_oid, location_name)."""
    from parquet_combiner_spark.schemas import DATA_B_SCHEMA

    return spark.createDataFrame(rows, DATA_B_SCHEMA)
