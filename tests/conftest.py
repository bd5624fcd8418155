from __future__ import annotations

import tempfile

import pytest

from bigmatch_utilities_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # fresh warehouse per run: a killed earlier JVM can orphan
    # ./spark-warehouse table locations, which a new session's catalog
    # doesn't know and then refuses to overwrite (LOCATION_ALREADY_EXISTS)
    wh = tempfile.mkdtemp(prefix="bm_warehouse_")
    s = get_spark(
        "bigmatch-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.warehouse.dir": wh},
    )
    yield s
    s.stop()
