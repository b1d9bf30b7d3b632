from __future__ import annotations

import sys
import tempfile

import pytest

sys.path.insert(0, "/root/repo")

SF_SMOKE = "/root/testdata/sf0.001"
SF_SMALL = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from stockify_spark.session import get_spark

    # warehouse dir is a static conf — point it at a tmp dir at session
    # creation so bucketed-table tests don't write into the repo
    wh = tempfile.mkdtemp(prefix="stockify_wh_")
    s = get_spark(
        "stockify-tests",
        cpus=8,
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": wh},
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE
