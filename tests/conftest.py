import shutil
import tempfile

import pytest

from kmcp_spark.config import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="kmcp_spark_tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture()
def tmp_out():
    d = tempfile.mkdtemp(prefix="kmcp_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
