import os
import shutil
import tempfile

import pytest


@pytest.fixture(scope="session")
def spark():
    from lucene_solr_spark.session import get_spark

    s = get_spark("tests", cpus=os.environ.get("TEST_CPUS", "4"), shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tmp_root():
    d = tempfile.mkdtemp(prefix="lss_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
