import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aproximacion_1_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[*]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session", autouse=True)
def _reclaim_test_tempdirs():
    """Sweep temp dirs the test session created (fixture parquet,
    streaming checkpoints). Only dirs that appeared AFTER session start
    and match our own prefixes are removed, so concurrent processes'
    dirs are untouched."""
    import glob
    import shutil
    import tempfile

    prefixes = ("graft_", "ckpt_", "inc_", "cdc_snap_", "binsrc_")
    tmp = tempfile.gettempdir()
    before = {
        p for pre in prefixes for p in glob.glob(os.path.join(tmp, pre + "*"))
    }
    yield
    for pre in prefixes:
        for p in glob.glob(os.path.join(tmp, pre + "*")):
            if p not in before:
                shutil.rmtree(p, ignore_errors=True)
