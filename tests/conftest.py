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
    """Give the test session its OWN temp root and delete it at the
    end. Every tempfile.mkdtemp in tests and in library code they call
    (fixture parquet, streaming checkpoints, roundtrip keys) lands
    under it, so cleanup is one rmtree that cannot touch another
    process's dirs — a prefix-glob sweep of the shared /tmp could
    delete a concurrently running bench/oracle process's live
    checkpoint."""
    import glob
    import shutil
    import tempfile
    import time

    # crash-robust sweep: a killed pytest run never reaches the rmtree
    # below, so reclaim STALE session roots from prior runs first. The
    # age gate reads the NEWEST mtime among the root and its direct
    # children (mkdtemp children land in the root, so a live session
    # keeps refreshing some child even when the root's own mtime is
    # pinned at session start) and requires >6h — far past any real
    # pytest run — before touching anything; the prefix is unique to
    # this fixture, so bench/oracle checkpoints are untouchable by
    # construction.
    now = time.time()
    for d in glob.glob(
        os.path.join(tempfile.gettempdir(), "graft_test_session_*")
    ):
        try:
            newest = os.path.getmtime(d)
            with os.scandir(d) as it:
                for child in it:
                    try:
                        newest = max(newest, child.stat().st_mtime)
                    except OSError:
                        pass
            if now - newest > 6 * 3600:
                shutil.rmtree(d, ignore_errors=True)
        except OSError:
            pass

    session_tmp = tempfile.mkdtemp(prefix="graft_test_session_")
    prev = tempfile.tempdir
    tempfile.tempdir = session_tmp
    yield
    tempfile.tempdir = prev
    shutil.rmtree(session_tmp, ignore_errors=True)
