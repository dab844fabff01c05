"""functions/concurrency.overlap — the driver-side job-overlap helper
(guide §2.6) the report/retrain keys run their independent
driver-blocking evaluations through."""

import threading
import time

import pytest

from aproximacion_1_etl_spark.functions.concurrency import overlap


def test_overlap_slots_results_in_call_order():
    # deliberately finish out of order: the slow thunk is first
    def slow():
        time.sleep(0.2)
        return "first"

    out = overlap(slow, lambda: "second", lambda: "third")
    assert out == ["first", "second", "third"]


def test_overlap_actually_runs_concurrently():
    gate = threading.Barrier(2, timeout=10)

    # each thunk blocks until BOTH have started — sequential execution
    # would deadlock (the barrier timeout turns that into a failure)
    def t():
        gate.wait()
        return True

    assert overlap(t, t) == [True, True]


def test_overlap_awaits_siblings_and_reraises_first_failure():
    finished = []

    def ok():
        time.sleep(0.3)
        finished.append("ok")
        return 1

    def boom():
        raise RuntimeError("wave failed")

    with pytest.raises(RuntimeError, match="wave failed"):
        overlap(ok, boom)
    # the running sibling was awaited, not abandoned mid-job
    assert finished == ["ok"]


def test_overlap_single_thunk_runs_inline():
    assert overlap(lambda: 42) == [42]
