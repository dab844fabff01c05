"""S10 notification sink: batched per-partition delivery with retry and
failure table (no network — file-backed fake transport)."""

import glob
import os
import tempfile

import pyspark.sql.functions as F

from aproximacion_1_etl_spark.sources.notify import notify_each_partition
from aproximacion_1_etl_spark.sources.tables import load_table


def test_notify_delivers_all_and_reports_failures(spark, sf_dir):
    outdir = tempfile.mkdtemp(prefix="notify_")

    def send_batch(rows):
        # deliver by appending to a per-pid file; permanently fail ids
        # divisible by 97 (to exercise the failure table)
        ok = [r for r in rows if r["o_orderkey"] % 97 != 0]
        with open(os.path.join(outdir, f"{os.getpid()}.log"), "a") as f:
            for r in ok:
                f.write(f"{r['o_orderkey']}\n")
        return [str(r["o_orderkey"]) for r in rows if r["o_orderkey"] % 97 == 0]

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    failed = notify_each_partition(
        o, "o_orderkey", send_batch, batch_size=50, max_retries=2
    )
    failed_rows = failed.collect()
    n_bad = o.filter(F.col("o_orderkey") % 97 == 0).count()
    assert len(failed_rows) == n_bad
    assert all(r["n_attempts"] == 2 for r in failed_rows)

    delivered = set()
    for path in glob.glob(os.path.join(outdir, "*.log")):
        with open(path) as f:
            delivered.update(int(x) for x in f.read().split())
    expected = {
        r["o_orderkey"]
        for r in o.filter(F.col("o_orderkey") % 97 != 0).collect()
    }
    assert delivered == expected


def test_notify_sends_once_even_if_result_reevaluated(spark, sf_dir):
    """The delivery pass is an eager action inside the call: evaluating
    the returned failure DataFrame again (count + collect + count) must
    NOT re-fire the transport."""
    outdir = tempfile.mkdtemp(prefix="notify_once_")

    def send_batch(rows):
        with open(os.path.join(outdir, f"{os.getpid()}.log"), "a") as f:
            for r in rows:
                f.write(f"{r['o_orderkey']}\n")
        return []

    o = load_table(spark, sf_dir, "orders").select("o_orderkey").limit(500)
    n_rows = o.count()
    failed = notify_each_partition(o, "o_orderkey", send_batch, batch_size=50)
    assert failed.count() == 0
    assert failed.collect() == []
    assert failed.count() == 0  # third action over the result

    sent = []
    for path in glob.glob(os.path.join(outdir, "*.log")):
        with open(path) as f:
            sent.extend(int(x) for x in f.read().split())
    # every row delivered exactly once despite three downstream actions
    assert len(sent) == n_rows
    assert len(set(sent)) == n_rows
