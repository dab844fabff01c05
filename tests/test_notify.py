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


def test_notify_idempotent_ledger_prevents_resend(spark, sf_dir):
    """Delivery ledger: a retried/re-run pass (the reference's DAG
    retries the whole chain) must not re-send ids a previous pass
    committed — each id is delivered exactly once across passes, and
    ids that FAILED are retried (they are not committed)."""
    from aproximacion_1_etl_spark.sources.notify import notify_idempotent

    outdir = tempfile.mkdtemp(prefix="notify_ledger_")
    ledger = tempfile.mkdtemp(prefix="notify_ledger_t_") + "/ledger"
    faildir = tempfile.mkdtemp(prefix="notify_ledger_f_")
    # ids divisible by 97 fail on the FIRST pass only (flag file keyed
    # by pass number is written by the driver between passes)
    flag = os.path.join(faildir, "pass2")

    def send_batch(rows):
        import os as _os

        second = _os.path.exists(flag)
        bad = [] if second else [
            str(r["o_orderkey"]) for r in rows if r["o_orderkey"] % 97 == 0
        ]
        with open(_os.path.join(outdir, f"{_os.getpid()}.log"), "a") as f:
            for r in rows:
                if str(r["o_orderkey"]) not in bad:
                    f.write(f"{r['o_orderkey']}\n")
        return bad

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    n_bad = o.filter(F.col("o_orderkey") % 97 == 0).count()

    failed1 = notify_idempotent(
        o, "o_orderkey", send_batch, ledger, batch_size=50, max_retries=2
    )
    assert failed1.count() == n_bad

    # pass 2 = the retried run: endpoint healthy now
    open(flag, "w").close()
    failed2 = notify_idempotent(
        o, "o_orderkey", send_batch, ledger, batch_size=50, max_retries=2
    )
    assert failed2.count() == 0

    # every id delivered exactly ONCE across both passes
    sent = []
    for path in glob.glob(os.path.join(outdir, "*.log")):
        with open(path) as f:
            sent.extend(int(x) for x in f.read().split())
    assert len(sent) == o.count()
    assert len(set(sent)) == o.count()

    # a third pass sends nothing at all
    failed3 = notify_idempotent(
        o, "o_orderkey", send_batch, ledger, batch_size=50, max_retries=2
    )
    assert failed3.count() == 0
    sent3 = []
    for path in glob.glob(os.path.join(outdir, "*.log")):
        with open(path) as f:
            sent3.extend(int(x) for x in f.read().split())
    assert len(sent3) == len(sent)


def test_notify_idempotent_corrupt_ledger_raises_not_resends(spark, sf_dir):
    """A ledger that EXISTS but cannot be read (corrupt parquet from a
    crashed append) must raise, never be treated as 'first pass': a
    silent fallback would re-send every previously committed id."""
    import pytest

    from aproximacion_1_etl_spark.sources.notify import notify_idempotent

    outdir = tempfile.mkdtemp(prefix="notify_corrupt_")
    ledger = os.path.join(tempfile.mkdtemp(prefix="notify_corrupt_t_"), "ledger")
    os.makedirs(ledger)
    with open(os.path.join(ledger, "part-00000.parquet"), "wb") as f:
        f.write(b"this is not a parquet file")

    def send_batch(rows):
        with open(os.path.join(outdir, f"{os.getpid()}.log"), "a") as f:
            for r in rows:
                f.write(f"{r['o_orderkey']}\n")
        return []

    o = load_table(spark, sf_dir, "orders").select("o_orderkey").limit(100)
    with pytest.raises(Exception):
        notify_idempotent(o, "o_orderkey", send_batch, ledger, batch_size=50)
    # nothing was sent: the error surfaced BEFORE any delivery fired
    assert glob.glob(os.path.join(outdir, "*.log")) == []
