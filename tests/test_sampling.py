"""Deterministic sampling / splitting (functions/sampling.py).

The property that matters: sample membership depends only on the key,
never on partitioning, run order, or seed state."""

import pytest

from pyspark.sql import functions as F

from aproximacion_1_etl_spark.functions.sampling import (
    deterministic_sample,
    rate_threshold,
    split_column,
    stratified_sample,
)


def test_rate_threshold_bounds():
    assert rate_threshold(0.0) == "0000"
    assert rate_threshold(1.0) == "g"  # sorts after every hex prefix
    assert rate_threshold(0.05) == "0ccd"
    with pytest.raises(ValueError):
        rate_threshold(1.5)


def test_sample_invariant_under_partitioning(spark):
    df = spark.range(0, 5000).withColumnRenamed("id", "k")
    a = {r.k for r in deterministic_sample(df, "k", 0.1).collect()}
    b = {
        r.k
        for r in deterministic_sample(df.repartition(17, "k"), "k", 0.1).collect()
    }
    assert a == b
    # uniform hash: 10% +- a loose band
    assert 350 < len(a) < 650


def test_size_derived_threshold_shrinks_with_corpus():
    """The derived rate is min(max_rate, target/count) in exact integer
    arithmetic: capped at max_rate for small corpora, monotonically
    non-increasing in corpus size, floored at 1/65536 so a huge corpus
    still samples something."""
    from aproximacion_1_etl_spark.functions.sampling import (
        size_derived_threshold,
    )

    assert size_derived_threshold(500, 1000) == "8000"  # capped at 0.5
    assert size_derived_threshold(2000, 1000) == "8000"  # exactly 0.5
    assert size_derived_threshold(5000, 1000) == "3333"
    assert size_derived_threshold(10**9, 1000) == "0001"  # floor
    prev = None
    for n in [100, 1000, 2500, 5000, 50000, 10**6, 10**10]:
        h = size_derived_threshold(n, 1000)
        if prev is not None:
            assert h <= prev, n
        prev = h
    with pytest.raises(ValueError):
        size_derived_threshold(0, 1000)


def test_sample_to_size_matches_python_twin_and_shrinks(spark):
    """deterministic_sample_to_size's in-engine threshold equals the
    Python twin's on every corpus size, membership is exactly the
    md5-prefix rule, and the kept count tracks the TARGET (not the
    corpus) as the corpus grows — the property that keeps a pair join
    built on the sample O(target²) at any scale."""
    import hashlib

    from aproximacion_1_etl_spark.functions.sampling import (
        deterministic_sample_to_size,
        size_derived_threshold,
    )

    target = 1000
    for n in (800, 4000, 20000):
        df = spark.range(0, n).withColumnRenamed("id", "k")
        kept = {
            r.k for r in deterministic_sample_to_size(
                df, "k", target
            ).collect()
        }
        thr = size_derived_threshold(n, target)
        expect = {
            k for k in range(n)
            if hashlib.md5(str(k).encode()).hexdigest()[:4] < thr
        }
        assert kept == expect, n
    # corpus grew 25x; the sample stayed pinned near the target
    assert 400 <= len(kept) <= 1600


def test_split_exhaustive_and_stable(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    labeled = df.select(
        "k", split_column(F.col("k"), {"train": 0.8, "val": 0.1, "test": 0.1})
    )
    counts = {r.split: r.n for r in labeled.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000  # every row gets exactly one split
    assert counts["train"] > counts["val"]
    # train members never migrate on re-run
    again = {
        r.k
        for r in labeled.filter(F.col("split") == "train").collect()
    }
    assert again == {
        r.k
        for r in df.select(
            "k", split_column(F.col("k"), {"train": 0.8, "val": 0.1, "test": 0.1})
        ).filter(F.col("split") == "train").collect()
    }
    with pytest.raises(ValueError):
        split_column(F.col("k"), {"a": 0.5, "b": 0.1})


def test_sample_is_narrow(spark):
    """Sampling must add NO shuffle — at 100 TB it has to stay a pure
    scan+filter that composes with pruning."""
    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    plan = deterministic_sample(df, "k", 0.1)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_stratified_rates(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = stratified_sample(docs, "doc_id", "lang", {"en": 1.0, "es": 0.0})
    langs = {r.lang for r in out.select("lang").distinct().collect()}
    assert langs <= {"en"}  # es rate 0 and unlisted langs dropped
    n_en = docs.filter(F.col("lang") == "en").count()
    assert out.count() == n_en  # rate 1.0 keeps every row


def test_weighted_sample_biases_toward_heavy_rows(spark):
    """A-ES: with weights heavily skewed to one half of the keys, the
    top-k should be dominated by heavy rows; sample is deterministic
    across re-runs."""
    from aproximacion_1_etl_spark.functions.sampling import (
        weighted_sample_topk,
    )

    df = spark.range(0, 400).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 200, F.lit(1000.0)).otherwise(F.lit(1.0)).alias("w"),
    )
    picked = weighted_sample_topk(df, "k", "w", k=50)
    rows = picked.collect()
    assert len(rows) == 50
    heavy = sum(1 for r in rows if r.k < 200)
    assert heavy >= 45  # 1000x weight dominates the draw
    again = {r.k for r in weighted_sample_topk(df, "k", "w", k=50).collect()}
    assert again == {r.k for r in rows}


def test_global_index_matches_global_sort_and_packs_batches(spark):
    from aproximacion_1_etl_spark.functions.sampling import (
        deterministic_global_index,
        pack_training_batches,
    )
    import hashlib

    n = 100
    df = spark.createDataFrame([(i,) for i in range(n)], "k BIGINT")
    rows = deterministic_global_index(df, "k").collect()
    got = {r["k"]: r["global_idx"] for r in rows}
    # reference: single global sort by (md5(k), k)
    order = sorted(range(n), key=lambda k: (hashlib.md5(str(k).encode()).hexdigest(), k))
    want = {k: i for i, k in enumerate(order)}
    assert got == want
    packed = pack_training_batches(df, "k", batch_size=8).collect()
    sizes: dict[int, int] = {}
    for r in packed:
        sizes[r["batch_id"]] = sizes.get(r["batch_id"], 0) + 1
        assert r["position"] == r["global_idx"] % 8
        assert r["batch_id"] == r["global_idx"] // 8
    # every batch full except the last (100 = 12*8 + 4)
    assert sorted(sizes) == list(range(13))
    assert all(sizes[b] == 8 for b in range(12)) and sizes[12] == 4


def test_length_bucketed_batches_are_band_homogeneous(spark):
    from aproximacion_1_etl_spark.functions.sampling import (
        length_bucketed_batches,
    )

    rows = [(i, (i * 37) % 300) for i in range(120)]
    df = spark.createDataFrame(rows, "k BIGINT, n_tok BIGINT")
    out = length_bucketed_batches(
        df, "k", "n_tok", batch_size=8, bucket_width=64
    ).collect()
    assert len(out) == 120
    by_batch: dict[tuple, list] = {}
    for r in out:
        assert r["len_bucket"] == r["n_tok"] // 64
        by_batch.setdefault((r["len_bucket"], r["batch_id"]), []).append(r)
    for (band, _), members in by_batch.items():
        # every member of a batch sits in the same length band
        assert all(m["n_tok"] // 64 == band for m in members)
        assert sorted(m["position"] for m in members) == list(
            range(len(members))
        )
        assert len(members) <= 8
    # per band: every batch full except at most the last
    for band in {r["len_bucket"] for r in out}:
        sizes = [
            len(v) for (b, _), v in sorted(by_batch.items()) if b == band
        ]
        assert all(s == 8 for s in sizes[:-1])


def test_temperature_mix_upweights_low_resource(spark, sf_dir):
    from aproximacion_1_etl_spark.queries import (
        q_domain_mix_resample,
        q_temperature_mix_resample,
    )

    temp = {
        r["lang"]: r for r in q_temperature_mix_resample(spark, sf_dir).collect()
    }
    unif = {
        r["lang"]: r for r in q_domain_mix_resample(spark, sf_dir).collect()
    }
    assert set(temp) == set(unif)
    big = max(temp, key=lambda l: temp[l]["n_before"])
    small = min(temp, key=lambda l: temp[l]["n_before"])
    if temp[big]["n_before"] > temp[small]["n_before"]:
        # alpha=0.5 keeps MORE of the dominant language than uniform
        # flattening does (it interpolates between natural and uniform)
        assert temp[big]["rate"] >= unif[big]["rate"]
        # and still downweights it relative to its natural share
        assert temp[big]["rate"] < 1.0
        assert temp[small]["rate"] >= temp[big]["rate"]


def test_sample_to_size_full_rate_keeps_everything():
    """max_rate=1.0 on a corpus smaller than the target must keep 100%
    of rows: the threshold is 'g' (sorts after every hex prefix), not
    the 5-char '10000' that would silently keep ~6%."""
    from aproximacion_1_etl_spark.functions.sampling import (
        size_derived_threshold,
    )

    assert size_derived_threshold(100, 1000, max_rate=1.0) == "g"
    assert size_derived_threshold(2000, 1000, max_rate=1.0) == "8000"


def test_sample_to_size_engine_full_rate(spark):
    from aproximacion_1_etl_spark.functions.sampling import (
        deterministic_sample_to_size,
    )

    df = spark.range(0, 300).withColumnRenamed("id", "k")
    kept = deterministic_sample_to_size(df, "k", 1000, max_rate=1.0)
    assert kept.count() == 300


def test_fold_weighted_sample_equals_rebuild(spark):
    """The maintained A-ES sample: top-k(store ∪ scored(batch)) ==
    one-shot top-k over the full relation — including a batch row
    displacing a stored row (higher weight -> higher score odds), and
    per-stratum independence."""
    import pyspark.sql.functions as F

    from aproximacion_1_etl_spark.functions.sampling import (
        fold_weighted_sample,
        weighted_sample_topk,
    )

    rows = [
        ("a", i, (i * 37) % 90 + 10) for i in range(40)
    ] + [("b", 100 + i, (i * 53) % 90 + 10) for i in range(40)]
    df = spark.createDataFrame(rows, "lang STRING, doc_id BIGINT, w BIGINT")
    old = df.filter(F.col("doc_id") % 4 != 0)
    batch = df.filter(F.col("doc_id") % 4 == 0)

    store = weighted_sample_topk(
        old, key_col="doc_id", weight_col="w", k=5, strata_col="lang"
    ).localCheckpoint(eager=True)
    got = {
        (r.lang, r.doc_id): r.sample_score
        for r in fold_weighted_sample(
            store, batch, key_col="doc_id", weight_col="w", k=5,
            strata_col="lang",
        ).collect()
    }
    want = {
        (r.lang, r.doc_id): r.sample_score
        for r in weighted_sample_topk(
            df, key_col="doc_id", weight_col="w", k=5, strata_col="lang"
        ).collect()
    }
    assert got == want
    # the fold genuinely displaced at least one stored row
    stored = {(r.lang, r.doc_id) for r in store.collect()}
    assert any(key not in stored for key in got)


def test_fold_weighted_sample_redelivered_batch_is_noop(spark):
    """r11 fold audit: without the guard, a re-delivered batch row
    whose key already sits in the sample enters the union twice with
    the identical score and row_number keeps BOTH copies inside the
    top-k — a duplicated member evicting a legitimate k-th one. The
    guard makes fold(fold(s, B), B) == fold(s, B) with no duplicate
    keys; the unguarded form still exhibits the duplication (pinning
    why the guard exists)."""
    import pyspark.sql.functions as F

    from aproximacion_1_etl_spark.functions.sampling import (
        fold_weighted_sample,
        weighted_sample_topk,
    )

    rows = [("a", i, (i * 37) % 90 + 10) for i in range(20)]
    df = spark.createDataFrame(rows, "lang STRING, doc_id BIGINT, w BIGINT")
    old = df.filter(F.col("doc_id") % 4 != 0)
    batch = df.filter(F.col("doc_id") % 4 == 0)
    store = weighted_sample_topk(
        old, key_col="doc_id", weight_col="w", k=5, strata_col="lang"
    ).localCheckpoint(eager=True)
    once = fold_weighted_sample(
        store, batch, key_col="doc_id", weight_col="w", k=5,
        strata_col="lang",
    ).localCheckpoint(eager=True)
    snap = sorted((r.lang, r.doc_id, r.sample_score) for r in once.collect())
    twice = fold_weighted_sample(
        once, batch, key_col="doc_id", weight_col="w", k=5,
        strata_col="lang",
    )
    got = sorted((r.lang, r.doc_id, r.sample_score) for r in twice.collect())
    assert got == snap
    assert len({(la, d) for la, d, _ in got}) == len(got)  # unique keys
    # unguarded: the duplicate wave really does corrupt the sample
    raw = fold_weighted_sample(
        once, batch, key_col="doc_id", weight_col="w", k=5,
        strata_col="lang", guard_redelivery=False,
    ).collect()
    keys = [(r.lang, r.doc_id) for r in raw]
    assert len(set(keys)) < len(keys)  # duplicated member, by contract


def test_fold_weighted_sample_within_batch_duplicates(spark):
    """ADVICE r11 #3: a batch that ITSELF contains duplicate key rows
    (two deliveries compacted into one trigger) passes a store-only
    anti-join — the guard now dropDuplicates the batch first, so
    fold(store, B ∪ B) == fold(store, B) with unique sample keys."""
    import pyspark.sql.functions as F

    from aproximacion_1_etl_spark.functions.sampling import (
        fold_weighted_sample,
        weighted_sample_topk,
    )

    rows = [("a", i, (i * 37) % 90 + 10) for i in range(20)]
    df = spark.createDataFrame(rows, "lang STRING, doc_id BIGINT, w BIGINT")
    old = df.filter(F.col("doc_id") % 4 != 0)
    batch = df.filter(F.col("doc_id") % 4 == 0)
    store = weighted_sample_topk(
        old, key_col="doc_id", weight_col="w", k=5, strata_col="lang"
    ).localCheckpoint(eager=True)
    clean = sorted(
        (r.lang, r.doc_id, r.sample_score)
        for r in fold_weighted_sample(
            store, batch, key_col="doc_id", weight_col="w", k=5,
            strata_col="lang",
        ).collect()
    )
    dup = sorted(
        (r.lang, r.doc_id, r.sample_score)
        for r in fold_weighted_sample(
            store, batch.unionByName(batch), key_col="doc_id",
            weight_col="w", k=5, strata_col="lang",
        ).collect()
    )
    assert dup == clean
    assert len({(la, d) for la, d, _ in dup}) == len(dup)


def test_forget_weighted_sample_equals_rebuild(spark):
    """r13 RTBF edge: evicting a delete wave from the top-(k+reserve)
    store and reading the visible top-k equals a from-scratch
    weighted sample over the post-delete corpus (score purity makes
    the survivors exactly the post-delete corpus's best rows)."""
    import pyspark.sql.functions as F

    from aproximacion_1_etl_spark.functions.sampling import (
        _topk_by_score,
        forget_weighted_sample,
        weighted_sample_topk,
    )

    rows = [
        ("a", i, (i * 37) % 90 + 10) for i in range(60)
    ] + [("b", 100 + i, (i * 53) % 90 + 10) for i in range(60)]
    df = spark.createDataFrame(rows, "lang STRING, doc_id BIGINT, w BIGINT")
    k, reserve = 5, 4
    store = weighted_sample_topk(
        df, key_col="doc_id", weight_col="w", k=k + reserve,
        strata_col="lang",
    ).localCheckpoint(eager=True)
    wave = df.filter(F.col("doc_id") % 7 == 0).select("doc_id")
    shrunk = forget_weighted_sample(
        store, wave, key_col="doc_id", k=k, reserve=reserve,
        strata_col="lang",
    )
    got = {
        (r.lang, r.doc_id): r.sample_score
        for r in _topk_by_score(shrunk, "doc_id", k, "lang").collect()
    }
    want = {
        (r.lang, r.doc_id): r.sample_score
        for r in weighted_sample_topk(
            df.filter(F.col("doc_id") % 7 != 0),
            key_col="doc_id", weight_col="w", k=k, strata_col="lang",
        ).collect()
    }
    assert got == want
    # the wave really evicted at least one stored row
    stored = {(r.lang, r.doc_id) for r in store.collect()}
    evicted = stored - {
        (r.lang, r.doc_id) for r in shrunk.collect()
    }
    assert evicted
    # re-delivered wave: evicting already-evicted keys is a no-op
    again = forget_weighted_sample(
        shrunk.localCheckpoint(eager=True), wave, key_col="doc_id",
        k=k, reserve=reserve, strata_col="lang",
    )
    assert sorted(
        (r.lang, r.doc_id) for r in again.collect()
    ) == sorted((r.lang, r.doc_id) for r in shrunk.collect())


def test_forget_weighted_sample_reserve_exhaustion_raises(spark):
    """r13: a stratum that stored the FULL k+reserve rows (corpus may
    extend beyond the store) and lost more than the reserve cannot
    back-fill the visible top-k — the forget must raise in-plan, not
    silently publish an under-filled (or rebuild-mismatched)
    sample."""
    import pytest
    from pyspark.errors import PySparkException
    from pyspark.sql import functions as F

    from aproximacion_1_etl_spark.functions.sampling import (
        forget_weighted_sample,
        weighted_sample_topk,
    )

    rows = [("a", i, (i * 37) % 90 + 10) for i in range(40)]
    df = spark.createDataFrame(rows, "lang STRING, doc_id BIGINT, w BIGINT")
    k, reserve = 3, 2
    store = weighted_sample_topk(
        df, key_col="doc_id", weight_col="w", k=k + reserve,
        strata_col="lang",
    ).localCheckpoint(eager=True)
    assert store.count() == k + reserve  # full reserve: 40 > k+reserve
    # delete reserve+1 of the stored keys -> fewer than k survive
    doomed = store.limit(reserve + 1).select("doc_id")
    bad = forget_weighted_sample(
        store, doomed, key_col="doc_id", k=k, reserve=reserve,
        strata_col="lang",
    )
    with pytest.raises(PySparkException, match="reserve exhausted"):
        bad.collect()
    # deleting exactly `reserve` stored keys still works (boundary)
    ok = forget_weighted_sample(
        store, store.limit(reserve).select("doc_id"),
        key_col="doc_id", k=k, reserve=reserve, strata_col="lang",
    )
    assert ok.count() == k


def test_forget_weighted_sample_whole_stratum_never_raises(spark):
    """r13: a stratum stored SHORT of k+reserve holds its ENTIRE
    corpus stratum — eviction there is complete truth and must not
    raise however many rows it loses (forget == rebuild even when
    fewer than k survive)."""
    from pyspark.sql import functions as F

    from aproximacion_1_etl_spark.functions.sampling import (
        _topk_by_score,
        forget_weighted_sample,
        weighted_sample_topk,
    )

    # stratum 'tiny' has only 4 corpus rows < k+reserve = 5
    rows = [("tiny", i, 10 + i) for i in range(4)] + [
        ("big", 100 + i, (i * 31) % 80 + 10) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "lang STRING, doc_id BIGINT, w BIGINT")
    k, reserve = 3, 2
    store = weighted_sample_topk(
        df, key_col="doc_id", weight_col="w", k=k + reserve,
        strata_col="lang",
    ).localCheckpoint(eager=True)
    # delete 3 of tiny's 4 rows -> 1 survivor < k, but no raise
    wave = df.filter(
        (F.col("lang") == "tiny") & (F.col("doc_id") < 3)
    ).select("doc_id")
    shrunk = forget_weighted_sample(
        store, wave, key_col="doc_id", k=k, reserve=reserve,
        strata_col="lang",
    )
    got = {
        (r.lang, r.doc_id)
        for r in _topk_by_score(shrunk, "doc_id", k, "lang").collect()
    }
    want = {
        (r.lang, r.doc_id)
        for r in weighted_sample_topk(
            df.join(wave, "doc_id", "left_anti"),
            key_col="doc_id", weight_col="w", k=k, strata_col="lang",
        ).collect()
    }
    assert got == want
    assert sum(1 for la, _ in got if la == "tiny") == 1


def test_weighted_sample_stream_replay_semantics(spark, tmp_path):
    """r13: the batch-versioned commit protocol's REPLAY semantics,
    driven end-to-end with the public helpers the streaming twin
    uses — fold wave 1, commit, fold wave 2, commit, then REPLAY
    wave 2 exactly as a crashed-after-marker trigger would (skip on
    committed batch_id): the store must be byte-stable and equal the
    one-shot sample over both waves."""
    import os

    import pyspark.sql.functions as F

    from aproximacion_1_etl_spark.functions.sampling import (
        fold_weighted_sample,
        weighted_sample_topk,
    )
    from aproximacion_1_etl_spark.queries.streaming import (
        _committed_batch_ids,
        _mark_batch_committed,
    )

    base = str(tmp_path)
    rows = [("a", i, (i * 37) % 90 + 10) for i in range(40)]
    df = spark.createDataFrame(rows, "lang STRING, doc_id BIGINT, w BIGINT")
    waves = {0: df.filter(F.col("doc_id") % 2 == 0),
             1: df.filter(F.col("doc_id") % 2 == 1)}

    def handle(batch_id):
        committed = _committed_batch_ids(base)
        if batch_id in committed:
            return  # replay of a committed trigger
        if committed:
            store = spark.read.parquet(
                os.path.join(base, f"store_b{committed[-1]}")
            )
        else:
            store = spark.createDataFrame(
                [], "lang STRING, doc_id BIGINT, w BIGINT, "
                "sample_score DOUBLE"
            )
        folded = fold_weighted_sample(
            store, waves[batch_id], key_col="doc_id", weight_col="w",
            k=5, strata_col="lang",
        )
        folded.write.mode("overwrite").parquet(
            os.path.join(base, f"store_b{batch_id}")
        )
        _mark_batch_committed(base, batch_id)

    handle(0)
    handle(1)
    snap = sorted(
        map(tuple, spark.read.parquet(
            os.path.join(base, "store_b1")
        ).collect())
    )
    handle(1)  # replayed committed trigger: pure no-op
    again = sorted(
        map(tuple, spark.read.parquet(
            os.path.join(base, "store_b1")
        ).collect())
    )
    assert again == snap
    want = sorted(
        map(tuple, weighted_sample_topk(
            df, key_col="doc_id", weight_col="w", k=5, strata_col="lang"
        ).collect())
    )
    assert snap == want
