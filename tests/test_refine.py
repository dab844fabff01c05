"""Refinement-chain tests (M1-M14) on hand-built micro-fixtures where
the expected output is computable by eye — dedup tie-breaks, merge
update-wins semantics, n-th/last event selection."""

import pyspark.sql.functions as F

from aproximacion_1_etl_spark.operators.refine import (
    dedup_latest,
    latest_child_attrs,
    merge_upsert,
    nth_event,
    visit_order,
)


def test_dedup_latest_keeps_newest_with_tiebreak(spark):
    df = spark.createDataFrame(
        [("k1", "2024-01-01", 1), ("k1", "2024-01-02", 2),
         ("k1", "2024-01-02", 3), ("k2", "2023-12-31", 4)],
        ["k", "d", "id"],
    )
    out = dedup_latest(df, ["k"], [F.col("d").desc(), F.col("id").desc()])
    got = {r["k"]: r["id"] for r in out.collect()}
    assert got == {"k1": 3, "k2": 4}


def test_merge_upsert_update_wins_insert_survives(spark):
    master = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], ["k", "s", "v"]
    )
    updates = spark.createDataFrame(
        [(2, "B", None), (3, "c", 30.0)], "k INT, s STRING, v DOUBLE"
    )
    out = {r["k"]: (r["s"], r["v"]) for r in
           merge_upsert(master, updates, ["k"]).collect()}
    assert out[1] == ("a", 10.0)          # untouched master row
    assert out[2] == ("B", 20.0)          # update wins; null falls back
    assert out[3] == ("c", 30.0)          # pure insert


def test_merge_upsert_schema_mismatch_raises(spark):
    master = spark.createDataFrame([(1, "a")], ["k", "s"])
    updates = spark.createDataFrame([(1,)], ["k"])
    try:
        merge_upsert(master, updates, ["k"])
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "missing columns" in str(e)


def test_nth_and_last_event(spark):
    df = spark.createDataFrame(
        [("u", "2024-01-01", 1, "a"), ("u", "2024-01-02", 2, "b"),
         ("u", "2024-01-03", 3, "c"), ("v", "2024-01-01", 4, "only")],
        ["k", "ts", "id", "tag"],
    )
    second = {r["k"]: r["tag"] for r in
              nth_event(df, ["k"], "ts", "id", n=2).collect()}
    assert second == {"u": "b"}  # v has no 2nd event
    last = {r["k"]: r["tag"] for r in
            nth_event(df, ["k"], "ts", "id", n=0).collect()}
    assert last == {"u": "c", "v": "only"}


def test_latest_child_attrs_max_by(spark):
    df = spark.createDataFrame(
        [("u", "2024-01-01", 1, "old"), ("u", "2024-01-02", 2, "new"),
         ("u", "2024-01-02", 1, "tie-lower-id")],
        ["k", "ts", "id", "tag"],
    )
    out = latest_child_attrs(df, ["k"], ["tag"], "ts", "id").collect()[0]
    assert out["latest_tag"] == "new"


def test_visit_order_ranks(spark):
    df = spark.createDataFrame(
        [("u", "2024-01-02", 2), ("u", "2024-01-01", 1)], ["k", "ts", "id"]
    )
    ranks = {r["id"]: r["visit_rank"] for r in
             visit_order(df, ["k"], "ts", "id").collect()}
    assert ranks == {1: 1, 2: 2}


def test_merge_upsert_evolve_widens_schema(spark):
    from aproximacion_1_etl_spark.operators.refine import merge_upsert_evolve

    master = spark.createDataFrame(
        [(1, "a"), (2, "b")], "k INT, s STRING"
    )
    updates = spark.createDataFrame(
        [(2, "B", True), (3, "c", False)], "k INT, s STRING, flag BOOLEAN"
    )
    out = merge_upsert_evolve(master, updates, ["k"])
    assert set(out.columns) == {"k", "s", "flag"}
    got = {r["k"]: (r["s"], r["flag"]) for r in out.collect()}
    assert got[1] == ("a", None)   # master-only row: new column is NULL
    assert got[2] == ("B", True)   # updated row carries the new column
    assert got[3] == ("c", False)  # inserted row


def test_merge_partial_rollup_equals_full_recompute(spark):
    from aproximacion_1_etl_spark.operators.refine import merge_partial_rollup

    rows = [(k, float(v)) for k in ("a", "b", "c") for v in range(1, 7)]
    df = spark.createDataFrame(rows, "k STRING, v DOUBLE")

    def partial(d):
        return d.groupBy("k").agg(
            F.count("*").alias("n"), F.sum("v").alias("sv")
        )

    base = partial(df.filter(F.col("v") <= 3))
    delta = partial(df.filter(F.col("v") > 3))
    merged = merge_partial_rollup(base, delta, ["k"], ["n", "sv"])
    full = partial(df)
    got = {r["k"]: (r["n"], r["sv"]) for r in merged.collect()}
    want = {r["k"]: (r["n"], r["sv"]) for r in full.collect()}
    assert got == want


def test_merge_partial_rollup_retractions_equal_recompute(spark):
    """Z-set retractions: deletes arrive as NEGATED partials; with
    count_col given, a fully-retracted key ('c') disappears from the
    maintained rollup exactly as it does from a full recompute, and a
    partially-retracted key ('a') nets out to the recomputed values."""
    from aproximacion_1_etl_spark.operators.refine import (
        merge_partial_rollup,
    )

    rows = [(k, float(v)) for k in ("a", "b", "c") for v in range(1, 4)]
    df = spark.createDataFrame(rows, "k STRING, v DOUBLE")

    def partial(d):
        return d.groupBy("k").agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("v").alias("sv"),
        )

    base = partial(df)
    # delete a's v=1 row and ALL of c's rows
    deleted = df.filter(
        ((F.col("k") == "a") & (F.col("v") == 1.0)) | (F.col("k") == "c")
    )
    retraction = partial(deleted).select(
        "k", (-F.col("n")).alias("n"), (-F.col("sv")).alias("sv")
    )
    merged = merge_partial_rollup(
        base, retraction, ["k"], ["n", "sv"], count_col="n"
    )
    survivors = df.join(deleted, ["k", "v"], "left_anti")
    want = {r["k"]: (r["n"], r["sv"]) for r in partial(survivors).collect()}
    got = {r["k"]: (r["n"], r["sv"]) for r in merged.collect()}
    assert got == want
    assert "c" not in got

    try:
        merge_partial_rollup(base, retraction, ["k"], ["n", "sv"],
                             count_col="missing")
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "count_col" in str(e)


def test_maintain_join_view_delta_rules(spark):
    """All three IVM delta rules on a micro-fixture: fact delete, fact
    update of an existing key, fact insert, dim attribute propagation
    to untouched view rows, a dim change for a key with no facts
    (no-op), and an inserted fact whose join key has no dim row
    (dropped — inner-join semantics)."""
    from aproximacion_1_etl_spark.operators.refine import (
        maintain_join_view,
    )

    # view = fact (f, d, v) JOIN dim (d, attr)
    view = spark.createDataFrame(
        [(1, 10, 1.0, "a"), (2, 10, 2.0, "a"), (3, 20, 3.0, "b")],
        ["f", "d", "v", "attr"],
    )
    dim_current = spark.createDataFrame(
        [(10, "A"), (20, "b"), (40, "zz")], ["d", "attr"]
    )
    dim_changes = spark.createDataFrame(
        [(10, "A"), (40, "zz")], ["d", "attr"]  # 40: no facts -> no-op
    )
    fact_changes = spark.createDataFrame(
        [
            (1, 10, 1.5, "U"),   # update existing key
            (3, 20, 3.0, "D"),   # delete
            (4, 20, 4.0, "U"),   # insert
            (5, 30, 5.0, "U"),   # insert, no dim row -> dropped
            (9, 10, 9.0, "D"),   # delete of unknown key -> no-op
        ],
        ["f", "d", "v", "op"],
    )
    out = maintain_join_view(
        view, fact_changes, dim_current, dim_changes, "f", "d"
    )
    got = {r["f"]: (r["d"], r["v"], r["attr"]) for r in out.collect()}
    assert got == {
        1: (10, 1.5, "A"),  # refreshed against new dim
        2: (10, 2.0, "A"),  # untouched fact, dim attr propagated
        4: (20, 4.0, "b"),  # insert
    }


def test_maintain_join_view_dim_deletes(spark):
    """Dim-side deletes (dim_op_col): deleting dim key 10 drops every
    surviving view row that carries it (inner-join semantics), while a
    dim upsert in the same batch still propagates, and a refreshed
    fact pointing at the deleted key vanishes because dim_current no
    longer has it."""
    from aproximacion_1_etl_spark.operators.refine import (
        maintain_join_view,
    )

    view = spark.createDataFrame(
        [(1, 10, 1.0, "a"), (2, 20, 2.0, "b"), (3, 30, 3.0, "c")],
        ["f", "d", "v", "attr"],
    )
    # dim 10 deleted; dim 20 renamed
    dim_current = spark.createDataFrame(
        [(20, "B"), (30, "c")], ["d", "attr"]
    )
    dim_changes = spark.createDataFrame(
        [(10, None, "D"), (20, "B", "U")],
        "d BIGINT, attr STRING, op STRING",
    )
    fact_changes = spark.createDataFrame(
        [(4, 10, 4.0, "U")], ["f", "d", "v", "op"]  # points at deleted dim
    )
    out = maintain_join_view(
        view, fact_changes, dim_current, dim_changes, "f", "d",
        dim_op_col="op",
    )
    got = {r["f"]: (r["d"], r["v"], r["attr"]) for r in out.collect()}
    assert got == {
        2: (20, 2.0, "B"),  # upsert propagated
        3: (30, 3.0, "c"),  # untouched
    }  # row 1 dropped with dim 10; fact 4 never joins


def test_maintain_join_view_full_orphan_lifecycle(spark):
    """Out-of-order CDC across three batches: an early-arriving fact
    (dim key not yet present) parks as an orphan and is PROMOTED when
    its dim arrives; a dim delete DEMOTES its view rows to orphans and
    a re-insert restores them. After every batch the view equals the
    from-scratch inner join of the live facts with the current dim."""
    from aproximacion_1_etl_spark.operators.refine import (
        maintain_join_view_full,
    )

    def snap(view, orph):
        v = {r["f"]: (r["d"], r["v"], r["attr"]) for r in view.collect()}
        o = {r["f"]: (r["d"], r["v"]) for r in orph.collect()}
        return v, o

    view = spark.createDataFrame(
        [(1, 10, 1.0, "a")], ["f", "d", "v", "attr"]
    )
    orph = spark.createDataFrame([], "f BIGINT, d BIGINT, v DOUBLE")
    dim = spark.createDataFrame([(10, "a")], ["d", "attr"])
    no_dim_change = spark.createDataFrame([], "d BIGINT, attr STRING, dop STRING")

    # batch 1: fact 5 arrives pointing at dim 30 (not yet present)
    fc1 = spark.createDataFrame([(5, 30, 5.0, "U")], ["f", "d", "v", "op"])
    view, orph = maintain_join_view_full(
        view, orph, fc1, dim, no_dim_change, "f", "d", dim_op_col="dop"
    )
    v, o = snap(view, orph)
    assert v == {1: (10, 1.0, "a")} and o == {5: (30, 5.0)}

    # batch 2: dim 30 arrives -> fact 5 promotes with its attributes
    dim = spark.createDataFrame([(10, "a"), (30, "z")], ["d", "attr"])
    dc2 = spark.createDataFrame(
        [(30, "z", "U")], "d BIGINT, attr STRING, dop STRING"
    )
    no_facts = spark.createDataFrame(
        [], "f BIGINT, d BIGINT, v DOUBLE, op STRING"
    )
    view, orph = maintain_join_view_full(
        view, orph, no_facts, dim, dc2, "f", "d", dim_op_col="dop"
    )
    v, o = snap(view, orph)
    assert v == {1: (10, 1.0, "a"), 5: (30, 5.0, "z")} and o == {}

    # batch 3: dim 10 deleted -> fact 1 demotes to orphan
    dim = spark.createDataFrame([(30, "z")], ["d", "attr"])
    dc3 = spark.createDataFrame(
        [(10, None, "D")], "d BIGINT, attr STRING, dop STRING"
    )
    view, orph = maintain_join_view_full(
        view, orph, no_facts, dim, dc3, "f", "d", dim_op_col="dop"
    )
    v, o = snap(view, orph)
    assert v == {5: (30, 5.0, "z")} and o == {1: (10, 1.0)}

    # batch 4: dim 10 re-inserted (new attr) -> fact 1 restores
    dim = spark.createDataFrame([(10, "A2"), (30, "z")], ["d", "attr"])
    dc4 = spark.createDataFrame(
        [(10, "A2", "U")], "d BIGINT, attr STRING, dop STRING"
    )
    view, orph = maintain_join_view_full(
        view, orph, no_facts, dim, dc4, "f", "d", dim_op_col="dop"
    )
    v, o = snap(view, orph)
    assert v == {1: (10, 1.0, "A2"), 5: (30, 5.0, "z")} and o == {}


def test_maintain_join_view_null_dim_update_propagates(spark):
    """A dim upsert that NULLs an attribute must reach existing view
    rows (hit-flag propagation, not coalesce)."""
    from aproximacion_1_etl_spark.operators.refine import (
        maintain_join_view,
    )

    view = spark.createDataFrame([(1, 10, 1.0, "a")], ["f", "d", "v", "attr"])
    dim = spark.createDataFrame([(10, None)], "d BIGINT, attr STRING")
    dc = spark.createDataFrame([(10, None)], "d BIGINT, attr STRING")
    no_facts = spark.createDataFrame(
        [], "f BIGINT, d BIGINT, v DOUBLE, op STRING"
    )
    out = maintain_join_view(view, no_facts, dim, dc, "f", "d").collect()
    assert len(out) == 1 and out[0]["attr"] is None


def test_maintain_join_view_schema_mismatch_raises(spark):
    from aproximacion_1_etl_spark.operators.refine import (
        maintain_join_view,
    )

    view = spark.createDataFrame([(1, 10, "a")], ["f", "d", "attr"])
    dim = spark.createDataFrame([(10, "a")], ["d", "attr"])
    facts = spark.createDataFrame(
        [(1, 10, 9.9, "U")], ["f", "d", "extra", "op"]
    )
    try:
        maintain_join_view(view, facts, dim, dim, "f", "d")
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "view schema" in str(e)


def test_column_profile_counts(spark):
    from aproximacion_1_etl_spark.functions.profile import column_profile

    df = spark.createDataFrame(
        [(1, "x"), (2, None), (3, "x"), (None, "y")],
        "a INT, b STRING",
    )
    prof = {r["column_name"]: r for r in column_profile(df).collect()}
    assert prof["a"]["n_rows"] == 4
    assert prof["a"]["n_nulls"] == 1
    assert prof["a"]["n_distinct"] == 3
    assert prof["b"]["n_nulls"] == 1
    assert prof["b"]["n_distinct"] == 2


def test_profile_state_merge_equals_full_recompute(spark):
    """Mergeable profile algebra: folding three disjoint batch states
    (out of order) must give exactly the profile a full rescan gives —
    including null-bearing and all-null-in-one-batch columns and
    string extrema that would break if merged after stringification
    ("10" < "9")."""
    from aproximacion_1_etl_spark.functions.profile import (
        distinct_state,
        merge_profile_states,
        profile_from_states,
        profile_state,
    )

    rows = [
        (1, 9.0, "x"),
        (2, 10.0, None),
        (3, None, "y"),
        (4, 100.0, "x"),
        (5, 2.0, "z"),
        (6, None, None),
    ]
    df = spark.createDataFrame(rows, "k INT, v DOUBLE, s STRING")
    cols = ["k", "v", "s"]
    batches = [
        df.filter(F.col("k") % 3 == i) for i in (2, 0, 1)  # any order
    ]
    merged = profile_from_states(
        merge_profile_states([profile_state(b, cols) for b in batches], cols),
        distinct_state(batches[0], cols)
        .unionByName(distinct_state(batches[1], cols))
        .unionByName(distinct_state(batches[2], cols))
        .distinct(),
        cols,
    )
    full = profile_from_states(
        profile_state(df, cols), distinct_state(df, cols), cols
    )
    got = {tuple(r) for r in merged.collect()}
    want = {tuple(r) for r in full.collect()}
    assert got == want
    # numeric extrema merged on TYPED values: min 2.0, max 100.0 (a
    # string merge would pick "10" as min and "9.0" as max)
    v = {r[0]: r for r in merged.collect()}["v"]
    assert v[4] == "2.0" and v[5] == "100.0"


def test_merge_upsert_delete_semantics(spark):
    from aproximacion_1_etl_spark.operators.refine import merge_upsert_delete

    master = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k INT, s STRING"
    )
    changes = spark.createDataFrame(
        [(2, "B", "U"), (3, None, "D"), (4, "d", "U")],
        "k INT, s STRING, op STRING",
    )
    got = {r["k"]: r["s"] for r in
           merge_upsert_delete(master, changes, ["k"]).collect()}
    assert got == {1: "a", 2: "B", 4: "d"}  # 3 deleted


def test_corpus_fingerprint_partition_invariant_and_sensitive(spark):
    from aproximacion_1_etl_spark.functions.profile import (
        corpus_fingerprint,
    )

    rows = [(i, f"text-{i}", "en") for i in range(200)]
    df = spark.createDataFrame(rows, "id BIGINT, text STRING, lang STRING")
    base = corpus_fingerprint(df, "id", ["text", "lang"]).collect()[0]
    assert base["n_rows"] == 200
    # invariant under partitioning / arrival order
    shuffled = df.repartition(7, "text").sortWithinPartitions("lang")
    again = corpus_fingerprint(shuffled, "id", ["text", "lang"]).collect()[0]
    assert again["fingerprint"] == base["fingerprint"]
    # one changed row flips the digest
    mutated = spark.createDataFrame(
        [(i, f"text-{i}" if i != 117 else "tampered", "en") for i in range(200)],
        "id BIGINT, text STRING, lang STRING",
    )
    other = corpus_fingerprint(mutated, "id", ["text", "lang"]).collect()[0]
    assert other["fingerprint"] != base["fingerprint"]
    assert other["n_rows"] == 200


def test_fingerprint_diff_localizes_changes(spark):
    from aproximacion_1_etl_spark.functions.profile import (
        fingerprint_diff,
    )
    import pyspark.sql.functions as F

    left = spark.createDataFrame(
        [(i, f"t{i}") for i in range(50)], "id BIGINT, text STRING"
    )
    right = left.filter(F.col("id") != 7).withColumn(
        "text",
        F.when(F.col("id") == 11, F.lit("edited")).otherwise(F.col("text")),
    )
    out = fingerprint_diff(left, right, "id", ["text"], prefix_len=6)
    rows = out.collect()
    # key-prefix bucketing: the edited row STAYS in its bucket
    # ('changed'), the dropped row's bucket reads only_left/changed —
    # exactly two buckets surface, 48 rows never compared
    assert len(rows) == 2
    assert sum(r["n_left"] for r in rows) - sum(r["n_right"] for r in rows) == 1
    statuses = {r["status"] for r in rows}
    assert "changed" in statuses and statuses <= {"changed", "only_left"}
    # identical corpora diff to zero rows
    assert fingerprint_diff(left, left, "id", ["text"]).count() == 0


def test_decayed_value_halves_per_week(spark, tmp_path):
    import os

    from aproximacion_1_etl_spark.queries import q_decayed_user_value

    rows = [
        (1, "2026-01-29 00:00:00", 1, "a", 8.0, "{}"),   # anchor week
        (2, "2026-01-22 00:00:00", 1, "a", 8.0, "{}"),   # 1 week old
        (3, "2026-01-08 00:00:00", 1, "a", 8.0, "{}"),   # 3 weeks old
        (4, "2026-01-29 00:00:00", 2, "a", 3.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id BIGINT, ts STRING, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING",
    ).withColumn("ts", __import__("pyspark.sql.functions", fromlist=["F"]).to_timestamp("ts"))
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = {r["user_id"]: r for r in q_decayed_user_value(spark, d).collect()}
    # 8 + 8/2 + 8/8 = 13.0 exactly (powers of two)
    assert out[1]["decayed_value"] == 13.0
    assert out[2]["decayed_value"] == 3.0


def test_event_bigrams_probabilities_sum_to_one(spark, sf_dir):
    from aproximacion_1_etl_spark.queries import q_event_bigrams

    rows = q_event_bigrams(spark, sf_dir).collect()
    by_prev: dict[str, float] = {}
    for r in rows:
        assert 0.0 < r["p_next_given_prev"] <= 1.0
        by_prev[r["prev_type"]] = (
            by_prev.get(r["prev_type"], 0.0) + r["p_next_given_prev"]
        )
    for prev, s in by_prev.items():
        assert abs(s - 1.0) < 0.001, (prev, s)


def test_type_cooccurrence_support_and_lift(spark, tmp_path):
    import os

    from aproximacion_1_etl_spark.queries import q_type_cooccurrence

    # 4 users: a+b together twice, a alone once, b alone once
    rows = []
    eid = 0
    for uid, types in ((1, "ab"), (2, "ab"), (3, "a"), (4, "b")):
        for t in types:
            eid += 1
            rows.append((eid, "2026-01-01 00:00:00", uid, t, 1.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id BIGINT, ts STRING, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING",
    )
    import pyspark.sql.functions as F

    d = str(tmp_path)
    df.withColumn("ts", F.to_timestamp("ts")).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "events.parquet"))
    out = q_type_cooccurrence(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["type_a"], r["type_b"], r["n_both"]) == ("a", "b", 2)
    assert r["support"] == 0.5
    # lift = 0.5 / (0.75 * 0.75) = 0.8889
    assert abs(r["lift"] - 0.8889) < 1e-9


def test_dedup_rate_by_source_counts_are_consistent(spark, sf_dir):
    from aproximacion_1_etl_spark.queries import q_dedup_rate_by_source

    rows = q_dedup_rate_by_source(spark, sf_dir).collect()
    total = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == total
    for r in rows:
        assert 0 <= r["n_exact_dup"] <= r["n_docs"]
        assert 0 <= r["n_near_dup_dropped"] <= r["n_docs"]


def test_corpus_release_manifest_consistency(spark, sf_dir):
    from aproximacion_1_etl_spark.queries import (
        q_corpus_funnel,
        q_corpus_release,
    )

    rel = {r["split"]: r for r in q_corpus_release(spark, sf_dir).collect()}
    assert set(rel) <= {"train", "val", "test"}
    # total released docs == the funnel's final survivor count
    funnel = {
        r["stage"]: r["n_docs"] for r in q_corpus_funnel(spark, sf_dir).collect()
    }
    assert sum(r["n_docs"] for r in rel.values()) == funnel["content_unique"]
    for r in rel.values():
        assert r["n_tokens"] > 0 and r["n_chars"] > 0
    # the split is leak-aware but still roughly proportioned
    if "train" in rel:
        total = sum(r["n_docs"] for r in rel.values())
        assert rel["train"]["n_docs"] / total > 0.5
