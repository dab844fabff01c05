"""The oracle generators that REWRITE a shared SQL fragment textually
(.replace on an anchor substring) must fail fast when the fragment is
reworded — otherwise a drifted anchor silently produces a wrong oracle
(unsampled / unfiltered histogram) that surfaces only as an opaque
cert hash mismatch. These tests PLANT the drift and pin the loud
failure (VERDICT r9 #2 / ADVICE r8 #3 device)."""

from __future__ import annotations

import pytest

from aproximacion_1_etl_spark.oracles import common as oc


def test_lsh_band_plan_oracle_raises_on_reworded_shingles(monkeypatch):
    reworded = oc._SHINGLES_SQL.replace(
        "FROM documents WHERE", "FROM documents AS d WHERE"
    )
    assert reworded != oc._SHINGLES_SQL  # the drift really planted
    monkeypatch.setattr(oc, "_SHINGLES_SQL", reworded)
    with pytest.raises(AssertionError, match="injection anchor"):
        oc._lsh_band_plan_sql([(16, 8)])


def test_corpus_release_oracle_raises_on_reworded_shingles(monkeypatch):
    reworded = oc._SHINGLES_SQL.replace("FROM documents", "FROM docs")
    assert reworded != oc._SHINGLES_SQL
    monkeypatch.setattr(oc, "_SHINGLES_SQL", reworded)
    with pytest.raises(AssertionError, match="rebase anchor"):
        oc._corpus_release_sql({"train": 0.8, "val": 0.1, "test": 0.1})


def test_generators_accept_the_real_fragment():
    # the guards must not fire on the genuine fragment
    assert "samp_thr" in oc._lsh_band_plan_sql([(16, 8)])
    sql = oc._corpus_release_sql({"train": 0.8, "val": 0.2})
    assert "FROM clean" in sql


def test_lsh_band_plan_oracle_literals_derive_from_shared_constants():
    # ADVICE r9 #1: the cap/space literals must come from
    # functions/sampling, not re-typed digits — changing
    # DEFAULT_MAX_RATE on the Spark side must flow into the oracle.
    from aproximacion_1_etl_spark.functions.sampling import (
        _SPACE,
        DEFAULT_MAX_RATE,
    )

    sql = oc._lsh_band_plan_sql([(16, 8)])
    assert f"LEAST({int(DEFAULT_MAX_RATE * _SPACE)}" in sql
    assert f"* {_SPACE})" in sql
    # division-by-zero guard on an empty corpus
    assert "GREATEST(count(*), 1)" in sql
