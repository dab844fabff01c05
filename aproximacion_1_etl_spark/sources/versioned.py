"""Versioned snapshot tables: atomic publish + time travel.

The reference mutates BigQuery tables in place through a 29-procedure
chain (`Composer/DAG_cloudrun_dataflow_sp.py:90-318`) — a half-finished
run leaves the table in an intermediate state, and yesterday's data is
gone after today's overwrite. The snapshot layout fixes both with plain
parquet + one manifest file, the core idea of Delta/Iceberg stripped to
what the engine needs:

    <table>/v=0/part-*.parquet
    <table>/v=1/part-*.parquet
    <table>/_VERSION            <- single small file naming the current
                                   committed version

Writers land a NEW version directory in full, then flip ``_VERSION``
(one tiny-file write = the commit point — readers either see the old
version or the new one, never a partial table, fixing the visibility
gap compact_table documents). Readers resolve ``_VERSION`` unless asked
for an explicit older version (time travel). Old versions are immutable
until ``vacuum`` removes them.

At 100 TB nothing changes: the manifest is one small file per table;
data files are never rewritten in place, so concurrent readers of v_n
are undisturbed by the v_n+1 publish.
"""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "_VERSION"


def _manifest_path(path: str) -> str:
    return os.path.join(path, _MANIFEST)


def current_version(path: str) -> int | None:
    """Committed version of the table at ``path`` (None = never
    published)."""
    try:
        with open(_manifest_path(path)) as f:
            return int(f.read().strip())
    except (FileNotFoundError, ValueError):
        return None


def list_versions(path: str) -> list[int]:
    """All version directories present (committed or orphaned)."""
    if not os.path.isdir(path):
        return []
    return sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(path)
        if d.startswith("v=") and d.split("=", 1)[1].isdigit()
    )


def write_snapshot(df: DataFrame, path: str, meta: str | None = None) -> int:
    """Publish ``df`` as the next version of the table; returns the new
    version number. The version directory is fully written before the
    manifest flips, so a crash mid-write leaves the previous version
    current and the partial directory orphaned (cleaned by vacuum).

    ``meta`` (e.g. a streaming batch id) is written INSIDE the version
    directory before the manifest flips, so it commits atomically with
    the data: a writer that crashed between data and manifest leaves
    neither visible. ``snapshot_meta``/``committed_metas`` read it
    back — the idempotent-replay primitive for foreachBatch publishers
    (skip a batch whose id a committed version already carries)."""
    cur, nxt, vdir = _land_version(df, path)
    _commit_version(path, cur, nxt, vdir, meta)
    return nxt


def _land_version(df: DataFrame, path: str) -> tuple[int | None, int, str]:
    """Write ``df`` fully into the NEXT version directory WITHOUT
    flipping the manifest: the landed dir is invisible (an orphan)
    until ``_commit_version`` publishes it. Returns
    (current_version, next_version, version_dir)."""
    os.makedirs(path, exist_ok=True)
    cur = current_version(path)
    nxt = 0 if cur is None else cur + 1
    # skip over orphaned (never-committed) higher version dirs
    existing = list_versions(path)
    if existing:
        nxt = max(nxt, existing[-1] + 1)
    vdir = os.path.join(path, f"v={nxt}")
    df.write.mode("overwrite").parquet(vdir)
    return cur, nxt, vdir


def _commit_version(
    path: str,
    cur: int | None,
    nxt: int,
    vdir: str,
    meta: str | None = None,
) -> None:
    """Publish a landed version dir: lineage + meta land inside it,
    then the manifest flips atomically."""
    # _parent records the version this publish supersedes — the commit
    # LINEAGE. "Committed" cannot be decided by version number alone:
    # an orphan keeps its number forever, and a later commit's number
    # passing it must not make it look committed. Walking _parent from
    # the current manifest yields exactly the committed chain.
    with open(os.path.join(vdir, "_parent"), "w") as f:
        f.write(str(-1 if cur is None else cur))
    if meta is not None:
        with open(os.path.join(vdir, "_meta"), "w") as f:
            f.write(meta)
    tmp = _manifest_path(path) + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(nxt))
    os.replace(tmp, _manifest_path(path))  # atomic commit point


def snapshot_meta(path: str, version: int | None = None) -> str | None:
    """The ``meta`` string a version was published with (None if it
    carried none). Defaults to the current committed version."""
    cur = current_version(path)
    if cur is None:
        raise FileNotFoundError(f"no committed version at {path}")
    v = cur if version is None else version
    try:
        with open(os.path.join(path, f"v={v}", "_meta")) as f:
            return f.read()
    except FileNotFoundError:
        return None


def committed_versions(path: str) -> list[int]:
    """The committed chain, oldest first: walk ``_parent`` links from
    the current manifest version. Orphaned dirs are never on the chain
    (nothing committed points at them — a publish racing with their
    crashed writer records the same parent they did, not them). The
    walk stops at a vacuumed (missing) ancestor; pre-lineage versions
    (no ``_parent`` file) terminate the walk after themselves."""
    cur = current_version(path)
    if cur is None:
        return []
    chain = []
    v = cur
    while v >= 0 and os.path.isdir(os.path.join(path, f"v={v}")):
        chain.append(v)
        try:
            with open(os.path.join(path, f"v={v}", "_parent")) as f:
                v = int(f.read().strip())
        except FileNotFoundError:
            break
    return chain[::-1]


def committed_metas(path: str) -> set[str]:
    """All meta strings carried by COMMITTED versions (orphaned dirs
    excluded — their meta never became visible). Vacuumed versions'
    metas are forgotten: a replay-guard caller must retain at least
    its replay horizon (vacuum keep_last)."""
    out = set()
    for v in committed_versions(path):
        m = snapshot_meta(path, v)
        if m is not None:
            out.add(m)
    return out


def read_snapshot(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read the current committed version, or time-travel to an older
    one with ``version=``."""
    cur = current_version(path)
    if cur is None:
        raise FileNotFoundError(f"no committed version at {path}")
    v = cur if version is None else version
    if v > cur or v not in list_versions(path):
        raise ValueError(f"version {v} not available (current={cur})")
    return spark.read.parquet(os.path.join(path, f"v={v}"))


def delete_rows(
    spark: SparkSession,
    path: str,
    key_col: str,
    condition: str,
) -> int:
    """Row-level delete WITHOUT rewriting data files — the deletion-
    vector idea from modern lakehouse formats, stripped to what the
    engine needs. The keys matching ``condition`` (a SQL boolean over
    the current version) are appended to a tiny sidecar table
    (``<table>/_dv/v=<n>/``) keyed to the version they apply to;
    ``read_snapshot_with_dv`` anti-joins them out at scan time.

    Why it matters at 100 TB: a delete that touches 0.1% of rows
    otherwise rewrites every affected file (terabytes of write
    amplification for kilobytes of intent). The DV is the kilobytes.
    Deletes accumulate (append mode) so repeated calls compose;
    ``compact_snapshot`` naturally materializes them (it reads through
    the DV path) and resets the next version's DV to empty. Returns
    the number of newly deleted keys (driver sees one count, never the
    data)."""
    cur = current_version(path)
    if cur is None:
        raise FileNotFoundError(f"no committed version at {path}")
    snap = read_snapshot(spark, path)
    keys = snap.filter(condition).select(key_col)
    dv_dir = os.path.join(path, "_dv", f"v={cur}")
    n = keys.count()
    if n:
        keys.write.mode("append").parquet(dv_dir)
    return n


def read_snapshot_with_dv(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a snapshot version with its deletion vector applied: the
    base files stream through an anti-join against the (tiny,
    broadcastable) DV sidecar — no data file was rewritten to serve
    the delete. Falls back to the plain read when no DV exists for the
    version."""
    cur = current_version(path)
    if cur is None:
        raise FileNotFoundError(f"no committed version at {path}")
    v = cur if version is None else version
    base = read_snapshot(spark, path, version=v)
    dv_dir = os.path.join(path, "_dv", f"v={v}")
    if not os.path.isdir(dv_dir):
        return base
    dv = spark.read.parquet(dv_dir)
    key_col = dv.columns[0]
    from pyspark.sql import functions as F

    return base.join(F.broadcast(dv.distinct()), key_col, "left_anti")


def compact_snapshot(
    spark: SparkSession,
    path: str,
    target_partitions: int,
    sort_by: list[str] | None = None,
) -> int:
    """Atomic small-file compaction for snapshot tables: rewrite the
    CURRENT committed version into ``target_partitions`` files (sorted/
    clustered on ``sort_by`` if given) as the NEXT version, then flip
    the manifest. Unlike the plain-directory ``tables.compact_table``
    (which documents a two-rename window where the path is missing),
    readers here are never disturbed: the table root always exists, a
    reader that resolved v_n keeps reading v_n's immutable files, and
    the flip is one atomic manifest replace — the engine-native
    equivalent of the reference's atomic BigQuery DDL rewrites
    (`Composer/DAG_cloudrun_dataflow_sp.py:280-318`). Reads through the
    deletion vector, so compaction MATERIALIZES accumulated row-level
    deletes (the new version carries no DV). Returns the new
    version."""
    df = read_snapshot_with_dv(spark, path)
    if sort_by:
        compacted = df.repartitionByRange(
            target_partitions, *sort_by
        ).sortWithinPartitions(*sort_by)
    else:
        compacted = df.coalesce(target_partitions)
    return write_snapshot(compacted, path)


def zorder_snapshot(
    spark: SparkSession,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = 16,
) -> int:
    """Atomic Z-order rewrite for snapshot tables: cluster the current
    committed version on the Z-curve of ``cols`` (layout.zvalue) into
    the next version and flip the manifest — OPTIMIZE ZORDER BY with
    snapshot isolation, same publish protocol as compact_snapshot.
    Returns the new version."""
    import pyspark.sql.functions as F

    from aproximacion_1_etl_spark.sources.layout import zvalue

    df = read_snapshot(spark, path)
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_lo_{c}"), F.max(c).alias(f"_hi_{c}")]
    b = df.agg(*aggs).collect()[0]
    bounds = []
    for c in cols:
        lo, hi = b[f"_lo_{c}"], b[f"_hi_{c}"]
        if lo is None or hi is None:
            # Empty current version or an all-NULL z-order column: there
            # is nothing to cluster on — leave the table as-is instead
            # of crashing with an opaque float(None) TypeError.
            cur = current_version(path)
            if cur is None:
                raise ValueError(
                    f"zorder_snapshot: no committed version at {path}"
                )
            return cur
        try:
            bounds.append((F.col(c), float(lo), float(hi)))
        except (TypeError, ValueError) as e:
            raise ValueError(
                f"zorder_snapshot: column {c!r} has non-numeric bounds "
                f"({lo!r}, {hi!r}); Z-ordering needs numeric columns"
            ) from e
    z = zvalue(bounds, bits=bits)
    return write_snapshot(
        df.repartitionByRange(n_files, z).sortWithinPartitions(z), path
    )


def snapshot_change_feed(
    spark: SparkSession,
    path: str,
    v_old: int,
    v_new: int,
    key_cols: list[str],
) -> DataFrame:
    """Change-data-feed between two committed versions of a snapshot
    table (the table-format CDF surface, derived rather than stored):
    one co-partitioned full-outer join on the key comparing the
    non-key columns as a struct — 'D' rows carry the old image of
    keys that vanished, 'U' rows the after-image of keys that
    appeared or changed. Unchanged keys emit nothing, so the feed is
    |changes|-sized and plugs straight into maintain_join_view /
    merge-based consumers.

    At 100 TB: the struct compare shuffles both versions once on the
    key; a deployment doing this nightly should persist a row-hash
    column at write time (the table_diff pattern) so the shuffle
    carries (key, hash) only and after-images are fetched for the
    changed minority.

    Reads through each version's deletion vector (read_snapshot_with_dv,
    like compact_snapshot): the feed must describe the LOGICAL table a
    reader sees, not the physical files — a row delete served by a DV
    sidecar is a real 'D' to every downstream view, and a raw-file diff
    would either miss it or emit phantom deletes for rows no reader of
    v_old ever saw."""
    old = read_snapshot_with_dv(spark, path, v_old)
    new = read_snapshot_with_dv(spark, path, v_new)
    if set(old.columns) != set(new.columns):
        raise ValueError(
            "change feed requires identical schemas; got "
            f"{sorted(old.columns)} vs {sorted(new.columns)}"
        )
    val_cols = [c for c in new.columns if c not in key_cols]
    o = old.select(*key_cols, F.struct(*val_cols).alias("_img_old"))
    n = new.select(*key_cols, F.struct(*val_cols).alias("_img_new"))
    j = o.join(n, key_cols, "full_outer")
    deleted = (
        j.filter(F.col("_img_new").isNull())
        .select(*key_cols, F.col("_img_old.*"))
        .withColumn("op", F.lit("D"))
    )
    upserted = (
        # eqNullSafe, not != : a NULL field inside either image must
        # compare as a definite (in)equality, and a missing old image
        # (new key) must read as "changed"
        j.filter(
            F.col("_img_new").isNotNull()
            & ~F.col("_img_old").eqNullSafe(F.col("_img_new"))
        )
        .select(*key_cols, F.col("_img_new.*"))
        .withColumn("op", F.lit("U"))
    )
    return deleted.unionByName(upserted)


def _delta_root(path: str, version: int) -> str:
    return os.path.join(path, "_delta", f"v={version}")


def committed_delta_seqs(path: str, version: int) -> list[int]:
    """Committed delta sequence numbers for a base version, in apply
    order. A seq dir without its ``_commit`` marker is an orphan from a
    crashed writer and is never read (same crash-safety contract as the
    snapshot manifest)."""
    root = _delta_root(path, version)
    if not os.path.isdir(root):
        return []
    return sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(root)
        if d.startswith("seq=")
        and d.split("=", 1)[1].isdigit()
        and os.path.exists(os.path.join(root, d, "_commit"))
    )


def committed_delta_metas(path: str, version: int) -> set[str]:
    """Meta strings carried by committed delta batches of a base
    version — the replay guard for streaming delta producers (skip a
    micro-batch whose id an already-committed delta carries), the
    delta-level twin of ``committed_metas``."""
    out = set()
    root = _delta_root(path, version)
    for s in committed_delta_seqs(path, version):
        try:
            with open(os.path.join(root, f"seq={s}", "_meta")) as f:
                out.add(f.read())
        except FileNotFoundError:
            pass
    return out


def write_delta(
    df: DataFrame,
    path: str,
    op_col: str | None = None,
    meta: str | None = None,
) -> int:
    """MERGE-ON-READ delta append: land a keyed batch of row-level
    changes against the CURRENT committed version without rewriting any
    base file — the copy-on-write/merge-on-read tradeoff from modern
    lakehouse formats, stripped to what the engine needs. ``df`` must
    carry the base schema; ``op_col`` (values 'U' upsert / 'D' delete)
    marks intent, default all-'U'. Each batch must be key-unique (one
    row per key per batch); across batches the HIGHEST sequence number
    wins at read time.

    Why it matters at 100 TB: a trickle of small upserts otherwise
    forces either terabyte-scale file rewrites per batch (copy-on-
    write) or unbounded small-file growth in the base. Deltas are the
    kilobytes of intent; ``read_merged`` applies them at scan time and
    ``compact_deltas`` folds them into the next version when they
    outgrow the broadcast threshold. Crash-safe: the seq dir is fully
    written before its ``_commit`` marker lands; a crashed writer
    leaves an ignored orphan. Returns the sequence number."""
    cur = current_version(path)
    if cur is None:
        raise FileNotFoundError(f"no committed version at {path}")
    if op_col is None:
        out = df.withColumn("_op", F.lit("U"))
    else:
        out = df.withColumnRenamed(op_col, "_op")
    root = _delta_root(path, cur)
    existing = [
        int(d.split("=", 1)[1])
        for d in (os.listdir(root) if os.path.isdir(root) else [])
        if d.startswith("seq=") and d.split("=", 1)[1].isdigit()
    ]
    seq = max(existing) + 1 if existing else 0
    sdir = os.path.join(root, f"seq={seq}")
    out.write.mode("overwrite").parquet(sdir)
    # _meta lands BEFORE _commit so it becomes visible atomically with
    # the batch (same protocol as write_snapshot's meta)
    if meta is not None:
        with open(os.path.join(sdir, "_meta"), "w") as f:
            f.write(meta)
    with open(os.path.join(sdir, "_commit"), "w") as f:
        f.write(str(seq))
    return seq


def read_merged(
    spark: SparkSession,
    path: str,
    key_cols: list[str],
    version: int | None = None,
) -> DataFrame:
    """Merge-on-read scan: the base version (through its deletion
    vector) with all committed deltas applied, latest sequence winning
    per key; keys whose winning op is 'D' vanish.

    Scale shape: the base RELATION IS NEVER SHUFFLED — the winning
    delta images are resolved by a window over the (small) delta set
    only, their keys broadcast into a left-anti prune of the base, and
    the 'U' after-images unioned on top. Read cost = base scan + one
    broadcast anti-join, independent of how many delta batches
    accumulated. When the delta set outgrows broadcast size, that is
    the signal to ``compact_deltas`` — the same economics as Delta/
    Iceberg minor compaction."""
    cur = current_version(path)
    if cur is None:
        raise FileNotFoundError(f"no committed version at {path}")
    v = cur if version is None else version
    base = read_snapshot_with_dv(spark, path, v)
    seqs = committed_delta_seqs(path, v)
    if not seqs:
        return base
    parts = [
        spark.read.parquet(os.path.join(_delta_root(path, v), f"seq={s}"))
        .withColumn("_seq", F.lit(s))
        for s in seqs
    ]
    deltas = parts[0]
    for p in parts[1:]:
        deltas = deltas.unionByName(p)
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(F.col("_seq").desc())
    latest = (
        deltas.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
    )
    survivors = base.join(
        F.broadcast(latest.select(*key_cols)), key_cols, "left_anti"
    )
    upserts = latest.filter(F.col("_op") == "U").select(*base.columns)
    return survivors.unionByName(upserts)


def compact_deltas(
    spark: SparkSession, path: str, key_cols: list[str]
) -> int:
    """Fold all accumulated deltas (and the base's deletion vector)
    into the NEXT snapshot version — merge-on-read's minor compaction.
    The new version starts with no deltas and no DV; readers of the old
    version are undisturbed (same atomic-manifest publish as
    compact_snapshot). Returns the new version."""
    return write_snapshot(read_merged(spark, path, key_cols), path)


def write_snapshot_gated(
    df: DataFrame,
    path: str,
    expectations: dict[str, str],
    meta: str | None = None,
) -> tuple[int | None, dict[str, int]]:
    """WRITE-audit-publish: land ``df`` into the next (invisible)
    version directory, audit THE WRITTEN BYTES with every named SQL
    expectation in ONE aggregation pass, and flip the manifest only if
    all hold — on any violation the landed dir is removed and readers
    keep the last good version. Auditing the landed files (not a
    second evaluation of ``df``) matters twice: a non-deterministic
    plan (sampling, timestamps) cannot pass the gate with rows it
    never publishes, and the data is written exactly once — the
    pattern the reference's daily loop needs but cannot get from
    in-place table mutation (`app.py:142-147` diffs runs AFTER the bad
    data is already live).

    Expectations use SQL-CHECK-STRICT semantics: a row where the
    condition evaluates to NULL counts as a VIOLATION (a DQ gate that
    waves NULLs through is a trap — 'v >= 0' must not pass v NULL).
    Returns (version-or-None, per-rule violation counts). An empty
    expectations dict means an ungated publish — commit directly
    (zero-expression agg would raise after landing, orphaning the
    dir)."""
    import shutil as _shutil

    if not expectations:
        return write_snapshot(df, path, meta), {}
    cur, nxt, vdir = _land_version(df, path)
    landed = df.sparkSession.read.parquet(vdir)
    aggs = [
        F.sum(
            F.when(F.expr(cond), F.lit(0)).otherwise(F.lit(1))
        ).alias(name)
        for name, cond in expectations.items()
    ]
    row = landed.agg(*aggs).collect()[0]
    viol = {name: int(row[name] or 0) for name in expectations}
    if any(v > 0 for v in viol.values()):
        # never committed — safe to reclaim immediately rather than
        # leaving an orphan for vacuum
        _shutil.rmtree(vdir, ignore_errors=True)
        return None, viol
    _commit_version(path, cur, nxt, vdir, meta)
    return nxt, viol


def read_history(
    spark: SparkSession, path: str, through_dv: bool = True
) -> DataFrame:
    """Full-history scan: every COMMITTED version (orphans never
    appear), union-aligned BY NAME with schema evolution — a column
    absent in an older version reads as NULL — plus a ``_v`` column
    naming each row's version. Reads through each version's deletion
    vector by default, so rows DV-deleted from a version are absent
    from that version's slice, exactly as a time-traveling reader of
    it would see.

    Scale shape: one scan per retained version, no shuffle — the union
    is a physical concatenation. Blame/auditing queries (first version
    containing a key, column drift across versions) reduce on top with
    ordinary aggregates; a deployment with long retention should
    restrict to a version range via time-travel reads instead of
    scanning the full chain."""
    chain = committed_versions(path)
    if not chain:
        raise FileNotFoundError(f"no committed version at {path}")
    out = None
    for v in chain:
        reader = read_snapshot_with_dv if through_dv else read_snapshot
        df = reader(spark, path, v).withColumn("_v", F.lit(v))
        out = (
            df
            if out is None
            else out.unionByName(df, allowMissingColumns=True)
        )
    return out


def history_to_scd2(
    hist: DataFrame,
    key_cols: list[str],
    val_cols: list[str],
    versions: list[int] | None = None,
) -> DataFrame:
    """Derive an SCD TYPE-2 dimension from a version-history scan
    (``read_history`` output carrying ``_v``): per key, consecutive
    versions with an unchanged value image collapse into one validity
    interval [valid_from, valid_to) in version numbers; the open
    current interval has valid_to NULL. A key ABSENT from a later
    version closes its interval at the first version it vanished from
    (and is NOT current) — deletions are first-class: an internal
    tombstone row is synthesized at each gap start, so a key that
    vanishes and later reappears with the SAME image still gets two
    separate intervals instead of being silently merged across the
    gap. Zero producer-side instrumentation — the committed chain IS
    the history; the consumer-side twin of the instrumented scd2
    builder (operators/refine.py) for tables that only kept snapshots.

    ``versions`` is the COMMITTED chain (``committed_versions(path)``).
    Pass it whenever the chain may contain a version with zero
    surviving rows: derived-from-rows (the ``None`` fallback) cannot
    see an all-deleted version, so keys absent from it would get no
    tombstone there and their intervals would silently span it —
    contradicting what a time-travel reader of that version observes.

    Scale shape: one shuffle on the key serves both windows (gap
    detection + change points + interval ends); the version chain is a
    |versions|-row broadcast; no self-join. The change-point filter
    collapses |keys| x |versions| rows to |change points| before the
    interval window."""
    from pyspark.sql import Window

    # next version in the committed chain, as a tiny broadcast lookup
    wv = Window.orderBy("_v")
    if versions is not None:
        spark = hist.sparkSession
        vnext = spark.createDataFrame(
            [(int(v),) for v in sorted(versions)], "_v bigint"
        ).withColumn("_v_next", F.lead("_v").over(wv))
    else:
        vnext = (
            hist.select("_v")
            .distinct()
            .withColumn("_v_next", F.lead("_v").over(wv))
        )
    wk = Window.partitionBy(*key_cols).orderBy("_v")
    h = (
        hist.join(F.broadcast(vnext), "_v")
        .withColumn("_nxt_key", F.lead("_v").over(wk))
    )
    # tombstone at each gap start: the chain has a next version but
    # this key's next row (if any) is beyond it
    tomb = h.filter(
        F.col("_v_next").isNotNull()
        & (
            F.col("_nxt_key").isNull()
            | (F.col("_nxt_key") > F.col("_v_next"))
        )
    ).select(
        *key_cols,
        F.col("_v_next").alias("_v"),
        *[
            F.lit(None).cast(hist.schema[c].dataType).alias(c)
            for c in val_cols
        ],
        F.lit(True).alias("_absent"),
    )
    rows = hist.select(
        *key_cols, "_v", *val_cols, F.lit(False).alias("_absent")
    ).unionByName(tomb)
    img = F.struct("_absent", *val_cols)
    ch = (
        rows.withColumn("_prev", F.lag(img).over(wk))
        .filter(
            F.col("_prev").isNull() | ~F.col("_prev").eqNullSafe(img)
        )
        .drop("_prev")
    )
    return (
        ch.withColumn("valid_from", F.col("_v"))
        .withColumn("valid_to", F.lead("_v").over(wk))
        .withColumn("is_current", F.col("valid_to").isNull())
        .filter(~F.col("_absent"))
        .drop("_v", "_absent")
    )


def vacuum(path: str, keep_last: int = 2) -> list[int]:
    """Drop all but the newest ``keep_last`` committed versions (and any
    orphaned uncommitted dirs newer than the manifest); returns removed
    versions. Never removes the current version."""
    cur = current_version(path)
    if cur is None:
        return []
    removed = []

    def _rm(v: int) -> None:
        # a version's DV and delta sidecars die with it — they are
        # meaningless without the base files they patch
        shutil.rmtree(os.path.join(path, f"v={v}"), ignore_errors=True)
        shutil.rmtree(os.path.join(path, "_dv", f"v={v}"), ignore_errors=True)
        shutil.rmtree(
            os.path.join(path, "_delta", f"v={v}"), ignore_errors=True
        )

    committed = [v for v in list_versions(path) if v <= cur]
    for v in committed[:-keep_last] if keep_last > 0 else committed[:-1]:
        if v == cur:
            continue
        _rm(v)
        removed.append(v)
    for v in list_versions(path):
        if v > cur:
            _rm(v)
            removed.append(v)
    return removed
