"""Warehouse layout: partitioned + bucketed table writers (the 100 TB
read-path design made concrete and testable).

The reference's one physical trick is its store layout: partition key
+ clustering order so every read is a pruned, pre-sorted scan
(schema.sql:9-10 — SURVEY.md §1.3). At Spark scale the equivalents:

  - ``partitionBy(key)`` on write → partition PRUNING: a predicate on
    the key eliminates directories before any I/O.
  - ``bucketBy(n, key)`` + ``sortBy`` on both sides of a recurring
    fact-fact join → CO-LOCATED join: both scans report the same
    hash-partitioning, so the join plans with ZERO Exchange — the
    shuffle that dominates orders⋈lineitem at 100 TB disappears from
    every downstream query that joins on the bucket key.

Bucket counts here are test-sized; at production scale size buckets so
each holds ~128-256 MB of the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table


def write_partitioned_entries(df: DataFrame, path: str, key: str = "sensor") -> None:
    """Entry-store layout: one directory per key (schema.sql:9's
    partition key), sorted within files by ts descending so per-key
    newest-n scans read minimal row groups."""
    (
        df.repartition(key)
        .sortWithinPartitions(key, "ts", ascending=[True, False])
        .write.mode("overwrite")
        .partitionBy(key)
        .parquet(path)
    )


def compact_parquet(
    spark: SparkSession,
    path: str,
    sort_col: str | None = None,
    target_rows_per_file: int = 1_000_000,
) -> tuple[int, int]:
    """Small-files maintenance: rewrite a parquet directory into
    ~target-sized files, optionally re-establishing a per-file sort
    (so min/max skipping keeps working after compaction). Streaming
    sinks and frequent micro-batch appends accrete thousands of tiny
    files; scan-task scheduling then dominates query time — the
    classic operational fix is this periodic rewrite.

    Returns (files_before, files_after). The rewrite goes through a
    temp dir, is verified, then swapped in via rmtree + move — which is
    NOT atomic: there is a window where the path is absent or partial,
    so this assumes an exclusive maintenance window (no readers, single
    writer), like any non-transactional parquet rewrite. Concurrent
    readers require a transactional table format (Delta/Iceberg MERGE +
    snapshot isolation) or a versioned-directory + pointer-swap layout —
    the latter is implemented here as compact_versioned /
    write_versioned for tables that opt into the ``v=N`` + ``_VERSION``
    layout; this in-place variant remains for plain directories."""
    import math as _math
    import shutil
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    files_before = df.select(F.input_file_name()).distinct().count()
    n_rows = df.count()
    n_files = max(1, _math.ceil(n_rows / target_rows_per_file))
    if sort_col is not None:
        out = df.repartitionByRange(n_files, sort_col).sortWithinPartitions(sort_col)
    else:
        out = df.repartition(n_files)
    tmp = path.rstrip("/") + "__compact_tmp"
    out.write.mode("overwrite").parquet(tmp)
    final = spark.read.parquet(tmp)
    assert final.count() == n_rows  # verify before the swap
    shutil.rmtree(path)
    shutil.move(tmp, path)
    files_after = (
        spark.read.parquet(path).select(F.input_file_name()).distinct().count()
    )
    return files_before, files_after


VERSION_POINTER = "_VERSION"


def _commit_pointer(root: str, v: int) -> None:
    """Atomically swap the ``_VERSION`` pointer to ``v`` (fsync'd temp
    file + ``os.replace`` — POSIX-atomic, so a concurrent reader sees
    the old or the new version, never a torn pointer)."""
    import os

    tmp = os.path.join(root, VERSION_POINTER + ".tmp")
    with open(tmp, "w") as f:
        f.write(str(v))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(root, VERSION_POINTER))


VERSION_META = "_COMMIT_META"


def _write_version_meta(root: str, v: int, meta: str) -> None:
    """Persist an opaque commit-metadata string INSIDE the version
    directory, before the pointer swap — so the marker and the data
    commit are one atomic unit (the pointer names the version, the
    version carries its meta). Used by streaming foreachBatch callers
    to make a versioned MERGE replay-idempotent: record the batch id
    in the commit, read it back for the skip check."""
    import os

    path = os.path.join(versioned_path(root, v), VERSION_META)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(meta)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def version_meta(root: str, version: int | None = None) -> str | None:
    """Commit metadata recorded with ``version`` (default: the current
    committed version), or None if the table or the meta is absent."""
    import os

    if version is None:
        version = current_version(root)
        if version is None:
            return None
    try:
        with open(os.path.join(versioned_path(root, version), VERSION_META)) as f:
            return f.read()
    except FileNotFoundError:
        return None


def current_version(root: str) -> int | None:
    """Version the table pointer currently names, or None if the table
    has never been committed."""
    import os

    try:
        with open(os.path.join(root, VERSION_POINTER)) as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return None


def list_versions(root: str, committed_only: bool = True) -> list[int]:
    """All ``v=N`` directories under ``root``, ascending.

    ``committed_only`` (the default) drops versions ABOVE the current
    pointer: a writer that crashed between writing ``v=N`` and the
    pointer swap leaves an orphan directory whose contents (including
    any ``_COMMIT_META``) must not be treated as committed state —
    the replay-skip checks that scan version history depend on this
    filter for their crash-safety argument."""
    import os
    import re

    try:
        versions = sorted(
            int(m.group(1))
            for d in os.listdir(root)
            if (m := re.fullmatch(r"v=(\d+)", d))
        )
    except FileNotFoundError:
        return []
    if committed_only:
        cur = current_version(root)
        if cur is None:
            return []
        versions = [v for v in versions if v <= cur]
    return versions


def versioned_path(root: str, version: int) -> str:
    import os

    return os.path.join(root, f"v={version}")


def read_versioned(spark: SparkSession, root: str) -> DataFrame:
    """Read the current committed version. The version directory is
    immutable once committed, so a query that resolved the pointer
    keeps a consistent snapshot for its whole lifetime even if a
    writer commits (or vacuums other versions) concurrently."""
    v = current_version(root)
    if v is None:
        raise FileNotFoundError(f"no committed version under {root}")
    return spark.read.parquet(versioned_path(root, v))


def write_versioned(
    df: DataFrame,
    root: str,
    partition_by: list[str] | None = None,
    meta: str | None = None,
) -> int:
    """Commit ``df`` as the next version of a versioned parquet table.

    The minimal transactional layout (the single-pointer core of what
    Delta/Iceberg generalize): data lands in a fresh immutable
    ``v=<n+1>/`` directory, then the ``_VERSION`` pointer file is
    swapped via ``os.replace`` — atomic on POSIX — so a concurrent
    reader resolves either the old version or the new one, never a
    half-written directory (the non-atomic rmtree+move window that
    plain ``compact_parquet`` documents). Old versions remain readable
    until ``vacuum_versions``; single-WRITER is still assumed (two
    concurrent committers could race the same version number).

    ``partition_by`` preserves a physical partition layout — the
    bucketed-table case: merge_versioned tables MUST keep their
    ``_bkt=`` directories, or the next merge's hardlink carry-forward
    finds none and silently drops every untouched bucket."""
    import os

    os.makedirs(root, exist_ok=True)
    v = (current_version(root) or 0) + 1
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(versioned_path(root, v))
    if meta is not None:
        _write_version_meta(root, v, meta)
    _commit_pointer(root, v)
    return v


def vacuum_versions(root: str, keep: int = 2) -> list[int]:
    """Drop all but the newest ``keep`` committed versions (never the
    current one). Returns the versions removed. Readers that resolved
    a dropped version BEFORE the vacuum can still fail mid-scan — the
    retention window is the operator's promise that no query runs
    longer than ``keep`` commits, exactly like Delta/Iceberg VACUUM."""
    import shutil

    cur = current_version(root)
    versions = list_versions(root, committed_only=False)
    doomed = [v for v in versions[:-keep] if v != cur] if keep else []
    for v in doomed:
        shutil.rmtree(versioned_path(root, v))
    return doomed


def diff_versions(
    spark: SparkSession,
    root: str,
    v_from: int,
    v_to: int,
    keys: list[str],
) -> DataFrame:
    """Row-level change feed between two committed versions (the
    Delta/Iceberg ``table_changes`` shape): one row per changed key
    with ``change ∈ {added, removed, updated}``. Unchanged rows are
    dropped BEFORE the output materializes: each side reduces to
    (keys, row-hash) — a full-width column hash over the non-key
    columns, computed scan-side — so the full outer join co-shuffles
    only keys+hash, never payloads, and the change census is the join
    output filtered on hash inequality. Audit/debug tool for the
    versioned stores (model censuses, corpus tables, labels): what
    did last night's commit actually change?"""
    a = spark.read.parquet(versioned_path(root, v_from))
    b = spark.read.parquet(versioned_path(root, v_to))
    if set(a.columns) != set(b.columns):
        raise ValueError(
            f"schema changed between v{v_from} and v{v_to}: "
            f"{sorted(a.columns)} vs {sorted(b.columns)}"
        )
    payload = [c for c in a.columns if c not in keys]

    def keyed(df: DataFrame, tag: str) -> DataFrame:
        # NULLs are skipped by xxhash64's accumulator, which would make
        # (NULL, 'x') hash like ('x', NULL) — coalesce each column to a
        # sentinel so null position matters
        cols = [
            F.coalesce(F.col(c).cast("string"), F.lit("\x00<NULL>"))
            for c in payload
        ]
        h = F.xxhash64(*cols) if payload else F.lit(0)
        return df.select(*keys, h.alias(f"__h_{tag}"))

    ka, kb = keyed(a, "a"), keyed(b, "b")
    # null-SAFE key equality (review catch): a name-list equi-join
    # never matches NULL keys, so an unchanged NULL-key row would be
    # reported as a phantom removed+added pair on every diff
    cond = None
    for k in keys:
        c = ka[k].eqNullSafe(kb[k])
        cond = c if cond is None else cond & c
    j = ka.join(kb, cond, "full_outer")
    change = (
        F.when(F.col("__h_a").isNull(), F.lit("added"))
        .when(F.col("__h_b").isNull(), F.lit("removed"))
        .when(F.col("__h_a") != F.col("__h_b"), F.lit("updated"))
    )
    return (
        j.select(
            *[F.coalesce(ka[k], kb[k]).alias(k) for k in keys],
            "__h_a",
            "__h_b",
        )
        .withColumn("change", change)
        .where(F.col("change").isNotNull())
        .select(*keys, "change")
    )


def compact_versioned(
    spark: SparkSession,
    root: str,
    sort_col: str | None = None,
    target_rows_per_file: int = 1_000_000,
) -> tuple[int, int]:
    """compact_parquet's concurrent-reader-safe twin for versioned
    tables: rewrite the current version into ~target-sized files as a
    NEW version and atomically swap the pointer. Readers mid-query on
    the old version are untouched (its directory survives until
    vacuum); new readers see only compacted files. Returns
    (files_before, files_after).

    REFUSES bucketed (merge_versioned) tables: this rewrite flattens
    partition layout, and a flattened merge table loses every
    untouched bucket at its next merge (the carry-forward finds no
    ``_bkt=`` directories). ``compact_versioned_bucketed`` is the
    layout-preserving maintenance for those — the guard turns a
    silent-data-loss mistake into an error naming the right tool."""
    import math as _math
    from pyspark.sql import functions as F

    if stored_buckets(root) is not None:
        raise ValueError(
            f"table {root} is a bucketed merge_versioned table; use "
            "compact_versioned_bucketed (this rewrite would flatten "
            "the _bkt= layout and the next merge would silently drop "
            "every untouched bucket)"
        )
    df = read_versioned(spark, root)
    files_before = df.select(F.input_file_name()).distinct().count()
    n_rows = df.count()
    n_files = max(1, _math.ceil(n_rows / target_rows_per_file))
    if sort_col is not None:
        out = df.repartitionByRange(n_files, sort_col).sortWithinPartitions(sort_col)
    else:
        out = df.repartition(n_files)
    v = write_versioned(out, root)
    after = spark.read.parquet(versioned_path(root, v))
    files_after = after.select(F.input_file_name()).distinct().count()
    return files_before, files_after


MERGE_BUCKETS = 16  # production: size so a bucket ~ a few hundred MB
BUCKETS_META = "_BUCKETS"
# updates with more key rows than this skip the broadcast anti-join hint
# and let the planner/AQE pick (a 2M-row key set is already past any
# sane autoBroadcastJoinThreshold)
BROADCAST_KEY_ROWS = 2_000_000


def stored_buckets(root: str) -> int | None:
    """Bucket count the table was created with, or None if the table
    predates bucket metadata (or doesn't exist)."""
    import os

    try:
        with open(os.path.join(root, BUCKETS_META)) as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return None


def _write_buckets(root: str, n_buckets: int) -> None:
    import os

    os.makedirs(root, exist_ok=True)
    tmp = os.path.join(root, BUCKETS_META + ".tmp")
    with open(tmp, "w") as f:
        f.write(str(n_buckets))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(root, BUCKETS_META))


def resolve_buckets(root: str, n_buckets: int | None) -> int:
    """The table's authoritative bucket count: the persisted metadata
    when present (an explicit conflicting argument raises rather than
    silently pruning/rewriting the wrong buckets), else the argument,
    else MERGE_BUCKETS. Tables created before bucket metadata existed
    get the resolved value persisted by the next merge."""
    import os

    stored = stored_buckets(root)
    if stored is not None:
        if n_buckets is not None and n_buckets != stored:
            raise ValueError(
                f"table {root} was bucketed with n_buckets={stored}; "
                f"caller passed {n_buckets} — reads/merges with a "
                "mismatched bucket count would corrupt the table"
            )
        return stored
    # metadata-less but PHYSICALLY bucketed (pre-metadata table): a
    # guessed count that differs from the physical one hashes updates
    # into the wrong _bkt directories, the anti-join prunes the wrong
    # buckets, and stale rows silently survive — refuse instead of
    # guessing; the operator must supply the creation-time count
    cur = current_version(root)
    if cur is not None and n_buckets is None:
        vdir = versioned_path(root, cur)
        if any(d.startswith("_bkt=") for d in os.listdir(vdir)):
            raise ValueError(
                f"table {root} is physically bucketed but has no "
                "bucket metadata (pre-metadata table); pass the "
                "creation-time n_buckets explicitly — a guessed "
                "default would merge against the wrong buckets"
            )
    return MERGE_BUCKETS if n_buckets is None else n_buckets


def merge_versioned(
    spark: SparkSession,
    root: str,
    updates: DataFrame,
    keys: list[str],
    n_buckets: int | None = None,
    meta: str | None = None,
) -> int:
    """MERGE-shaped upsert on a versioned table: rows in ``updates``
    replace current rows with equal ``keys`` (insert-or-update, the
    reference's Cassandra upsert semantics — Consumer.scala:59-66),
    committed as the next version with the atomic pointer swap.

    Bounded-work by construction, the property that matters at 100 TB:
    the table is hash-bucketed on the merge keys (``_bkt`` partition
    directories), so a merge (1) prunes the current-version scan to
    the buckets the updates touch, (2) rewrites ONLY those buckets
    (anti-join current ⋉̸ updates, union updates), and (3) carries
    every untouched bucket into the new version BY HARDLINK — zero
    data copied, the filesystem analogue of a Delta/Iceberg manifest
    referencing unchanged files from the previous snapshot (links
    share inodes, so vacuuming an old version never corrupts a newer
    one). Merge cost scales with touched data, not table size.

    ``updates`` must be unique per key (enforced via dropDuplicates).
    ``n_buckets`` is authoritative only at table CREATION; afterwards
    the count persisted in the ``_BUCKETS`` metadata file wins, and an
    explicit conflicting argument raises (see resolve_buckets) — a
    mismatched count would prune/rewrite the wrong buckets and leave
    stale rows alive. Returns the committed version number.
    """
    import os

    from pyspark.sql import functions as F

    n_buckets = resolve_buckets(root, n_buckets)
    bkt = F.pmod(F.xxhash64(*keys), F.lit(n_buckets)).cast("int")
    # the frame feeds THREE consumers (per-bucket census collect,
    # anti-join keyset, union write) but is deliberately NOT persisted:
    # Spark reuses a stage's shuffle outputs across jobs in a session,
    # so the expensive upstream map work (window dedup, LSH banding)
    # runs once and the re-derivations only replay the cheap
    # post-shuffle tail — measured: persisting COST ~35% on the ingest
    # composite (cache serialization of wide rows) with no win
    updates = updates.dropDuplicates(keys).withColumn("_bkt", bkt)
    return _merge_versioned_inner(
        spark, root, updates, keys, n_buckets, meta=meta
    )


def _merge_versioned_inner(
    spark: SparkSession,
    root: str,
    updates: DataFrame,
    keys: list[str],
    n_buckets: int,
    meta: str | None = None,
) -> int:
    import os

    from functools import reduce

    from pyspark.sql import functions as F

    cur = current_version(root)
    if cur is None:
        os.makedirs(root, exist_ok=True)
        v = 1
        # mode('overwrite') everywhere a version dir is written: a crash
        # between the data write and the pointer swap leaves an orphan
        # v=<n+1> dir, and the retry recomputes the SAME version number —
        # errorifexists would wedge the table permanently
        (
            updates.write.mode("overwrite")
            .partitionBy("_bkt")
            .parquet(versioned_path(root, v))
        )
    else:
        # one aggregate action yields the touched-bucket set AND the
        # update size: the collect is bounded by n_buckets rows (the
        # groupBy reduces first), independent of how large the update
        # batch is — no unbounded driver materialization
        per_bkt = updates.groupBy("_bkt").agg(F.count(F.lit(1)).alias("n")).collect()
        touched = sorted(r._bkt for r in per_bkt)
        n_update_rows = sum(r.n for r in per_bkt)
        current = spark.read.parquet(versioned_path(root, cur))
        # partition pruning: only touched bucket directories are read
        pruned = current.where(F.col("_bkt").isin(touched))
        # broadcast the update keyset only while it plausibly fits the
        # broadcast budget; a huge backfill batch falls back to a
        # planner-chosen (AQE) join — still pruned to touched buckets
        # NULL-SAFE key equality: a plain name-list join evaluates
        # NULL = NULL as NULL, so a stored NULL-key row would survive
        # the anti-join and every merge of a NULL-key update would
        # append a duplicate instead of upserting (dropDuplicates
        # above already groups NULLs together — the join must agree)
        upd_keys = updates.select(
            *[F.col(k).alias(f"_uk_{k}") for k in keys]
        )
        if n_update_rows <= BROADCAST_KEY_ROWS:
            upd_keys = F.broadcast(upd_keys)
        anti_cond = reduce(
            lambda a, b: a & b,
            [F.col(k).eqNullSafe(F.col(f"_uk_{k}")) for k in keys],
        )
        kept = pruned.join(upd_keys, anti_cond, "left_anti")
        merged = kept.unionByName(updates)
        v = cur + 1
        new_dir = versioned_path(root, v)
        # overwrite (static partition-overwrite truncates the whole dir)
        # clears any orphan left by a crash before the pointer swap, so
        # a retried merge cannot fail on 'path already exists' — and the
        # hardlink carry-forward below re-links into the fresh dir.
        # repartition by bucket first: each touched bucket lands from
        # ONE task -> one file per touched bucket per merge (the
        # union's cached+pruned legs otherwise fan out into a file per
        # task per bucket — cached scans are invisible to AQE
        # coalescing), keeping read fan-in minimal between compactions
        merged.repartition("_bkt").write.mode("overwrite").partitionBy(
            "_bkt"
        ).parquet(new_dir)
        # carry untouched buckets forward by reference (hardlink)
        old_dir = versioned_path(root, cur)
        for d in os.listdir(old_dir):
            if not d.startswith("_bkt="):
                continue
            if int(d.split("=", 1)[1]) in touched:
                continue
            os.makedirs(os.path.join(new_dir, d), exist_ok=True)
            for fname in os.listdir(os.path.join(old_dir, d)):
                if fname.startswith((".", "_")):
                    continue
                os.link(
                    os.path.join(old_dir, d, fname),
                    os.path.join(new_dir, d, fname),
                )
    # persist the bucket count with the table (idempotent; also
    # upgrades legacy tables in place) BEFORE the pointer swap, so a
    # reader never sees a committed version without its metadata
    _write_buckets(root, n_buckets)
    if meta is not None:
        _write_version_meta(root, v, meta)
    _commit_pointer(root, v)
    return v


def compact_versioned_bucketed(spark: SparkSession, root: str) -> tuple[int, int]:
    """Small-files compaction for ``merge_versioned`` tables — the
    steady-state maintenance a merge-append workload needs: every merge
    rewrites its touched buckets as fresh shuffle-partition-count file
    sets, so file fan-in per bucket grows with commit count until a
    rewrite coalesces it. Unlike ``compact_versioned`` (plain tables),
    this PRESERVES the ``_bkt=`` partition layout the merge path's
    pruning and hardlink carry-forward depend on — compacting a merge
    table with the plain variant would flatten the bucket directories
    and the next merge would silently drop every untouched bucket.
    One output file per bucket; committed as a new version via the
    atomic pointer swap (readers on the old version are untouched).
    Returns (files_before, files_after)."""
    from pyspark.sql import functions as F

    n_buckets = resolve_buckets(root, None)
    df = read_versioned(spark, root)
    files_before = df.select(F.input_file_name()).distinct().count()
    cur = current_version(root)
    v = cur + 1
    (
        # overwrite: heal an orphan v=<n+1> dir from a compaction that
        # crashed before its pointer swap (same retry contract as
        # write_versioned / merge_versioned)
        df.repartition(n_buckets, "_bkt")
        .write.mode("overwrite")
        .partitionBy("_bkt")
        .parquet(versioned_path(root, v))
    )
    _commit_pointer(root, v)
    after = spark.read.parquet(versioned_path(root, v))
    files_after = after.select(F.input_file_name()).distinct().count()
    return files_before, files_after


def zorder_column(cols: list[str], bits: int = 8):
    """Morton (Z-order) value interleaving the low ``bits`` of the
    pre-normalized integer columns ``_n0.._nk`` — bit i of dim d lands
    at position i*ndims + d, so files sorted by the result cluster in
    ALL dimensions at once."""
    from pyspark.sql import functions as F

    ndims = len(cols)
    terms = [
        f"(((_n{d} >> {i}) & 1) << {i * ndims + d})"
        for d in range(ndims)
        for i in range(bits)
    ]
    return F.expr(" + ".join(f"CAST({t} AS BIGINT)" for t in terms))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    n_files: int = 8,
) -> None:
    """Multi-dimension data-skipping layout: normalize each clustering
    column to [0, 2^bits), interleave into a Morton value, range-
    partition + sort files by it. Parquet min/max stats per file then
    stay NARROW in every clustering dimension simultaneously, so a
    conjunctive predicate over any of them prunes most files — the
    property a single-column sort only gives its own column (asserted
    in tests/test_zorder.py). Pure expressions end to end; the only
    extra pass is one min/max aggregate broadcast back as scalars."""
    from pyspark.sql import functions as F

    aggs = df.agg(
        *[F.min(c).alias(f"_min{i}") for i, c in enumerate(cols)],
        *[F.max(c).alias(f"_max{i}") for i, c in enumerate(cols)],
    )
    j = df.crossJoin(F.broadcast(aggs))
    top = (1 << bits) - 1
    for i, c in enumerate(cols):
        span = F.col(f"_max{i}") - F.col(f"_min{i}")
        norm = F.when(span == 0, F.lit(0)).otherwise(
            ((F.col(c) - F.col(f"_min{i}")) / span * top).cast("bigint")
        )
        j = j.withColumn(f"_n{i}", norm)
    j = j.withColumn("_z", zorder_column(cols, bits))
    (
        j.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z", *[f"_n{i}" for i in range(len(cols))],
              *[f"_min{i}" for i in range(len(cols))],
              *[f"_max{i}" for i in range(len(cols))])
        .write.mode("overwrite")
        .parquet(path)
    )


def create_bucketed_tables(
    spark: SparkSession,
    sf_dir: str,
    n_buckets: int = 8,
    prefix: str = "bkt",
) -> tuple[str, str]:
    """Persist orders and lineitem bucketed + sorted on the join key.
    Returns the two table names. Requires a session with a writable
    spark.sql.warehouse.dir (tests use a tmp dir)."""
    o_name, l_name = f"{prefix}_orders", f"{prefix}_lineitem"
    (
        load_table(spark, sf_dir, "orders")
        .write.mode("overwrite")
        .bucketBy(n_buckets, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable(o_name)
    )
    (
        load_table(spark, sf_dir, "lineitem")
        .write.mode("overwrite")
        .bucketBy(n_buckets, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable(l_name)
    )
    return o_name, l_name


def bucketed_join_revenue(spark: SparkSession, o_name: str, l_name: str) -> DataFrame:
    """orders⋈lineitem revenue per order status over the bucketed
    tables — co-located, so the plan contains no Exchange."""
    from pyspark.sql import functions as F

    o = spark.table(o_name)
    li = spark.table(l_name)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.round(F.sum(rev), 2).alias("revenue"))
    )
