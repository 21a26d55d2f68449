"""Warehouse layout proofs: partition pruning on the partitioned entry
store; zero-Exchange co-located join on bucketed fact tables."""

from __future__ import annotations

import pytest

from lambda_sample_spark.plans.audit import simple_plan
from pyspark.sql import functions as F

from lambda_sample_spark.io import load_table
from lambda_sample_spark.plans import audit
from lambda_sample_spark.sources.warehouse import (
    bucketed_join_revenue,
    create_bucketed_tables,
    write_partitioned_entries,
)


def test_partitioned_store_prunes(spark, sf_dir, tmp_path):
    path = str(tmp_path / "entry_by_type")
    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("sensor"), "ts", "value"
    )
    write_partitioned_entries(ev, path)
    df = spark.read.parquet(path).where(F.col("sensor") == "click")
    plan = audit.formatted_plan(df)
    # partition pruning: the sensor predicate appears as a partition
    # filter on the scan, not a post-scan data filter
    assert "PartitionFilters" in plan and "sensor" in plan.split("PartitionFilters")[1].split("]")[0]
    got = df.select(F.count_distinct("sensor")).collect()[0][0]
    assert got == 1


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    o_name, l_name = create_bucketed_tables(spark, sf_dir, n_buckets=4)
    # disable auto-broadcast: at test SF orders fits the broadcast
    # threshold, but the bucketed path exists for the at-scale case
    # where NEITHER side is broadcastable
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = bucketed_join_revenue(spark, o_name, l_name)
        plan = audit.simple_plan(df)
        join_part = plan.split("HashAggregate")[-1]  # below the final agg
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        # the join itself consumes bucketed scans directly: no shuffle
        # between the join and either table scan
        assert "Exchange" not in join_part, plan
        # correctness: same result as the shuffled formulation
        sf = sf_dir
        o = load_table(spark, sf, "orders")
        li = load_table(spark, sf, "lineitem")
        rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
        expect = {
            r.o_orderstatus: r.revenue
            for r in li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderstatus")
            .agg(F.round(F.sum(rev), 2).alias("revenue"))
            .collect()
        }
        got = {r.o_orderstatus: r.revenue for r in df.collect()}
        assert got == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {o_name}")
        spark.sql(f"DROP TABLE IF EXISTS {l_name}")


def test_dynamic_partition_pruning_fires(spark, sf_dir, tmp_path):
    """DPP: joining the sensor-partitioned store to a FILTERED dim on
    the partition column injects a runtime subquery into the scan, so
    only the matching partition directories are read — the partition-
    key lookup the reference gets from Cassandra, recovered at the
    file layout level even when the keys come from another table."""
    from lambda_sample_spark.operators.common import events
    from lambda_sample_spark.sources.warehouse import write_partitioned_entries

    store = str(tmp_path / "entries_by_type")
    ev = events(spark, sf_dir).select(
        F.col("event_type").alias("sensor"), "ts", "value", "event_id"
    )
    write_partitioned_entries(ev, store)

    dim = spark.createDataFrame(
        [("click", 1.0), ("view", 0.0)], "sensor STRING, w DOUBLE"
    ).where(F.col("w") > 0)  # selective predicate on the filtering side
    fact = spark.read.parquet(store)
    saved = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.useStats", None)
    try:
        # test-sized tables defeat the cost heuristic; DPP itself is what
        # we're proving. Broadcast the DIM so the partitioned fact stays
        # the probe side (DPP reuses the dim's broadcast as the filter).
        spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
        joined = fact.join(F.broadcast(dim), "sensor").groupBy("sensor").count()
        joined.collect()  # drive THIS df's query execution
        plan = simple_plan(joined)
        assert "dynamicpruning" in plan.lower(), plan[:1500]
    finally:
        if saved is None:
            spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.useStats")
        else:
            spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", saved)


def test_versioned_commit_is_pointer_swap(spark, tmp_path):
    """write_versioned commits via an atomic _VERSION pointer: old
    version directories stay immutable and readable (a mid-query
    reader keeps its snapshot), vacuum honors retention and never
    drops the current version."""
    import os

    from lambda_sample_spark.sources.warehouse import (
        compact_versioned,
        current_version,
        read_versioned,
        vacuum_versions,
        versioned_path,
        write_versioned,
    )

    root = str(tmp_path / "vt")
    df1 = spark.range(100).withColumnRenamed("id", "k")
    assert write_versioned(df1, root) == 1
    assert current_version(root) == 1

    # a reader resolves v1 and holds its snapshot...
    reader = read_versioned(spark, root)

    # ...while a writer commits v2 (many tiny files, then compacted)
    df2 = spark.range(200).withColumnRenamed("id", "k").repartition(16)
    assert write_versioned(df2, root) == 2
    nb, na = compact_versioned(spark, root, sort_col="k")
    assert nb == 16 and na == 1
    assert current_version(root) == 3

    # the v1 snapshot still collects in full: commits never mutate it
    assert reader.count() == 100
    assert read_versioned(spark, root).count() == 200

    # pointer file contains exactly the version, no partial states
    with open(os.path.join(root, "_VERSION")) as f:
        assert f.read() == "3"

    # vacuum keeps the newest `keep` and never the current
    assert vacuum_versions(root, keep=2) == [1]
    assert os.path.isdir(versioned_path(root, 2))
    assert os.path.isdir(versioned_path(root, 3))
    assert not os.path.isdir(versioned_path(root, 1))
    assert read_versioned(spark, root).count() == 200


def test_merge_versioned_rewrites_only_touched_buckets(spark, tmp_path):
    """MERGE on the versioned store: updates replace rows by key, only
    the buckets the updates hash into are rewritten, untouched buckets
    are carried forward by hardlink (same inode), and vacuuming the
    old version never breaks the new one (links share inodes)."""
    import os

    from lambda_sample_spark.sources.warehouse import (
        merge_versioned,
        read_versioned,
        vacuum_versions,
        versioned_path,
    )

    root = str(tmp_path / "merged")
    base = spark.createDataFrame(
        [(k, 1.0) for k in range(100)], "k BIGINT, val DOUBLE"
    )
    assert merge_versioned(spark, root, base, keys=["k"]) == 1

    reader_v1 = read_versioned(spark, root)

    ups = spark.createDataFrame(
        [(k, 2.0) for k in (3, 7, 11, 13, 17)] + [(k, 9.0) for k in (200, 201, 202)],
        "k BIGINT, val DOUBLE",
    )
    assert merge_versioned(spark, root, ups, keys=["k"]) == 2

    got = {
        r.k: r.val for r in read_versioned(spark, root).select("k", "val").collect()
    }
    expect = {k: 1.0 for k in range(100)}
    expect.update({k: 2.0 for k in (3, 7, 11, 13, 17)})
    expect.update({k: 9.0 for k in (200, 201, 202)})
    assert got == expect

    # the v1 snapshot is untouched by the merge
    assert {r.k: r.val for r in reader_v1.select("k", "val").collect()} == {
        k: 1.0 for k in range(100)
    }

    # bucket directories: untouched ones share inodes with v1 (carried
    # by reference), touched ones are fresh files
    def inodes(vdir):
        out = {}
        for d in os.listdir(vdir):
            if d.startswith("_bkt="):
                out[d] = {
                    os.stat(os.path.join(vdir, d, f)).st_ino
                    for f in os.listdir(os.path.join(vdir, d))
                    if not f.startswith((".", "_"))
                }
        return out

    v1, v2 = inodes(versioned_path(root, 1)), inodes(versioned_path(root, 2))
    shared = [d for d in v2 if d in v1 and v2[d] == v1[d]]
    rewritten = [d for d in v2 if d not in v1 or not (v2[d] & v1[d])]
    assert shared, "expected some untouched buckets carried by hardlink"
    assert rewritten, "expected touched buckets to be rewritten"
    assert len(shared) + len(rewritten) == len(v2)

    # removing the old version leaves the new one fully readable
    assert vacuum_versions(root, keep=1) == [1]
    assert len(read_versioned(spark, root).collect()) == 103


def test_crashed_commit_is_healed_on_retry(spark, tmp_path):
    """A writer that crashes AFTER writing v=<n+1> but BEFORE the
    pointer swap leaves an orphan version directory; the retry computes
    the same version number, so every version-dir writer must use
    overwrite mode or the table wedges on 'path already exists'.
    Simulate the orphan for merge_versioned and
    compact_versioned_bucketed and check both retry clean."""
    import os
    import shutil

    from lambda_sample_spark.sources.warehouse import (
        compact_versioned_bucketed,
        current_version,
        merge_versioned,
        read_versioned,
        versioned_path,
    )

    root = str(tmp_path / "crashy")
    base = spark.createDataFrame(
        [(k, 1.0) for k in range(50)], "k BIGINT, val DOUBLE"
    )
    assert merge_versioned(spark, root, base, keys=["k"]) == 1

    # fake a crashed merge: v=2 exists (stale partial data) but the
    # pointer still names v=1
    orphan = versioned_path(root, 2)
    shutil.copytree(versioned_path(root, 1), orphan)
    assert current_version(root) == 1 and os.path.isdir(orphan)

    ups = spark.createDataFrame([(3, 2.0), (999, 9.0)], "k BIGINT, val DOUBLE")
    assert merge_versioned(spark, root, ups, keys=["k"]) == 2
    got = {r.k: r.val for r in read_versioned(spark, root).collect()}
    assert got[3] == 2.0 and got[999] == 9.0 and len(got) == 51

    # fake a crashed compaction the same way, then retry it
    orphan3 = versioned_path(root, 3)
    shutil.copytree(versioned_path(root, 2), orphan3)
    assert current_version(root) == 2
    compact_versioned_bucketed(spark, root)
    assert current_version(root) == 3
    assert {r.k: r.val for r in read_versioned(spark, root).collect()} == got


def test_diff_versions_change_feed(spark, tmp_path):
    from lambda_sample_spark.sources.warehouse import (
        diff_versions,
        write_versioned,
    )

    root = str(tmp_path / "tbl")
    v1 = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", None)],
        "k long, s string, v int",
    )
    write_versioned(v1, root)
    v2 = spark.createDataFrame(
        [(2, "b", 20), (3, "c", 99), (4, "d", 40)],
        "k long, s string, v int",
    )
    write_versioned(v2, root)

    got = {
        r["k"]: r["change"]
        for r in diff_versions(spark, root, 1, 2, keys=["k"]).collect()
    }
    # 1 removed, 2 unchanged (absent), 3 updated (NULL -> 99), 4 added
    assert got == {1: "removed", 3: "updated", 4: "added"}

    # null-position sentinel: swapping which column is NULL is a change
    a = spark.createDataFrame([(1, None, "x")], "k long, s string, t string")
    b = spark.createDataFrame([(1, "x", None)], "k long, s string, t string")
    root2 = str(tmp_path / "tbl2")
    write_versioned(a, root2)
    write_versioned(b, root2)
    rows = diff_versions(spark, root2, 1, 2, keys=["k"]).collect()
    assert [r["change"] for r in rows] == ["updated"]

    import pytest as _p

    root3 = str(tmp_path / "tbl3")
    write_versioned(v1, root3)
    write_versioned(v1.withColumnRenamed("v", "w"), root3)
    with _p.raises(ValueError, match="schema changed"):
        diff_versions(spark, root3, 1, 2, keys=["k"])
