"""Z-order layout: per-file min/max ranges stay narrow in BOTH
clustering dimensions (a single-column sort only narrows its own), so
conjunctive predicates prune files in every dimension."""

from __future__ import annotations

from pyspark.sql import functions as F

from lambda_sample_spark.operators.common import events
from lambda_sample_spark.sources.warehouse import write_zordered

N_FILES = 8


def _avg_file_extent(spark, path, col, global_span):
    per_file = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("f"))
        .agg((F.max(col) - F.min(col)).alias("ext"))
    )
    rows = per_file.collect()
    assert len(rows) >= N_FILES // 2  # range partitioner may merge a few
    return sum(float(r.ext) for r in rows) / len(rows) / global_span


def test_zorder_narrows_both_dimensions(spark, sf_dir, tmp_path):
    ev = events(spark, sf_dir).select("event_id", "user_id", "value")
    spans = ev.agg(
        (F.max("user_id") - F.min("user_id")).alias("su"),
        (F.max("value") - F.min("value")).alias("sv"),
    ).first()

    zpath = str(tmp_path / "zorder")
    write_zordered(ev, zpath, ["user_id", "value"], n_files=N_FILES)
    # baseline: classic single-column sort layout
    lpath = str(tmp_path / "linear")
    (
        ev.repartitionByRange(N_FILES, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    z_user = _avg_file_extent(spark, zpath, "user_id", spans.su)
    z_value = _avg_file_extent(spark, zpath, "value", spans.sv)
    l_value = _avg_file_extent(spark, lpath, "value", spans.sv)

    # z-order: BOTH dimensions materially narrower than global
    assert z_user < 0.75, z_user
    assert z_value < 0.75, z_value
    # and strictly better than the single-column sort on the
    # dimension that sort does NOT cluster
    assert z_value < l_value, (z_value, l_value)
    # and z-order loses no rows
    assert spark.read.parquet(zpath).count() == ev.count()


def test_compact_parquet_merges_small_files(spark, sf_dir, tmp_path):
    from lambda_sample_spark.sources.warehouse import compact_parquet

    ev = events(spark, sf_dir).select("event_id", "ts", "user_id", "value")
    path = str(tmp_path / "fragged")
    # simulate micro-batch accretion: many tiny appends
    for i in range(6):
        ev.where(F.col("event_id") % 6 == i).repartition(4).write.mode(
            "append"
        ).parquet(path)
    before_rows = spark.read.parquet(path).count()

    nb, na = compact_parquet(
        spark, path, sort_col="ts", target_rows_per_file=before_rows // 2
    )
    assert nb >= 20
    assert na <= 4
    after = spark.read.parquet(path)
    assert after.count() == before_rows
    assert after.exceptAll(ev).count() == 0 and ev.exceptAll(after).count() == 0
    # per-file sort re-established: each file's ts range is narrow
    spans = (
        after.groupBy(F.input_file_name())
        .agg((F.unix_millis(F.max("ts")) - F.unix_millis(F.min("ts"))).alias("ext"))
        .collect()
    )
    g = after.agg(
        (F.unix_millis(F.max("ts")) - F.unix_millis(F.min("ts"))).alias("g")
    ).first().g
    assert all(r.ext < 0.8 * g for r in spans)
