"""Benchmark harness: runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop sink (full computation, no
driver materialization) and run REPEATS times; the reported per-query
number is the MIN across repeats (the max travels alongside in
"queries_max" for transparency). Host interference on this box inflates
single runs by 1.4-2.7x; min-of-N is the reproducible statistic. The
flagship q_fast_anomaly time is the headline metric (BASELINE.md: the
reference's `GET /` recompute path); per-query times cover the wider
operator surface.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

HEADLINE = [
    "q_fast_anomaly",
    "q_recent_topk",
    "q_upsert_lww",
    "q_quantiles",
    "q_share_of_total",
    "q_lookup_join_left",
    "q_weighted_ensemble",
    "q_tpch_q1",
    "q_tpch_q3",
    "q_tpch_join_agg",
    "q_tpch_q6",
    "q_semi_anti_join",
    "q_outer_custdist",
    "q_asof_join",
    "q_sessionize",
    "q_moving_stats",
    "q_rollup_day",
    "q_distinct_users",
    "q_dedup_exact",
    "q_tpch_q14",
    "q_tpch_q18",
    "q_simhash",
    "q_multimodal_features",
    "q_ngram_jaccard",
    "q_dedup_near",
    "q_similarity_topk",
    "q_ann_lsh_topk",
    "q_text_stats",
    "q_json_codec",
    "q_winnowing",
    "q_vocab_topn",
    "q_semantic_dedup",
    "q_cms_heavy_hitters",
    "q_tpch_q5",
    "q_tpch_q4",
    "q_tpch_q19",
    "q_tpch_q7",
    "q_tpch_q10",
    "q_tpch_q17",
    "q_source_cap",
    "q_sampled_quantiles",
    "q_repetition_stats",
    "q_redact_pii",
    "q_range_join",
    "q_salted_agg",
    "q_unigram_logprob",
    "q_tpch_q2",
    "q_tpch_q21",
    "q_tpch_q8",
    "q_tpch_q9",
    "q_tpch_q12",
    "q_tpch_q11",
    "q_tpch_q15",
    "q_tpch_q16",
    "q_tpch_q20",
    "q_tpch_q22",
    "q_stratified_sample",
    "q_split_assign",
    "q_pack_documents",
    "q_contamination",
    "q_connected_components",
    "q_pq_adc_topk",
    "q_shard_order",
    "q_tfidf_topterms",
    "q_drift_psi",
]


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def bench_ingest_batch(spark, sf_dir: str) -> None:
    """Composite: the X14 steady-state ingest workflow end-to-end —
    commit half the corpus as the initial minhash index, then ingest
    the other half against it (match + fixpoint + merge + maintenance).
    A fresh index root per invocation keeps every repeat identical
    work; ingest_batch materializes its own outputs (scratch rounds +
    ingest log + index merge), so no extra force() is needed."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from lambda_sample_spark.io import load_table
    from lambda_sample_spark.operators import incremental_dedup as inc

    root = tempfile.mkdtemp(prefix="bench_mhidx_")
    try:
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        inc.ingest_batch(spark, root, docs.where(F.col("doc_id") % 2 == 0))
        inc.ingest_batch(spark, root, docs.where(F.col("doc_id") % 2 == 1))
    finally:
        shutil.rmtree(root, ignore_errors=True)


def bench_winnow_prod(spark, sf_dir: str) -> None:
    """Composite: the PRODUCTION winnowing path (vectorized numpy
    rolling hash, O(n) per doc) — q_winnowing in the HEADLINE is the
    md5 oracle-contract twin, which pays interpreted-HOF + O(n^2)
    substring extraction for DuckDB replayability; this trail records
    what real callers pay."""
    from lambda_sample_spark.io import load_table
    from lambda_sample_spark.operators.text import winnow_fingerprints_fast

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    force(winnow_fingerprints_fast(docs))


_STREAM_SRC: dict[str, str] = {}


def bench_stream_bottomk(spark, sf_dir: str) -> None:
    """Composite: the X10 speed layer end-to-end — stateful per-window
    bottom-k (streaming/stateful.py) over the FULL events table
    (100k rows at sf0.1) replayed as a file stream with an
    availableNow trigger to a parquet sink. The source parquet is
    staged once per process (the warmup sweep pays it); every measured
    repeat gets a fresh checkpoint + sink so the trigger does the
    complete stateful pass — events/s = table rows / this number."""
    import shutil
    import tempfile

    from lambda_sample_spark.io import load_table
    from lambda_sample_spark.streaming.stateful import stateful_windowed_bottomk

    src = _STREAM_SRC.get(sf_dir)
    if src is None:
        src = tempfile.mkdtemp(prefix="bench_stream_src_")
        load_table(spark, sf_dir, "events").select(
            "event_id", "event_type", "ts", "value"
        ).write.mode("overwrite").parquet(src)
        _STREAM_SRC[sf_dir] = src
    root = tempfile.mkdtemp(prefix="bench_stream_run_")
    try:
        stream = spark.readStream.schema(
            "event_id bigint, event_type string, ts timestamp, value double"
        ).parquet(src)
        q = (
            stateful_windowed_bottomk(stream)
            .writeStream.format("parquet")
            .option("path", f"{root}/out")
            .option("checkpointLocation", f"{root}/ckpt")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# non-contract composites timed alongside the HEADLINE queries (they
# drive their own materialization instead of a noop-sink force)
COMPOSITES = {
    "x_winnow_prod": bench_winnow_prod,
    "x_ingest_batch": bench_ingest_batch,
    "x_stream_bottomk": bench_stream_bottomk,
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from lambda_sample_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(app_name="lambda-sample-spark-bench")
    queries = entrymod.queries()
    bench_fns = {
        **{name: (lambda s, d, _q=queries[name]: force(_q(s, d))) for name in HEADLINE},
        **COMPOSITES,
    }
    names = list(bench_fns)

    # full warmup sweep (unmeasured): JIT/codegen compilation and
    # file-listing caches land here instead of inflating sweep 1
    for name in names:
        bench_fns[name](spark, sf_dir)

    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    # Interleave: sweep the whole HEADLINE list once per repeat instead of
    # running each query's repeats back-to-back. A transient host stall then
    # inflates at most one sweep's worth of samples per query, and min-of-N
    # rejects it; back-to-back repeats let a single stall poison all N
    # samples of one query (observed as phantom ±50% round-over-round moves
    # on zero-source-change diffs). Whole-PROCESS drift (every query
    # uniformly slower in one invocation — CPU frequency, page cache) is
    # not rejectable by any repeat scheme; sweep_totals/sweep_spread in the
    # output expose it so cross-round comparisons can be read accordingly.
    runs: dict[str, list[float]] = {name: [] for name in names}
    sweep_totals = []
    for _ in range(repeats):
        t_sweep = time.perf_counter()
        for name in names:
            t0 = time.perf_counter()
            bench_fns[name](spark, sf_dir)
            runs[name].append(time.perf_counter() - t0)
        sweep_totals.append(round(time.perf_counter() - t_sweep, 4))
    # 3 decimals (ms precision) on the stdout line: 62 headline
    # queries at 4 decimals measured 1818 chars — inside the 1900
    # assert but one promotion from breaking the driver's ~2000-char
    # tail capture; full 4-decimal numbers stay in bench_detail.json
    timings = {name: round(min(rs), 3) for name, rs in runs.items()}
    timings_max = {name: round(max(rs), 4) for name, rs in runs.items()}

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # The driver captures only the LAST ~2000 chars of stdout and
    # parses the JSON line it finds there (BENCH_r07 recorded
    # parsed:null because the line, grown past that window by
    # queries_max, was truncated at the head). So: stdout gets a
    # COMPACT line — metric/value/queries/sf plus small scalars — and
    # the full per-repeat detail (max times, sweep walls) goes to
    # bench_detail.json alongside this script.
    out = {
        "metric": "fast_anomaly_sec",
        "value": timings["q_fast_anomaly"],
        "unit": "sec",
        "queries": timings,
        "repeats": repeats,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf_dir,
        "total_sec": round(sum(timings.values()), 4),
        # host-noise indicator: spread of whole-sweep wall times within
        # this invocation (cross-invocation drift of ~1.3x has been
        # observed on this box with zero source change)
        "sweep_spread": round(max(sweep_totals) / max(min(sweep_totals), 1e-9), 3),
    }
    detail = dict(out, queries_max=timings_max, sweep_totals=sweep_totals)
    with open(Path(REPO) / "bench_detail.json", "w") as f:
        json.dump(detail, f, indent=1)
    line = json.dumps(out)
    # hard guard: never exceed the driver's capture window again
    assert len(line) < 1900, f"bench JSON line {len(line)} chars; slim it"
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
