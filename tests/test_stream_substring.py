"""Streaming substring scrub: two file-stream micro-batch waves over
the same index — cross-wave passages are caught on arrival, the sink
holds the scrubbed texts, and the batch-mode theorem carries over."""

from __future__ import annotations

import random
import string

from pyspark.sql import functions as F

from lambda_sample_spark.operators.substring import duplicated_spans
from lambda_sample_spark.streaming.substring_scrub import scrub_sink

SCHEMA = "doc_id bigint, text string"


def _rand_text(rng: random.Random, n: int) -> str:
    return "".join(rng.choice(string.ascii_letters + string.digits) for _ in range(n))


def test_stream_scrub_catches_cross_wave_passages(spark, tmp_path):
    rng = random.Random(31)
    passage = _rand_text(rng, 30)
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    idx = str(tmp_path / "idx")

    def run_wave(rows, tag):
        # ONE long-lived checkpoint across waves (the deployment
        # contract): each availableNow restart processes only files
        # that arrived since the last run
        spark.createDataFrame(rows, SCHEMA).write.mode("append").parquet(src)
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        q = scrub_sink(stream, idx, out, str(tmp_path / "ckpt"))
        q.awaitTermination(120)

    # wave 1: passage appears once (unique so far) + an unrelated doc
    w1 = [
        (1, _rand_text(rng, 40) + passage),
        (2, _rand_text(rng, 80)),
    ]
    run_wave(w1, "a")
    got1 = {
        r["doc_id"]: r["text"] for r in spark.read.parquet(out).collect()
    }
    assert got1[1] == w1[0][1]  # nothing scrubbed yet
    assert got1[2] == w1[1][1]

    # wave 2 (fresh checkpoint, same index — a new day's run): the
    # passage's second copy arrives and is excised on arrival
    pre = _rand_text(rng, 25)
    post = _rand_text(rng, 35)
    run_wave([(3, pre + passage + post)], "b")
    got2 = {
        r["doc_id"]: r["text"] for r in spark.read.parquet(out).collect()
    }
    assert got2[3] == pre + post
    # wave-1 sink rows are untouched (scrub-forward)
    assert got2[1] == w1[0][1]

    # the theorem carries over: the scrub_log across both waves equals
    # batch-mode spans over all docs restricted to later arrivals
    all_docs = spark.createDataFrame(
        w1 + [(3, pre + passage + post)], SCHEMA
    )
    full = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicated_spans(all_docs, gram_col="hash").collect()
    }
    logged = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in spark.read.parquet(f"{idx}/scrub_log/*").collect()
    }
    assert logged == {t for t in full if t[0] == 3}


def test_replayed_batch_does_not_double_count(spark, tmp_path):
    """Idempotence marker: re-delivering the same micro-batch id must
    not re-merge gram counts (a double-merge would make a UNIQUE
    passage look duplicated)."""
    from lambda_sample_spark.operators.incremental_substring import (
        _read_index,
    )
    from lambda_sample_spark.streaming.substring_scrub import scrub_sink

    rng = random.Random(77)
    passage = _rand_text(rng, 20)
    src = str(tmp_path / "src2")
    out = str(tmp_path / "out2")
    idx = str(tmp_path / "idx2")
    spark.createDataFrame(
        [(1, _rand_text(rng, 30) + passage)], SCHEMA
    ).write.parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    # same checkpoint run twice -> batch 0 replays on the second start
    for _ in range(2):
        q = scrub_sink(stream, idx, out, str(tmp_path / "ckpt2"))
        q.awaitTermination(120)
    gram_val = spark.range(1).select(F.xxhash64(F.lit(passage))).collect()[0][0]
    rows = _read_index(spark, idx).where(F.col("gram") == gram_val).collect()
    assert [r["cnt"] for r in rows] == [1]
