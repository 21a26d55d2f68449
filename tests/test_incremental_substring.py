"""Incremental exact-substring dedup: the steady-state equivalence
theorem (batch-k spans == full recompute over all seen docs restricted
to batch k), scrub-forward semantics, the no-index-shuffle plan
invariant, and index-count bookkeeping."""

from __future__ import annotations

import random
import string

from pyspark.sql import functions as F

from lambda_sample_spark.operators.incremental_substring import (
    _read_index,
    batch_totals,
    scrub_batch,
)
from lambda_sample_spark.operators.substring import duplicated_spans
from lambda_sample_spark.plans.audit import simple_plan


def _rand_text(rng: random.Random, n: int) -> str:
    return "".join(rng.choice(string.ascii_letters + string.digits) for _ in range(n))


def _spans_set(df):
    return {
        (r["doc_id"], r["span_start"], r["span_end"]) for r in df.collect()
    }


def test_batchwise_equals_full_recompute(spark, tmp_path):
    """The theorem: after ingesting B1..Bk, batch k's flagged spans
    equal batch-mode duplicated_spans(B1 ∪ ... ∪ Bk) restricted to
    batch-k docs — on the real sf0.001 corpus, three batches."""
    root = str(tmp_path / "idx")
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    batches = [docs.where(F.col("doc_id") % 3 == i) for i in range(3)]
    seen = None
    for i, b in enumerate(batches):
        got = _spans_set(scrub_batch(spark, root, b))
        seen = b if seen is None else seen.unionByName(b)
        full = duplicated_spans(seen, min_len=20, gram_col="hash")
        batch_ids = {r["doc_id"] for r in b.select("doc_id").collect()}
        want = {
            t for t in _spans_set(full) if t[0] in batch_ids
        }
        assert got == want, f"batch {i}: {len(got)} vs {len(want)} spans"


def test_cross_batch_passage_flagged_forward_only(spark, tmp_path):
    rng = random.Random(5)
    passage = _rand_text(rng, 30)
    root = str(tmp_path / "idx2")
    b1 = spark.createDataFrame(
        [(1, _rand_text(rng, 40) + passage)], "doc_id bigint, text string"
    )
    b2 = spark.createDataFrame(
        [(2, passage + _rand_text(rng, 60))], "doc_id bigint, text string"
    )
    s1 = _spans_set(scrub_batch(spark, root, b1))
    assert s1 == set()  # first copy is unique so far
    s2 = _spans_set(scrub_batch(spark, root, b2))
    assert s2 == {(2, 1, 30)}  # second copy caught on arrival
    # scrub-forward: batch 1's audit log is immutable (no retro-flag)
    log1 = spark.read.parquet(f"{root}/scrub_log/batch=0")
    assert log1.count() == 0


def test_within_batch_dup_found_on_empty_index(spark, tmp_path):
    rng = random.Random(8)
    passage = _rand_text(rng, 25)
    root = str(tmp_path / "idx3")
    b = spark.createDataFrame(
        [
            (1, _rand_text(rng, 30) + passage),
            (2, passage + _rand_text(rng, 30)),
        ],
        "doc_id bigint, text string",
    )
    assert _spans_set(scrub_batch(spark, root, b)) == {
        (1, 31, 55),
        (2, 1, 25),
    }


def test_index_counts_accumulate_across_commits(spark, tmp_path):
    rng = random.Random(12)
    passage = _rand_text(rng, 20)  # exactly one gram
    root = str(tmp_path / "idx4")
    mk = lambda i, pre: spark.createDataFrame(
        [(i, pre + passage)], "doc_id bigint, text string"
    )
    scrub_batch(spark, root, mk(1, _rand_text(rng, 25)))
    scrub_batch(spark, root, mk(2, _rand_text(rng, 35)))
    scrub_batch(spark, root, mk(3, _rand_text(rng, 45)))
    gram = F.xxhash64(F.lit(passage))
    cnt = (
        _read_index(spark, root)
        .where(F.col("gram") == spark.range(1).select(gram).collect()[0][0])
        .collect()[0]["cnt"]
    )
    assert cnt == 3  # one occurrence per batch, summed across commits


def test_match_plan_never_shuffles_the_index(spark, tmp_path):
    """The no-index-shuffle invariant: the whole match subtree has
    ZERO hash-partitioning exchanges — the index enters via a
    broadcast semi-join, the hit set re-enters via broadcast."""
    rng = random.Random(3)
    root = str(tmp_path / "idx5")
    b1 = spark.createDataFrame(
        [(i, _rand_text(rng, 120)) for i in range(8)],
        "doc_id bigint, text string",
    )
    scrub_batch(spark, root, b1)  # commit a real index version
    bcnt = spark.createDataFrame(
        [(123456789, 2), (987654321, 1)], "gram bigint, bcnt bigint"
    )
    plan = simple_plan(batch_totals(spark, root, bcnt))
    assert plan.count("Exchange hashpartitioning") == 0, plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
