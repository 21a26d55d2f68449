"""Crash-recovery property tests for the versioned stores (round-11
verdict task #4): kill each commit between its data write and its
pointer swap, re-open, and assert (a) the store serves the OLD version
intact, (b) a retry converges to the correct new state, (c) a reader
that resolved a snapshot before a concurrent commit keeps it. Plus the
streaming-scrub replay window (ADVICE round 10): a crash between the
scrubbed-output write and the gram-count merge must converge on
replay without double-counting or duplicate output."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from lambda_sample_spark.sources import warehouse as W


pytestmark = pytest.mark.slow  # live-service/load/scale tier (round-16 task 1)


class Boom(RuntimeError):
    pass


def _crash_pointer_once(monkeypatch):
    """Make the NEXT pointer swap crash (after data is on disk, before
    the pointer moves), then restore normal behavior."""
    real = W._commit_pointer
    state = {"armed": True}

    def wrapper(root, v):
        if state["armed"]:
            state["armed"] = False
            raise Boom("crash before pointer swap")
        real(root, v)

    monkeypatch.setattr(W, "_commit_pointer", wrapper)
    return state


# ---------------------------------------------------------------- merge


def test_merge_crash_before_swap_serves_old_version(spark, tmp_path, monkeypatch):
    root = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(i, i * 10) for i in range(20)], "k BIGINT, v BIGINT"
    )
    W.merge_versioned(spark, root, base, keys=["k"], n_buckets=4)
    upd = spark.createDataFrame([(3, 999), (77, 1)], "k BIGINT, v BIGINT")

    _crash_pointer_once(monkeypatch)
    with pytest.raises(Boom):
        W.merge_versioned(spark, root, upd, keys=["k"])
    # re-open: the old version is served intact (the orphan v=2 dir is
    # invisible — the pointer never moved)
    assert W.current_version(root) == 1
    got = {r.k: r.v for r in W.read_versioned(spark, root).collect()}
    assert got == {i: i * 10 for i in range(20)}
    # retry converges: same version number, merged rows, no duplicates
    v = W.merge_versioned(spark, root, upd, keys=["k"])
    assert v == 2
    got = {r.k: r.v for r in W.read_versioned(spark, root).collect()}
    want = {i: i * 10 for i in range(20)} | {3: 999, 77: 1}
    assert got == want
    n = W.read_versioned(spark, root).count()
    assert n == len(want)


def test_reader_snapshot_survives_concurrent_merge(spark, tmp_path):
    root = str(tmp_path / "tbl2")
    base = spark.createDataFrame(
        [(i, 0) for i in range(10)], "k BIGINT, v BIGINT"
    )
    W.merge_versioned(spark, root, base, keys=["k"], n_buckets=4)
    # reader resolves the pointer now (lazy frame over v=1)...
    snap = W.read_versioned(spark, root)
    # ...a writer commits v=2 (touching every bucket) mid-lifetime...
    upd = spark.createDataFrame(
        [(i, 1) for i in range(10)], "k BIGINT, v BIGINT"
    )
    W.merge_versioned(spark, root, upd, keys=["k"])
    # ...and the reader still collects its own consistent snapshot
    assert sorted(r.v for r in snap.collect()) == [0] * 10
    assert sorted(r.v for r in W.read_versioned(spark, root).collect()) == [1] * 10


def test_version_meta_rides_the_commit(spark, tmp_path, monkeypatch):
    root = str(tmp_path / "tbl3")
    df = spark.createDataFrame([(1, 1)], "k BIGINT, v BIGINT")
    assert W.version_meta(root) is None
    W.merge_versioned(spark, root, df, keys=["k"], n_buckets=2, meta="run:0")
    assert W.version_meta(root) == "run:0"
    # a crashed commit never exposes its meta: the pointer still names
    # the old version, whose meta is unchanged
    _crash_pointer_once(monkeypatch)
    with pytest.raises(Boom):
        W.merge_versioned(spark, root, df, keys=["k"], meta="run:1")
    assert W.version_meta(root) == "run:0"
    W.merge_versioned(spark, root, df, keys=["k"], meta="run:1")
    assert W.version_meta(root) == "run:1"
    # write_versioned carries meta too; versions without meta read None
    root2 = str(tmp_path / "tbl4")
    W.write_versioned(df, root2, meta="m1")
    assert W.version_meta(root2) == "m1"
    W.write_versioned(df, root2)
    assert W.version_meta(root2) is None


# ------------------------------------------------------------- nb model


def _nb_fixture(spark):
    rows = [
        (i, ("good text quality fine " if i % 2 == 0 else "bad spam junk ") * 3, i % 2)
        for i in range(40)
    ]
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING, y BIGINT")


def test_nb_commit_crash_is_atomic_across_all_four_tables(
    spark, tmp_path, monkeypatch
):
    from lambda_sample_spark.operators import classifier as C

    docs = _nb_fixture(spark)
    model_dir = str(tmp_path / "model")
    b1 = docs.where(F.col("doc_id") < 20)
    b2 = docs.where(F.col("doc_id") >= 20)
    C.nb_commit(spark, model_dir, *C.nb_census(b1, F.col("y") == 1, n=1))
    w1, c1 = C.load_nb_model(spark, model_dir)
    w1_rows = {r.bucket: r.w for r in w1.collect()}
    c1_rows = c1.collect()

    # crash the update between the four table writes and the swap: the
    # single model-level pointer means the reader can never see new
    # weights with old consts
    _crash_pointer_once(monkeypatch)
    with pytest.raises(Boom):
        C.nb_update(spark, model_dir, b2, F.col("y") == 1, n=1)
    assert W.current_version(model_dir) == 1
    w_after, c_after = C.load_nb_model(spark, model_dir)
    assert {r.bucket: r.w for r in w_after.collect()} == w1_rows
    assert c_after.collect() == c1_rows

    # retry converges to the full-retrain model bit-for-bit
    C.nb_update(spark, model_dir, b2, F.col("y") == 1, n=1)
    assert W.current_version(model_dir) == 2
    ref_dir = str(tmp_path / "ref_model")
    C.nb_commit(spark, ref_dir, *C.nb_census(docs, F.col("y") == 1, n=1))
    w_inc, c_inc = C.load_nb_model(spark, model_dir)
    w_ref, c_ref = C.load_nb_model(spark, ref_dir)
    key = lambda r: r.bucket  # noqa: E731
    assert sorted(w_inc.collect(), key=key) == sorted(w_ref.collect(), key=key)
    assert c_inc.collect() == c_ref.collect()


# ---------------------------------------------------------------- ivfpq


@pytest.fixture(scope="module")
def small_index(spark, tmp_path_factory):
    import numpy as np

    from lambda_sample_spark.operators.pq import ivfpq_write_index

    rng = np.random.default_rng(7)
    pts = rng.normal(size=(400, 16))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(pts)],
        "vec_id BIGINT, vec ARRAY<DOUBLE>",
    )
    path = str(tmp_path_factory.mktemp("ivfpq") / "idx")
    ivfpq_write_index(emb, path, n=400, m=4, ks=16)

    def batch(id_base: int, k: int):
        return spark.createDataFrame(
            [
                (id_base + i, [float(x) for x in row])
                for i, row in enumerate(pts[:k])
            ],
            "vec_id BIGINT, vec ARRAY<DOUBLE>",
        )

    return path, batch


def _cells_count(spark, path):
    return spark.read.parquet(f"{path}/cells").count()


def test_ivfpq_append_replay_is_idempotent(spark, small_index):
    from lambda_sample_spark.operators.pq import ivfpq_append_index

    path, batch = small_index
    new = batch(10_000, 25)
    base = _cells_count(spark, path)
    ivfpq_append_index(new, path, batch_token="night-1")
    after = _cells_count(spark, path)
    assert after == base + 25
    # full replay (orchestrator retry after the marker landed): no-op
    ivfpq_append_index(new, path, batch_token="night-1")
    assert _cells_count(spark, path) == after
    ids = [
        r.vec_id
        for r in spark.read.parquet(f"{path}/cells")
        .where(F.col("vec_id").between(10_000, 10_024))
        .collect()
    ]
    assert len(ids) == len(set(ids)) == 25


def test_ivfpq_append_crash_mid_publish_converges(spark, small_index, monkeypatch):
    # crash window: scratch staged (+_SUCCESS), SOME files hardlinked,
    # marker NOT written. The retry must reuse the staged files (not
    # restage — part filenames are per-attempt UUIDs), skip the links
    # that landed, finish the rest, and stamp the marker.
    from lambda_sample_spark.operators.pq import ivfpq_append_index

    path, mk = small_index
    base = _cells_count(spark, path)
    batch = mk(20_000, 10)
    real_link = os.link
    calls = {"n": 0}

    def flaky_link(src, dst, *a, **kw):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise Boom("crash mid-publish")
        return real_link(src, dst, *a, **kw)

    monkeypatch.setattr(os, "link", flaky_link)
    with pytest.raises(Boom):
        ivfpq_append_index(batch, path, batch_token="night-2")
    monkeypatch.setattr(os, "link", real_link)
    assert not os.path.exists(os.path.join(path, "_appended", "night-2"))
    assert os.path.exists(
        os.path.join(path, "_append_scratch", "night-2", "_SUCCESS")
    )
    ivfpq_append_index(batch, path, batch_token="night-2")
    assert os.path.exists(os.path.join(path, "_appended", "night-2"))
    after = _cells_count(spark, path)
    assert after == base + 10
    rows = (
        spark.read.parquet(f"{path}/cells")
        .where(F.col("vec_id").between(20_000, 20_009))
        .collect()
    )
    ids = [r.vec_id for r in rows]
    assert len(ids) == len(set(ids)) == 10


def test_ivfpq_append_crash_mid_stage_converges(spark, small_index):
    # crash window: scratch partially written, no _SUCCESS — the retry
    # restages (overwrite) and publishes exactly once
    from lambda_sample_spark.operators.pq import ivfpq_append_index

    path, mk = small_index
    base = _cells_count(spark, path)
    scratch = os.path.join(path, "_append_scratch", "night-3")
    os.makedirs(os.path.join(scratch, "cluster=0"), exist_ok=True)
    with open(os.path.join(scratch, "cluster=0", "part-junk.parquet"), "w") as f:
        f.write("partial garbage from a dead attempt")
    ivfpq_append_index(mk(30_000, 5), path, batch_token="night-3")
    assert _cells_count(spark, path) == base + 5


# ------------------------------------------------------ streaming scrub


def test_scrub_crash_between_output_and_merge_converges(spark, tmp_path):
    from lambda_sample_spark.operators.incremental_substring import (
        _read_index,
        scrub_batch,
    )
    from lambda_sample_spark.operators.substring import remove_dup_spans
    from lambda_sample_spark.streaming.substring_scrub import batch_committed

    import random
    import string

    idx = str(tmp_path / "idx")
    out = str(tmp_path / "out" / "batch=0")
    rng = random.Random(5)

    def rand(n):
        return "".join(rng.choice(string.ascii_letters) for _ in range(n))

    passage = rand(25)  # above min_len=20; shared by both docs
    pre1, post2 = rand(30), rand(30)
    docs = spark.createDataFrame(
        [(1, pre1 + passage), (2, passage + post2)],
        "doc_id BIGINT, text STRING",
    )
    counts_root = os.path.join(idx, "gram_counts")

    def write_then_crash(spans):
        remove_dup_spans(docs, spans).write.mode("overwrite").parquet(out)
        raise Boom("crash between output write and index merge")

    with pytest.raises(Boom):
        scrub_batch(
            spark, idx, docs, log_label="t-0", commit_meta="t:0",
            pre_commit=write_then_crash,
        )
    # the merge never landed: no committed index, marker says so
    assert W.current_version(counts_root) is None
    assert not batch_committed(counts_root, "t", 0)

    # replay: same batch against the UNCHANGED index — same spans, the
    # output overwrites in place, the merge lands with its marker
    def write_output(spans):
        remove_dup_spans(docs, spans).write.mode("overwrite").parquet(out)

    scrub_batch(
        spark, idx, docs, log_label="t-0", commit_meta="t:0",
        pre_commit=write_output,
    )
    assert batch_committed(counts_root, "t", 0)
    # gram counts are the single-merge truth (no double count): the
    # passage gram seen twice counts 2, and re-reading shows exactly
    # one output row per doc with the passage excised from both
    got = {r.doc_id: r.text for r in spark.read.parquet(out).collect()}
    assert got == {1: pre1, 2: post2}
    mx = _read_index(spark, idx).agg(F.max("cnt")).collect()[0][0]
    assert mx == 2  # a double merge would read 4
    # scrub_log holds ONE partition for the batch (the labeled
    # overwrite), not an appended pair
    log_dirs = os.listdir(os.path.join(idx, "scrub_log"))
    assert log_dirs == ["batch=t-0"]


def test_two_writer_scrub_interleaving_no_double_merge(
    spark, tmp_path, monkeypatch
):
    """Round-12 verdict task #8 — the adversarial multi-writer leg:
    two scrub_batch writers share one gram index; writer A crashes in
    the commit window (merged version dir + its meta on disk, pointer
    NOT swapped), writer B then runs to completion on the same index,
    and A replays. Required properties: B's first-version overwrite
    heals A's orphan (including A's stale _COMMIT_META — B's commit
    must not inherit it), A's replay is NOT skipped (its merge never
    landed), the replayed merge lands exactly once (a double merge
    would double A's gram counts), and the history scan answers both
    writers' skip checks even though only the newest version's meta
    names A."""
    import random
    import string

    from lambda_sample_spark.operators.incremental_substring import (
        _read_index,
        scrub_batch,
    )
    from lambda_sample_spark.streaming.substring_scrub import batch_committed

    idx = str(tmp_path / "idx")
    counts_root = os.path.join(idx, "gram_counts")
    rng = random.Random(9)

    def rand(n):
        return "".join(rng.choice(string.ascii_letters) for _ in range(n))

    passage = rand(25)  # above min_len=20, shared across the writers
    docs_a = spark.createDataFrame(
        [(1, rand(30) + passage)], "doc_id BIGINT, text STRING"
    )
    docs_b = spark.createDataFrame(
        [(2, passage + rand(30))], "doc_id BIGINT, text STRING"
    )

    # writer A: crash between the version write (data + meta) and the
    # pointer swap — the only seam between "merged" and "committed"
    _crash_pointer_once(monkeypatch)
    with pytest.raises(Boom):
        scrub_batch(spark, idx, docs_a, log_label="a-0", commit_meta="a:0")
    assert W.current_version(counts_root) is None
    assert not batch_committed(counts_root, "a", 0)
    # the orphan dir holds A's meta — uncommitted, so invisible
    assert W.version_meta(counts_root, 1) == "a:0"

    # writer B interleaves on the same index and commits cleanly: its
    # create-branch overwrite clears A's orphan (data AND meta)
    scrub_batch(spark, idx, docs_b, log_label="b-0", commit_meta="b:0")
    assert W.current_version(counts_root) == 1
    assert W.version_meta(counts_root, 1) == "b:0"
    assert batch_committed(counts_root, "b", 0)
    assert not batch_committed(counts_root, "a", 0)

    # A replays against the index as B left it; the passage is now its
    # second sighting, so the replayed batch flags it as a dup span
    spans = scrub_batch(
        spark, idx, docs_a, log_label="a-0", commit_meta="a:0"
    )
    assert spans.count() == 1
    assert W.current_version(counts_root) == 2
    # history scan: both writers' skip checks answer True even though
    # the CURRENT version's meta only names A
    assert batch_committed(counts_root, "a", 0)
    assert batch_committed(counts_root, "b", 0)

    # single-merge truth: the shared passage gram was seen once per
    # writer -> cnt 2; a double-merged A replay would read 3
    mx = _read_index(spark, idx).agg(F.max("cnt")).collect()[0][0]
    assert mx == 2
    # one scrub_log partition per writer (labeled overwrite, no growth)
    assert sorted(os.listdir(os.path.join(idx, "scrub_log"))) == [
        "batch=a-0",
        "batch=b-0",
    ]
