"""Incremental near-dup dedup against a persisted minhash index
(north star §2.8 X2 at steady state): the nightly-ingest workflow —
dedup a new batch against an already-ingested corpus WITHOUT
re-reading or re-minhashing the corpus, then commit the survivors'
signatures so the next batch sees them.

Composition of existing pieces: the md5/affine banded minhash from
``dedup.py`` (16 signature rows per doc) + the versioned table layer
from ``sources/warehouse.py`` (atomic pointer swap, bounded-work
merge). The index holds ONLY (doc_id, band, sig) — ~100 bytes/doc —
so the 100 TB corpus's index is ~TB-scale and the per-batch cost is:

  scan new batch (once)  ->  minhash it  ->  broadcast the batch's
  distinct (band, sig) keys  ->  hash-filter the index scan (left-semi
  against the broadcast: NO index shuffle, no corpus text touched)
  ->  one window over the touched buckets  ->  merge-append survivors.

Match semantics are the LSH banding criterion: a new doc duplicates a
kept doc iff they share a full band signature. Corpus docs take
precedence as representatives; within the batch the min doc_id wins,
and rep chains are pointer-jumped TO FIXPOINT so every flagged doc's
``rep_id`` is a doc that was actually kept (the ingest invariant —
dropped docs are deleted downstream, so a dangling rep would corrupt
lineage; ``dedup_near_minhash``'s fixed REP_ROUNDS is the batch
compromise this path cannot afford). Each jump round materializes to
a scratch directory — iterating on lineage alone doubles the plan per
round — and the final flags land in ``<index_root>/ingest_log/``, the
per-batch audit record a production pipeline keeps anyway. Doc ids
are assumed unique across the corpus + all batches.
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.warehouse import (
    compact_versioned_bucketed,
    merge_versioned,
    read_versioned,
    vacuum_versions,
)
from .dedup import _minhash_bands

INDEX_KEYS = ["doc_id", "band"]  # one row per doc per band
# steady-state maintenance cadence: every Nth committed version gets a
# bucket-preserving compaction (each merge rewrites its touched buckets
# as a fresh shuffle-sized file set, so per-bucket fan-in grows with
# commit count until coalesced); vacuum runs after every commit and
# keeps this many newest versions as the reader-retention window.
# VACUUM_KEEP >= COMPACT_EVERY on purpose: compaction commits a version
# too, so with a smaller retention window the vacuum after a compaction
# could drop the last pre-compaction version while a long-running
# reader (single-writer, many-reader is the layout's contract) is
# still mid-scan on it. With the window at least as wide as the
# compaction period, any version a reader resolved survives a full
# compaction cycle — readers must finish within VACUUM_KEEP commits of
# resolving a version, exactly the Delta/Iceberg VACUUM promise.
COMPACT_EVERY = 8
VACUUM_KEEP = 8


def minhash_bands_for(docs: DataFrame) -> DataFrame:
    """(doc_id, band, sig) for arbitrary input docs (doc_id, text)."""
    toks = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.trim("text"), r"[ \t\n\x0B\f\r]+"))).alias("tok"),
    )
    return _minhash_bands(toks)


def match_plan(
    spark: SparkSession,
    index_root: str,
    new_docs: DataFrame,
    bands: DataFrame | None = None,
) -> DataFrame:
    """The (lazy) matching core: one row per new doc with the round-0
    representative ``rep_id`` — a corpus doc when any bucket matches,
    else the min batch doc of its buckets. This is the plan to audit:
    the index branch must be a hash-filtered scan feeding the
    broadcast semi-join, never a shuffle. ``bands``: optionally pass
    the batch's precomputed (doc_id, band, sig) frame — ingest_batch
    materializes it once and shares it with the commit leg."""
    new_bands = bands if bands is not None else minhash_bands_for(new_docs)
    try:
        idx = read_versioned(spark, index_root).select("doc_id", "band", "sig")
    except FileNotFoundError:
        # day-one ingest: empty index with the BATCH's own schema, so
        # corpora whose doc_id is not bigint (string ids etc.) union
        # cleanly instead of failing or silently coercing
        idx = new_bands.select("doc_id", "band", "sig").limit(0)
    # touch only buckets the batch lands in; the batch's key set
    # (16 rows/doc) broadcasts, so the index branch is a hash-filtered
    # scan — zero index shuffle
    touched = idx.join(
        F.broadcast(new_bands.select("band", "sig").distinct()),
        ["band", "sig"],
        "left_semi",
    )
    # prec 0 = corpus (kept by definition), 1 = new: min struct(prec,
    # doc_id) per bucket elects a corpus doc when any matches
    u = touched.withColumn("prec", F.lit(0)).unionByName(
        new_bands.select("doc_id", "band", "sig").withColumn("prec", F.lit(1))
    )
    w = Window.partitionBy("band", "sig")
    return (
        u.withColumn("rk", F.min(F.struct("prec", "doc_id")).over(w))
        .where(F.col("prec") == 1)
        .groupBy("doc_id")
        .agg(F.min("rk").alias("rk"))
        .select("doc_id", F.col("rk.doc_id").alias("rep_id"))
    )


def ingest_batch(
    spark: SparkSession,
    index_root: str,
    new_docs: DataFrame,
    commit: bool = True,
    timings: dict | None = None,
) -> DataFrame:
    """Dedup ``new_docs`` against the index (and each other), then —
    with ``commit`` — merge the SURVIVORS' band signatures in as the
    next index version. Returns one row per new doc (materialized to
    ``<index_root>/ingest_log/batch=N``):
    ``doc_id, rep_id, is_near_dup`` — ``rep_id`` is the KEPT doc it
    duplicates (a corpus doc when one matches, else the surviving
    within-batch representative), or itself when kept.

    ``timings`` (optional): a dict the call fills with per-phase wall
    seconds (minhash / match / fixpoint / log_write / commit_merge /
    maintenance) — the bench harness passes one so the x_ingest_batch
    composite's cost lands on a leg instead of the whole composite
    (verdict-14 task 5). ``None`` skips all bookkeeping."""
    from math import ceil, log2

    t_prev = time.perf_counter()

    def mark(leg: str) -> None:
        nonlocal t_prev
        now = time.perf_counter()
        if timings is not None:
            timings[leg] = round(timings.get(leg, 0.0) + (now - t_prev), 4)
        t_prev = now

    scratch = os.path.join(index_root, "_ingest_scratch")
    shutil.rmtree(scratch, ignore_errors=True)
    os.makedirs(scratch)
    # minhash the batch ONCE: the match leg and the commit leg both
    # need the band signatures, and the 64 min-aggregates over the
    # batch's tokens are the dominant per-batch cost — materialize
    # them and make the second use a parquet re-read, not a second
    # minhash pass over the raw text
    bands_path = os.path.join(scratch, "bands")
    minhash_bands_for(new_docs).write.parquet(bands_path)
    bands = spark.read.parquet(bands_path)
    mark("minhash")
    rep0 = match_plan(spark, index_root, new_docs, bands=bands)
    # pointer-jump to fixpoint: a chain D -> C -> B -> A must resolve
    # every doc to the KEPT root A (min-propagation only strictly
    # decreases rep ids, so chains are acyclic and doubling converges
    # in ceil(log2(chain)) rounds). Rounds materialize to scratch
    # parquet — the rep frame is batch-sized and narrow, and
    # lineage-only iteration doubles the plan per round. Round-16:
    # each materialized round applies TWO jumps (jump² — both are
    # broadcast joins over the same batch-sized parquet, riding one
    # stage), and the per-row _chg flag records whether the SECOND
    # jump moved anything: _chg all-false means the first jump's
    # result was already the fixpoint, so the round that reaches the
    # fixpoint also CONFIRMS it — the previous shape (one jump per
    # round, _chg between rounds) paid a whole extra write+read+probe
    # round of pure confirmation on every call (this corpus's chains
    # resolve in one jump; a semi-join chain probe was also tried and
    # measured WORSE — the broadcast build per probe costs more than
    # the saved write). The probe stays an any-row scan of the
    # just-written parquet (limit(1).count() — footer stats + early
    # exit). The doubling bound ceil(log2(n)) backstops the loop
    # unchanged (jump² only converges faster). NOTE: do NOT "optimize"
    # the probe into a df.observe()/Observation metric — first use
    # initializes the session's lazy ObservationManager (Spark 4.1),
    # which is not serializable and breaks every later closure that
    # captures the session (e.g. MLlib training summaries) with "Task
    # not serializable".
    rep0.write.parquet(os.path.join(scratch, "r0"))
    cur = spark.read.parquet(os.path.join(scratch, "r0"))
    mark("match")
    n_batch = cur.count()  # metadata-only on freshly-written parquet
    max_rounds = max(1, ceil(log2(max(n_batch, 2))))
    r = 0
    while r < max_rounds:
        p1 = cur.select(
            F.col("doc_id").alias("p_doc"), F.col("rep_id").alias("p_rep")
        )
        j1 = cur.join(p1, cur.rep_id == p1.p_doc, "left").select(
            "doc_id", F.coalesce("p_rep", "rep_id").alias("rep1")
        )
        p2 = j1.select(
            F.col("doc_id").alias("q_doc"), F.col("rep1").alias("q_rep")
        )
        nxt = j1.join(p2, j1.rep1 == p2.q_doc, "left").select(
            "doc_id",
            F.coalesce("q_rep", "rep1").alias("rep_id"),
            (F.coalesce("q_rep", "rep1") != F.col("rep1")).alias("_chg"),
        )
        r += 1
        nxt.write.parquet(os.path.join(scratch, f"r{r}"))
        written = spark.read.parquet(os.path.join(scratch, f"r{r}"))
        changed = written.where(F.col("_chg")).limit(1).count()
        cur = written.select("doc_id", "rep_id")
        if changed == 0:
            break
    mark("fixpoint")
    flags = cur.withColumn(
        "is_near_dup", F.col("rep_id") != F.col("doc_id")
    )
    # the returned frame must outlive the scratch dir: persist it as
    # the batch's ingest-log record (the audit artifact a production
    # pipeline keeps), then drop the intermediate rounds
    log_dir = os.path.join(index_root, "ingest_log")
    os.makedirs(log_dir, exist_ok=True)
    batch_no = len(os.listdir(log_dir))
    final = os.path.join(log_dir, f"batch={batch_no}")
    flags.write.parquet(final)
    flags = spark.read.parquet(final)
    mark("log_write")
    if commit:
        survivors = flags.where(~F.col("is_near_dup")).select("doc_id")
        # the materialized bands again — no second minhash pass
        keep_bands = bands.join(survivors, "doc_id")
        v = merge_versioned(spark, index_root, keep_bands, INDEX_KEYS)
        mark("commit_merge")
        # steady-state maintenance, in the ingest loop itself so a
        # nightly pipeline gets it without a separate job: periodic
        # bucket-preserving compaction bounds read fan-in (file count
        # per bucket) regardless of how many batches have landed, and
        # vacuum bounds disk growth to the retention window (hardlinked
        # carry-forward files share inodes, so dropping an old version
        # never touches a newer one's data). Retention contract: the
        # vacuum window (VACUUM_KEEP, >= COMPACT_EVERY — see the
        # constants' comment) is the bound on how long a concurrent
        # reader may hold a resolved version.
        if v % COMPACT_EVERY == 0:
            compact_versioned_bucketed(spark, index_root)
        vacuum_versions(index_root, keep=VACUUM_KEEP)
        mark("maintenance")
    # scratch (rounds + bands) outlives the commit: the merge reads
    # the materialized bands
    shutil.rmtree(scratch, ignore_errors=True)
    return flags
