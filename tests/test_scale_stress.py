"""Empirical scale-stress for the heavy dedup/ANN/ingest operators
(the 100 TB linearity claims, executed instead of argued).

A deterministic inflater unions id-shifted, token-perturbed copies of
the sf0.01 corpus at two factors (10x and 40x — a 4x data ratio) and
measures each operator at both: wall time, SHUFFLE BYTES (read from
the executor summaries — noise-free, unlike wall time on a shared
host), and the operator-specific candidate counts. Quadratic behavior
at a 4x data ratio shows as ~16x growth; the assertions allow
generous linear slack (shuffle <= 1.75x linear, wall <= 3x linear)
and still fail any quadratic regression by a wide margin.

Copy classes per base doc (k = copy index, families of 8):
  k == 0        original
  k % 8 == 1    near-dup: one extra token (J = sz/(sz+1) >= 0.95 for
                sz >= 19 — ~75% of the corpus)
  k % 8 in 2,6  "long" PPJoin-regime member: orig tokens + 35 tokens
                salted by (doc, k//8) block + a unique marker — the
                two members of a block differ by exactly 2 tokens at
                sz ~ 60, the regime only the PPJoin branch handles;
                members of DIFFERENT blocks share only base tokens
                (their prefix tokens are the block-salted rares, so
                candidates stay within blocks — linear)
  else          far: all-unique tokens (corpus mass, no pairs)

Embedding copies: near = +0.13-scaled xxhash64-uniform noise
(cos ~ 0.86 vs the original, ~0.74 between two nears — straddling
the 0.8 stress threshold so only orig-near pairs qualify); far = pure
hash noise (|cos| < ~0.45 against everything — hash noise, NOT a
shared-frequency sinusoid, which would correlate every far copy with
every other).
"""

from __future__ import annotations

import os
import time

import pytest

from pyspark.sql import functions as F

from lambda_sample_spark.operators import incremental_dedup as inc
from lambda_sample_spark.operators import dedup, similarity
from lambda_sample_spark.operators.dedup import _ngram_sets, _ppjoin_candidates
from lambda_sample_spark.operators.similarity import as_double

BASE = "/root/testdata/sf0.01"
ID_OFF = 10_000_000
FACTORS = (10, 40)
RATIO = FACTORS[1] / FACTORS[0]  # 4x data growth between the two runs
SHUFFLE_SLACK = 1.75  # shuffle bytes may grow <= slack * linear
WALL_SLACK = 3.0  # wall time (noisy) may grow <= slack * linear


pytestmark = pytest.mark.slow  # live-service/load/scale tier (round-16 task 1)


def _shuffle_written(spark) -> int:
    """Total shuffle-write bytes this app, summed over executor
    summaries (local mode: the one driver-executor). Deltas around an
    action give that action's shuffle volume — the noise-free scale
    signal wall time isn't."""
    store = spark.sparkContext._jsc.sc().statusStore()
    execs = store.executorList(False)
    return sum(execs.apply(i).totalShuffleWrite() for i in range(execs.size()))


def _measure(spark, fn):
    t0 = time.perf_counter()
    s0 = _shuffle_written(spark)
    out = fn()
    wall = time.perf_counter() - t0
    time.sleep(0.8)  # the status store updates asynchronously
    return out, wall, _shuffle_written(spark) - s0


def _inflate_docs(spark, docs, factor):
    copies = spark.range(factor).select(F.col("id").alias("k"))
    inf = docs.crossJoin(copies)
    kmod = F.col("k") % 8
    block = F.floor(F.col("k") / 8)
    near_text = F.concat_ws(" ", "text", F.concat(F.lit("near"), F.col("k")))
    block_toks = [
        F.concat(F.lit("L"), F.col("doc_id"), F.lit("b"), block, F.lit("p"), F.lit(j))
        for j in range(35)
    ]
    long_text = F.concat_ws(" ", "text", *block_toks, F.concat(F.lit("m"), F.col("k")))
    far_toks = [
        F.concat(F.lit("u"), F.col("doc_id"), F.lit("k"), F.col("k"), F.lit("t"), F.lit(j))
        for j in range(24)
    ]
    far_text = F.concat_ws(" ", *far_toks)
    text2 = (
        F.when(F.col("k") == 0, F.col("text"))
        .when(kmod == 1, near_text)
        .when(kmod.isin(2, 6), long_text)
        .otherwise(far_text)
    )
    return inf.select(
        (F.col("doc_id") + F.col("k") * ID_OFF).alias("doc_id"),
        text2.alias("text"),
        "lang",
        "source",
        F.length(text2).alias("n_chars"),
    )


def _unoise(salt_col, scale):
    # deterministic per-element uniform noise in [-scale, scale]
    return F.transform(
        "embedding",
        lambda x, i: (
            (
                F.pmod(
                    F.xxhash64(F.concat_ws("_", F.col("vec_id"), salt_col, i)),
                    F.lit(2000001),
                )
                - 1000000
            )
            / 1000000.0
            * scale
        ),
    )


def _inflate_emb(spark, emb, factor):
    copies = spark.range(factor).select(F.col("id").alias("k"))
    inf = emb.crossJoin(copies)
    kmod = F.col("k") % 8
    near = F.zip_with("embedding", _unoise(F.col("k"), 0.13), lambda a, b: a + b)
    far = _unoise(F.col("k") + 1000, 0.2165)
    emb2 = (
        F.when(F.col("k") == 0, F.col("embedding"))
        .when(kmod == 1, near)
        .otherwise(far)
    )
    return inf.select(
        (F.col("vec_id") + F.col("k") * ID_OFF).alias("vec_id"),
        emb2.alias("embedding"),
        "label",
    )


@pytest.fixture(scope="module")
def stress_dirs(spark, tmp_path_factory):
    """Inflated corpora at both factors, written once per session."""
    root = tmp_path_factory.mktemp("stress")
    dirs = {}
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    for f in FACTORS:
        d = str(root / f"f{f}")
        os.makedirs(d)
        _inflate_docs(spark, docs, f).coalesce(4).write.parquet(
            f"{d}/documents.parquet"
        )
        _inflate_emb(spark, emb, f).coalesce(4).write.parquet(
            f"{d}/embeddings.parquet"
        )
        dirs[f] = d
    return dirs


def _assert_linear(name, walls, shuffles):
    w1, w2 = walls
    s1, s2 = shuffles
    assert s2 <= SHUFFLE_SLACK * RATIO * max(s1, 1), (
        f"{name}: shuffle bytes grew {s2 / max(s1, 1):.1f}x "
        f"on {RATIO:.0f}x data ({s1} -> {s2})"
    )
    assert w2 <= WALL_SLACK * RATIO * w1, (
        f"{name}: wall time grew {w2 / w1:.1f}x on {RATIO:.0f}x data "
        f"({w1:.1f}s -> {w2:.1f}s)"
    )


def test_ngram_jaccard_scale(spark, stress_dirs):
    dedup.ngram_jaccard(spark, BASE).count()  # warm codegen/JIT paths
    walls, shuffles, rows = [], [], []
    for f in FACTORS:
        n, w, s = _measure(
            spark, lambda: dedup.ngram_jaccard(spark, stress_dirs[f]).count()
        )
        walls.append(w)
        shuffles.append(s)
        rows.append(n)
    # output grows with the planted pairs (never shrinks, never explodes
    # quadratically: true pairs are linear in the factor by construction)
    assert rows[0] < rows[1] <= RATIO * 1.5 * rows[0], rows
    _assert_linear("ngram_jaccard", walls, shuffles)


def test_ppjoin_candidates_no_blowup(spark, stress_dirs):
    # the central PPJoin promise: candidates track TRUE pairs (the
    # block-salted rare tokens keep prefixes from colliding across
    # blocks), not corpus size squared. Planted truth: one qualifying
    # long-pair per (family, block) = 500 * ceil(f/8) set pairs.
    cands = {}
    for f in FACTORS:
        docs = spark.read.parquet(f"{stress_dirs[f]}/documents.parquet")
        _, groups = _ngram_sets(docs.select("doc_id", "lang", "text"))
        cands[f] = _ppjoin_candidates(groups).count()
    # a block only plants a pair when BOTH members (k = 8b+2, 8b+6) exist
    n_blocks = {
        f: len([b for b in range(-(-f // 8)) if 8 * b + 6 < f]) for f in FACTORS
    }
    for f in FACTORS:
        planted = 500 * n_blocks[f]
        assert cands[f] <= 2 * planted, (
            f"f={f}: {cands[f]} candidates vs {planted} planted pairs — "
            "prefix filter is leaking cross-block candidates"
        )
    growth = cands[FACTORS[1]] / max(cands[FACTORS[0]], 1)
    linear = n_blocks[FACTORS[1]] / n_blocks[FACTORS[0]]
    assert growth <= 1.5 * linear, (cands, growth, linear)


def test_dedup_near_minhash_scale(spark, stress_dirs):
    dedup.dedup_near_minhash(spark, BASE).count()  # warm
    walls, shuffles = [], []
    for f in FACTORS:
        n, w, s = _measure(
            spark,
            lambda: dedup.dedup_near_minhash(spark, stress_dirs[f]).count(),
        )
        assert n == 500 * f  # one row per doc, always
        walls.append(w)
        shuffles.append(s)
    _assert_linear("dedup_near_minhash", walls, shuffles)


def test_ann_lsh_scale(spark, stress_dirs):
    similarity.ann_lsh_topk(spark, BASE).count()  # warm
    walls, shuffles = [], []
    for f in FACTORS:
        n, w, s = _measure(
            spark, lambda: similarity.ann_lsh_topk(spark, stress_dirs[f]).count()
        )
        assert n == 50  # 5 probes x top-10 regardless of corpus size
        walls.append(w)
        shuffles.append(s)
    _assert_linear("ann_lsh_topk", walls, shuffles)
    # and the candidate budget stays constant-per-query at the big factor
    emb = spark.read.parquet(
        f"{stress_dirs[FACTORS[1]]}/embeddings.parquet"
    ).select("vec_id", as_double(F.col("embedding")).alias("vec"))
    n = emb.count()
    bits = similarity.lsh_bits_for(n)
    per_query = (
        similarity.ann_candidates(emb, bits)
        .groupBy("q_id")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    budget = (
        2
        * similarity.LSH_TABLES
        * (bits + 1)
        * similarity.LSH_TARGET_OCCUPANCY
    )
    assert per_query <= budget, (per_query, budget, n)


def test_embed_near_dup_fat_path_scale(spark, stress_dirs):
    # forced through the LSH fat path (fat_block_limit far below the
    # inflated label blocks) at a 0.8 threshold: only orig-near pairs
    # qualify, so truth is linear in the factor and every found pair
    # must be within a copy family.
    def run(f):
        emb = spark.read.parquet(f"{stress_dirs[f]}/embeddings.parquet").select(
            "vec_id", "label", as_double(F.col("embedding")).alias("vec")
        )
        return similarity.near_dup_pairs(emb, threshold=0.8, fat_block_limit=500)

    run(FACTORS[0]).count()  # warm the UDF/codegen paths once
    walls = []
    for f in FACTORS:
        rows, w, _ = _measure(spark, lambda: run(f).collect())
        walls.append(w)
        n_near = 500 * len([k for k in range(f) if k % 8 == 1])
        # >= 90% of planted orig-near pairs found (cos spread puts a few
        # under the threshold), and nothing outside a copy family
        assert 0.9 * n_near <= len(rows) <= 1.1 * n_near, (f, len(rows), n_near)
        assert all((r.v2 - r.v1) % ID_OFF == 0 for r in rows), "cross-family pair"
    assert walls[1] <= WALL_SLACK * RATIO * walls[0], walls


def test_ingest_batch_scale(spark, stress_dirs, tmp_path):
    # the X14 steady-state path end-to-end (minhash, index semi-join,
    # fixpoint rounds, merge commit, maintenance) at both factors
    walls = {}
    for f in FACTORS:
        docs = spark.read.parquet(f"{stress_dirs[f]}/documents.parquet").select(
            "doc_id", "text"
        )
        root = str(tmp_path / f"idx{f}")
        flags, w, _ = _measure(
            spark, lambda: inc.ingest_batch(spark, root, docs)
        )
        walls[f] = w
        flagged = {r.doc_id for r in flags.where("is_near_dup").collect()}
        # far copies (all-unique tokens) must never be flagged
        far_ks = {k for k in range(1, f) if k % 8 not in (1, 2, 6)}
        assert not any((d // ID_OFF) in far_ks for d in flagged), (
            "far copy flagged as near-dup"
        )
        # near copies of large-enough docs overwhelmingly flag (banding
        # S-curve at J ~ 0.96 collides almost surely)
        near_ks = [k for k in range(1, f) if k % 8 == 1]
        n_near = 500 * len(near_ks)
        n_near_flagged = sum(
            1 for d in flagged if (d // ID_OFF) in near_ks
        )
        assert n_near_flagged >= 0.7 * n_near, (n_near_flagged, n_near)
    assert walls[FACTORS[1]] <= WALL_SLACK * RATIO * walls[FACTORS[0]], walls
