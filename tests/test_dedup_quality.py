"""Quality validation for the rows-only dedup ops: the driver gate
only checks that they run, so these tests pin their SEMANTICS against
exact-Jaccard ground truth (computed by the oracle-checked
ngram_jaccard) at sf0.001."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from lambda_sample_spark.operators.dedup import (
    dedup_near_minhash,
    ngram_jaccard,
    simhash,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def exact_pairs(spark):
    # ground truth: same-language token-set Jaccard >= 0.95 pairs
    return ngram_jaccard(spark, SF).collect()


def test_minhash_clusters_capture_exact_near_dups(spark, exact_pairs):
    assert len(exact_pairs) > 0
    rep = {r.doc_id: r.rep_id for r in dedup_near_minhash(spark, SF).collect()}
    same_cluster = sum(1 for p in exact_pairs if rep[p.d1] == rep[p.d2])
    recall = same_cluster / len(exact_pairs)
    # banding threshold ~0.77 << 0.95, so true near-dups should nearly
    # always collide in some band and share a representative
    assert recall >= 0.9, f"cluster recall {recall:.2f}"


def test_simhash_distance_separates_near_dups(spark, exact_pairs):
    sig = {r.doc_id: r.simhash for r in simhash(spark, SF).collect()}

    def hamming(a: int, b: int) -> int:
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    near = [hamming(sig[p.d1], sig[p.d2]) for p in exact_pairs]
    assert near, "no ground-truth pairs"
    # near-dup pairs: predominantly tiny Hamming distance (short docs
    # flip a few bits per changed token, so the tail isn't empty)
    assert sum(1 for d in near if d <= 8) / len(near) >= 0.7, near[:20]
    avg_near = sum(near) / len(near)

    # far cohort must be VERIFIED low-Jaccard: this corpus is near-dup
    # heavy (tiny shared vocabulary), so arbitrary pairs are not far.
    from lambda_sample_spark.operators.common import documents

    toksets = {
        r.doc_id: set(r.text.split())
        for r in documents(spark, SF).select("doc_id", "text").collect()
    }
    ids = sorted(sig)
    far = []
    for a, b in zip(ids[: len(ids) // 2], reversed(ids)):
        if a >= b:
            continue
        ta, tb = toksets[a], toksets[b]
        j = len(ta & tb) / len(ta | tb)
        if j <= 0.5:
            far.append(hamming(sig[a], sig[b]))
        if len(far) >= 100:
            break
    assert far, "no low-Jaccard pairs found"
    avg_far = sum(far) / len(far)
    # the separation that makes simhash a usable blocking key
    assert avg_far > 2 * avg_near, (avg_near, avg_far)


def test_approx_distinct_within_hll_error(spark):
    # HLL++ estimate vs exact, now folded into the contract output: the
    # query itself emits the exact count plus a within_pct boolean from
    # the pinned 2% bound (the estimate is cross-checked in-query, so
    # the DuckDB oracle can hash-match against its own sketch).
    from lambda_sample_spark.operators.multidim import (
        approx_distinct_users,
        distinct_users,
    )

    sf = "/root/testdata/sf0.01"
    exact = {r.event_type: r.n_users for r in distinct_users(spark, sf).collect()}
    rows = approx_distinct_users(spark, sf).collect()
    got = {r.event_type: (r.n_users_exact, r.within_pct) for r in rows}
    assert set(exact) == set(got)
    for et, n in exact.items():
        n_exact, within = got[et]
        assert n_exact == n, (et, n_exact, n)
        assert within is True, f"HLL estimate outside 2% for {et}"


def test_dedup_exact_keep_first_null_texts_pass_through(spark):
    # round-7 advice: md5(NULL) is NULL, so NULL-text rows used to
    # collapse into a single survivor; they must pass through unchanged
    from lambda_sample_spark.operators.dedup import dedup_exact_keep_first

    docs = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, None), (4, None), (5, "other")],
        "doc_id BIGINT, text STRING",
    )
    out = dedup_exact_keep_first(docs)
    ids = sorted(r.doc_id for r in out.collect())
    assert ids == [1, 3, 4, 5], ids
