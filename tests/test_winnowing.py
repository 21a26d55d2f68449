"""Winnowing fingerprint properties (text.py winnow_fingerprints):
determinism, locality under local edits, and sketch density."""

from __future__ import annotations

from pyspark.sql import functions as F

from lambda_sample_spark.operators.text import (
    WINNOW_W,
    winnow_fingerprints,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat "
    "watches from the warm windowsill in the afternoon sun light"
)


def _fps(spark, rows):
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = winnow_fingerprints(df).collect()
    by_doc: dict[int, set] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    return by_doc

def test_identical_docs_identical_fingerprints(spark):
    fps = _fps(spark, [(1, BASE), (2, BASE)])
    assert fps[1] == fps[2]
    assert len(fps[1]) > 0


def test_local_edit_preserves_most_fingerprints(spark):
    # winnowing's locality guarantee: an edit only perturbs
    # fingerprints whose k-grams overlap the edited span
    edited = BASE.replace("lazy dog", "bored dog")
    fps = _fps(spark, [(1, BASE), (2, edited)])
    overlap = len(fps[1] & fps[2]) / len(fps[1] | fps[2])
    assert overlap >= 0.6, overlap


def test_sketch_density(spark):
    # expected density 2/(w+1); allow generous slack both ways
    fps = _fps(spark, [(1, BASE)])
    n_grams = len(BASE) - 4
    density = len(fps[1]) / n_grams
    assert density <= 4.0 / (WINNOW_W + 1)
    assert density >= 0.5 / (WINNOW_W + 1)


def test_matches_reference_winnowing_exactly(spark):
    # Schleimer et al. winnowing = union of every w-window's minimum.
    # Recompute that set in plain Python from the same md5-word hashes
    # (hashlib — independent of the Spark expression) and require
    # exact agreement (catches trailing-window-only variants, which
    # break the >=1-fingerprint-per-window guarantee — the round-3
    # advice finding). Ties on h within a window resolve to the
    # leftmost pos in the operator; the fingerprint (h alone) is
    # unaffected, so plain min(h) is the correct reference.
    import hashlib

    from lambda_sample_spark.operators.text import WINNOW_K

    for text in [BASE, "tiny", BASE[:WINNOW_K + WINNOW_W - 2]]:
        grams = [
            text[i : i + WINNOW_K]
            for i in range(max(len(text) - WINNOW_K + 1, 1))
        ]
        hs = [
            int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in grams
        ]
        if len(hs) < WINNOW_W:
            expected = {min(hs)}
        else:
            expected = {
                min(hs[i : i + WINNOW_W]) for i in range(len(hs) - WINNOW_W + 1)
            }
        fps = _fps(spark, [(1, text)])
        assert fps[1] == expected, (text[:20], fps[1], expected)


def test_disjoint_docs_share_nothing(spark):
    fps = _fps(spark, [(1, "abcdefghijklmnopqrstuvwxyz"), (2, "0123456789012345678901234")])
    assert not (fps[1] & fps[2])


def test_containment_detects_shared_passage(spark):
    from lambda_sample_spark.operators.text import winnow_near_dup

    passage = (
        "it was the best of times it was the worst of times it was the "
        "age of wisdom it was the age of foolishness it was the epoch"
    )
    a = passage + " and then entirely different trailing content follows here"
    b = "completely unrelated opening words precede the stolen text " + passage
    c = "nothing in common with either document at all whatsoever truly"
    docs = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id BIGINT, text STRING"
    )
    pairs = winnow_near_dup(docs, min_shared=3, min_overlap=0.3).collect()
    found = {(r.d1, r.d2) for r in pairs}
    assert (1, 2) in found          # the shared passage is detected
    assert all(3 not in p for p in found)  # the unrelated doc never pairs
    row = next(r for r in pairs if (r.d1, r.d2) == (1, 2))
    assert row.containment >= 0.3 and row.n_shared >= 3
