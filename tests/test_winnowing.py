"""Winnowing fingerprint properties (text.py winnow_fingerprints):
determinism, locality under local edits, and sketch density — for BOTH
gram hashes (xxhash64 production default, md5 oracle contract path);
the guarantees depend only on the window minimum, not on which uniform
hash supplies the values. Plus the loud-failure guard for docs whose
k-gram count would overflow the (hash, pos) pack."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from lambda_sample_spark.operators.text import (
    WINNOW_W,
    winnow_fingerprints,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat "
    "watches from the warm windowsill in the afternoon sun light"
)

HASHES = ["xxhash64", "md5", "fast", "md5_fast"]


def _fps(spark, rows, gram_hash="xxhash64"):
    from lambda_sample_spark.operators.text import (
        winnow_fingerprints_fast,
        winnow_fingerprints_md5_fast,
    )

    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    if gram_hash == "fast":
        out = winnow_fingerprints_fast(df).collect()
    elif gram_hash == "md5_fast":
        out = winnow_fingerprints_md5_fast(df).collect()
    else:
        out = winnow_fingerprints(df, gram_hash=gram_hash).collect()
    by_doc: dict[int, set] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    return by_doc


@pytest.mark.parametrize("gram_hash", HASHES)
def test_identical_docs_identical_fingerprints(spark, gram_hash):
    fps = _fps(spark, [(1, BASE), (2, BASE)], gram_hash)
    assert fps[1] == fps[2]
    assert len(fps[1]) > 0


@pytest.mark.parametrize("gram_hash", HASHES)
def test_local_edit_preserves_most_fingerprints(spark, gram_hash):
    # winnowing's locality guarantee: an edit only perturbs
    # fingerprints whose k-grams overlap the edited span
    edited = BASE.replace("lazy dog", "bored dog")
    fps = _fps(spark, [(1, BASE), (2, edited)], gram_hash)
    overlap = len(fps[1] & fps[2]) / len(fps[1] | fps[2])
    assert overlap >= 0.6, overlap


@pytest.mark.parametrize("gram_hash", HASHES)
def test_sketch_density(spark, gram_hash):
    # expected density 2/(w+1); allow generous slack both ways
    fps = _fps(spark, [(1, BASE)], gram_hash)
    n_grams = len(BASE) - 4
    density = len(fps[1]) / n_grams
    assert density <= 4.0 / (WINNOW_W + 1)
    assert density >= 0.5 / (WINNOW_W + 1)


@pytest.mark.parametrize("gram_hash", HASHES)
def test_shared_passage_guarantees_shared_fingerprint(spark, gram_hash):
    # THE winnowing guarantee (Schleimer et al. thm 1): any shared
    # substring of length >= w + k - 1 yields >= 1 shared fingerprint,
    # whatever hash function supplies the gram values
    passage = "zqvxkjwpfmg bhtrydncsl"  # >= w + k - 1 chars
    a = "leading filler text before " + passage + " and one tail"
    b = passage + " with a totally different continuation afterwards"
    fps = _fps(spark, [(1, a), (2, b)], gram_hash)
    assert fps[1] & fps[2], gram_hash


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
        fps = _fps(spark, [(1, text)], gram_hash="md5")
        assert fps[1] == expected, (text[:20], fps[1], expected)


def test_hash_variants_agree_on_selected_positions_shape(spark):
    # the two hashes pick different minima, but both must produce a
    # non-empty sketch over the same docs with comparable density
    fx = _fps(spark, [(1, BASE)], "xxhash64")
    fm = _fps(spark, [(1, BASE)], "md5")
    assert fx[1] and fm[1]
    assert abs(len(fx[1]) - len(fm[1])) <= max(len(fx[1]), len(fm[1])) // 2 + 2


@pytest.mark.parametrize("gram_hash", HASHES)
def test_disjoint_docs_share_nothing(spark, gram_hash):
    fps = _fps(
        spark,
        [(1, "abcdefghijklmnopqrstuvwxyz"), (2, "0123456789012345678901234")],
        gram_hash,
    )
    assert not (fps[1] & fps[2])


@pytest.mark.parametrize("gram_hash", HASHES)
def test_containment_detects_shared_passage(spark, gram_hash):
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
    pairs = winnow_near_dup(
        docs, min_shared=3, min_overlap=0.3, gram_hash=gram_hash
    ).collect()
    found = {(r.d1, r.d2) for r in pairs}
    assert (1, 2) in found          # the shared passage is detected
    assert all(3 not in p for p in found)  # the unrelated doc never pairs
    row = next(r for r in pairs if (r.d1, r.d2) == (1, 2))
    assert row.containment >= 0.3 and row.n_shared >= 3


def test_overlong_doc_fails_loudly(spark):
    # a doc with >= 2^20 k-grams would spill pos into hash bits and
    # silently corrupt the window-min order; the guard must raise
    # instead of fingerprinting incorrectly. The raise is cheap: the
    # assert sits in the sequence BOUND, evaluated before any gram is
    # hashed (no million-substring array is ever built).
    from lambda_sample_spark.operators.text import WINNOW_K, _WINNOW_POS_BITS

    too_long = "x" * ((1 << _WINNOW_POS_BITS) + WINNOW_K - 1)
    df_bad = spark.createDataFrame([(1, too_long)], "doc_id BIGINT, text STRING")
    with pytest.raises(Exception, match="winnowing"):
        winnow_fingerprints(df_bad).collect()


def test_guard_boundary(spark, monkeypatch):
    # boundary semantics, tested at a shrunk pack width (pack=2^6) so
    # the pass side stays O(small): exactly pack-1 grams fingerprints
    # fine, exactly pack grams raises. (Computing the real 2^20-gram
    # boundary doc is quadratic in Spark's UTF8String.substring — the
    # cap also protects against that.)
    import lambda_sample_spark.operators.text as text_mod

    monkeypatch.setattr(text_mod, "_WINNOW_POS_BITS", 6)
    pack = 1 << 6
    k = text_mod.WINNOW_K
    ok = "x" * ((pack - 1) + k - 1)       # pack-1 grams: under the cap
    bad = "x" * (pack + k - 1)            # pack grams: at the cap
    df_ok = spark.createDataFrame([(1, ok)], "doc_id BIGINT, text STRING")
    df_bad = spark.createDataFrame([(1, bad)], "doc_id BIGINT, text STRING")
    assert text_mod.winnow_fingerprints(df_ok).count() == 1  # all grams equal
    with pytest.raises(Exception, match="winnowing"):
        text_mod.winnow_fingerprints(df_bad).collect()


def _fast_reference(text, k, w, pos_bits, mask_bits, base):
    # pure-Python twin of the fast path's hash + winnowing (plain ints
    # mod 2^64 — independent of numpy vectorization)
    M = 1 << 64
    cs = [ord(ch) for ch in text]
    n = max(len(cs) - k + 1, 1)
    hs = []
    for i in range(n):
        g = 0
        for ch in cs[i : i + k]:
            g = (g * base + ch) % M
        z = (g + 0x9E3779B97F4A7C15) % M
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) % M
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) % M
        z = z ^ (z >> 31)
        hs.append(z & ((1 << mask_bits) - 1))
    packed = [(h << pos_bits) | i for i, h in enumerate(hs)]
    if len(packed) < w:
        mins = {min(packed)}
    else:
        mins = {min(packed[i : i + w]) for i in range(len(packed) - w + 1)}
    return {m >> pos_bits for m in mins}


def test_fast_matches_pure_python_reference(spark):
    from lambda_sample_spark.operators.text import (
        WINNOW_K,
        _FAST_B,
        _WINNOW_POS_BITS,
        _XXH_MASK_BITS,
    )

    for text in [BASE, "tiny", "", BASE[: WINNOW_K + WINNOW_W - 2]]:
        expected = _fast_reference(
            text, WINNOW_K, WINNOW_W, _WINNOW_POS_BITS, _XXH_MASK_BITS, _FAST_B
        )
        got = _fps(spark, [(1, text)], "fast")
        assert got[1] == expected, (text[:20], got[1], expected)


def test_md5_fast_bit_equals_expression_path(spark):
    """The vectorized exact-md5 kernel (the round-14 q_winnowing
    contract engine) must equal the interpreted expression path
    FINGERPRINT-FOR-FINGERPRINT — that is what keeps the DuckDB oracle
    seam intact. Adversarial rows: multibyte utf-8 (2/3/4-byte
    codepoints inside grams), shorter-than-k docs, empty text, NULL
    text, duplicate grams."""
    from lambda_sample_spark.operators.text import (
        winnow_fingerprints_md5_fast,
    )

    rows = [
        (1, BASE),
        (2, "tiny"),
        (3, ""),
        (4, None),
        (5, "héllo wörld ünïcode tèxt"),
        (6, "日本語のテキストです、これは実験"),
        (7, "mixed 日本 ascii ünd 𝕌nicode 𝔽ancy"),  # 4-byte astral chars
        (8, "aaaaaaaaaaaaaaaaaaaaaa"),  # duplicate grams, min ties
        (9, BASE + " " + BASE),  # shared passages with doc 1
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    want = sorted(
        (r.doc_id, r.fp) for r in winnow_fingerprints(df, "md5").collect()
    )
    got = sorted(
        (r.doc_id, r.fp)
        for r in winnow_fingerprints_md5_fast(df).collect()
    )
    assert got == want

    # and on the real corpus
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    want = sorted(
        (r.doc_id, r.fp) for r in winnow_fingerprints(docs, "md5").collect()
    )
    got = sorted(
        (r.doc_id, r.fp)
        for r in winnow_fingerprints_md5_fast(docs).collect()
    )
    assert got == want


def test_md5_fast_overlong_doc_fails_loudly(spark):
    from lambda_sample_spark.operators.text import (
        WINNOW_K,
        _WINNOW_POS_BITS,
        winnow_fingerprints_md5_fast,
    )

    too_long = "x" * ((1 << _WINNOW_POS_BITS) + WINNOW_K - 1)
    df = spark.createDataFrame([(1, too_long)], "doc_id BIGINT, text STRING")
    with pytest.raises(Exception, match="winnowing"):
        winnow_fingerprints_md5_fast(df).collect()


def test_fast_overlong_doc_fails_loudly(spark):
    from lambda_sample_spark.operators.text import (
        WINNOW_K,
        _WINNOW_POS_BITS,
        winnow_fingerprints_fast,
    )

    too_long = "x" * ((1 << _WINNOW_POS_BITS) + WINNOW_K - 1)
    df = spark.createDataFrame([(1, too_long)], "doc_id BIGINT, text STRING")
    with pytest.raises(Exception, match="winnowing"):
        winnow_fingerprints_fast(df).collect()


def test_stop_cap_switches_from_fractional_to_absolute():
    from lambda_sample_spark.operators.text import _stop_cap

    # below the switch point (n < abs/frac) the fractional cap rules
    assert _stop_cap(500, 0.1, 500) == 50       # sf0.01 contract value
    assert _stop_cap(5_000, 0.1, 500) == 500    # the switch point
    # past it the ABSOLUTE bound holds: per-fingerprint join work is
    # constant no matter how big the corpus gets
    assert _stop_cap(50_000, 0.1, 500) == 500
    assert _stop_cap(10_000_000, 0.1, 500) == 500
    # floor of 2 on tiny corpora; None+None disables
    assert _stop_cap(10, 0.1, 500) == 2
    assert _stop_cap(10**9, None, None) is None
    # single-sided configurations
    assert _stop_cap(50_000, None, 500) == 500
    assert _stop_cap(50_000, 0.1, None) == 5_000


def test_contract_row_grades_the_scale_closed_cap(spark):
    """Since round 14 q_winnow_near_dup grades the library-default
    stop cap max(2, min(trunc(0.1·n), 500)) and its oracle mirrors it
    (the r13 verdict's scale-killer fix: the pure-fractional shape
    admitted 0.1·n-doc fingerprints and OOMed at sf10). Below the
    5k-doc switch point the capped and pure-fractional shapes
    coincide, so the frozen small-SF hashes were unchanged by the
    fold — pinned here at sf0.001."""
    from lambda_sample_spark.operators.common import documents
    from lambda_sample_spark.operators.text import ORACLE, winnow_near_dup

    sql = ORACLE["q_winnow_near_dup"]
    assert "least" in sql and "500" in sql  # the absolute bound is graded
    docs = documents(spark, "/root/testdata/sf0.001")
    a = sorted(map(tuple, winnow_near_dup(docs, gram_hash="md5").collect()))
    b = sorted(
        map(
            tuple,
            winnow_near_dup(docs, gram_hash="md5", max_df_abs=None).collect(),
        )
    )
    assert a == b
