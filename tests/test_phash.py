"""Perceptual-hash near-dup: planted-duplicate recall, the inline
codec twins pinned against the module codecs, the banding-exactness
guard, and the contract rows vs their DuckDB oracles."""

from __future__ import annotations

import hashlib
import random

import pytest

from lambda_sample_spark.operators.multimodal import encode_bmp, encode_png
from lambda_sample_spark.operators.phash import (
    ORACLE,
    dhash_images,
    phash_near_dup,
    q_image_dhash,
    q_image_phash_dedup,
    synthesize_phash_media,
)
from tests.conftest import SMOKE_SF_DIR
from tests.oracle_harness import compare, duckdb_con


def _py_dhash(w: int, h: int, rgb: bytes) -> int:
    """Independent reference dHash (same spec as the closure)."""
    def gray(j, k):
        p = (((j * h) // 8) * w + ((k * w) // 9)) * 3
        return rgb[p] + rgb[p + 1] + rgb[p + 2]

    hsh = 0
    for j in range(8):
        for k in range(8):
            if gray(j, k + 1) > gray(j, k):
                hsh |= 1 << (j * 8 + k)
    return hsh - (1 << 64) if hsh >= 1 << 63 else hsh


def _media(spark, rows):
    """rows: (doc_id, payload, (w, h, codec))"""
    data = [
        (i, p, {"modality": "image", "width": w, "height": h, "codec": c})
        for i, p, (w, h, c) in rows
    ]
    return spark.createDataFrame(
        data,
        "doc_id bigint, payload binary, "
        "meta struct<modality:string,width:int,height:int,codec:string>",
    )


def test_dhash_matches_reference_on_module_encoded_payloads(spark):
    """Module encoders (multimodal.encode_bmp/encode_png) -> inline
    decoders in dhash_images -> hash equals the reference dHash of the
    original pixels: pins the inline decode twins to the codecs."""
    rng = random.Random(3)
    w, h = 11, 7
    rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
    media = _media(
        spark,
        [
            (1, encode_bmp(w, h, rgb), (w, h, "image/bmp")),
            (2, encode_png(w, h, rgb), (w, h, "image/png")),
        ],
    )
    out = {r["doc_id"]: r["dhash"] for r in dhash_images(media).collect()}
    expect = _py_dhash(w, h, rgb)
    assert out == {1: expect, 2: expect}


def test_planted_near_copy_recall(spark):
    """A copy with one perturbed pixel is found; an unrelated image is
    not (random 64-bit dHashes sit at Hamming ~32)."""
    rng = random.Random(9)
    w, h = 16, 9
    base = bytearray(rng.randrange(256) for _ in range(w * h * 3))
    near = bytearray(base)
    near[0] = (near[0] + 128) % 256  # top-left pixel brightness flip
    far = bytes(rng.randrange(256) for _ in range(w * h * 3))
    media = _media(
        spark,
        [
            (1, encode_bmp(w, h, bytes(base)), (w, h, "image/bmp")),
            (2, encode_png(w, h, bytes(near)), (w, h, "image/png")),
            (3, encode_bmp(w, h, far), (w, h, "image/bmp")),
        ],
    )
    pairs = {
        (r["d1"], r["d2"]): r["hamming"]
        for r in phash_near_dup(dhash_images(media)).collect()
    }
    assert set(pairs) == {(1, 2)}
    assert pairs[(1, 2)] <= 7


def test_exact_copy_hamming_zero_across_codecs(spark):
    rng = random.Random(21)
    w, h = 9, 8
    rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
    media = _media(
        spark,
        [
            (1, encode_bmp(w, h, rgb), (w, h, "image/bmp")),
            (2, encode_png(w, h, rgb), (w, h, "image/png")),
        ],
    )
    pairs = phash_near_dup(dhash_images(media)).collect()
    assert [(r["d1"], r["d2"], r["hamming"]) for r in pairs] == [(1, 2, 0)]


def test_banding_guard_rejects_wide_radius(spark):
    media = _media(spark, [])
    with pytest.raises(ValueError, match="max_hamming"):
        phash_near_dup(dhash_images(media), max_hamming=8)


def test_synthesized_payloads_decode_to_keystream(spark):
    """The inline encoders in synthesize_phash_media are pinned to the
    module decoders: decoding a sampled payload yields exactly the
    keystream bytes the oracle reconstructs arithmetically."""
    from lambda_sample_spark.operators.multimodal import decode_bmp, decode_png

    rows = (
        synthesize_phash_media(spark, SMOKE_SF_DIR)
        .where("doc_id in (0, 2, 3, 4)")  # PNG, perturbed copy, BMPs
        .collect()
    )

    def keystream(seed: str, n: int, pert: bool) -> bytes:
        out = bytearray()
        block = 0
        while len(out) < n:
            key = seed + ("|p|0" if (pert and block == 0) else "|" + str(block))
            out += hashlib.md5(key.encode()).digest()
            block += 1
        return bytes(out[:n])

    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SMOKE_SF_DIR}/documents.parquet")
        .where("doc_id in (0, 2, 3, 4)")
        .collect()
    }
    assert len(rows) == 4
    for r in rows:
        doc_id = r["doc_id"]
        src = doc_id - 2 if doc_id % 10 == 2 else doc_id
        w, h = 4 + src % 13, 3 + src % 7
        expect = keystream(docs[src], w * h * 3, doc_id % 10 == 2)
        payload = bytes(r["payload"])
        dw, dh, rgb = (
            decode_png(payload) if doc_id % 4 == 0 else decode_bmp(payload)
        )
        assert (dw, dh) == (w, h)
        assert rgb == expect, f"doc {doc_id}: decoded pixels != keystream"


def test_contract_rows_vs_oracle(spark):
    con = duckdb_con(SMOKE_SF_DIR)
    for name, q in [
        ("q_image_dhash", q_image_dhash),
        ("q_image_phash_dedup", q_image_phash_dedup),
    ]:
        sdf = q(spark, SMOKE_SF_DIR)
        odf = con.execute(ORACLE[name]).fetchdf()
        assert compare(name, sdf, odf) == []
    # the pair row is non-trivially populated (planted near-copies)
    assert q_image_phash_dedup(spark, SMOKE_SF_DIR).count() > 10
