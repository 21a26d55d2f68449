"""Video frame-hash near-dup: per-frame dHash pinned to the reference
spec, frame sampling, planted-near-copy recall, the stop-hash df cap,
the synthesize keystream pin, and the contract rows vs their DuckDB
oracles."""

from __future__ import annotations

import hashlib
import random
import struct

from lambda_sample_spark.operators.multimodal import encode_bmp
from lambda_sample_spark.operators.video import (
    ORACLE,
    q_video_frame_hashes,
    q_video_near_dup,
    synthesize_video_media,
    video_frame_hashes,
    video_near_dup,
)
from tests.conftest import SMOKE_SF_DIR
from tests.oracle_harness import compare, duckdb_con


def _py_dhash(w: int, h: int, rgb: bytes) -> int:
    """Independent reference dHash (the X43 spec, same as phash)."""

    def gray(j, k):
        p = (((j * h) // 8) * w + ((k * w) // 9)) * 3
        return rgb[p] + rgb[p + 1] + rgb[p + 2]

    hsh = 0
    for j in range(8):
        for k in range(8):
            if gray(j, k + 1) > gray(j, k):
                hsh |= 1 << (j * 8 + k)
    return hsh - (1 << 64) if hsh >= 1 << 63 else hsh


def _rawv(frames: list[bytes]) -> bytes:
    """Test-side RAWV container packer (length-prefixed BMP frames)."""
    return (
        b"RAWV"
        + struct.pack(">I", len(frames))
        + b"".join(struct.pack(">I", len(f)) + f for f in frames)
    )


def _media(spark, rows):
    """rows: (doc_id, [frame_rgb...], w, h)"""
    data = [
        (i, _rawv([encode_bmp(w, h, f) for f in frames]))
        for i, frames, w, h in rows
    ]
    return spark.createDataFrame(data, "doc_id bigint, payload binary")


def _rand_frame(rng, w, h):
    return bytes(rng.randrange(256) for _ in range(w * h * 3))


def test_frame_hashes_match_reference(spark):
    """Container parse + module BMP encode -> inline decode -> hash
    equals the reference dHash of the original pixels, per frame."""
    rng = random.Random(3)
    w, h = 11, 7
    frames = [_rand_frame(rng, w, h) for _ in range(3)]
    out = {
        (r["doc_id"], r["frame_idx"]): r["dhash"]
        for r in video_frame_hashes(
            _media(spark, [(1, frames, w, h)])
        ).collect()
    }
    assert out == {
        (1, f): _py_dhash(w, h, frames[f]) for f in range(3)
    }


def test_every_n_frame_sampling(spark):
    rng = random.Random(5)
    w, h = 8, 6
    frames = [_rand_frame(rng, w, h) for _ in range(5)]
    out = video_frame_hashes(
        _media(spark, [(1, frames, w, h)]), every_n=2
    ).collect()
    assert sorted(r["frame_idx"] for r in out) == [0, 2, 4]


def _pairs(spark, rows, **kw):
    per_video = (
        video_frame_hashes(_media(spark, rows))
        .select("doc_id", "dhash")
        .distinct()
    )
    return {
        (r["d1"], r["d2"]): r["shared_frames"]
        for r in video_near_dup(per_video, **kw).collect()
    }


def test_planted_near_copy_recall_and_unrelated_rejected(spark):
    """A copy with one re-shot frame shares 3 of 4 frame hashes and is
    found; an unrelated video shares none."""
    rng = random.Random(9)
    w, h = 10, 8
    base = [_rand_frame(rng, w, h) for _ in range(4)]
    near = list(base)
    near[0] = _rand_frame(rng, w, h)  # frame 0 re-shot
    far = [_rand_frame(rng, w, h) for _ in range(4)]
    pairs = _pairs(
        spark, [(1, base, w, h), (2, near, w, h), (3, far, w, h)]
    )
    assert pairs == {(1, 2): 3}


def test_stop_hash_cap_drops_corpus_wide_frame(spark):
    """Eight videos share one intro frame plus one unique frame each:
    with the df cap below 8 the intro hash is stopped and no pair
    qualifies; with the cap lifted all 28 intro-only pairs fan out —
    exactly the quadratic hot key the cap exists to kill."""
    rng = random.Random(17)
    w, h = 9, 7
    intro = _rand_frame(rng, w, h)
    rows = [
        (i, [intro, _rand_frame(rng, w, h)], w, h) for i in range(1, 9)
    ]
    assert _pairs(spark, rows, min_shared=1, max_df=5) == {}
    lifted = _pairs(spark, rows, min_shared=1, max_df=100)
    assert len(lifted) == 28 and set(lifted.values()) == {1}


def test_synthesized_payloads_decode_to_keystream(spark):
    """The inline encoder in synthesize_video_media is pinned to the
    module BMP decoder: every frame of a sampled payload decodes to
    exactly the frame-scoped keystream the oracle reconstructs."""
    from lambda_sample_spark.operators.multimodal import decode_bmp

    rows = (
        synthesize_video_media(spark, SMOKE_SF_DIR)
        .where("doc_id in (0, 2)")  # identity + perturbed near-copy
        .collect()
    )
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SMOKE_SF_DIR}/documents.parquet")
        .where("doc_id in (0, 2)")
        .collect()
    }

    def keystream(seed: str, frame: int, n: int, pert: bool) -> bytes:
        out = bytearray()
        block = 0
        while len(out) < n:
            if pert and frame == 0 and block == 0:
                key = seed + "#p0|0"
            else:
                key = seed + "#" + str(frame) + "|" + str(block)
            out += hashlib.md5(key.encode()).digest()
            block += 1
        return bytes(out[:n])

    assert len(rows) == 2
    for r in rows:
        doc_id = r["doc_id"]
        src = doc_id - 2 if doc_id % 10 == 2 else doc_id
        w, h = 4 + src % 13, 3 + src % 7
        nf = 4 + src % 4
        body = bytes(r["payload"])
        assert body[:4] == b"RAWV" and r["n_frames"] == nf
        (got_nf,) = struct.unpack(">I", body[4:8])
        assert got_nf == nf
        pos = 8
        for f in range(nf):
            (ln,) = struct.unpack(">I", body[pos : pos + 4])
            frame = body[pos + 4 : pos + 4 + ln]
            pos += 4 + ln
            dw, dh, rgb = decode_bmp(frame)
            assert (dw, dh) == (w, h)
            expect = keystream(docs[src], f, w * h * 3, doc_id % 10 == 2)
            assert rgb == expect, f"doc {doc_id} frame {f}"
        assert pos == len(body)


def test_contract_rows_vs_oracle(spark):
    con = duckdb_con(SMOKE_SF_DIR)
    for name, q in [
        ("q_video_frame_hashes", q_video_frame_hashes),
        ("q_video_near_dup", q_video_near_dup),
    ]:
        sdf = q(spark, SMOKE_SF_DIR)
        odf = con.execute(ORACLE[name]).fetchdf()
        assert compare(name, sdf, odf) == []
    # planted near-copies populate the pair row non-trivially
    assert q_video_near_dup(spark, SMOKE_SF_DIR).count() >= 40
