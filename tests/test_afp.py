"""Audio perceptual fingerprint near-dup: planted-duplicate recall
over real WAV payloads, the inline codec twins pinned against the
module codecs, and the contract rows vs their DuckDB oracles."""

from __future__ import annotations

import hashlib
import random
import struct

from lambda_sample_spark.operators.afp import (
    ORACLE,
    audio_fingerprints,
    q_audio_fingerprint,
    q_audio_near_dup,
    synthesize_afp_media,
)
from lambda_sample_spark.operators.multimodal import decode_wav, encode_wav
from lambda_sample_spark.operators.phash import phash_near_dup
from tests.conftest import SMOKE_SF_DIR
from tests.oracle_harness import compare, duckdb_con


def _py_fp(samples: list[int]) -> int:
    fl = len(samples) // 65
    e = [sum(abs(samples[i * fl + k]) for k in range(fl)) for i in range(65)]
    h = 0
    for i in range(64):
        if e[i + 1] > e[i]:
            h |= 1 << i
    return h - (1 << 64) if h >= 1 << 63 else h


def _media(spark, rows):
    data = [
        (i, encode_wav(8000, s),
         {"modality": "audio", "width": 0, "height": 0, "codec": "audio/wav"})
        for i, s in rows
    ]
    return spark.createDataFrame(
        data,
        "doc_id bigint, payload binary, "
        "meta struct<modality:string,width:int,height:int,codec:string>",
    )


def test_fingerprint_matches_reference_on_module_encoded_wav(spark):
    rng = random.Random(4)
    samples = [rng.randrange(-32768, 32768) for _ in range(65 * 3)]
    out = {
        r["doc_id"]: r["fp"]
        for r in audio_fingerprints(_media(spark, [(1, samples)])).collect()
    }
    assert out == {1: _py_fp(samples)}


def test_planted_near_copy_recall_and_unrelated_rejected(spark):
    rng = random.Random(10)
    base = [rng.randrange(-32768, 32768) for _ in range(65 * 4)]
    near = list(base)
    near[0] = -near[0]  # one-sample edit -> frame 0 energy shifts
    far = [rng.randrange(-32768, 32768) for _ in range(65 * 4)]
    media = _media(spark, [(1, base), (2, near), (3, far)])
    pairs = {
        (r["d1"], r["d2"]): r["hamming"]
        for r in phash_near_dup(
            audio_fingerprints(media), hash_col="fp"
        ).collect()
    }
    assert set(pairs) == {(1, 2)}
    assert pairs[(1, 2)] <= 7


def test_synthesized_payloads_decode_to_keystream_samples(spark):
    """Inline enc_wav twin pinned to the module decoder: decoding a
    sampled payload yields exactly the keystream-derived waveform the
    oracle reconstructs arithmetically."""
    rows = (
        synthesize_afp_media(spark, SMOKE_SF_DIR)
        .where("doc_id in (0, 2)")
        .collect()
    )
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SMOKE_SF_DIR}/documents.parquet")
        .where("doc_id in (0, 2)")
        .collect()
    }

    def keystream(seed, n, pert):
        out = bytearray()
        b = 0
        while len(out) < n:
            key = seed + ("|p|0" if (pert and b == 0) else "|" + str(b))
            out += hashlib.md5(key.encode()).digest()
            b += 1
        return bytes(out[:n])

    for r in rows:
        doc_id = r["doc_id"]
        src = doc_id - 2 if doc_id % 10 == 2 else doc_id
        fl = (200 + src % 120) // 65
        n = 65 * fl
        raw = keystream(docs[src], 2 * n, doc_id % 10 == 2)
        expect = list(struct.unpack(f"<{n}h", raw))
        rate, got = decode_wav(bytes(r["payload"]))
        assert rate == 8000 and got == expect, f"doc {doc_id}"


def test_contract_rows_vs_oracle(spark):
    con = duckdb_con(SMOKE_SF_DIR)
    for name, q in [
        ("q_audio_fingerprint", q_audio_fingerprint),
        ("q_audio_near_dup", q_audio_near_dup),
    ]:
        sdf = q(spark, SMOKE_SF_DIR)
        odf = con.execute(ORACLE[name]).fetchdf()
        assert compare(name, sdf, odf) == []
    assert q_audio_near_dup(spark, SMOKE_SF_DIR).count() >= 40
