"""Resize / frame-sample plumbing over binary media columns
(operators/multimodal.py — decode cores stubbed, Spark plumbing real)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lambda_sample_spark.operators.multimodal import (
    resize_images,
    sample_frames,
    synthesize_media,
)

SF = "/root/testdata/sf0.001"


def test_resize_bounds_dims_and_keeps_schema(spark):
    media = synthesize_media(spark, SF)
    out = resize_images(media, max_side=100)
    # schema carried through (modulo nullability, which DDL strings
    # default to nullable)
    assert out.schema.simpleString() == media.schema.simpleString()
    rows = out.select("doc_id", "meta.width", "meta.height").collect()
    assert rows
    assert all(r.width <= 100 and r.height <= 100 for r in rows)
    assert all(r.width >= 1 and r.height >= 1 for r in rows)
    # deterministic: same input -> same output
    again = {r.doc_id: (r.width, r.height) for r in
             resize_images(media, max_side=100).select("doc_id", "meta.width", "meta.height").collect()}
    assert all(again[r.doc_id] == (r.width, r.height) for r in rows)


def test_resize_preserves_aspect_ratio(spark):
    media = synthesize_media(spark, SF).where(
        (F.col("meta.width") > 100) & (F.col("meta.height") > 100)
    )
    joined = (
        media.select("doc_id", F.col("meta.width").alias("w0"), F.col("meta.height").alias("h0"))
        .join(
            resize_images(media, max_side=100).select(
                "doc_id", F.col("meta.width").alias("w1"), F.col("meta.height").alias("h1")
            ),
            "doc_id",
        )
    )
    for r in joined.collect():
        if r.w0 >= 8 and r.h0 >= 8:  # integer floor noise on tiny dims
            assert abs(r.w1 / r.h1 - r.w0 / r.h0) / (r.w0 / r.h0) < 0.35


def test_frame_sampling_fans_out_rows(spark):
    media = synthesize_media(spark, SF)
    frames = sample_frames(media, every_n=2, frame_bytes=32)
    per_doc = frames.groupBy("doc_id").agg(
        F.count("*").alias("n"), F.min("frame_idx").alias("first_idx")
    )
    docs = media.count()
    rows = per_doc.collect()
    assert len(rows) == docs
    assert all(r.first_idx == 0 for r in rows)
    # stride honored: indices are multiples of every_n
    bad = frames.where(F.col("frame_idx") % 2 != 0).count()
    assert bad == 0
    # frames are bounded slices
    sizes = frames.select(F.length("frame").alias("sz")).agg(F.max("sz")).first()[0]
    assert sizes <= 32


# ---------------------------------------------------------------------------
# round-8: real decode (BMP/WAV) — verdict item 4


def test_bmp_roundtrip_including_padded_widths():
    from lambda_sample_spark.operators.multimodal import decode_bmp, encode_bmp

    for w, h in [(4, 3), (5, 2), (7, 1), (1, 1)]:  # 5,7: rows need padding
        rgb = bytes((i * 37 + 11) % 256 for i in range(w * h * 3))
        payload = encode_bmp(w, h, rgb)
        assert decode_bmp(payload) == (w, h, rgb), (w, h)


def test_wav_roundtrip_and_chunk_walk():
    import struct

    from lambda_sample_spark.operators.multimodal import decode_wav, encode_wav

    samples = [((i * 997) % 65536) - 32768 for i in range(129)]  # odd count
    payload = encode_wav(8000, samples)
    assert decode_wav(payload) == (8000, samples)
    # an extra chunk before data must be skipped (word-aligned walk)
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    patched = payload[:12] + extra + payload[12:]
    patched = b"RIFF" + struct.pack("<I", len(patched) - 8) + patched[8:]
    assert decode_wav(patched) == (8000, samples)


def test_decode_payload_dispatch_and_stub():
    import pytest

    from lambda_sample_spark.operators.multimodal import (
        decode_payload,
        encode_bmp,
        encode_wav,
    )

    img = decode_payload(encode_bmp(2, 2, bytes(range(12))))
    assert img["modality"] == "image" and img["width"] == 2
    aud = decode_payload(encode_wav(8000, [1, -2, 3]))
    assert aud["modality"] == "audio" and aud["samples"] == [1, -2, 3]
    # JPEG stays behind the documented codec boundary
    with pytest.raises(NotImplementedError):
        decode_payload(b"\xff\xd8\xff\xe0....")
    # PNG decodes for real now; a malformed body raises ValueError
    with pytest.raises(ValueError):
        decode_payload(b"\x89PNG\r\n\x1a\n....")


def test_png_roundtrip_rgb():
    from lambda_sample_spark.operators.multimodal import decode_png, encode_png

    rgb = bytes((i * 37) % 256 for i in range(5 * 3 * 3))
    w, h, got = decode_png(encode_png(5, 3, rgb))
    assert (w, h) == (5, 3) and got == rgb


def _png_with_filters(w, h, rgb, ftypes, ctype=2, extra=None):
    """Hand-build a PNG whose rows use the GIVEN filter types, applying
    the real filter transforms to the raw scanlines — exercises the
    reconstruction paths encode_png (filter 0 only) never emits."""
    import struct
    import zlib

    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    stride = w * ch
    raw = bytearray()
    prev = bytes(stride)
    for y in range(h):
        row = rgb[y * stride : (y + 1) * stride]
        ft = ftypes[y % len(ftypes)]
        filt = bytearray(stride)
        for x in range(stride):
            a = row[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            filt[x] = (row[x] - pred) & 0xFF
        raw += bytes([ft]) + bytes(filt)
        prev = row

    def chunk(ct, data):
        return (
            struct.pack(">I", len(data)) + ct + data
            + struct.pack(">I", zlib.crc32(ct + data) & 0xFFFFFFFF)
        )

    out = b"\x89PNG\r\n\x1a\n" + chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    )
    if extra:
        out += chunk(*extra)
    return out + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")


def test_png_filter_reconstruction_all_types():
    from lambda_sample_spark.operators.multimodal import decode_png

    rgb = bytes((i * 73 + 11) % 256 for i in range(6 * 5 * 3))
    for ftypes in ([1], [2], [3], [4], [0, 1, 2, 3, 4]):
        payload = _png_with_filters(6, 5, rgb, ftypes)
        w, h, got = decode_png(payload)
        assert got == rgb, f"filters {ftypes}"


def test_png_color_types_map_to_rgb():
    from lambda_sample_spark.operators.multimodal import decode_png

    # grayscale (type 0): every pixel expands to (g, g, g)
    gray = bytes((i * 29) % 256 for i in range(4 * 3))
    w, h, got = decode_png(_png_with_filters(4, 3, gray, [0, 2], ctype=0))
    assert got == b"".join(bytes([g, g, g]) for g in gray)
    # RGBA (type 6): alpha dropped
    rgb = bytes((i * 31) % 256 for i in range(4 * 3 * 3))
    rgba = b"".join(rgb[i * 3 : i * 3 + 3] + b"\x80" for i in range(4 * 3))
    w, h, got = decode_png(_png_with_filters(4, 3, rgba, [1, 4], ctype=6))
    assert got == rgb
    # palette (type 3): indices resolve through PLTE
    plte = bytes((i * 7) % 256 for i in range(9))  # 3 entries
    idx = bytes([0, 1, 2, 2, 1, 0])
    w, h, got = decode_png(
        _png_with_filters(3, 2, idx, [0], ctype=3, extra=(b"PLTE", plte))
    )
    assert got == b"".join(plte[i * 3 : i * 3 + 3] for i in idx)


def test_png_rejects_unsupported_flavors():
    import struct
    import zlib

    import pytest

    from lambda_sample_spark.operators.multimodal import decode_png, encode_png

    with pytest.raises(ValueError):
        decode_png(b"not a png")
    # interlaced flag
    good = encode_png(2, 2, bytes(12))
    ihdr_off = 8 + 8
    bad = bytearray(good)
    bad[ihdr_off + 12] = 1  # interlace byte
    with pytest.raises(ValueError):
        decode_png(bytes(bad))
    # truncated IDAT stream -> zlib/length error, not a crash elsewhere
    with pytest.raises(Exception):
        decode_png(good[:-20])


def test_extract_features_decodes_real_media(spark, sf_dir):
    # the Spark path must produce EXACTLY real_features(decode_payload)
    # for genuinely decodable payloads — pinning the self-contained
    # closure twin equal to the module-level decoders
    from lambda_sample_spark.operators.multimodal import (
        decode_payload,
        extract_features,
        real_features,
        synthesize_decodable_media,
    )

    media = synthesize_decodable_media(spark, sf_dir)
    rows = media.limit(40).collect()
    got = {
        r.doc_id: r.features
        for r in extract_features(media.limit(40)).collect()
    }
    assert len(got) == len(rows) > 0
    for r in rows:
        want = real_features(decode_payload(bytes(r.payload)))
        assert got[r.doc_id] == want, r.doc_id
        # modality tag: images end 1.0, audio ends 2.0
        assert want[-1] == (1.0 if r.doc_id % 2 == 0 else 2.0)


def test_synthesizer_inline_encoders_match_module_encoders(spark, sf_dir):
    import hashlib
    import struct

    from lambda_sample_spark.operators.multimodal import (
        encode_bmp,
        encode_png,
        encode_wav,
        synthesize_decodable_media,
    )
    from lambda_sample_spark.operators.common import documents

    def keystream(seed: bytes, n: int) -> bytes:
        out = bytearray()
        counter = 0
        while len(out) < n:
            out += hashlib.md5(seed + counter.to_bytes(4, "little")).digest()
            counter += 1
        return bytes(out[:n])

    texts = {
        r.doc_id: r.text
        for r in documents(spark, sf_dir).select("doc_id", "text").limit(10).collect()
    }
    payloads = {
        r.doc_id: bytes(r.payload)
        for r in synthesize_decodable_media(spark, sf_dir)
        .where(F.col("doc_id").isin(list(texts)))
        .collect()
    }
    for doc_id, text in texts.items():
        seed = (text or "").encode("utf-8")
        if doc_id % 2 == 0:
            w, h = 4 + doc_id % 13, 3 + doc_id % 7
            enc = encode_png if doc_id % 4 == 0 else encode_bmp
            want = enc(w, h, keystream(seed, w * h * 3))
        else:
            n = 64 + doc_id % 100
            want = encode_wav(8000, list(struct.unpack(f"<{n}h", keystream(seed, n * 2))))
        assert payloads[doc_id] == want, doc_id


def test_mis_sniffed_payloads_degrade_to_fake_not_crash(spark):
    # magic-byte false positives: arbitrary bytes starting 'BM' (with
    # garbage dims that would otherwise allocate ~1e17 bytes) or a
    # truncated RIFF header must yield the deterministic fake
    # features, never fail the job
    import hashlib

    from lambda_sample_spark.operators.multimodal import (
        FEATURE_DIM,
        extract_features,
    )

    evil = [
        (0, bytearray(b"BM" + b" " * 60)),           # text that sniffs as BMP
        (1, bytearray(b"BM\x01")),                   # truncated header
        (2, bytearray(b"RIFF\x00\x00\x00\x00WAVE")), # RIFF with no chunks
        (3, bytearray(b"RIFFxxxxWAVEfmt \xff\xff\xff\xff")),  # absurd chunk len
    ]
    df = spark.createDataFrame(evil, "doc_id BIGINT, payload BINARY")
    rows = {r.doc_id: r for r in extract_features(df).collect()}
    assert set(rows) == {0, 1, 2, 3}
    for doc_id, payload in evil:
        digest = hashlib.md5(bytes(payload)).digest()
        want = [x / 256.0 for x in digest[:FEATURE_DIM]]
        assert list(rows[doc_id].features) == pytest.approx(want), doc_id
