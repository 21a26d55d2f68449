"""Optional JPEG decode (round-11 verdict #8, the Kafka flag-gate
pattern): with Pillow installed the JPEG path really decodes in
decode_payload / extract_features / dhash_images; without it (this
container) the deterministic fallback is byte-identical to previous
rounds — fake features, skipped dHash rows, NotImplementedError from
the eager decoder — and never a crash."""

from __future__ import annotations

import pytest

from lambda_sample_spark.operators.multimodal import (
    _fake_features,
    decode_payload,
    extract_features,
    real_features,
)

try:
    import PIL  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

# a tiny but syntactically valid-looking JPEG prefix; enough for the
# magic sniff (full decode only runs under Pillow, which gets a real
# file from _jpeg_bytes below)
JPEG_STUB = b"\xff\xd8\xff\xe0" + b"\x00" * 64


def test_fallback_without_pillow_is_unchanged(spark):
    if HAVE_PIL:
        pytest.skip("Pillow installed — fallback leg covered elsewhere")
    # eager decoder: documented NotImplementedError, not a crash
    with pytest.raises(NotImplementedError):
        decode_payload(JPEG_STUB)
    # distributed path: the md5 fake, exactly as before round 11
    media = spark.createDataFrame(
        [(1, bytearray(JPEG_STUB), {"modality": "image"})],
        "doc_id LONG, payload BINARY, meta MAP<STRING,STRING>",
    )
    row = extract_features(media).collect()[0]
    assert row.features == _fake_features(JPEG_STUB)


def test_jpeg_rows_skip_dhash_without_pillow(spark):
    if HAVE_PIL:
        pytest.skip("Pillow installed — real leg covered below")
    from lambda_sample_spark.operators.phash import dhash_images

    media = spark.createDataFrame(
        [(1, bytearray(JPEG_STUB), {"modality": "image", "codec": "image/jpeg"})],
        "doc_id LONG, payload BINARY, meta MAP<STRING,STRING>",
    )
    assert dhash_images(media).collect() == []


@pytest.mark.skipif(not HAVE_PIL, reason="Pillow not installed (expected in this container)")
def test_jpeg_real_decode_with_pillow(spark):
    import io

    from PIL import Image

    from lambda_sample_spark.operators.phash import dhash_images

    img = Image.new("RGB", (9, 8))
    px = img.load()
    for y in range(8):
        for x in range(9):
            px[x, y] = ((x * 28) % 256, (y * 31) % 256, 128)
    buf = io.BytesIO()
    img.save(buf, format="JPEG", quality=95)
    payload = buf.getvalue()

    dec = decode_payload(payload)
    assert dec["modality"] == "image" and (dec["width"], dec["height"]) == (9, 8)
    media = spark.createDataFrame(
        [(1, bytearray(payload), {"modality": "image", "codec": "image/jpeg"})],
        "doc_id LONG, payload BINARY, meta MAP<STRING,STRING>",
    )
    row = extract_features(media).collect()[0]
    assert row.features == pytest.approx(real_features(dec))
    assert row.features[-1] == 1.0  # image modality tag, not the fake
    got = dhash_images(media).collect()
    assert len(got) == 1 and len(got[0].bands) == 8
