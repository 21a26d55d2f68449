"""Optional MP4 decode (round-11 verdict task #5, the Pillow/JPEG
pattern from tests/test_jpeg_optional.py): with PyAV installed the MP4
path really decodes in decode_mp4_frames / video_frame_hashes; without
it (this container) the fallback is byte-identical to previous rounds
— MP4 payloads skip inside video_frame_hashes, RAWV still decodes in
the same batch, NotImplementedError from the eager decoder — and never
a crash."""

from __future__ import annotations

import random
import struct

import pytest

from lambda_sample_spark.operators.multimodal import encode_bmp
from lambda_sample_spark.operators.video import (
    decode_mp4_frames,
    video_frame_hashes,
)

try:
    import av  # noqa: F401

    HAVE_AV = True
except ImportError:
    HAVE_AV = False

# enough MP4 to pass the container sniff (bytes 4:8 == b"ftyp"); a
# real decodable file is only built under PyAV in the real-leg test
MP4_STUB = struct.pack(">I", 20) + b"ftypisom" + b"\x00" * 64


def _rawv(frames: list[bytes]) -> bytes:
    return (
        b"RAWV"
        + struct.pack(">I", len(frames))
        + b"".join(struct.pack(">I", len(f)) + f for f in frames)
    )


def test_eager_decoder_raises_without_pyav():
    if HAVE_AV:
        pytest.skip("PyAV installed — fallback leg covered elsewhere")
    with pytest.raises(NotImplementedError):
        decode_mp4_frames(MP4_STUB)


def test_mp4_rows_skip_rawv_still_decodes_without_pyav(spark):
    """The documented fallback: in one mixed batch the MP4 row yields
    no frames (skip, not crash) while the RAWV row decodes exactly as
    before the MP4 branch existed."""
    if HAVE_AV:
        pytest.skip("PyAV installed — real leg covered below")
    rng = random.Random(7)
    w, h = 9, 8
    rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
    media = spark.createDataFrame(
        [
            (1, bytearray(MP4_STUB)),
            (2, bytearray(_rawv([encode_bmp(w, h, rgb)]))),
        ],
        "doc_id bigint, payload binary",
    )
    rows = video_frame_hashes(media).collect()
    assert [(r.doc_id, r.frame_idx) for r in rows] == [(2, 0)]


def test_unknown_container_still_skips(spark):
    """A payload that is neither RAWV nor ftyp-sniffed stays a silent
    skip — the pre-round-12 contract for non-RAWV bytes."""
    media = spark.createDataFrame(
        [(1, bytearray(b"\x00GARBAGE" + b"\x00" * 32))],
        "doc_id bigint, payload binary",
    )
    assert video_frame_hashes(media).collect() == []


@pytest.mark.skipif(not HAVE_AV, reason="PyAV not installed (expected in this container)")
def test_mp4_real_decode_with_pyav(spark):
    """With PyAV: eager decode yields (w, h, rgb24) frames in stream
    order, and the distributed path hashes the same frames — the
    inline closure twin pinned equal to decode_mp4_frames."""
    import io

    import av as _av
    import numpy as np

    def _py_dhash(fw: int, fh: int, rgb: bytes) -> int:
        # independent reference dHash (the X43 spec, as in test_video)
        def gray(j, k):
            p = (((j * fh) // 8) * fw + ((k * fw) // 9)) * 3
            return rgb[p] + rgb[p + 1] + rgb[p + 2]

        hsh = 0
        for j in range(8):
            for k in range(8):
                if gray(j, k + 1) > gray(j, k):
                    hsh |= 1 << (j * 8 + k)
        return hsh - (1 << 64) if hsh >= 1 << 63 else hsh

    w, h, nf = 16, 16, 3
    buf = io.BytesIO()
    with _av.open(buf, mode="w", format="mp4") as container:
        stream = container.add_stream("mpeg4", rate=4)
        stream.width, stream.height, stream.pix_fmt = w, h, "yuv420p"
        rng = np.random.default_rng(11)
        for _ in range(nf):
            arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            frame = _av.VideoFrame.from_ndarray(arr, format="rgb24")
            for pkt in stream.encode(frame):
                container.mux(pkt)
        for pkt in stream.encode():
            container.mux(pkt)
    payload = buf.getvalue()

    frames = decode_mp4_frames(payload)
    assert len(frames) == nf
    assert all(fw == w and fh == h and len(rgb) == w * h * 3 for fw, fh, rgb in frames)

    media = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id bigint, payload binary"
    )
    rows = sorted(video_frame_hashes(media).collect(), key=lambda r: r.frame_idx)
    assert [(r.doc_id, r.frame_idx) for r in rows] == [(1, f) for f in range(nf)]
    assert [r.dhash for r in rows] == [
        _py_dhash(fw, fh, rgb) for fw, fh, rgb in frames
    ]
