"""Multimodal (image/audio/video) columns as opaque binary + typed
metadata (SURVEY.md §2.8 X5).

Design: payloads are ``BinaryType`` columns; metadata travels in a
struct (modality, width/height or sample rate, codec). Decode /
feature-extract runs as Arrow-batched ``mapInPandas`` so each Python
worker touches a whole batch. The image/audio codec libraries are not
available in this container, so the *decode* step is stubbed behind a
deterministic fake (content-hash-derived "features"), while the
Spark-side plumbing — schema, batching, partitioning — is real.

At 100 TB: binary payloads dominate storage; the plumbing keeps them
out of shuffles (dedup/group on the 16-byte content hash, never the
payload) and feature extraction streams batch-at-a-time through
mapInPandas without materializing rows on the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import documents

FEATURE_DIM = 8

MEDIA_SCHEMA = (
    "doc_id BIGINT, payload BINARY, "
    "meta STRUCT<modality: STRING, width: INT, height: INT, codec: STRING>"
)

FEATURES_SCHEMA = "doc_id BIGINT, content_hash STRING, features ARRAY<DOUBLE>"


def synthesize_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a multimodal table from documents: payload = utf-8 bytes
    of the text (stands in for image bytes), metadata derived
    deterministically."""
    docs = documents(spark, sf_dir)
    meta = F.struct(
        F.lit("image").alias("modality"),
        (F.col("n_chars") % 1024).cast("int").alias("width"),
        ((F.col("n_chars") * 7) % 1024).cast("int").alias("height"),
        F.lit("fake/raw").alias("codec"),
    )
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        meta.alias("meta"),
    )


def decode_payload(payload: bytes) -> bytes:
    """Real image/audio decode would live here (PIL / torchaudio /
    ffmpeg). Not available in this environment."""
    raise NotImplementedError(
        "media decode requires codec libraries not present in this container; "
        "extract_features uses a deterministic fake instead"
    )


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a decoded-media feature vector:
    bytes of md5(payload) scaled to [0, 1)."""
    import hashlib

    digest = hashlib.md5(payload).digest()
    return [b / 256.0 for b in digest[:FEATURE_DIM]]


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    The content hash is a JVM column expression (``F.md5(payload)``) —
    a codegen'd projection, not a per-row Python call — so only the
    feature stand-in itself runs Python-side. mapInPandas signature:
    Iterator[pd.DataFrame] -> Iterator[pd.DataFrame], so one Python
    worker handles whole Arrow batches — the real decode would drop in
    at ``fake_features`` without touching the plumbing.
    """
    hashed = media.select(
        "doc_id", F.md5("payload").alias("content_hash"), "payload"
    )

    # NB: the closure must be fully self-contained (no references to
    # module globals) so cloudpickle ships it by value — Spark's Python
    # workers do not have this package on their sys.path when the
    # driver imports us from a file path.
    feature_dim = FEATURE_DIM

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as pd  # local import: keep the closure self-contained

        def fake_features(b: bytes) -> list[float]:
            digest = hashlib.md5(b).digest()
            return [x / 256.0 for x in digest[:feature_dim]]

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content_hash": pdf["content_hash"],
                    "features": pdf["payload"].map(lambda b: fake_features(bytes(b))),
                }
            )

    return hashed.mapInPandas(run, schema=FEATURES_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id BIGINT, payload BINARY, "
    "meta STRUCT<modality: STRING, width: INT, height: INT, codec: STRING>"
)


def resize_images(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Image resize over the binary column: mapInPandas batches with
    the decode→resample→encode core stubbed (PIL/libvips are not in
    this container) behind a deterministic stand-in that halves the
    payload until both metadata dims fit ``max_side``. The REAL parts
    — Arrow batch shape, metadata math (aspect-preserving target dims),
    schema carried through — are exactly what a PIL-backed version
    keeps; only the pixel resample swaps in."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd  # closure-local: workers don't import this repo

        def target(w: int, h: int) -> tuple[int, int]:
            s = max(w, h, 1)
            if s <= max_side:
                return w, h
            return max(w * max_side // s, 1), max(h * max_side // s, 1)

        def fake_resample(b: bytes, w: int, h: int, nw: int, nh: int) -> bytes:
            # stand-in for decode->resample->encode: shrink the byte
            # budget by the same area ratio, deterministically
            if w * h == 0:
                return bytes(b)
            keep = max(1, len(b) * nw * nh // max(w * h, 1))
            return bytes(b)[:keep]

        for pdf in batches:
            metas = pdf["meta"]
            dims = [target(m["width"], m["height"]) for m in metas]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        fake_resample(bytes(b), m["width"], m["height"], nw, nh)
                        for b, m, (nw, nh) in zip(pdf["payload"], metas, dims)
                    ],
                    "meta": [
                        {
                            "modality": m["modality"],
                            "width": nw,
                            "height": nh,
                            "codec": m["codec"],
                        }
                        for m, (nw, nh) in zip(metas, dims)
                    ],
                }
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = "doc_id BIGINT, frame_idx INT, frame BINARY"


def sample_frames(media: DataFrame, every_n: int = 4, frame_bytes: int = 64) -> DataFrame:
    """Video frame sampling over the binary column: every ``every_n``-th
    fixed-size slice of the payload stands in for a decoded frame
    (ffmpeg-style keyframe extraction is the drop-in real core). One
    input row fans out to its sampled frames — the mapInPandas batch
    returns MORE rows than it consumes, the plumbing a real frame
    sampler needs; downstream the frames are ordinary binary rows
    (dedup by content hash, feature-extract, etc.)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(b)
                n_frames = max(1, len(raw) // frame_bytes)
                for i in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(raw[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return media.mapInPandas(run, schema=FRAMES_SCHEMA)


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract query (rows-only): synthesize -> extract features ->
    content-hash dedup (keep lowest doc_id per identical payload)."""
    media = synthesize_media(spark, sf_dir)
    feats = extract_features(media)
    return (
        feats.groupBy("content_hash")
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("n_dups"))
        .select("doc_id", "content_hash", "n_dups")
    )


# the content-hash dedup IS oracle-checkable (md5 of the utf-8 payload
# = DuckDB's md5 of the text), which value-checks the whole
# mapInPandas path end-to-end; only the feature vectors are fake
ORACLE = {
    "q_multimodal_features": """
SELECT min(doc_id) AS doc_id,
       md5(text) AS content_hash,
       count(*) AS n_dups
FROM documents
GROUP BY md5(text)
""",
}

QUERIES = {"q_multimodal_features": multimodal_features}
