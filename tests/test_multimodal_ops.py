"""Resize / frame-sample plumbing over binary media columns
(operators/multimodal.py — decode cores stubbed, Spark plumbing real)."""

from __future__ import annotations

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
