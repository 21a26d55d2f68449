"""RAG ingestion example: the retrieval-side composition of this
repo's operators — what an embedding/search pipeline runs between the
curated corpus and the serving index:

  1. chunk        chunking.chunk_documents — fixed-token windows with
                  overlap (zero-shuffle projection)
  2. embed        a DETERMINISTIC stand-in embedder (bag-of-words
                  random projection via hash arithmetic — no model
                  libs in this container); production swaps in a
                  mapInPandas model-inference pass with a
                  self-contained closure, exactly the multimodal
                  decode seam (operators/multimodal.py)
  3. index        similarity.ivf_index + ivf_write_index — spherical
                  k-means coarse quantizer, cells persisted
                  partitioned-by-cluster so probes prune partitions
  4. probe        similarity.ivf_probe_index — top-k cosine over the
                  probed cells only

tests/test_rag_example.py pins self-retrieval (a query built from a
chunk's own embedding returns that chunk at rank 1) and overlap
sanity (the runner-up for a mid-document chunk is one of its
overlapping neighbors more often than chance).

Run: python examples/rag_ingest.py [sf_dir] [index_dir]
(defaults: /root/testdata/sf0.001, a temp dir).
"""

from __future__ import annotations

import sys
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lambda_sample_spark.io import load_table
from lambda_sample_spark.operators.chunking import chunk_documents
from lambda_sample_spark.operators.similarity import (
    ivf_index,
    ivf_probe_index,
    ivf_write_index,
)

EMBED_DIM = 16


def fake_embed(
    chunks: DataFrame, dim: int = EMBED_DIM, text_col: str = "chunk_text"
) -> DataFrame:
    """Deterministic bag-of-words random-projection embedding: each
    token hashes to a ±1-ish direction per dimension
    (xxhash64(token, j) folded to [-1, 1]); a chunk is the sum of its
    token directions. Overlapping chunks share tokens, so they land
    near each other — the property the tests lean on. All relational
    (F.aggregate fold); fine at example scale, and the hot-path note
    is in the module docstring: production embedding is model
    inference, not this."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")

    def tok_vec(w):
        return F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: (
                F.pmod(F.xxhash64(w, j), F.lit(2000001)) - 1000000
            )
            / 1000000.0,
        )

    zero = F.array_repeat(F.lit(0.0), dim)
    vec = F.aggregate(
        toks,
        zero,
        lambda acc, w: F.zip_with(acc, tok_vec(w), lambda a, b: a + b),
    )
    return chunks.withColumn("vec", vec)


def build_index(
    spark: SparkSession, sf_dir: str, index_dir: str, n_cells: int = 16
) -> DataFrame:
    """Chunk + embed the documents table, write the IVF index, and
    return the embedded chunk frame (vec_id = doc_id * 10_000 +
    chunk_id — the synthetic id namespace the probe joins back on)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    chunks = chunk_documents(docs)
    emb = fake_embed(chunks).select(
        (F.col("doc_id") * 10_000 + F.col("chunk_id")).alias("vec_id"),
        "doc_id",
        "chunk_id",
        "vec",
    )
    centroids, assigned = ivf_index(emb.select("vec_id", "vec"), k=n_cells)
    ivf_write_index(assigned, centroids, index_dir)
    return emb


def probe(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    top_k: int = 5,
    exclude_query_ids: bool = True,
) -> DataFrame:
    """Thin wrapper so the example reads end-to-end: (q_id, q_vec) →
    (q_id, c_id, cos, rk) over the persisted cells."""
    return ivf_probe_index(
        spark,
        index_dir,
        queries,
        top_k=top_k,
        exclude_query_ids=exclude_query_ids,
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    index_dir = (
        sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="rag_ix_")
    )
    from lambda_sample_spark.session import get_spark

    spark = get_spark(app_name="rag-ingest-example")
    emb = build_index(spark, sf_dir, index_dir)
    queries = emb.where(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("vec").alias("q_vec")
    )
    res = probe(spark, index_dir, queries, exclude_query_ids=False)
    hits = res.where("rk = 1 AND c_id = q_id").count()
    total = queries.count()
    print(f"index at {index_dir}; self-retrieval {hits}/{total} @ rank 1")
    spark.stop()


if __name__ == "__main__":
    main()
