"""Similarity search over embeddings (SURVEY.md §2.8 X3 + north star).

  - brute-force cosine top-k: the exact baseline; query set broadcast
    against the candidate scan — no shuffle of the big side, O(Q*N)
    work distributed over candidate partitions.
  - embedding near-dup: same-label blocked self-join with a cosine
    threshold (label plays the blocking-key role).
  - ANN via random-hyperplane LSH: the 100 TB path — deterministic
    hyperplanes bucket vectors; search touches only the query's bucket.
    Recall/latency trades off via n_planes (rows-only contract).

All cosine math uses functions/vectors.py (JVM higher-order fns).
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — resolves pandas_udf type hints

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vectors import as_double, cosine, dot
from .common import embeddings, r6

N_QUERIES = 5
TOP_K = 10
NEAR_DUP_THRESHOLD = 0.4


def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3: exact cosine top-k for a small query set (vec_id < 5),
    ranked by rounded cosine with vec_id tiebreak for determinism."""
    emb = embeddings(spark, sf_dir).select(
        "vec_id", as_double(F.col("embedding")).alias("vec")
    )
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("vec").alias("q_vec")
    )
    cand = emb.select(F.col("vec_id").alias("c_id"), F.col("vec").alias("c_vec"))
    scored = (
        cand.crossJoin(F.broadcast(q))
        .where(F.col("c_id") != F.col("q_id"))
        .select("q_id", "c_id", r6(cosine(F.col("q_vec"), F.col("c_vec"))).alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TOP_K)
        .select("q_id", "c_id", "cos", F.col("rk").cast("bigint").alias("rk"))
    )


def embed_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: same-label (blocked) pairs above a
    cosine threshold."""
    emb = embeddings(spark, sf_dir).select(
        "vec_id", "label", as_double(F.col("embedding")).alias("vec")
    )
    a = emb.alias("a")
    b = emb.alias("b")
    cos = cosine(F.col("a.vec"), F.col("b.vec"))
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .where(cos >= NEAR_DUP_THRESHOLD)
        .select(
            F.col("a.label").alias("label"),
            F.col("a.vec_id").alias("v1"),
            F.col("b.vec_id").alias("v2"),
            r6(cos).alias("cos"),
        )
    )


LSH_TABLES = 16  # recall@10 ~0.9 vs exact on the test corpus
LSH_BITS = 4


def _lsh_signatures(emb: DataFrame) -> DataFrame:
    """Attach (table, bucket) rows per vector: LSH_TABLES independent
    hash tables of LSH_BITS signed-random-hyperplane bits each.

    All 32 projections happen in ONE numpy matmul per Arrow batch
    (vectorized pandas UDF): (batch x dim) @ (dim x planes) -> signs
    -> per-table bucket ids. Hyperplanes are seeded-deterministic and
    regenerated identically inside every worker — nothing is shipped
    but the seed. Multiple small tables (vs one wide signature) trade
    bucket selectivity for recall: a near-neighbor only needs to agree
    in ONE table to become a candidate.
    """
    from pyspark.sql.functions import pandas_udf

    n_tables, n_bits = LSH_TABLES, LSH_BITS

    @pandas_udf("array<bigint>")
    def bucket_ids(vecs: pd.Series) -> pd.Series:
        import numpy as np

        planes = None  # (dim, n_tables*n_bits), built lazily from dim
        out = []
        mat = np.array(vecs.tolist(), dtype=np.float64)
        if mat.ndim != 2 or mat.size == 0:
            return pd.Series([[0] * n_tables] * len(vecs))
        dim = mat.shape[1]
        planes = (
            np.random.RandomState(42)
            .uniform(-1.0, 1.0, size=(dim, n_tables * n_bits))
        )
        bits = (mat @ planes) > 0  # (batch, n_tables*n_bits)
        weights = (1 << np.arange(n_bits)).astype(np.int64)
        for row in bits:
            sigs = row.reshape(n_tables, n_bits) @ weights
            out.append([int(s) for s in sigs])
        return pd.Series(out)

    return emb.select(
        "vec_id",
        "vec",
        F.posexplode(bucket_ids(F.col("vec"))).alias("table", "bucket"),
    )


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN (rows-only): multi-table random-hyperplane LSH top-k.

    The 100 TB path for X3: candidates are the union over hash tables
    of same-bucket vectors — per-query work scales with bucket
    occupancy, not corpus size; exact cosine re-ranks the candidates.
    """
    emb = embeddings(spark, sf_dir).select(
        "vec_id", as_double(F.col("embedding")).alias("vec")
    )
    sigs = _lsh_signatures(emb)
    q = sigs.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("vec").alias("q_vec"),
        "table",
        "bucket",
    )
    cands = (
        sigs.join(F.broadcast(q), on=["table", "bucket"])
        .where(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "q_vec", F.col("vec_id").alias("c_id"), "vec")
        .dropDuplicates(["q_id", "c_id"])
    )
    scored = cands.select(
        "q_id", "c_id", r6(cosine(F.col("q_vec"), F.col("vec"))).alias("cos")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TOP_K)
        .select("q_id", "c_id", "cos", F.col("rk").cast("bigint").alias("rk"))
    )


def _cos_sql(a: str, b: str) -> str:
    """Cosine in portable SQL mirroring the Spark fold exactly:
    sequential sum over index order, double precision."""
    return (
        f"(list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"
        f" / (sqrt(list_dot_product(CAST({a} AS DOUBLE[]), CAST({a} AS DOUBLE[])))"
        f" * sqrt(list_dot_product(CAST({b} AS DOUBLE[]), CAST({b} AS DOUBLE[])))))"
    )


ORACLE = {
    "q_similarity_topk": f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT q.q_id, e.vec_id AS c_id,
         round({_cos_sql('q.q_vec', 'e.embedding')}, 6) AS cos
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id != q.q_id
), ranked AS (
  SELECT q_id, c_id, cos,
         CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id ASC) AS BIGINT) AS rk
  FROM scored
)
SELECT q_id, c_id, cos, rk FROM ranked WHERE rk <= {TOP_K}
""",
    "q_embed_near_dup": f"""
SELECT a.label AS label, a.vec_id AS v1, b.vec_id AS v2,
       round({_cos_sql('a.embedding', 'b.embedding')}, 6) AS cos
FROM embeddings a
JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {_cos_sql('a.embedding', 'b.embedding')} >= {NEAR_DUP_THRESHOLD}
""",
}

QUERIES = {
    "q_similarity_topk": similarity_topk,
    "q_embed_near_dup": embed_near_dup,
    "q_ann_lsh_topk": ann_lsh_topk,  # rows-only
}
