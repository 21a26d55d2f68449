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


LSH_TABLES = 8
LSH_BITS = 4


def _lsh_signatures(emb: DataFrame) -> DataFrame:
    """Attach (table, bucket) rows per vector: LSH_TABLES independent
    hash tables of LSH_BITS signed-random-hyperplane bits each.

    Hyperplane components are deterministic pseudo-randoms in [-1, 1)
    derived from xxhash64(dim, plane) — reproducible across runs with
    no driver-side randomness. Multiple small tables (vs one wide
    signature) trade bucket selectivity for recall: a near-neighbor
    only needs to agree in ONE table to become a candidate.
    """

    def plane_component(i, plane_idx: int):
        h = F.xxhash64(i.cast("string"), F.lit(plane_idx))
        return ((h % 20011).cast("double") - F.lit(10005.0)) / F.lit(10005.0)

    def plane_lambda(plane_idx: int):
        # closure factory: PySpark infers lambda arity from the
        # signature, so captured values must not appear as params
        return lambda i: plane_component(i, plane_idx)

    tables = []
    for t in range(LSH_TABLES):
        sig = F.lit(0).cast("bigint")
        for p in range(LSH_BITS):
            proj = F.aggregate(
                F.zip_with(
                    F.col("vec"),
                    F.transform(
                        F.sequence(F.lit(0), F.size("vec") - 1),
                        plane_lambda(t * LSH_BITS + p),
                    ),
                    lambda x, w: x * w,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            sig = sig + F.when(proj > 0, F.lit(1 << p).cast("bigint")).otherwise(
                F.lit(0)
            )
        tables.append(F.struct(F.lit(t).alias("table"), sig.alias("bucket")))
    return emb.select(
        "vec_id", "vec", F.explode(F.array(*tables)).alias("tb")
    ).select("vec_id", "vec", F.col("tb.table").alias("table"), F.col("tb.bucket").alias("bucket"))


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
