"""Deduplication operators for training-data pipelines (SURVEY.md §2.8
X1/X2 + north star): exact, n-gram Jaccard, MinHash-LSH, SimHash.

Scale design:
  - exact dedup: hash-groupBy on the text (one shuffle keyed by
    content; at 100 TB group by md5(text) so the shuffle key is 16
    bytes, not the document).
  - n-gram Jaccard: exact pairwise similarity via token explode +
    equi-join on token. Correct but vocabulary-skew-sensitive (a token
    present in k docs fans out k^2 pairs) — this is the small-scale /
    oracle-checkable baseline; the 100 TB path is MinHash-LSH below,
    which replaces the all-pairs join with banded bucket joins.
  - MinHash-LSH: pyspark.ml MinHashLSH over HashingTF shingle vectors;
    approxSimilarityJoin only compares within-bucket candidates.
  - SimHash: 64-bit signature via xxhash64(token) bit-voting —
    near-dups differ in few bits; grouping by band prefixes gives a
    cheap blocking key. Pure DataFrame ops (explode + bit arithmetic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .common import documents, r6

JACCARD_THRESHOLD = 0.95


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1: exact dedup — keep the lowest doc_id per identical text."""
    docs = documents(spark, sf_dir)
    return (
        docs.groupBy("text")
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("n_dups"))
        .select(F.md5("text").alias("text_hash"), "doc_id", "n_dups")
    )


def _distinct_tokens(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id",
        "lang",
        F.explode(F.array_distinct(F.split(F.trim("text"), r"\s+"))).alias("tok"),
    )


def ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-set Jaccard similarity >= 0.95 between same-language
    pairs — EXACT result via prefix filtering (PPJoin).

    A naive token equi-join fans out quadratically on frequent tokens
    (a token in k docs emits k^2 pairs). Prefix filtering keeps the
    result exact while joining only on each document's rarest tokens:
    if J(A,B) >= t, the first |X| - ceil(t*|X|) + 1 tokens of each set
    under a global (doc-frequency, token) order must intersect. At
    t=0.95 that prefix is ~5% of each document, made of its rarest
    tokens — so the candidate join touches almost no hot keys, which is
    what makes this the 100 TB-safe exact variant (MinHash-LSH below is
    the approximate one). Candidates then get an exact intersection
    count via joins restricted to candidate doc ids.
    """
    t = JACCARD_THRESHOLD
    docs = documents(spark, sf_dir)
    toks = _distinct_tokens(docs)
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("sz"))

    # global token order: ascending document frequency, rarest first
    dfreq = toks.groupBy("tok").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "tok")
    ranked = (
        toks.join(dfreq, "tok")
        .withColumn("rnk", F.row_number().over(w))
        .join(F.broadcast(sizes), "doc_id")
    )
    prefix = ranked.where(
        F.col("rnk") <= F.col("sz") - F.ceil(F.lit(t) * F.col("sz")) + 1
    ).select("doc_id", "lang", "tok", "sz")

    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # size compatibility: J >= t forces t*|A| <= |B| <= |A|/t
            & (F.col("b.sz") >= F.lit(t) * F.col("a.sz"))
            & (F.col("a.sz") >= F.lit(t) * F.col("b.sz")),
        )
        .select(
            F.col("a.doc_id").alias("d1"),
            F.col("b.doc_id").alias("d2"),
            F.col("a.sz").alias("sz1"),
            F.col("b.sz").alias("sz2"),
        )
        .distinct()
    )

    # verify candidates only: exact intersection via two candidate-
    # restricted joins (cost ~ |candidates| * avg doc size, not all-pairs)
    t1 = toks.select(F.col("doc_id").alias("d1"), "tok")
    t2 = toks.select(F.col("doc_id").alias("d2"), "tok")
    inter = (
        cand.join(t1, "d1")
        .join(t2, ["d2", "tok"])
        .groupBy("d1", "d2", "sz1", "sz2")
        .agg(F.count("*").alias("inter"))
    )
    jac = F.col("inter") / (F.col("sz1") + F.col("sz2") - F.col("inter"))
    return (
        inter.where(jac >= t)
        .select("d1", "d2", r6(jac).alias("jaccard"))
    )


def dedup_near_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 (rows-only): MinHash-LSH near-dup candidate pairs.

    Shingle -> HashingTF sparse vector -> MinHashLSH (banded) ->
    approxSimilarityJoin on Jaccard distance <= 0.2. The LSH join is
    the 100 TB-safe variant of ngram_jaccard: candidates only meet
    inside a band bucket.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH, Tokenizer

    docs = documents(spark, sf_dir).select("doc_id", F.trim("text").alias("text"))
    tokenizer = Tokenizer(inputCol="text", outputCol="tokens")
    toks = tokenizer.transform(docs)
    tf = HashingTF(inputCol="tokens", outputCol="features", numFeatures=1 << 14)
    feats = tf.transform(toks).where(F.expr("size(tokens) > 0"))
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=42)
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, 0.2, distCol="jaccard_dist")
    return (
        pairs.where(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("d1"),
            F.col("datasetB.doc_id").alias("d2"),
            r6(1 - F.col("jaccard_dist")).alias("jaccard_sim"),
        )
    )


def simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash (rows-only): 64-bit signature by per-bit voting over
    xxhash64(token); near-dup docs land within small Hamming distance.

    Pure DataFrame formulation: explode tokens -> explode 64 bit
    positions is avoided by summing bit masks arithmetically — we vote
    with sign contributions per bit using integer shifts.
    """
    docs = documents(spark, sf_dir)
    toks = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.trim("text"), r"\s+"))).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    # per bit position: vote +1 if bit set else -1; final bit = vote > 0
    bits = toks.select(
        "doc_id",
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(63))).alias("bit"),
    ).select(
        "doc_id",
        "bit",
        F.when(F.expr("(h >> bit) & 1") == 1, 1).otherwise(-1).alias("vote"),
    )
    sig = (
        bits.groupBy("doc_id", "bit")
        .agg(F.sum("vote").alias("votes"))
        .withColumn("bitval", F.when(F.col("votes") > 0, F.lit(1)).otherwise(F.lit(0)))
        .groupBy("doc_id")
        .agg(F.sum(F.expr("cast(bitval as bigint) << bit")).alias("simhash"))
    )
    return sig.select("doc_id", "simhash")


ORACLE = {
    "q_dedup_exact": """
SELECT md5(text) AS text_hash,
       CAST(min(doc_id) AS BIGINT) AS doc_id,
       count(*) AS n_dups
FROM documents GROUP BY text
""",
    "q_ngram_jaccard": r"""
WITH toks AS (
  SELECT DISTINCT doc_id, lang,
         unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
  FROM documents
), sizes AS (
  SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
  FROM toks a
  JOIN toks b ON a.tok = b.tok AND a.lang = b.lang AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT d1, d2,
       round(inter * 1.0 / (s1.sz + s2.sz - inter), 6) AS jaccard
FROM pairs
JOIN sizes s1 ON d1 = s1.doc_id
JOIN sizes s2 ON d2 = s2.doc_id
WHERE inter * 1.0 / (s1.sz + s2.sz - inter) >= 0.95
""",
}

QUERIES = {
    "q_dedup_exact": dedup_exact,
    "q_ngram_jaccard": ngram_jaccard,
    "q_dedup_near": dedup_near_minhash,  # rows-only
    "q_simhash": simhash,  # rows-only
}
