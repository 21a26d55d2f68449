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


MINHASH_BANDS = 8
MINHASH_ROWS = 8  # 8 bands x 8 rows = 64 minhashes; S-curve threshold
# ~ (1/b)^(1/r) = 0.77 Jaccard — near-dup, not merely related
REP_ROUNDS = 2  # min-propagation rounds (transitivity closure depth)


def _minhash_bands(toks: DataFrame) -> DataFrame:
    """(doc_id, tok) -> (doc_id, band, sig): 64 minhash values folded
    into 16 banded signatures. Each minhash is min(xxhash64(tok, k))
    over the doc's token set — one shuffle, 64 min-aggregates computed
    map-side. Two docs land in the same (band, sig) bucket iff all 4
    of that band's minhashes agree, i.e. with probability ~ J^4 per
    band (the standard banding S-curve: high-Jaccard pairs collide in
    some band almost surely, low-Jaccard ones almost never)."""
    k = MINHASH_BANDS * MINHASH_ROWS
    sigs = toks.groupBy("doc_id").agg(
        *[F.min(F.xxhash64("tok", F.lit(i))).alias(f"mh{i}") for i in range(k)]
    )
    bands = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                *[f"mh{b * MINHASH_ROWS + r}" for r in range(MINHASH_ROWS)]
            ).alias("sig"),
        )
        for b in range(MINHASH_BANDS)
    ]
    return sigs.select(
        "doc_id", F.explode(F.array(*bands)).alias("bs")
    ).select("doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))


def dedup_near_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 (rows-only): MinHash-banded near-dup CLUSTERING.

    Emits (doc_id, rep_id, is_near_dup) — every doc mapped to the
    minimum doc_id of its near-dup neighborhood — rather than all
    near-dup PAIRS: pair output is quadratic in cluster size (this
    corpus yields ~120 neighbors/doc), which no pair-join survives at
    100 TB. The linear formulation is min-propagation over band
    buckets: per-bucket min doc_id, then per-doc min over its 16
    buckets, iterated REP_ROUNDS times for transitivity (each round is
    two hash aggregations — no pairwise join EVER materializes).
    Hand-rolled on DataFrame minhashes (xxhash64 min-aggregates);
    deliberately not MLlib's MinHashLSH.approxSimilarityJoin, whose
    pair materialization is the quadratic thing we're avoiding.
    """
    docs = documents(spark, sf_dir)
    toks = _distinct_tokens(docs).select("doc_id", "tok")
    bands = _minhash_bands(toks)

    # round 0: rep = min doc_id over all buckets the doc belongs to
    bucket_rep = bands.groupBy("band", "sig").agg(
        F.min("doc_id").alias("bucket_rep")
    )
    rep = (
        bands.join(bucket_rep, ["band", "sig"])
        .groupBy("doc_id")
        .agg(F.min("bucket_rep").alias("rep_id"))
    )
    # pointer-jumping rounds: rep := rep(rep) for transitivity
    for _ in range(REP_ROUNDS - 1):
        parent = rep.select(
            F.col("doc_id").alias("p_doc"), F.col("rep_id").alias("p_rep")
        )
        rep = rep.join(
            parent, rep.rep_id == parent.p_doc, "left"
        ).select(
            "doc_id",
            F.coalesce("p_rep", "rep_id").alias("rep_id"),
        )
    return rep.select(
        "doc_id",
        "rep_id",
        (F.col("doc_id") != F.col("rep_id")).alias("is_near_dup"),
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
