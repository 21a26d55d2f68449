"""DSIR data selection (SURVEY.md §2.8 adjunct): Data Selection via
Importance Resampling (Xie et al., NeurIPS 2023) — pick the subset of
a raw crawl that "looks like" a small target corpus by importance
weights over hashed n-gram features. The published recipe, verbatim:

1. features: bag of token n-grams hashed into ``B`` buckets;
2. fit two bucket multinomials — ``p`` on the target corpus, ``q`` on
   the raw corpus (add-one smoothing);
3. per-document log importance weight
   ``log w(d) = sum over d's gram occurrences of ln p[b] - ln q[b]``;
4. Gumbel-top-k: select the top fraction by ``log w + Gumbel noise``
   (sampling without replacement from the softmax of the weights).

Shape (the 100 TB story): ONE corpus pass builds (doc, bucket, cnt)
with map-side combine — the only corpus-sized shuffle, keyed by
(doc_id, bucket). Everything downstream is bounded by ``B``: the
bucket census is a tiny aggregate of that frame, the log-ratio table
is ≤ B rows and broadcasts back, and the per-doc score is one more
narrow-row aggregate. Nothing quadratic, no UDF, no driver loop; the
selection threshold is one approxQuantile over the score column.

Determinism/oracle seam: the contract row hashes grams with the first
md5 word (the winnowing/contamination idiom) so DuckDB replays the
buckets exactly; production stays on xxhash64. Per-(doc, bucket)
terms are single double multiplies of a per-bucket log-ratio (the one
ln() per bucket matches across engines — the q_unigram_logprob
precedent), then summed in exact DECIMAL so accumulation order can
never flip the 6dp rounding (the drift_psi idiom). Gumbel noise is
counter-based md5 — no RNG state, replayable anywhere.

Reference scope note: the reference engine (nuald/lambda-sample) has
no data-selection op — this extends the engine for LLM training-data
curation alongside contamination_check/dedup (same §2.8 family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from .common import r6z

N_BUCKETS = 1024
GRAM_N = 2
_U32 = 4294967296.0  # 2^32, the md5-first-word range


def _bucketed_grams(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    n_buckets: int,
    gram_hash: str,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """One row per (id, gram occurrence) -> hashed feature bucket.
    The BAG of grams (multiplicity kept — DSIR counts occurrences,
    unlike contamination's distinct-gram set). Docs shorter than
    ``n`` tokens emit their clamped full-text gram, mirroring
    curation._ngram_hashes. Hashing before the explode keeps the
    exploded rows narrow (one INT bucket, not the gram string);
    ``carry_cols`` ride along (cheap per-row constants — carrying
    them beats a second corpus join downstream)."""
    toks = F.split(F.trim(F.col(text_col)), r"[ \t\n\x0B\f\r]+")
    if gram_hash == "md5":
        def one(i):
            digest = F.md5(F.concat_ws(" ", F.slice(toks, i + 1, n)))
            word = F.conv(F.substring(digest, 1, 8), 16, 10).cast("bigint")
            return word % n_buckets  # md5 first word is always >= 0
    else:
        def one(i):
            return F.pmod(
                F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, n))),
                F.lit(n_buckets),
            )
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))), one
    )
    return docs.select(
        F.col(id_col), *carry_cols, F.explode(grams).alias("bucket")
    )


def dsir_scores(
    docs: DataFrame,
    target_pred,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = GRAM_N,
    n_buckets: int = N_BUCKETS,
    gram_hash: str = "xxhash64",
    gumbel_salt: str = "dsir:",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document DSIR importance scores. ``target_pred`` is a
    Column predicate over ``docs`` defining the target corpus (e.g.
    ``F.col("lang") == "en"``); the raw distribution is the whole
    input. Returns one row per doc:

    - ``n_grams``  — gram occurrences (the feature bag size),
    - ``logw``     — log importance weight, exact-decimal summed,
      rounded 6dp,
    - ``gkey``     — ``logw + Gumbel(md5(salt||id))``, the
      Gumbel-top-k sampling key, rounded 6dp.

    Selecting the top fraction by ``gkey`` IS Gumbel-top-k sampling
    without replacement proportional to ``w`` (Vieira 2014); ties at
    the 6dp boundary break by id downstream.
    """
    # the gram hash is CPU-bound: a single-file input would leave the
    # whole explode on one core (the winnow_near_dup hazard) — fan
    # under-partitioned inputs out first (no-op on real multi-split
    # sources)
    spark = docs.sparkSession
    par = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par)
    keyed = docs.select(
        F.col(id_col), target_pred.alias("__is_target"), text_col
    )
    grams = _bucketed_grams(
        keyed, id_col, text_col, n, n_buckets, gram_hash,
        carry_cols=("__is_target",),
    )
    # the ONE corpus-sized shuffle per pass: (doc, bucket) occurrence
    # counts, map-side combined (__is_target is a per-doc constant
    # riding along as a key). Everything below is B-bounded or per-doc.
    db = grams.groupBy(id_col, "__is_target", "bucket").agg(
        F.count("*").alias("cnt")
    )

    # FIT PASS: the bucket census is <= n_buckets rows of exact longs —
    # materialize it to the driver (the PQ-codebook-fit idiom) instead
    # of leaving census + totals as two more lazy consumers of the
    # corpus lineage, which Spark re-evaluates (the first cut's plan
    # scanned + re-exploded the corpus THREE times). Totals are
    # integer sums of the collected longs (exact); the log-ratio math
    # stays a SPARK expression over the literal-backed B-row frame, so
    # the oracle's cell-exactness argument is unchanged. Net: exactly
    # two corpus passes — fit, then score — the published DSIR shape.
    census = (
        db.groupBy("bucket")
        .agg(
            F.sum("cnt").alias("rcnt"),
            F.sum(
                F.when(F.col("__is_target"), F.col("cnt")).otherwise(0)
            ).alias("tcnt"),
        )
        .collect()
    )
    r_total = sum(r["rcnt"] for r in census)
    t_total = sum(r["tcnt"] for r in census)
    census_df = spark.createDataFrame(
        [(r["bucket"], r["rcnt"], r["tcnt"]) for r in census],
        "bucket BIGINT, rcnt BIGINT, tcnt BIGINT",
    )
    b = F.lit(float(n_buckets))
    ratio = census_df.select(
        "bucket",
        (
            F.log((F.col("tcnt") + 1) / (F.lit(t_total) + b))
            - F.log((F.col("rcnt") + 1) / (F.lit(r_total) + b))
        ).alias("lr"),
    )

    # SCORE PASS: per-(doc,bucket) term is one double multiply of the
    # shared per-bucket lr, then DECIMAL accumulation -> the 6dp
    # rounding can never flip on accumulation order
    term = (F.col("cnt") * F.col("lr")).cast("decimal(25,15)")
    scored = (
        db.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_grams"),
            F.sum(term).alias("__logw_d"),
        )
    )
    if extra_cols:
        # payload columns join AFTER the per-doc aggregate: doc-sized
        # against doc-sized on the id key (broadcast at test SF, a
        # co-keyed shuffle join at scale) — never a corpus broadcast
        scored = scored.join(docs.select(id_col, *extra_cols), id_col)
    logw_d = F.col("__logw_d").cast("double")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(gumbel_salt), F.col(id_col).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        + F.lit(0.5)
    ) / F.lit(_U32)
    gumbel = -F.log(-F.log(u))
    return scored.select(
        id_col,
        *extra_cols,
        "n_grams",
        # r6z: the negative-zero pairing (common.py; oracle carries
        # the matching + CAST(0.0 AS DOUBLE))
        r6z(logw_d).alias("logw"),
        r6z(logw_d + gumbel).alias("gkey"),
    )


def dsir_select(
    docs: DataFrame,
    target_pred,
    frac: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
    **kwargs,
) -> DataFrame:
    """Production selection: keep ~``frac`` of ``docs`` by Gumbel-top-k
    over the DSIR weights. The cut is a THRESHOLD from one
    approxQuantile on ``gkey`` (a driver-side scalar — no global sort,
    no global window; the 100 TB shape), so the kept fraction is
    approximate to the quantile sketch's error, which is the right
    trade for a sampling step. Returns the selected docs' ids +
    scores; join back to ``docs`` for payloads."""
    scores = dsir_scores(
        docs, target_pred, id_col=id_col, text_col=text_col, **kwargs
    )
    scores = scores.persist()
    try:
        # approxQuantile returns [] on an empty (or all-null) column —
        # an empty upstream funnel selects nothing rather than crashing
        q = scores.stat.approxQuantile("gkey", [1.0 - frac], 1e-4)
        thr = q[0] if q else float("inf")
        return (
            scores.where(F.col("gkey") >= thr)
            .localCheckpoint(eager=True)  # settle before unpersist
        )
    finally:
        scores.unpersist()


def q_dsir_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract (tail): DSIR importance scores over the documents
    table — target corpus = the English slice, raw = everything, 1024
    hashed-bigram buckets, md5 oracle seam. English docs should score
    high (their word mix IS the target mix diluted by four other
    languages); the oracle replays buckets, census, log-ratios, exact
    term sums, and the Gumbel keys cell-for-cell."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    return dsir_scores(
        docs,
        F.col("lang") == "en",
        gram_hash="md5",
        extra_cols=("lang",),
    )


_DSIR_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id, lang, regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, lang,
         unnest(list_transform(
           range(1, greatest(len(t) - {GRAM_N}, 0) + 2),
           i -> (('0x' || substr(md5(array_to_string(
                   list_slice(t, i, i + {GRAM_N} - 1), ' ')), 1, 8))::BIGINT)
                % {N_BUCKETS}
         )) AS bucket
  FROM toks
),
db AS (
  SELECT doc_id, lang, bucket, count(*) AS cnt
  FROM grams GROUP BY 1, 2, 3
),
census AS (
  SELECT bucket,
         sum(cnt) AS rcnt,
         sum(CASE WHEN lang = 'en' THEN cnt ELSE 0 END) AS tcnt
  FROM db GROUP BY 1
),
totals AS (SELECT sum(rcnt) AS r, sum(tcnt) AS t FROM census),
ratio AS (
  SELECT bucket,
         ln((tcnt + 1) / (t + {N_BUCKETS}.0))
           - ln((rcnt + 1) / (r + {N_BUCKETS}.0)) AS lr
  FROM census, totals
),
scored AS (
  SELECT d.doc_id, d.lang,
         CAST(sum(d.cnt) AS BIGINT) AS n_grams,
         CAST(sum(CAST(d.cnt * r.lr AS DECIMAL(25,15))) AS DOUBLE) AS logw_d
  FROM db d JOIN ratio r USING (bucket)
  GROUP BY 1, 2
)
SELECT doc_id, lang, n_grams,
       round(logw_d, 6) + CAST(0.0 AS DOUBLE) AS logw,
       round(logw_d + (
         -ln(-ln(((('0x' || substr(md5('dsir:' || CAST(doc_id AS VARCHAR)),
                          1, 8))::BIGINT) + 0.5) / {_U32!r}))
       ), 6) + CAST(0.0 AS DOUBLE) AS gkey
FROM scored
"""

QUERIES: dict = {}

QUERIES_TAIL = {
    "q_dsir_scores": q_dsir_scores,
}

ORACLE = {
    "q_dsir_scores": _DSIR_ORACLE,
}
