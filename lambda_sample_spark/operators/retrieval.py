"""BM25 keyword retrieval (SURVEY.md §2.8 adjunct): score documents
against a term query with Okapi BM25 and return the top-k — the
ranked-retrieval layer over the X29 inverted index (X29 stores
postings; this ranks them), and the lexical counterpart of the X3
embedding top-k.

Scale notes: corpus statistics (N, total token length, per-term
document frequencies) are a CONSTANT-width census — one eager
aggregate over the token arrays (no explode: array_contains /
size() per row), collected and inlined as integer literals (the
DSIR idiom; integers inline exactly, all double math stays in-engine
so the oracle replays it bit-for-bit). The lazy scoring plan is then
a SINGLE corpus scan with zero joins and zero shuffles: per-row term
frequencies via array filters (bounded by |query|), the BM25
polynomial as a fixed expression over inlined stats, and global
top-k as sort-limit (TakeOrdered — no range exchange). At 100 TB
the census pass amortizes across queries (it is query-independent
except for df, which the X29 index already materializes per term).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import documents, r6

QUERY_TERMS = ("spark", "join", "filter")
K1 = 1.2
B = 0.75
TOP_K = 20


def _toks(c: Column) -> Column:
    # the pinned whitespace tokenizer seam (text.py:26 <-> DuckDB
    # regexp_split_to_array, parity asserted by q_token_count)
    return F.split(F.trim(c), r"[ \t\n\x0B\f\r]+")


def bm25_topk(
    docs: DataFrame,
    terms: tuple[str, ...] = QUERY_TERMS,
    k: int = TOP_K,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents by BM25 score for ``terms``:
    (doc_id, tf_<term>..., score). Ties at the cut break on doc_id
    so the selected set is deterministic."""
    toks = _toks(F.col(text_col))

    # constant-width corpus census, one eager pass, integer results
    census = docs.select(
        F.size(toks).alias("len"),
        *[
            F.array_contains(toks, t).cast("int").alias(f"c_{i}")
            for i, t in enumerate(terms)
        ],
    ).agg(
        F.count("*").alias("n"),
        F.sum("len").alias("tl"),
        *[F.sum(f"c_{i}").alias(f"df_{i}") for i in range(len(terms))],
    ).first()
    n, total_len = int(census["n"]), int(census["tl"])
    dfs = [int(census[f"df_{i}"]) for i in range(len(terms))]

    avgdl = F.lit(total_len).cast("double") / F.lit(n)

    def _eq(term: str):
        # single-arg lambda: a 2-arg one would receive (element, index)
        return lambda x: x == F.lit(term)

    base = docs.select(
        F.col(id_col),
        F.size(toks).alias("len"),
        *[
            F.size(F.filter(toks, _eq(t))).cast("bigint").alias(f"tf_{t}")
            for t in terms
        ],
    )
    score = F.lit(0.0)
    for i, t in enumerate(terms):
        tf = F.col(f"tf_{t}")
        idf = F.log(
            (F.lit(n - dfs[i]) + F.lit(0.5))
            / (F.lit(dfs[i]) + F.lit(0.5))
            + F.lit(1.0)
        )
        norm = (tf * (F.lit(K1) + F.lit(1.0))) / (
            tf
            + F.lit(K1)
            * (F.lit(1.0) - F.lit(B) + F.lit(B) * (F.col("len") / avgdl))
        )
        score = score + idf * norm
    scored = base.select(
        id_col, *[f"tf_{t}" for t in terms], score.alias("raw")
    )
    return (
        scored.where(F.col("raw") > 0)
        .orderBy(F.desc("raw"), id_col)
        .limit(k)
        .select(
            id_col,
            *[f"tf_{t}" for t in terms],
            r6(F.col("raw")).alias("score"),
        )
    )


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract (tail, round 9): BM25 top-20 over documents for the
    fixed three-term query."""
    return bm25_topk(documents(spark, sf_dir))


def _oracle(terms: tuple[str, ...] = QUERY_TERMS) -> str:
    tf_exprs = ",\n".join(
        f"         len(list_filter(tk, x -> x = '{t}')) AS tf_{t}"
        for t in terms
    )
    df_exprs = ",\n".join(
        f"         count(*) FILTER (WHERE list_contains(tk, '{t}'))"
        f" AS df_{i}"
        for i, t in enumerate(terms)
    )
    score_terms = " + ".join(
        f"(ln((CAST(n - df_{i} AS DOUBLE) + CAST(0.5 AS DOUBLE))"
        f" / (CAST(df_{i} AS DOUBLE) + CAST(0.5 AS DOUBLE))"
        f" + CAST(1.0 AS DOUBLE))"
        f" * ((tf_{t} * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE)))"
        f" / (tf_{t} + CAST(1.2 AS DOUBLE)"
        f" * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)"
        f" + CAST(0.75 AS DOUBLE)"
        f" * (len / (CAST(tl AS DOUBLE) / n))))))"
        for i, t in enumerate(terms)
    )
    tf_out = ", ".join(
        f"CAST(tf_{t} AS BIGINT) AS tf_{t}" for t in terms
    )
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+') AS tk
  FROM documents
), stats AS (
  SELECT count(*) AS n, sum(len(tk)) AS tl,
{df_exprs}
  FROM toks
), scored AS (
  SELECT doc_id,
{tf_exprs},
         len(tk) AS len
  FROM toks
), ranked AS (
  SELECT doc_id, {', '.join('tf_' + t for t in terms)},
         {score_terms} AS raw
  FROM scored CROSS JOIN stats
)
SELECT doc_id, {tf_out}, round(raw, 6) AS score
FROM ranked WHERE raw > 0
ORDER BY raw DESC, doc_id
LIMIT {TOP_K}
"""


QUERIES: dict = {}

QUERIES_TAIL = {"q_bm25_topk": q_bm25_topk}

ORACLE = {"q_bm25_topk": _oracle()}
