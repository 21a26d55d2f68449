"""Document chunking for embedding / RAG ingestion: split each
document into fixed-size token windows with overlap — the standard
pre-embedding stage (every retrieval pipeline runs it between curation
and the ANN index build; similarity.py/pq.py consume its output).

Windowing rule (the common sliding-window loop, replayed relationally):
emit the window at 0; while the last window does not reach the end,
advance by ``stride = max_tokens − overlap``. So
``n_chunks = 1 + ceil((n − max_tokens) / stride)`` for n > max_tokens,
else 1 — trailing windows shorter than ``max_tokens`` are emitted
as-is and no window is ever a strict suffix-duplicate of its
predecessor (the naive 0..n−1-step-stride enumeration DOES emit such
dead tails; the loop rule stops instead).

100 TB: this is a pure per-row projection — sequence + posexplode +
slice, all codegen'd; ZERO shuffles, no Python (the contract row's
plan has no Exchange at all). Output size is input × ~(1/(1−overlap
ratio)); downstream embedding/indexing dominates. The ceil() is
written explicitly on BOTH engines (playbook: Spark casts truncate,
DuckDB casts round — never share an implicit cast).

Reference tie-in: extension tier (SURVEY §2.8), the missing front of
the X3/PQ similarity stack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import documents

MAX_TOKENS = 32
OVERLAP = 8


def chunk_documents(
    docs: DataFrame,
    max_tokens: int = MAX_TOKENS,
    overlap: int = OVERLAP,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """One row per (doc, window): ``chunk_id`` (0-based), ``chunk_start``
    (token offset), ``n_tokens`` (≤ max_tokens; trailing windows are
    shorter), ``chunk_text`` (space-rejoined window). ``carry_cols``
    ride along (cheap per-row constants)."""
    if not (0 <= overlap < max_tokens):
        raise ValueError("need 0 <= overlap < max_tokens")
    stride = max_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"[ \t\n\x0B\f\r]+")
    n = F.size(toks)
    n_chunks = F.when(n <= max_tokens, F.lit(1)).otherwise(
        1 + F.ceil((n - max_tokens) / F.lit(float(stride)))
    )
    starts = F.sequence(
        F.lit(0).cast("bigint"),
        ((n_chunks - 1) * stride).cast("bigint"),
        F.lit(stride).cast("bigint"),
    )
    win = F.slice(F.col("__t"), (F.col("chunk_start") + 1).cast("int"), max_tokens)
    return (
        docs.select(
            F.col(id_col), *carry_cols, toks.alias("__t"), starts.alias("__s")
        )
        .select(
            id_col,
            *carry_cols,
            F.col("__t"),
            F.posexplode("__s").alias("chunk_id", "chunk_start"),
        )
        .select(
            id_col,
            *carry_cols,
            F.col("chunk_id").cast("bigint").alias("chunk_id"),
            "chunk_start",
            F.size(win).cast("bigint").alias("n_tokens"),
            F.array_join(win, " ").alias("chunk_text"),
        )
    )


def q_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract (tail, round 10): 32-token windows with 8-token
    overlap over the documents table — one row per window with offset,
    length, and the window text itself (strings compare exactly, so
    the oracle pins the whole windowing rule including the ceil()
    stop condition and trailing short windows)."""
    return chunk_documents(documents(spark, sf_dir).select("doc_id", "text"))


_CHUNK_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+') AS t,
         len(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+')) AS n
  FROM documents
),
meta AS (
  SELECT doc_id, t,
         CASE WHEN n <= {MAX_TOKENS} THEN 1
              ELSE 1 + CAST(ceil((n - {MAX_TOKENS})
                                 / {MAX_TOKENS - OVERLAP}.0) AS BIGINT)
         END AS n_chunks
  FROM toks
)
SELECT doc_id,
       CAST(i.i AS BIGINT) AS chunk_id,
       CAST(i.i * {MAX_TOKENS - OVERLAP} AS BIGINT) AS chunk_start,
       CAST(len(list_slice(t, i.i * {MAX_TOKENS - OVERLAP} + 1,
                           i.i * {MAX_TOKENS - OVERLAP} + {MAX_TOKENS}))
            AS BIGINT) AS n_tokens,
       array_to_string(list_slice(t, i.i * {MAX_TOKENS - OVERLAP} + 1,
                                  i.i * {MAX_TOKENS - OVERLAP} + {MAX_TOKENS}),
                       ' ') AS chunk_text
FROM meta, LATERAL (SELECT unnest(range(0, n_chunks)) AS i) i
"""

QUERIES: dict = {}
QUERIES_TAIL = {"q_chunk_windows": q_chunk_windows}
ORACLE = {"q_chunk_windows": _CHUNK_ORACLE}
