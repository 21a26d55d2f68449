"""Span corruption (T5, Raffel et al. 2020): turn clean documents
into (input, target) pairs for masked-span pretraining — contiguous
token spans are replaced by numbered sentinels in the input, and the
target lists each sentinel followed by the tokens it hid, closed by a
final sentinel. This is the target-CONSTRUCTION stage of a training
pipeline, downstream of curation and upstream of packing
(training.pack_documents takes the emitted pairs).

Deterministic grid variant: T5's sampler draws span lengths and
positions from an RNG; a 100 TB pipeline wants the corruption to be a
pure function of (doc, position) so re-runs, resumed shards, and both
engines agree. Every FULL block of ``block`` tokens hides exactly one
span of length 2..4 (mean 3 — with block=16 that is T5's ~18%
noise density), the span's length and offset drawn from hash PRNs of
(doc_id, block): corruption rate is exact by construction, spans
never touch block boundaries, and the whole thing replays in DuckDB
through the md5 seam. The sub-block tail keeps its tokens unmasked
(documented; a <block-token doc passes through clean with an
empty-mask target — the degenerate T5 pair).

Implementation is per-row array algebra (sequence over blocks →
per-block slice/concat → flatten), zero shuffle, no Python. The
higher-order lambdas are interpreted per element (playbook) — here
they run once per BLOCK (n/16 evaluations of O(block) slices), not
per token pair, and the contract row's plan has no Exchange at all;
an explode-based formulation would pay a per-doc reassembly shuffle
instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import documents

BLOCK = 16
MIN_SPAN = 2
SPAN_CHOICES = 3  # lengths MIN_SPAN .. MIN_SPAN + SPAN_CHOICES - 1


def _prn(salt: str, doc_id, b, gram_hash: str):
    """Deterministic PRN in [0, 2^32) from (salt, doc, block)."""
    key = F.concat(
        F.lit(salt), doc_id.cast("string"), F.lit(":"), b.cast("string")
    )
    if gram_hash == "md5":
        return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint")
    return F.pmod(F.xxhash64(key), F.lit(1 << 32))


def span_corrupt(
    docs: DataFrame,
    block: int = BLOCK,
    id_col: str = "doc_id",
    text_col: str = "text",
    gram_hash: str = "xxhash64",
) -> DataFrame:
    """One row per doc: ``n_tokens``, ``n_spans`` (= full blocks),
    ``input_text`` (spans replaced by ``<extra_id_k>``), and
    ``target_text`` (each sentinel + its hidden tokens, closed by the
    final sentinel ``<extra_id_n_spans>``)."""
    did = F.col(id_col)
    toks = F.split(F.trim(F.col(text_col)), r"[ \t\n\x0B\f\r]+")
    n = F.size(toks)
    n_blocks = F.floor(n / F.lit(block)).cast("int")
    blocks = F.when(
        n_blocks >= 1,
        F.sequence(F.lit(0), (n_blocks - 1).cast("bigint")),
    ).otherwise(F.array().cast("array<bigint>"))

    def span_len(b):
        return MIN_SPAN + F.pmod(_prn("sc1:", did, b, gram_hash), F.lit(SPAN_CHOICES))

    def sentinel(k):
        return F.concat(F.lit("<extra_id_"), k.cast("string"), F.lit(">"))

    arr = F.col("__t")

    # stage the per-block (b, ln, off) draws ONCE: the PRN is an
    # interpreted md5/xxhash per evaluation, and the first cut
    # re-derived it inside every fragment reference (~10 hash evals
    # per block per row — review catch); two nested transforms compute
    # each salt exactly once, and the staged __sp column is referenced
    # by both output strings
    spans = F.transform(
        F.transform(
            F.col("__b"),
            lambda b: F.struct(b.alias("b"), span_len(b).alias("ln")),
        ),
        lambda s: F.struct(
            s["b"].alias("b"),
            s["ln"].alias("ln"),
            F.pmod(
                _prn("sc2:", did, s["b"], gram_hash),
                F.lit(block) + 1 - s["ln"],
            ).alias("off"),
        ),
    )

    def input_frag(s):
        base = (s["b"] * block).cast("int")
        off = s["off"].cast("int")
        ln = s["ln"].cast("int")
        return F.concat(
            F.slice(arr, base + 1, off),
            F.array(sentinel(s["b"])),
            F.slice(arr, base + off + ln + 1, F.lit(block) - off - ln),
        )

    def target_frag(s):
        base = (s["b"] * block).cast("int")
        off = s["off"].cast("int")
        ln = s["ln"].cast("int")
        return F.concat(
            F.array(sentinel(s["b"])), F.slice(arr, base + off + 1, ln)
        )

    tail = F.slice(
        arr,
        (F.col("__nb") * block + 1).cast("int"),
        F.col("__n") - F.col("__nb") * block,
    )
    input_text = F.array_join(
        F.concat(F.flatten(F.transform(F.col("__sp"), input_frag)), tail),
        " ",
    )
    target_text = F.array_join(
        F.concat(
            F.flatten(F.transform(F.col("__sp"), target_frag)),
            F.array(sentinel(F.col("__nb"))),
        ),
        " ",
    )
    return (
        docs.select(
            did,
            toks.alias("__t"),
            n.alias("__n"),
            n_blocks.alias("__nb"),
            blocks.alias("__b"),
        )
        .select(
            id_col, "__t", "__n", "__nb", spans.alias("__sp")
        )
        .select(
            id_col,
            F.col("__n").cast("bigint").alias("n_tokens"),
            F.col("__nb").cast("bigint").alias("n_spans"),
            input_text.alias("input_text"),
            target_text.alias("target_text"),
        )
    )


def q_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract (tail, round 10): deterministic span corruption over
    the documents table (block 16, spans 2-4, md5 PRN seam) — the
    full input/target strings hash-compare, pinning the PRN draws,
    every slice boundary, the sentinel numbering, and the tail and
    short-doc degenerate cases."""
    return span_corrupt(
        documents(spark, sf_dir).select("doc_id", "text"), gram_hash="md5"
    )


_CORRUPT_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+') AS t,
         len(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+')) AS n
  FROM documents
),
meta AS (
  SELECT doc_id, t, n, CAST(floor(n / {BLOCK}.0) AS BIGINT) AS nb
  FROM toks
),
spans AS (
  SELECT doc_id, b.b,
         {MIN_SPAN} + (('0x' || substr(md5('sc1:' || CAST(doc_id AS VARCHAR)
               || ':' || CAST(b.b AS VARCHAR)), 1, 8))::BIGINT)
             % {SPAN_CHOICES} AS ln
  FROM meta, LATERAL (SELECT unnest(range(0, nb)) AS b) b
),
placed AS (
  SELECT doc_id, b, ln,
         (('0x' || substr(md5('sc2:' || CAST(doc_id AS VARCHAR)
               || ':' || CAST(b AS VARCHAR)), 1, 8))::BIGINT)
             % ({BLOCK} + 1 - ln) AS off
  FROM spans
),
frags AS (
  SELECT p.doc_id, p.b,
         list_concat(
           list_concat(
             list_slice(m.t, p.b * {BLOCK} + 1, p.b * {BLOCK} + p.off),
             ['<extra_id_' || CAST(p.b AS VARCHAR) || '>']),
           list_slice(m.t, p.b * {BLOCK} + p.off + p.ln + 1,
                      (p.b + 1) * {BLOCK})
         ) AS in_frag,
         list_concat(
           ['<extra_id_' || CAST(p.b AS VARCHAR) || '>'],
           list_slice(m.t, p.b * {BLOCK} + p.off + 1,
                      p.b * {BLOCK} + p.off + p.ln)
         ) AS tg_frag
  FROM placed p JOIN meta m USING (doc_id)
),
assembled AS (
  SELECT doc_id,
         flatten(list(in_frag ORDER BY b)) AS in_body,
         flatten(list(tg_frag ORDER BY b)) AS tg_body
  FROM frags GROUP BY doc_id
)
SELECT m.doc_id,
       CAST(m.n AS BIGINT) AS n_tokens,
       m.nb AS n_spans,
       array_to_string(
         list_concat(COALESCE(a.in_body, []),
                     list_slice(m.t, m.nb * {BLOCK} + 1, m.n)), ' ')
         AS input_text,
       array_to_string(
         list_concat(COALESCE(a.tg_body, []),
                     ['<extra_id_' || CAST(m.nb AS VARCHAR) || '>']), ' ')
         AS target_text
FROM meta m LEFT JOIN assembled a USING (doc_id)
"""

QUERIES: dict = {}
QUERIES_TAIL = {"q_span_corruption": q_span_corruption}
ORACLE = {"q_span_corruption": _CORRUPT_ORACLE}
