"""Phrase-blocklist filtering — the keyword/NSFW scrub stage a
curation pipeline runs beside PII redaction (curation.py): flag (or
drop) every document containing any phrase from a blocklist, where a
phrase is one or more whitespace tokens matched EXACTLY at token
boundaries (substring regex matching is both wrong — "class" hits
"classify" — and unindexable at list sizes regexes choke on).

Relational shape: phrases group by token LENGTH on the driver (the
blocklist is an operator input — KBs, bounded); for each distinct
length L the corpus's L-gram hashes join the broadcast phrase-hash
set, all lengths unioned before one per-doc aggregate. The corpus
side is scan → gram hash → broadcast semi-probe per distinct length
(a handful — real blocklists are 1-5 token phrases), with only the
narrow per-doc hit census shuffling. This is the contamination-check
machinery (curation._ngram_hashes idiom) pointed at a phrase list
instead of a benchmark corpus; at blocklist sizes past broadcast
comfort, swap the broadcast join for bloom.bloom_probe over the same
grams — the ops compose because both match on the same gram unit.

Matching is case-insensitive on lower(); the contract row's md5 seam
replays hashing in DuckDB, production uses xxhash64.

Reference tie-in: extension tier (SURVEY §2.8), the X13 curation
family's third leg (decontaminate = drop by benchmark overlap,
redact_pii = rewrite by pattern, blocklist = drop/flag by phrase).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import documents, fan_out


def _gram_hash(g, gram_hash: str):
    if gram_hash == "md5":
        return F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("bigint")
    return F.xxhash64(g)


def blocklist_hits(
    docs: DataFrame,
    phrases: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    gram_hash: str = "xxhash64",
) -> DataFrame:
    """Per-document hit census: ``n_hits`` (distinct blocklist phrases
    present) and ``hit`` (BIGINT flag), one row per INPUT doc (zero
    hits included — the join is a left probe, so the output is a full
    audit table, not just the flagged slice). Phrases are matched
    case-insensitively at token boundaries."""
    if not phrases:
        raise ValueError("empty blocklist")
    by_len: dict[int, list[str]] = {}
    for p in phrases:
        toks = p.lower().split()
        if not toks:
            raise ValueError(f"blank blocklist phrase: {p!r}")
        by_len.setdefault(len(toks), []).append(" ".join(toks))

    toks = F.split(F.lower(F.trim(F.col(text_col))), r"[ \t\n\x0B\f\r]+")
    spark = docs.sparkSession
    docs = fan_out(docs)  # CPU-bound gram pass (the playbook gate)
    base = docs.select(F.col(id_col), toks.alias("__t"))

    # factory, NOT a default-arg closure: a two-arg transform lambda
    # receives (element, index) and would silently bind the INDEX to
    # the default (the playbook F.transform trap)
    def gram_fn(length: int):
        return lambda i: _gram_hash(
            F.concat_ws(" ", F.slice(F.col("__t"), i + 1, length)),
            gram_hash,
        )

    # ONE corpus scan for every phrase length (round 15 — was one
    # base.select per length, so documents scanned once per distinct
    # phrase length): a lengths->gram-array map explodes into
    # (length, arr) rows, the inner explode yields the same
    # (id, length, gram_h) stream the per-length probes produced, and
    # the semi-join side carries the length so cross-length hash
    # matches stay impossible (exactly the old per-length-probe
    # semantics).
    lens = sorted(by_len)
    gram_arrays = []
    side_rows = []
    for length in lens:
        grams = F.transform(
            F.sequence(
                F.lit(0), F.greatest(F.size("__t") - length, F.lit(0))
            ),
            gram_fn(length),
        )
        gram_arrays.append(F.array_distinct(grams))
        side_rows.extend(
            (length, p) for p in sorted(set(by_len[length]))
        )
    m = F.map_from_arrays(
        F.array(*[F.lit(L) for L in lens]), F.array(*gram_arrays)
    )
    side = spark.createDataFrame(
        side_rows, "glen int, phrase string"
    ).select("glen", _gram_hash(F.col("phrase"), gram_hash).alias("gram_h"))
    hits = (
        base.select(F.col(id_col), F.explode(m).alias("glen", "harr"))
        .select(id_col, "glen", F.explode("harr").alias("gram_h"))
        .join(F.broadcast(side), ["glen", "gram_h"], "left_semi")
    )
    census = hits.groupBy(id_col).agg(
        F.count_distinct("gram_h").cast("bigint").alias("n_hits")
    )
    return (
        docs.select(id_col)
        .join(census, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("bigint").alias(
                "n_hits"
            ),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0)
            .cast("bigint")
            .alias("hit"),
        )
    )


def blocklist_filter(
    docs: DataFrame,
    phrases: list[str],
    id_col: str = "doc_id",
    **kwargs,
) -> DataFrame:
    """Drop every document containing any blocklist phrase (the
    decontaminate() shape: anti-join against the flagged id set)."""
    flagged = (
        blocklist_hits(docs, phrases, id_col=id_col, **kwargs)
        .where(F.col("hit") == 1)
        .select(id_col)
    )
    return docs.join(flagged, id_col, "left_anti")


# the contract blocklist: phrases drawn from the synthetic vocabulary
# at MODERATE document frequency (measured 1-41 docs of 500 each) so
# the census is discriminative — ~20% flagged, not 90% — with real
# hits at every token length (1, 2, and 3)
BLOCKLIST = [
    "dup",
    "slow query",
    "big table",
    "vector stream",
    "hash join key",
]


def q_blocklist_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract (tail, round 10): the per-doc blocklist audit census
    over the documents table — 5 phrases spanning three token lengths,
    md5 seam; DuckDB replays the per-length gram hashing, the semi
    probes, and the zero-hit left join cell-exactly."""
    docs = documents(spark, sf_dir).select("doc_id", "text")
    return blocklist_hits(docs, BLOCKLIST, gram_hash="md5")


def _phrase_sql_list(length: int) -> str:
    plist = sorted(
        {" ".join(p.lower().split()) for p in BLOCKLIST
         if len(p.split()) == length}
    )
    return ", ".join("'" + p.replace("'", "''") + "'" for p in plist)


def _blocklist_oracle() -> str:
    legs = []
    for length in sorted({len(p.split()) for p in BLOCKLIST}):
        legs.append(rf"""
  SELECT doc_id, gram_h FROM (
    SELECT doc_id,
           unnest(list_distinct(list_transform(
             range(1, greatest(len(t) - {length}, 0) + 2),
             i -> (('0x' || substr(md5(array_to_string(
                     list_slice(t, i, i + {length} - 1), ' ')), 1, 8))::BIGINT)
           ))) AS gram_h
    FROM toks
  )
  WHERE gram_h IN (
    SELECT (('0x' || substr(md5(phrase), 1, 8))::BIGINT)
    FROM (SELECT unnest([{_phrase_sql_list(length)}]) AS phrase)
  )""")
    unioned = "\n  UNION ALL\n".join(legs)
    return rf"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '[ \t\n\x0B\f\r]+') AS t
  FROM documents
),
hits AS (
{unioned}
),
census AS (
  SELECT doc_id, count(DISTINCT gram_h) AS n_hits FROM hits GROUP BY 1
)
SELECT d.doc_id,
       CAST(COALESCE(c.n_hits, 0) AS BIGINT) AS n_hits,
       CAST(COALESCE(c.n_hits, 0) > 0 AS BIGINT) AS hit
FROM (SELECT DISTINCT doc_id FROM toks) d
LEFT JOIN census c USING (doc_id)
"""


QUERIES: dict = {}
QUERIES_TAIL = {"q_blocklist_hits": q_blocklist_hits}
ORACLE = {"q_blocklist_hits": _blocklist_oracle()}
