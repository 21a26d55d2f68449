"""Exact substring dedup (the suffix-array family of Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better") — find and
remove every maximal corpus passage of length >= ``min_len`` chars
that occurs at least ``min_count`` times ANYWHERE in the corpus
(cross-doc or within-doc).

This is the exact counterpart of the winnowing row (text.py:
winnow_near_dup flags doc PAIRS sharing a sketch; this op localizes
the shared bytes themselves) — the same "shared passage" semantic the
reference's analysis queries approximate, made exact. Reference
tie-in: SURVEY.md §2.8 dedup family; lambda-sample has no native
equivalent (its analyzer dedups whole readings), so the semantics
follow the published ExactSubstr spec.

Equivalence argument (why grams give the EXACT answer, no suffix
array needed): a character is inside some repeated substring of
length >= L  <=>  it is inside some repeated L-gram. (=>: if S with
|S| >= L repeats, every L-window of S repeats, and each char of S
lies in one; <=: a repeated L-gram IS a repeated substring of length
L.) So the union of repeated-L-gram extents equals the union of
repeated substrings of length >= L — Lee et al.'s removal set — and
merging overlapping-or-adjacent gram extents yields its maximal
spans.

100 TB shape: one pass emits (doc_id, pos, gram-hash) — the shuffle
is hash-sized (8 B/position on the production path), never document
text; duplicated positions come (default) from a partial-aggregated
gram count joined back over the positions — the skew-safe choice: a
boilerplate gram collapses to one row per map partition before the
shuffle, and AQE broadcasts or skew-splits the join back (the
alternative count-over-gram window saves one exchange but funnels
every position of a hot gram into a single sorting reducer — kept as
``count_mode="window"`` for the frozen contract row and measured-
no-hot-gram corpora). Span merge is a per-doc lag window (state
bounded by doc length) and both downstream aggregates reuse the
doc_id clustering (HashPartitioning on doc_id satisfies the (doc_id,
run_id) ClusteredDistribution — zero further exchanges). Total
duplicated-position state is bounded by the duplicated bytes, not by
doc pairs — no all-pairs anywhere. The known cost is the L-gram
emission fan-out (n positions/doc); the production path ships 8-byte
hashes so shuffle volume is ~8 bytes/char regardless of L.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .common import documents


def _grams(docs: DataFrame, min_len: int, gram_col: str) -> DataFrame:
    """(doc_id, pos, gram) for every char position; ``gram_col``:
    "hash" ships xxhash64(gram) (production — 8 B/pos shuffle),
    "text" ships the gram string (oracle seam — DuckDB replays
    substr() exactly; both engines count CHARACTERS)."""
    spark = docs.sparkSession
    par = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        # single-file parquet leaves the CPU-bound gram emission on
        # one core (playbook hazard); no-op on real multi-split input
        docs = docs.repartition(par)
    g = F.expr(f"substring(text, pos, {min_len})")
    return (
        docs.where(F.length("text") >= min_len)
        .select(
            "doc_id",
            # sequence() DESCENDS when stop < start, hence the length
            # guard above; 1-based positions match substr on both engines
            F.explode(F.expr(f"sequence(1, length(text) - {min_len} + 1)")).alias(
                "pos"
            ),
            "text",
        )
        .select(
            "doc_id",
            "pos",
            (F.xxhash64(g) if gram_col == "hash" else g).alias("gram"),
        )
    )


def duplicated_spans(
    docs: DataFrame,
    min_len: int = 20,
    min_count: int = 2,
    gram_col: str = "hash",
    count_mode: str = "join",
) -> DataFrame:
    """Maximal duplicated spans: (doc_id, span_start, span_end),
    1-based char positions inclusive. A span is a maximal run of
    characters each covered by some corpus-repeated ``min_len``-gram
    (occurrences counted across the whole corpus, within-doc repeats
    included — the Lee et al. 2022 semantic).

    ``count_mode`` picks how duplicated grams are detected; results
    are identical, skew behavior is not:

    - ``"join"`` (default, the 100 TB choice): groupBy the gram counts
      (map-side partial combine collapses a hot gram to ONE row per
      map partition before the shuffle) and join the qualifying gram
      set back over the positions — AQE broadcasts the dup set when it
      is small and skew-splits the probe otherwise. Costs a second
      evaluation of the gram pass on the probe side (the steady-state
      path, incremental_substring.scrub_batch, materializes grams once
      and pays this exactly nowhere).
    - ``"window"`` (the contract row's pick: one fewer exchange, and
      the frozen plan/budget): count-over-gram window — NO partial
      aggregation, so every position of a boilerplate gram (a license
      header in 1% of a 100 TB corpus) lands on a single reducer and
      sorts there. Fine at test SFs and on corpora without hot grams.
    """
    grams = _grams(docs, min_len, gram_col)
    if count_mode == "window":
        wg = Window.partitionBy("gram")
        cov = (
            grams.withColumn("cnt", F.count("*").over(wg))
            .where(F.col("cnt") >= min_count)
            .select("doc_id", "pos")
        )
    else:
        # NOTE a pinned repartition before this groupBy would widen
        # the AQE-coalesced reducer stage but it replaces the agg's
        # own exchange and thereby DISCARDS map-side partial
        # aggregation — the exact mechanism that makes this mode
        # skew-safe (the hot gram must collapse per map task BEFORE
        # the shuffle). The bounded cost of keeping it: on
        # near-unique-gram corpora partial agg reduces little and AQE
        # sizes the final agg by bytes (32x rung: 1.75x slower than
        # the window) — a constant, versus the window's unbounded
        # hot-reducer loss.
        dup = (
            grams.groupBy("gram")
            .agg(F.count("*").alias("cnt"))
            .where(F.col("cnt") >= min_count)
            .select("gram")
        )
        cov = grams.join(dup, "gram").select("doc_id", "pos")
    wd = Window.partitionBy("doc_id").orderBy("pos")
    prev = F.lag("pos").over(wd)
    # equal-length extents [pos, pos+L-1]: covered chars stay
    # contiguous iff next pos <= prev pos + L, so a new span starts
    # strictly beyond that
    new_run = F.when(
        prev.isNull() | (F.col("pos") > prev + min_len), F.lit(1)
    ).otherwise(F.lit(0))
    runs = cov.withColumn(
        "run_id",
        F.sum(new_run).over(wd.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return runs.groupBy("doc_id", "run_id").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + F.lit(min_len - 1)).alias("span_end"),
    ).drop("run_id")


def substring_dedup_census(
    docs: DataFrame,
    min_len: int = 20,
    min_count: int = 2,
    gram_col: str = "hash",
    count_mode: str = "join",
) -> DataFrame:
    """Per-doc removal census over :func:`duplicated_spans` — the
    auditable summary a 100 TB run reports before committing removal:
    (doc_id, n_spans, dup_chars, max_span), docs with no duplicated
    span omitted."""
    spans = duplicated_spans(docs, min_len, min_count, gram_col, count_mode)
    span_len = F.col("span_end") - F.col("span_start") + 1
    return spans.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_spans"),
        F.sum(span_len).cast("bigint").alias("dup_chars"),
        F.max(span_len).cast("bigint").alias("max_span"),
    )


def remove_dup_spans(docs: DataFrame, spans: DataFrame) -> DataFrame:
    """Excise ``spans`` from each doc's text (Lee et al. drop the
    duplicated bytes, keeping the remainder): returns (doc_id, text)
    with every span removed; docs without spans pass through intact.

    Pure SQL reconstruction — the per-doc span list is tiny (bounded
    by doc length / min_len), so an interpreted aggregate() fold over
    the sorted spans is output-bound, keeps the whole op JVM-side,
    and avoids shipping doc text through Python."""
    per_doc = spans.groupBy("doc_id").agg(
        F.sort_array(
            F.collect_list(F.struct("span_start", "span_end"))
        ).alias("spans")
    )
    rebuilt = F.expr(
        """
        aggregate(
          spans,
          struct(1 AS p, '' AS acc),
          (st, sp) -> struct(
            sp.span_end + 1 AS p,
            concat(st.acc, substring(text, st.p, sp.span_start - st.p)) AS acc
          ),
          st -> concat(st.acc, substring(text, st.p, length(text) - st.p + 1))
        )
        """
    )
    return docs.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.when(F.col("spans").isNull(), F.col("text"))
        .otherwise(rebuilt)
        .alias("text"),
    )


def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract (tail, round 10): exact-substring dedup census on the
    documents table — per-doc count/char-volume/max-length of maximal
    duplicated passages (min_len=20, min_count=2). Oracle seam: grams
    compared as strings (gram_col="text") so DuckDB replays substr()
    byte-for-byte; the production path ships xxhash64 instead."""
    return substring_dedup_census(
        documents(spark, sf_dir),
        min_len=20,
        min_count=2,
        gram_col="text",
        # the frozen plan/budget: one fewer exchange, no hot gram at
        # contract SFs; the library default is the skew-safe join
        count_mode="window",
    )


_SUBSTR_ORACLE = """
WITH g AS (
  SELECT d.doc_id, p.pos, substr(d.text, p.pos::INT, 20) AS gram
  FROM documents d,
       LATERAL (SELECT unnest(range(1, length(d.text) - 18)) AS pos) p
  WHERE length(d.text) >= 20
),
dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
cov AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (gram)),
isl AS (
  SELECT doc_id, pos,
    CASE WHEN lag(pos) OVER w IS NULL OR pos > lag(pos) OVER w + 20
         THEN 1 ELSE 0 END AS new_run
  FROM cov WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
runs AS (
  SELECT doc_id, pos,
    SUM(new_run) OVER (
      PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING
    ) AS run_id
  FROM isl
),
spans AS (
  SELECT doc_id, run_id, min(pos) AS s, max(pos) + 19 AS e
  FROM runs GROUP BY doc_id, run_id
)
SELECT doc_id,
       count(*)::BIGINT AS n_spans,
       SUM(e - s + 1)::BIGINT AS dup_chars,
       max(e - s + 1)::BIGINT AS max_span
FROM spans GROUP BY doc_id
"""

QUERIES: dict = {}
QUERIES_TAIL = {"q_substring_dedup": q_substring_dedup}
ORACLE = {"q_substring_dedup": _SUBSTR_ORACLE}
