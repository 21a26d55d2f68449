"""Corpus curation ops (north star §2.8 adjuncts): benchmark
decontamination, PII redaction, and deterministic training-order
shuffle — the steps a 100 TB pretraining pipeline runs between dedup
and packing. Most are library ops DuckDB-oracle-checked in
tests/test_curation.py; per-source frequency capping additionally
registers as the oracle-checked contract TAIL query ``q_source_cap``
(QUERIES_TAIL below — appended after the frozen first-50 driver
window, which edits here can therefore never move).

Scale notes: decontamination is an n-gram-hash equi-join — corpus-side
work is one pass + one shuffle on the hash (or zero shuffles when the
benchmark side fits a broadcast, the common case: eval sets are MBs).
PII redaction is chained ``regexp_replace`` — JVM codegen, no Python.
The shuffle is a sort by a keyed hash: deterministic, seedable, and
executed as one range-partitioned sort (no RNG column to persist).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .common import exploded_ngrams

# --- decontamination ---------------------------------------------------


def _ngram_hashes(
    docs: DataFrame, id_col: str, text_col: str, n: int, gram_hash: str = "xxhash64"
) -> DataFrame:
    """One row per (id, n-gram occurrence hash) — token n-grams (the
    GPT-3-style contamination unit). ``gram_hash='md5'`` uses the
    first md5 word instead — the DuckDB-replayable oracle seam (the
    winnowing idiom); production stays on xxhash64.

    Plan shape (round 15, guide §4.1 "prefer built-ins/codegen"): the
    sliding window is ``arrays_zip`` of ``n`` shifted ``slice``s of the
    token array, EXPLODED first, with concat_ws + hash running as
    row-level codegen expressions. The previous formulation computed
    the hash inside ``F.transform`` — higher-order lambdas are
    CodegenFallback, so every slice/concat/hash evaluated interpreted
    per element (measured 3.7 s -> 0.8 s for the md5 corpus pass at
    sf0.1, 5x for xxhash64). concat_ws skips the NULLs arrays_zip pads
    past the end, so gram i equals concat_ws(' ', slice(toks, i, n))
    exactly, clamped tail included.

    Duplicate grams within a doc are now emitted (the old shape
    array_distinct'ed per doc before exploding): both consumers
    aggregate with count_distinct / distinct downstream, so results
    are identical — and at scale not materializing the distinct gram
    array per doc is the cheaper side of the trade anyway."""
    toks = F.split(F.trim(F.col(text_col)), r"[ \t\n\x0B\f\r]+")
    rows = exploded_ngrams(docs, (id_col,), toks, n)
    gram = F.col("gram")
    if gram_hash == "md5":
        h = F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("bigint")
    else:
        h = F.xxhash64(gram)
    return rows.select(F.col(id_col), h.alias("gram_h"))


def contamination_check(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "text",
    broadcast_benchmark: bool = True,
    gram_hash: str = "xxhash64",
) -> DataFrame:
    """Flag training documents sharing any token ``n``-gram with an
    evaluation benchmark (the n=13 overlap rule used for pretraining
    decontamination). Returns one row per contaminated (doc, benchmark
    item): ``doc_id, bench_id, shared_ngrams``.

    Docs shorter than ``n`` tokens produce their full-text gram (the
    slice clamps), so short verbatim copies are still caught. The
    benchmark side is broadcast by default — eval sets are tiny next
    to the corpus — making the corpus-side plan scan+explode+
    broadcast-join with NO shuffle of corpus data; set
    ``broadcast_benchmark=False`` to co-shuffle both sides on the
    gram hash when the benchmark is itself huge."""
    doc_grams = _ngram_hashes(docs, id_col, text_col, n, gram_hash)
    bench_grams = _ngram_hashes(
        benchmark.select(
            F.col(bench_id_col).alias("bench_id"),
            F.col(bench_text_col).alias("__btext"),
        ),
        "bench_id",
        "__btext",
        n,
        gram_hash,
    )
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)
    return (
        doc_grams.join(bench_grams, "gram_h")
        .groupBy(id_col, "bench_id")
        .agg(F.count_distinct("gram_h").alias("shared_ngrams"))
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    **kwargs,
) -> DataFrame:
    """Drop every contaminated document: left-anti join against the
    contaminated id set."""
    hits = contamination_check(
        docs, benchmark, n=n, id_col=id_col, text_col=text_col, **kwargs
    ).select(id_col).distinct()
    return docs.join(hits, id_col, "left_anti")


# --- PII redaction -----------------------------------------------------

# pattern -> replacement token; order matters (emails before bare
# domains would, e.g., matter in a fuller set). Patterns are anchored
# on non-word boundaries so they compose under chaining.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (
        "phone",
        r"(?:\+?\d{1,3}[-. ]?)?(?:\(\d{3}\)|\d{3})[-. ]?\d{3}[-. ]?\d{4}\b",
        "<PHONE>",
    ),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
]


def redact_pii(
    docs: DataFrame, text_col: str = "text", count_hits: bool = True
) -> DataFrame:
    """Replace common PII shapes (email, IPv4, phone, SSN) with typed
    redaction tokens. Chained ``regexp_replace`` — one codegen'd
    projection, no Python, no extra pass. With ``count_hits`` each
    class also gets a ``n_<class>`` column (match count BEFORE
    redaction) so downstream filters can drop PII-dense docs without
    re-scanning."""
    out = docs
    c = F.col(text_col)
    if count_hits:
        for name, pat, _ in PII_PATTERNS:
            out = out.withColumn(
                f"n_{name}", F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0)))
            )
    red = c
    for _, pat, tok in PII_PATTERNS:
        red = F.regexp_replace(red, pat, tok)
    return out.withColumn(text_col, red)


# --- deterministic training-order shuffle ------------------------------


def deterministic_shuffle(
    docs: DataFrame,
    seed: int = 0,
    key_col: str = "doc_id",
    n_shards: int | None = None,
) -> DataFrame:
    """Global pseudo-random training order that is a pure function of
    (key, seed): sort by ``xxhash64(key, seed)``. Reproducible across
    runs and cluster sizes (no RNG column, no partition-order
    dependence), re-seedable per epoch, and executed as ONE
    range-partitioned sort. With ``n_shards`` the result is instead
    hash-bucketed into that many shards and sorted within each —
    the layout training loaders consume (shard files, locally
    shuffled) without a global sort's full range exchange."""
    h = F.xxhash64(F.col(key_col), F.lit(seed))
    if n_shards is None:
        return docs.orderBy(h)
    shard = F.pmod(h, F.lit(n_shards)).cast("int")
    return (
        docs.withColumn("shard", shard)
        # range-partition on the shard id (hash-repartition would fold
        # several shard ids into one output partition and leave others
        # empty), and keep shard as the leading sort key so shards stay
        # CONTIGUOUS even when a sampled range boundary puts two shard
        # ids in one partition — the shard-files-locally-shuffled
        # layout the docstring promises
        .repartitionByRange(n_shards, "shard")
        .sortWithinPartitions(
            "shard", F.xxhash64(F.col(key_col), F.lit(seed + 1))
        )
    )


def shard_order(
    docs: DataFrame,
    seed: int = 0,
    key_col: str = "doc_id",
    n_shards: int = 64,
    hash: str = "xxhash64",
) -> DataFrame:
    """The training-loader view of ``deterministic_shuffle``'s sharded
    mode AS DATA: every row gets its (shard, pos) — which shard file
    it lands in and its position within the shard's local shuffle —
    instead of a physical layout. Pure function of (key, seed): same
    hash-bucketed sharding, same within-shard pseudo-random order (an
    independent salt), NULLS LAST pinned on both sort keys (Spark and
    DuckDB default NULL order differ). ``hash='md5'`` swaps both draws
    for the md5 seam so a SQL oracle replays the full epoch order.

    One window shuffle on shard (64-ary by default — no global range
    sort, the reason the sharded mode exists)."""
    from pyspark.sql.window import Window

    key_str = F.col(key_col).cast("string")
    if hash == "md5":
        digest = F.md5(F.concat(F.lit(f"shard:{seed}:"), key_str))
        word = F.conv(F.substring(digest, 1, 8), 16, 10).cast("bigint")
        order_key = F.md5(F.concat(F.lit(f"order:{seed}:"), key_str))
    else:
        word = F.abs(F.xxhash64(F.col(key_col), F.lit(seed)))
        order_key = F.xxhash64(F.col(key_col), F.lit(seed + 1))
    w = Window.partitionBy("shard").orderBy(
        F.col("_ok").asc_nulls_last(), F.col(key_col).asc_nulls_last()
    )
    return (
        docs.withColumn("shard", F.pmod(word, F.lit(n_shards)).cast("int"))
        .withColumn("_ok", order_key)
        .withColumn("pos", F.row_number().over(w))
        .drop("_ok")
    )


def q_shard_order(spark, sf_dir: str) -> DataFrame:
    """Contract (tail, round-8 promotion): the full epoch order —
    (doc_id, shard, pos) for every document at seed 0, 8 shards — is
    hash-compared, pinning shard routing and within-shard order."""
    from ..io import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return shard_order(docs, seed=0, n_shards=8, hash="md5")


# --- per-source frequency capping -------------------------------------

SOURCE_CAP = 15


def cap_per_source(
    docs: DataFrame, cap: int = SOURCE_CAP, order_salt: str = "cap"
) -> DataFrame:
    """Per-source frequency capping: keep at most ``cap`` documents
    per source, chosen in DETERMINISTIC hash order (md5-salted doc_id,
    doc_id tiebreak) — the curation step that stops one crawl domain
    from dominating the training mix. Hash order rather than 'first N
    by id' removes the correlation between doc_id assignment order and
    crawl order; no RNG state, so the kept subset is reproducible on
    any cluster. One window shuffle on ``source``; at 100 TB a skewed
    mega-source is exactly the hot key the cap exists to bound, and
    its window input can be pre-pruned with a per-source count +
    cheap filter when needed."""
    from pyspark.sql.window import Window

    # NULLS LAST explicitly: Spark's ascending default is NULLS FIRST,
    # DuckDB's is NULLS LAST — a NULL doc_id would silently diverge
    # the two engines' ranks without this pin
    w = Window.partitionBy("source").orderBy(
        F.md5(
            F.concat(F.lit(order_salt + ":"), F.col("doc_id").cast("string"))
        ).asc_nulls_last(),
        F.col("doc_id").asc_nulls_last(),
    )
    return docs.withColumn("rk", F.row_number().over(w)).where(
        F.col("rk") <= cap
    )


def q_source_cap(spark, sf_dir: str) -> DataFrame:
    """Contract (tail): cap the documents table at SOURCE_CAP docs per
    source; emit the kept (doc_id, source, rk)."""
    from ..io import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return cap_per_source(docs).select(
        "doc_id", "source", F.col("rk").cast("bigint").alias("rk")
    )


# --- cross-document paragraph dedup -----------------------------------


def dedup_paragraphs(docs: DataFrame, sep: str = "\n\n") -> DataFrame:
    """Exact SUB-document dedup (the Dolma/Gopher 'remove duplicated
    paragraphs' pass): split each text on the LITERAL separator
    ``sep``, keep only the globally FIRST occurrence of every distinct
    paragraph (min (doc_id, idx) wins — deterministic), and reassemble
    each doc from its surviving paragraphs in original order.
    Whole-doc dedup misses boilerplate shared across different pages
    (headers, nav text, license blocks); this removes it at paragraph
    granularity. NULL text is treated as "" (one empty paragraph), so
    every input doc appears in the output.

    Scale shape: explode -> one window over md5(paragraph) -> group
    back by doc; n_paras comes straight from the doc row (array size),
    not a second corpus explode. Surviving paragraph bodies cross two
    exchanges (the md5 window, then the per-doc rebuild) — dropped
    duplicates cross only the first. A boilerplate paragraph repeated
    millions of times is ONE hot hash whose window rows carry (doc_id,
    idx) plus one body each; skew is bounded by the duplicate count
    itself, the thing being removed.

    Returns (doc_id, text, n_paras, n_kept) — text rebuilt, possibly
    empty when every paragraph was seen earlier."""
    from pyspark.sql.window import Window

    # \Q...\E quotes the separator: F.split takes a Java regex, and an
    # unescaped sep like "|" or ". " would split on the REGEX reading
    # while array_join rejoins with the literal — shredding the text
    split_paras = F.split(
        F.coalesce(F.col("text"), F.lit("")), F.lit("\\Q" + sep + "\\E")
    )
    base = docs.select("doc_id", split_paras.alias("paras"))
    paras = base.select(
        "doc_id", F.posexplode("paras").alias("idx", "para")
    )
    w = Window.partitionBy(F.md5("para"))
    firsts = paras.withColumn(
        "first", F.min(F.struct("doc_id", "idx")).over(w)
    )
    kept = firsts.where(
        (F.col("first.doc_id") == F.col("doc_id"))
        & (F.col("first.idx") == F.col("idx"))
    )
    rebuilt = (
        kept.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("idx", "para"))
            ).alias("ordered"),
        )
        .select(
            "doc_id",
            F.array_join(
                F.transform("ordered", lambda s: s.para), sep
            ).alias("text"),
            F.size("ordered").cast("bigint").alias("n_kept"),
        )
    )
    totals = base.select(
        "doc_id", F.size("paras").cast("bigint").alias("n_paras")
    )
    return (
        totals.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("text", F.lit("")).alias("text"),
            "n_paras",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
    )


def q_redact_pii(spark, sf_dir: str) -> DataFrame:
    """Contract (tail, round-8 promotion): PII redaction over the
    documents table. The synthetic corpus contains no organic PII, so
    the query PLANTS a deterministic doc_id-derived suffix (email +
    IPv4 + phone + SSN) onto every text with plain string concat —
    identically in the oracle SQL — and then redacts; the hash compare
    covers all four pattern classes with nonzero counts on every row,
    not just the no-op pass-through."""
    from ..io import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = F.concat(
        F.col("text"),
        F.lit(" contact u"),
        F.col("doc_id").cast("string"),
        F.lit("@ex.com ip 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 call 555-123-4567 ssn 123-45-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    return redact_pii(docs.withColumn("text", planted)).select(
        "doc_id", "text", "n_email", "n_ipv4", "n_phone", "n_ssn"
    )


def _redact_pii_oracle() -> str:
    """DuckDB twin of q_redact_pii: same planted suffix, same chained
    global regexp_replace in PII_PATTERNS order, counts taken BEFORE
    redaction (the patterns are the RE2-compatible subset both engines
    parse identically — proven on adversarial rows in
    tests/test_curation.py::test_redact_pii_vs_duckdb)."""
    sel, red = [], "text"
    for name, pat, tok in PII_PATTERNS:
        sel.append(f"len(regexp_extract_all(text, '{pat}')) AS n_{name}")
        red = f"regexp_replace({red}, '{pat}', '{tok}', 'g')"
    return f"""
WITH planted AS (
  SELECT doc_id,
         text || ' contact u' || CAST(doc_id AS VARCHAR)
              || '@ex.com ip 10.0.' || CAST(doc_id % 256 AS VARCHAR)
              || '.7 call 555-123-4567 ssn 123-45-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
  FROM documents
)
SELECT doc_id, {red} AS text, {', '.join(sel)}
FROM planted
"""


_DECON_N = 8


def q_contamination(spark, sf_dir: str) -> DataFrame:
    """Contract (tail, round-8 promotion): benchmark decontamination's
    detection half — flag every document sharing a token 8-gram with a
    20-item 'benchmark' (the first 20 documents standing in for an
    eval set; the corpus' planted near-duplicates give genuine
    cross-document hits beyond the 20 self-matches). Uses the
    gram_hash='md5' oracle seam so DuckDB replays the gram hashing
    exactly; production callers keep xxhash64 (n=13)."""
    from ..io import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.where(F.col("doc_id") < 20).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    return contamination_check(docs, bench, n=_DECON_N, gram_hash="md5")


_CONTAMINATION_ORACLE = rf"""
WITH dg AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, greatest(len(t) - {_DECON_N} + 1, 1) + 1),
           i -> (('0x' || substr(md5(array_to_string(
                   list_slice(t, i, i + {_DECON_N} - 1), ' ')), 1, 8))::BIGINT)
         ))) AS gram_h
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+') AS t
        FROM documents)
)
SELECT d.doc_id, b.bench_id, count(DISTINCT d.gram_h) AS shared_ngrams
FROM dg d
JOIN (SELECT doc_id AS bench_id, gram_h FROM dg WHERE doc_id < 20) b
  USING (gram_h)
GROUP BY 1, 2
"""


_SHARD_ORDER_ORACLE = """
SELECT doc_id, shard,
       CAST(row_number() OVER (
         PARTITION BY shard
         ORDER BY md5('order:0:' || CAST(doc_id AS VARCHAR)) NULLS LAST,
                  doc_id NULLS LAST) AS INT) AS pos
FROM (
  SELECT doc_id,
         CAST((('0x' || substr(md5('shard:0:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT) % 8
              AS INT) AS shard
  FROM documents
)
"""

ORACLE = {
    "q_contamination": _CONTAMINATION_ORACLE,
    "q_shard_order": _SHARD_ORDER_ORACLE,
    "q_redact_pii": _redact_pii_oracle(),
    "q_source_cap": f"""
SELECT doc_id, source, CAST(rk AS BIGINT) AS rk
FROM (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5('cap:' || CAST(doc_id AS VARCHAR)) NULLS LAST,
                    doc_id NULLS LAST
         ) AS rk
  FROM documents
) t
WHERE rk <= {SOURCE_CAP}
""",
}

QUERIES: dict = {}

# round-7/8 promotions (append after the frozen first-50 window)
QUERIES_TAIL = {
    "q_source_cap": q_source_cap,
    "q_redact_pii": q_redact_pii,
    "q_contamination": q_contamination,
    "q_shard_order": q_shard_order,
}
