"""Broadcast Bloom-filter membership probe — the constant-size scale
path for benchmark decontamination (q_contamination's sibling in
curation.py).

At 100 TB the corpus side of decontamination must not shuffle. The
exact path already achieves that by broadcasting the benchmark gram
set, but a broadcast hash SET costs ~8 B per benchmark gram plus
hash-table overhead — it grows with the benchmark. The Bloom bitmap is
the constant-size version: ``m`` bits and ``k`` probes chosen up front
from the target false-positive rate (``bloom_params``), after which
the corpus plan is scan → gram hash → k arithmetic probes → bit test,
all map-side against an ``m/8``-byte structure, with only the narrow
per-doc hit aggregate shuffling. False positives are the documented
price (a clean doc flagged with probability ~fpp); false negatives are
impossible by construction, which the tests pin against the exact
join.

Probe addressing is Kirsch-Mitzenmacher double hashing (K-M 2006:
``pos_i = (h1 + i·h2) mod m`` preserves the asymptotic FP rate of k
independent hashes): the md5 oracle seam derives ``h1``/``h2`` from
the first and second 8-hex words of one digest (DuckDB replays both —
the winnowing idiom), production uses two xxhash64 calls folded into
[0, 2^32) so the position arithmetic can never overflow a BIGINT
under ANSI mode.

Two probe executions over the same bitmap:

- ``probe_mode="inline"`` (default): the bitmap census (≤ m/32 rows of
  32-bit words, bounded by construction) collects to the driver and
  inlines into the probe expression as an array literal — ZERO joins,
  zero corpus shuffle before the per-doc aggregate; the k probes are
  UNROLLED codegen arithmetic (no interpreted higher-order lambda on
  the hot path — the playbook rule). Guarded by ``MAX_INLINE_WORDS``.
- ``probe_mode="join"``: a broadcast join against the bitmap table per
  probe row — for filters too large to inline in a plan (the census
  stays broadcast-sized long after it stops being literal-sized).

Reference tie-in: extension-tier (SURVEY §2.8, X13 adjunct); the
semantics certified are exactly contamination_check's, so this is the
drop-in probe a real pipeline swaps in when the benchmark suite grows
past broadcast-set size.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import documents, fan_out

GRAM_N = 8  # mirror curation._DECON_N so the exact join is comparable
M_BITS = 65536  # contract-row bitmap size (2 KiB words array)
K_PROBES = 4
MAX_INLINE_WORDS = 1 << 17  # 128k longs ≈ 1 MiB of plan literals
_U32 = 1 << 32
# 1<<b for b in [0,32): integer masks as ONE array literal — pow(2.0,b)
# double math (the previous mask) costs a transcendental call per probe
# per gram; element_at on a literal is an O(1) integer lookup. Built
# lazily: F.lit needs an active SparkContext.
_WORD_MASK_VALUES = [1 << b for b in range(32)]


def _mask(bit):
    return F.element_at(
        F.lit(_WORD_MASK_VALUES), (bit + 1).cast("int")
    )


def bloom_params(n_items: int, fpp: float) -> tuple[int, int]:
    """Textbook sizing: bits ``m = ceil(-n·ln p / ln²2)`` and probes
    ``k = round((m/n)·ln 2)`` for ``n`` inserted items at target
    false-positive rate ``p``. Returns (m_bits, k) with m rounded up
    to a multiple of 32 and k clamped to ≥ 1."""
    if n_items <= 0 or not (0.0 < fpp < 1.0):
        raise ValueError("need n_items > 0 and 0 < fpp < 1")
    ln2 = math.log(2.0)
    m = math.ceil(-n_items * math.log(fpp) / (ln2 * ln2))
    m = ((m + 31) // 32) * 32
    k = max(1, round(m / n_items * ln2))
    return m, k


def _gram_hash_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    gram_hash: str = "xxhash64",
) -> DataFrame:
    """One row per (id, distinct gram): the K-M hash pair
    ``h1, h2 ∈ [0, 2^32)``. Token n-grams via the sliding arrays_zip
    window (short docs emit their clamped full-text gram, exactly the
    curation slide). Round 15 (guide §4.1): the previous
    ``transform(sequence, λ)`` evaluated the concat/hash chain
    INTERPRETED per gram (higher-order lambdas are CodegenFallback);
    now ``array_distinct`` runs on the zipped token STRUCTS map-side —
    struct-distinct ≡ gram-string-distinct because whitespace-split
    tokens never contain the join space, so concat_ws(' ') is
    injective on the fixed-arity tuples — and the concat + hash run
    as row-level whole-stage-codegen expressions after the explode."""
    toks = F.split(F.trim(F.col(text_col)), r"[ \t\n\x0B\f\r]+")
    win = F.greatest(F.size(toks) - n, F.lit(0)) + F.lit(1)
    zipped = F.arrays_zip(
        *[F.slice(toks, j + 1, win).alias(f"w{j}") for j in range(n)]
    )
    rows = docs.select(
        F.col(id_col), F.explode(F.array_distinct(zipped)).alias("_z")
    )
    g = F.concat_ws(" ", *[F.col(f"_z.w{j}") for j in range(n)])
    if gram_hash == "md5":
        d = F.md5(g)
        h1 = F.conv(F.substring(d, 1, 8), 16, 10).cast("bigint")
        h2 = F.conv(F.substring(d, 9, 8), 16, 10).cast("bigint")
    else:
        h1 = F.pmod(F.xxhash64(g), F.lit(_U32))
        h2 = F.pmod(F.xxhash64(g, F.lit(1)), F.lit(_U32))
    return rows.select(id_col, h1.alias("h1"), h2.alias("h2"))


def _positions(m_bits: int, k: int):
    """The k unrolled K-M probe positions as plain column arithmetic
    (h1 + i·h2 < 2^34 ≪ 2^63 — ANSI-safe)."""
    return [
        F.pmod(F.col("h1") + i * F.col("h2"), F.lit(m_bits))
        for i in range(k)
    ]


def bloom_build(
    items: DataFrame,
    id_col: str = "bench_id",
    text_col: str = "text",
    n: int = GRAM_N,
    m_bits: int = M_BITS,
    k: int = K_PROBES,
    gram_hash: str = "xxhash64",
) -> DataFrame:
    """Build the bitmap census from the benchmark side: one row per
    touched 32-bit word, ``(word BIGINT, bits BIGINT)`` with
    ``bits < 2^32`` (32-bit words sidestep BIGINT sign overflow in
    both engines). ≤ m/32 rows by construction; OR-idempotence means
    duplicate grams cost nothing. The build side is benchmark-sized —
    its one small shuffle (groupBy word) never touches the corpus."""
    pairs = _gram_hash_pairs(items, id_col, text_col, n, gram_hash)
    pos = F.explode(F.array(*_positions(m_bits, k))).alias("pos")
    return (
        pairs.select(pos)
        .select(
            F.shiftright(F.col("pos"), 5).alias("word"),
            F.pmod(F.col("pos"), F.lit(32)).alias("bit"),
        )
        .groupBy("word")
        .agg(
            F.bit_or(_mask(F.col("bit"))).alias("bits")
        )
    )


def bloom_inline(bitmap: DataFrame, m_bits: int = M_BITS) -> list[int]:
    """Collect the bitmap census to a dense word list (driver-side,
    bounded by construction — the PQ-codebook-fit idiom). Runtime
    guard, not assert (ADVICE r9: asserts strip under -O)."""
    n_words = m_bits // 32
    if n_words > MAX_INLINE_WORDS:
        raise ValueError(
            f"bitmap of {n_words} words exceeds the inline cap "
            f"{MAX_INLINE_WORDS}; use probe_mode='join'"
        )
    dense = [0] * n_words
    for row in bitmap.collect():
        dense[int(row["word"])] = int(row["bits"])
    return dense


def bloom_probe(
    docs: DataFrame,
    bitmap,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = GRAM_N,
    m_bits: int = M_BITS,
    k: int = K_PROBES,
    gram_hash: str = "xxhash64",
    probe_mode: str = "inline",
) -> DataFrame:
    """Probe every document's distinct grams against the filter. One
    row per doc: ``n_grams`` (distinct grams), ``n_hit`` (grams whose
    k bits are all set), ``hit`` (BIGINT flag). ``bitmap`` is the
    dense word list from ``bloom_inline`` (probe_mode='inline') or the
    ``bloom_build`` DataFrame (probe_mode='join')."""
    # CPU-bound gram hashing: measured 54.2s → 7.3s on the 50k-doc
    # rung whose parquet read packed into 2 partitions
    docs = fan_out(docs)
    pairs = _gram_hash_pairs(docs, id_col, text_col, n, gram_hash)
    positions = _positions(m_bits, k)

    if probe_mode == "inline":
        if not isinstance(bitmap, list):
            bitmap = bloom_inline(bitmap, m_bits)
        # ONE array Literal, not F.array(*2048 lits): the probe
        # references the bitmap once per probe (k times), and a
        # CreateArray tree re-evaluates per reference while a Literal
        # is free — measured 4.7s -> 2.0s on the sf0.1 row (join mode
        # is 1.1s there but pays a corpus-sized per-gram shuffle;
        # inline stays the 100 TB default)
        arr = F.lit([int(w) for w in bitmap])
        ok = F.lit(True)
        for pos in positions:
            word = F.shiftright(pos, 5)
            mask = _mask(F.pmod(pos, F.lit(32)))
            ok = ok & (
                F.element_at(arr, (word + 1).cast("int")).bitwiseAND(mask)
                != 0
            )
        hit = pairs.select(id_col, ok.cast("int").alias("ok"))
    elif probe_mode == "join":
        probed = pairs.select(
            id_col, "h1", "h2", F.explode(F.array(*positions)).alias("pos")
        ).select(
            id_col,
            "h1",
            "h2",
            F.shiftright(F.col("pos"), 5).alias("word"),
            _mask(F.pmod(F.col("pos"), F.lit(32))).alias("mask"),
        )
        hit = (
            probed.join(F.broadcast(bitmap), "word", "left")
            .select(
                id_col,
                "h1",
                "h2",
                (
                    F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(
                        F.col("mask")
                    )
                    != 0
                )
                .cast("int")
                .alias("okp"),
            )
            .groupBy(id_col, "h1", "h2")
            .agg(F.min("okp").alias("ok"))
        )
    else:
        raise ValueError(f"unknown probe_mode {probe_mode!r}")

    return hit.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_grams"),
        F.sum("ok").cast("bigint").alias("n_hit"),
        (F.sum("ok") > 0).cast("bigint").alias("hit"),
    )


def q_bloom_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract (tail, round 10): Bloom-probe decontamination over the
    documents table — benchmark = the first 20 documents (the
    q_contamination seam, so the exact join is directly comparable),
    token 8-grams, m=65536 / k=4, md5 K-M hash pair. The bitmap builds
    from the benchmark, collects (≤ 2048 words, bounded by
    construction), and inlines into the probe expression; DuckDB
    rebuilds the identical bitmap with bit_or/shift arithmetic and
    replays every probe, so the row is cell-exact INCLUDING any false
    positives the filter admits."""
    docs = documents(spark, sf_dir).select("doc_id", "text")
    bench = docs.where(F.col("doc_id") < 20).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    bitmap = bloom_build(bench, gram_hash="md5")
    return bloom_probe(docs, bloom_inline(bitmap), gram_hash="md5")


_BLOOM_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+') AS t
  FROM documents
),
gr AS (  -- distinct (doc, K-M hash pair); clamped full-text gram for short docs
  SELECT DISTINCT doc_id,
         ('0x' || substr(md5(g), 1, 8))::BIGINT AS h1,
         ('0x' || substr(md5(g), 9, 8))::BIGINT AS h2
  FROM (
    SELECT doc_id,
           unnest(list_transform(
             range(1, greatest(len(t) - {GRAM_N}, 0) + 2),
             i -> array_to_string(list_slice(t, i, i + {GRAM_N} - 1), ' ')
           )) AS g
    FROM toks
  )
),
bpos AS (
  SELECT ((h1 + i.i * h2) % {M_BITS}) AS pos
  FROM gr, (SELECT unnest(range(0, {K_PROBES})) AS i) i
  WHERE doc_id < 20
),
bitmap AS (
  SELECT pos // 32 AS word,
         bit_or(1::BIGINT << CAST(pos % 32 AS INT)) AS bits
  FROM bpos GROUP BY 1
),
dpos AS (
  SELECT doc_id, h1, h2, ((h1 + i.i * h2) % {M_BITS}) AS pos
  FROM gr, (SELECT unnest(range(0, {K_PROBES})) AS i) i
),
dhit AS (
  SELECT doc_id, h1, h2,
         min(CASE WHEN (COALESCE(b.bits, 0)
                        & (1::BIGINT << CAST(p.pos % 32 AS INT))) <> 0
                  THEN 1 ELSE 0 END) AS ok
  FROM dpos p LEFT JOIN bitmap b ON b.word = p.pos // 32
  GROUP BY 1, 2, 3
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(ok) AS BIGINT) AS n_hit,
       CAST(sum(ok) > 0 AS BIGINT) AS hit
FROM dhit GROUP BY 1
"""

QUERIES: dict = {}
QUERIES_TAIL = {"q_bloom_contamination": q_bloom_contamination}
ORACLE = {"q_bloom_contamination": _BLOOM_ORACLE}
