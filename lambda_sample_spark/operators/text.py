"""Text analysis for training-data pipelines (SURVEY.md §2.8 X4 +
north-star extensions): token stats, quality scoring, language ID,
document fingerprinting.

All hot-path operators are built-in column expressions (split /
transform / filter / md5) — JVM-side, no Python UDFs. Language ID is
the one exception-shaped operator: it builds per-language character
n-gram profiles from a training split and scores held-out documents by
profile overlap — expressed as DataFrame ops (explode + join + argmax),
no driver loop, so it scales horizontally.

Scale notes: everything is per-row narrow work except lang-ID's profile
join, which broadcasts the (tiny) profile table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .common import documents, exact_ratio6, exact_ratio6_sql, r6

# tokenization: trim + split on runs of whitespace (empty-safe)
def _tokens(c):
    return F.split(F.trim(c), r"[ \t\n\x0B\f\r]+")


STOPWORDS = ["the", "a", "of", "and"]


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: per-language corpus statistics."""
    docs = documents(spark, sf_dir)
    toks = _tokens(F.col("text"))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    per_doc = docs.select(
        "lang",
        F.col("n_chars"),
        n_tok.alias("n_tok"),
        (n_stop / n_tok).alias("stop_ratio"),
    )
    return per_doc.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        r6(F.avg("n_chars")).alias("avg_chars"),
        r6(F.avg("n_tok")).alias("avg_tokens"),
        r6(F.avg("stop_ratio")).alias("avg_stop_ratio"),
    )


BPE_ISH = r"\w+|[^\w\s]"  # word runs + single punctuation, GPT-2-ish


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting, both estimators in one narrow projection:
    whitespace tokens (+ distinct) and BPE-ish subword pieces — a
    word-run + standalone-punctuation regex approximating an LLM
    tokenizer's pre-tokenization split, the cheap cluster-side token
    estimator."""
    docs = documents(spark, sf_dir)
    toks = _tokens(F.col("text"))
    pieces = F.regexp_extract_all(F.col("text"), F.lit(BPE_ISH), 0)
    return docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct_tokens"),
        F.size(pieces).cast("bigint").alias("n_bpe_tokens"),
        F.size(F.array_distinct(pieces)).cast("bigint").alias("n_distinct_bpe"),
    )


def repetition_stats(docs: DataFrame, ns: tuple[int, ...] = (2, 3)) -> DataFrame:
    """Gopher-style repetition metrics (Rae et al. 2021 §A1.1, token
    approximation): per doc and n, the fraction of n-grams that are
    duplicates (``dup_ngram_frac``) and the fraction of tokens covered
    by the single most frequent n-gram (``top_ngram_frac``). High
    values flag boilerplate/looping text the quality gate should drop.

    Shape: one (doc, n, gram-hash) row into a two-level aggregate —
    the simhash/ngram shuffle shape; grams hash to BIGINT before the
    explode so shuffled rows stay narrow. Output is one row per
    (doc_id, n): explode-friendly for a gate join, scalar columns only.

    The token array is MATERIALIZED as a column before the gram
    lambda: with the split expression inlined inside transform(),
    common-subexpression elimination does not reach through the lambda
    and the regex split re-ran once per GRAM — measured 6.1 s -> 1.25 s
    at sf0.1 for this one projection ordering change (round 8).
    """
    base = docs.select("doc_id", _tokens(F.col("text")).alias("toks")).select(
        "doc_id", "toks", F.size("toks").alias("n_tok")
    )

    def gram_hashes(n: int):
        # NB: the lambda must stay single-parameter — transform() passes
        # (element, index) to two-parameter lambdas
        return F.transform(
            F.sequence(F.lit(0), F.greatest(F.col("n_tok") - n, F.lit(0))),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice("toks", i + 1, n))),
        )

    per_n = []
    for n in ns:
        per_n.append(
            base.select(
                "doc_id",
                F.lit(n).alias("n"),
                "n_tok",
                F.explode(gram_hashes(n)).alias("gram_h"),
            )
        )
    exploded = per_n[0]
    for d in per_n[1:]:
        exploded = exploded.unionByName(d)
    counts = exploded.groupBy("doc_id", "n", "n_tok", "gram_h").agg(
        F.count("*").alias("c")
    )
    return (
        counts.groupBy("doc_id", "n", "n_tok")
        .agg(
            r6(
                F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0))
                / F.sum("c")
            ).alias("dup_ngram_frac"),
            r6(
                F.least(F.max("c") * F.col("n") / F.col("n_tok"), F.lit(1.0))
            ).alias("top_ngram_frac"),
        )
        .drop("n_tok")
    )


def doc_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document profile: quality score (length score x (1 -
    stopword ratio) — the shape of a C4/Gopher-style quality filter,
    kept deterministic and oracle-checkable) + content fingerprint
    (md5 hex — identical across engines) for exact-dup detection and
    caching keys."""
    docs = documents(spark, sf_dir)
    toks = _tokens(F.col("text"))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    # quality = min(n_chars,500)/500 * (n_tok-n_stop)/n_tok is a ratio
    # of integers; the sf10 gate caught a doc whose exact value is a
    # true half-way tie at the 6th decimal, so round in the integer
    # domain (common.exact_ratio6) instead of on the double product
    return docs.select(
        "doc_id",
        F.col("n_chars"),
        n_tok.alias("n_tok"),
        n_stop.alias("n_stop"),
        F.md5(F.col("text")).alias("fp"),
    ).select(
        "doc_id",
        exact_ratio6(
            "least(n_chars, 500) * (n_tok - n_stop)", "500 * n_tok"
        ).alias("quality"),
        "fp",
    )


WINNOW_K = 5  # k-gram length
WINNOW_W = 4  # winnowing window (w consecutive k-gram hashes)
# (hash, pos) packed into one BIGINT for the cross-engine window-min:
# h (32-bit md5 word) * 2^20 + pos — identical lexicographic order to
# struct(h, pos) while replayable as plain integer arithmetic in
# DuckDB. Caps docs at 2^20 grams (1M chars) — far above the corpus;
# the 100 TB path would widen the pack or shard long docs.
_WINNOW_POS_BITS = 20


# production gram hash: xxhash64 masked to 43 bits so packed = h*2^20+pos
# tops out at exactly 2^63-1 (signed BIGINT max). Measured ~25% cheaper
# end-to-end than md5 at 400k docs (the pipeline is extraction-bound,
# not hash-bound — see winnow_fingerprints); md5 remains for the
# oracle-checked contract row (DuckDB computes the identical digest).
_XXH_MASK_BITS = 63 - _WINNOW_POS_BITS


def winnow_fingerprints(docs: DataFrame, gram_hash: str = "xxhash64") -> DataFrame:
    """Rolling-hash document fingerprinting by winnowing (Schleimer,
    Wilkerson, Aiken, SIGMOD 2003 — the MOSS algorithm): hash every
    character k-gram, then keep each w-window's minimum hash. Two
    documents sharing any sufficiently long substring share
    fingerprints (locality guarantee), and expected density is
    2/(w+1) — a ~%-sized sketch of each doc.

    True winnowing selects the minimum of EVERY w-window of
    consecutive hashes (union over windows), which is what guarantees
    >= 1 fingerprint per window and the 2/(w+1) expected density — a
    trailing-window-only variant breaks both (a run of increasing
    hashes selects nothing; shared passages can share zero
    fingerprints), the round-3 advice finding. Formulation: each row
    at position s computes min(struct(h, pos)) over the FORWARD frame
    [s, s+w-1] — the per-window minimum with a deterministic
    (leftmost-on-tie) pick — restricted to full windows (plus the
    whole-doc window for docs shorter than w grams); the distinct
    minima are the sketch.

    Pure DataFrame, entirely in the ARRAY domain — zero shuffles: the
    per-doc gram/hash/window pipeline is one projection (k-grams via
    substring transform, then every w-window's minimum via
    transform(starts, s -> array_min(slice(packed, s, w))), O(n*w)
    arithmetic per doc), and only the ~2n/(w+1)-sized
    deduped sketch explodes into rows. The earlier formulation
    exploded every gram into a row and ran a doc_id window — one
    full-corpus shuffle this version doesn't have. Output
    (doc_id, fp) rows: the sketch used for containment / near-dup
    detection by overlap.

    ``gram_hash`` picks the per-gram hash: ``"xxhash64"`` (default —
    one JVM hash per gram, masked to 43 bits so the pack stays in
    signed-BIGINT range; measured ~25% cheaper end-to-end at 400k
    docs) or ``"md5"`` (first md5 word, the dedup.py oracle idiom —
    byte-identical in DuckDB, used by the oracle-checked contract
    rows). Both satisfy the winnowing locality/density guarantees
    (property-tested in tests/test_winnowing.py): the guarantee
    depends only on the window minimum, not on which uniform hash
    supplies the values. For long documents or maximum throughput use
    ``winnow_fingerprints_fast`` (vectorized numpy rolling hash, O(n)
    per doc, not oracle-replayable).
    """
    from .dedup import _hex_word_spark

    if gram_hash not in ("xxhash64", "md5"):
        raise ValueError(f"gram_hash must be 'xxhash64' or 'md5', got {gram_hash!r}")
    k, w, pack = WINNOW_K, WINNOW_W, 1 << _WINNOW_POS_BITS
    # Cost profile (measured, sf0.1 + 400k-doc one-off): this
    # expression pipeline is bound by gram EXTRACTION + interpreted
    # higher-order-function machinery, not by the hash — xxhash64 vs
    # md5 differs ~25% at 400k docs, not 10x. substring(text, i, k) is
    # O(i) per call (UTF8String scans from the string start for the
    # codepoint offset), so per-doc cost is quadratic in doc length —
    # fine for KB-sized corpus docs, and the 2^20-gram guard bounds the
    # worst case; a char-array slice+array_join reformulation (O(k)
    # per gram) measured 6x SLOWER from allocation overhead, so the
    # substring form stays. The O(n) production path for long docs is
    # winnow_fingerprints_fast (vectorized numpy rolling hash).
    if gram_hash == "md5":
        h = _hex_word_spark(f"md5(substring(text, i, {k}))", 1)
    else:
        h = f"(xxhash64(substring(text, i, {k})) & {(1 << _XXH_MASK_BITS) - 1})"
    # the (h, pos) pack caps docs at 2^POS_BITS k-grams; beyond that pos
    # would spill into hash bits and silently corrupt the lexicographic
    # order, so overlong docs must fail LOUDLY. assert_true is spliced
    # into the consumed sequence bound (+ coalesce(null, 0)) so Catalyst
    # cannot prune it; at 100 TB, shard long docs or widen the pack.
    n_grams = f"greatest(length(text) - {k - 1}, 1)"
    guarded_n = (
        f"({n_grams} + coalesce(CAST(assert_true({n_grams} < {pack}, "
        f"'winnowing: document exceeds 2^{_WINNOW_POS_BITS} k-grams; "
        f"the (hash, pos) pack would overflow — shard the document or "
        f"widen _WINNOW_POS_BITS') AS INT), 0))"
    )
    # packed_j = h_j * 2^POS_BITS + (j-1): min over a window orders by
    # (h, pos) with the leftmost-on-tie pick, replayed identically by
    # the oracle's integer arithmetic
    packed = f"transform(sequence(1, {guarded_n}), i -> {h} * {pack} + i - 1)"
    # one start per FULL window (plus the whole-doc window for docs
    # shorter than w grams: slice clamps at the array end)
    mins = (
        f"transform(sequence(1, greatest(size(_packed) - {w - 1}, 1)), s -> "
        f"array_min(slice(_packed, s, {w})))"
    )
    return (
        docs.select("doc_id", F.expr(packed).alias("_packed"))
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.expr(f"transform({mins}, m -> m div {pack})")
                )
            ).alias("fp"),
        )
    )


# polynomial rolling-hash base for the fast winnowing path (any odd
# constant works; the splitmix64 finalizer supplies the uniformity)
_FAST_B = 1000003


def winnow_fingerprints_fast(docs: DataFrame) -> DataFrame:
    """Vectorized production twin of ``winnow_fingerprints``: the same
    winnowing algorithm (per-doc forward-window minima over k-gram
    hashes, leftmost-on-tie via the (hash, pos) pack, density 2/(w+1))
    with the per-gram work done in numpy instead of interpreted
    Catalyst higher-order functions — the expression path is bound by
    gram extraction + HOF interpretation (O(doc_len) substring scans;
    measured 252-332s at 400k docs), while this path builds the
    codepoint array once per doc (utf-32 decode, O(n)) and computes a
    polynomial rolling hash + splitmix64 finalize + sliding-window min
    as a handful of whole-array ops per doc inside an Arrow-batched
    ``mapInPandas``.

    Fingerprint VALUES differ from the expression path (different
    hash family), so this twin is NOT oracle-replayable — the
    winnowing guarantees don't depend on which uniform hash supplies
    the values (the same property suite runs against all three
    paths). Codepoint k-grams (utf-32), matching the expression
    path's substring semantics. Same 2^20-gram cap, enforced loudly.
    """
    k, w = WINNOW_K, WINNOW_W
    pos_bits, mask = _WINNOW_POS_BITS, (1 << _XXH_MASK_BITS) - 1
    base = _FAST_B

    def gen(batches):
        import numpy as np
        import pandas as pd
        from numpy.lib.stride_tricks import sliding_window_view

        u64 = np.uint64
        for pdf in batches:
            out_ids: list = []
            out_fps: list = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                c = np.frombuffer(
                    text.encode("utf-32-le"), dtype=np.uint32
                ).astype(np.uint64)
                n_grams = max(len(c) - k + 1, 1)
                if n_grams >= (1 << pos_bits):
                    raise ValueError(
                        f"winnowing: document {doc_id} exceeds "
                        f"2^{pos_bits} k-grams; shard the document or "
                        "widen _WINNOW_POS_BITS"
                    )
                # polynomial hash of each k-gram: k shifted-slice ops
                # (wraps mod 2^64 — numpy unsigned arithmetic)
                g = np.zeros(n_grams, dtype=u64)
                for j in range(min(k, len(c))):
                    end = j + n_grams
                    seg = c[j:end]
                    if len(seg) < n_grams:  # doc shorter than k grams
                        seg = np.pad(seg, (0, n_grams - len(seg)))
                    g = g * u64(base) + seg
                # splitmix64 finalize for uniformity
                z = g + u64(0x9E3779B97F4A7C15)
                z = (z ^ (z >> u64(30))) * u64(0xBF58476D1CE4E5B9)
                z = (z ^ (z >> u64(27))) * u64(0x94D049BB133111EB)
                z = z ^ (z >> u64(31))
                h = z & u64(mask)
                packed = (h << u64(pos_bits)) | np.arange(len(h), dtype=u64)
                if len(packed) >= w:
                    mins = sliding_window_view(packed, w).min(axis=1)
                else:
                    mins = packed.min(keepdims=True)
                fps = np.unique(mins >> u64(pos_bits))
                out_ids.append(np.full(len(fps), doc_id, dtype=np.int64))
                out_fps.append(fps.astype(np.int64))
            yield pd.DataFrame(
                {
                    "doc_id": np.concatenate(out_ids) if out_ids else [],
                    "fp": np.concatenate(out_fps) if out_fps else [],
                }
            )

    return docs.select("doc_id", "text").mapInPandas(
        gen, "doc_id bigint, fp bigint"
    )


def winnow_fingerprints_md5_fast(docs: DataFrame) -> DataFrame:
    """Vectorized EXACT-md5 twin of ``winnow_fingerprints(gram_hash=
    "md5")`` — same fingerprints bit-for-bit (pinned in
    tests/test_winnowing.py), so it keeps the DuckDB oracle seam while
    escaping the expression path's cost wall: substring(text, i, k) is
    O(i) per call (UTF8String scans from the string start), so the
    interpreted-HOF pipeline is QUADRATIC per doc and measured 138.7 s
    at the sf10 rung. This kernel is O(n) per doc: one utf-8/utf-32
    decode, then a single-block md5 (every k-gram is <= 4k=20 utf-8
    bytes < 56, so one 64-byte block each) computed as 64 rounds of
    numpy uint32 arithmetic over ALL grams of an Arrow batch at once —
    the embed_near_dup vectorized-oracle-kernel idiom (round-13
    precedent: exact arithmetic in numpy, md5 seam kept).

    Matches the expression path's edges exactly: value = first 8 hex
    chars of the digest as BIGINT (= byteswapped md5 word A); docs
    shorter than k grams hash their whole text; empty text hashes
    md5(""); NULL text yields one (doc_id, NULL) row; the 2^20-gram
    pack cap fails loudly. Grams pool across the batch for the md5
    pass (chunked so the 64-byte block matrix stays ~64 MB), then
    split back per doc for the (hash, pos)-packed forward-window
    minimum."""
    k, w = WINNOW_K, WINNOW_W
    pos_bits = _WINNOW_POS_BITS
    # md5 vector chunk: 32k grams keeps every per-round temporary
    # (~128 KB at u32) L2-resident. Measured on 7.5M sf10 grams,
    # single-threaded: 2^20 chunks -> 7.2 us/gram (each round's
    # temporaries are 4 MB, all 64 rounds stream through DRAM and the
    # allocator mmap-churns); 2^15 -> 0.66 us/gram — 11x. The fixed
    # ~0.5 ms/chunk numpy-dispatch cost is <2% at this size.
    chunk_grams = 1 << 15

    def gen(batches):
        import numpy as np
        import pandas as pd
        from numpy.lib.stride_tricks import sliding_window_view

        u32, u64 = np.uint32, np.uint64
        # RFC 1321 tables (hardcoded, not recomputed via sin(), so no
        # libm-rounding seam can perturb the digest)
        KT = np.array([
            0xd76aa478, 0xe8c7b756, 0x242070db, 0xc1bdceee,
            0xf57c0faf, 0x4787c62a, 0xa8304613, 0xfd469501,
            0x698098d8, 0x8b44f7af, 0xffff5bb1, 0x895cd7be,
            0x6b901122, 0xfd987193, 0xa679438e, 0x49b40821,
            0xf61e2562, 0xc040b340, 0x265e5a51, 0xe9b6c7aa,
            0xd62f105d, 0x02441453, 0xd8a1e681, 0xe7d3fbc8,
            0x21e1cde6, 0xc33707d6, 0xf4d50d87, 0x455a14ed,
            0xa9e3e905, 0xfcefa3f8, 0x676f02d9, 0x8d2a4c8a,
            0xfffa3942, 0x8771f681, 0x6d9d6122, 0xfde5380c,
            0xa4beea44, 0x4bdecfa9, 0xf6bb4b60, 0xbebfbc70,
            0x289b7ec6, 0xeaa127fa, 0xd4ef3085, 0x04881d05,
            0xd9d4d039, 0xe6db99e5, 0x1fa27cf8, 0xc4ac5665,
            0xf4292244, 0x432aff97, 0xab9423a7, 0xfc93a039,
            0x655b59c3, 0x8f0ccc92, 0xffeff47d, 0x85845dd1,
            0x6fa87e4f, 0xfe2ce6e0, 0xa3014314, 0x4e0811a1,
            0xf7537e82, 0xbd3af235, 0x2ad7d2bb, 0xeb86d391,
        ], dtype=u32)
        ST = ([7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4
              + [4, 11, 16, 23] * 4 + [6, 10, 15, 21] * 4)
        gmax = 4 * k  # utf-8 bytes per k-gram cap (4 bytes/codepoint)

        def md5_word1(buf, starts, glens):
            """First md5 hex word (big-endian digest bytes 0..3) of
            each byte slice buf[starts[i] : starts[i]+glens[i]]."""
            n = len(starts)
            idx = starts[:, None] + np.arange(gmax, dtype=np.int64)
            valid = np.arange(gmax, dtype=np.int64) < glens[:, None]
            src = buf if len(buf) else np.zeros(1, np.uint8)
            block = np.zeros((n, 64), np.uint8)
            block[:, :gmax] = src[np.minimum(idx, len(src) - 1)] * valid
            block[np.arange(n), glens] = 0x80
            bits = glens * 8
            block[:, 56] = bits & 0xFF
            block[:, 57] = bits >> 8
            M = block.view("<u4").reshape(n, 16)
            a = np.full(n, 0x67452301, u32)
            b = np.full(n, 0xEFCDAB89, u32)
            c = np.full(n, 0x98BADCFE, u32)
            d = np.full(n, 0x10325476, u32)
            for i in range(64):
                if i < 16:
                    f = (b & c) | (~b & d); g = i
                elif i < 32:
                    f = (d & b) | (~d & c); g = (5 * i + 1) & 15
                elif i < 48:
                    f = b ^ c ^ d; g = (3 * i + 5) & 15
                else:
                    f = c ^ (b | ~d); g = (7 * i) & 15
                tmp = f + a + KT[i] + M[:, g]
                a, d, c = d, c, b
                r = ST[i]
                b = c + ((tmp << u32(r)) | (tmp >> u32(32 - r)))
            A = a + u32(0x67452301)
            return (
                ((A & u32(0xFF)) << u32(24))
                | (((A >> u32(8)) & u32(0xFF)) << u32(16))
                | (((A >> u32(16)) & u32(0xFF)) << u32(8))
                | (A >> u32(24))
            )

        for pdf in batches:
            bufs, starts_l, lens_l = [], [], []
            ids, counts, nulls = [], [], []
            base = 0
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if text is None:
                    nulls.append(doc_id)
                    continue
                cp = np.frombuffer(text.encode("utf-32-le"), np.uint32)
                m = len(cp)
                n_g = max(m - k + 1, 1)
                if n_g >= (1 << pos_bits):
                    raise ValueError(
                        f"winnowing: document {doc_id} exceeds "
                        f"2^{pos_bits} k-grams; shard the document or "
                        "widen _WINNOW_POS_BITS"
                    )
                bl = np.ones(m, np.int64)
                bl += cp > 0x7F
                bl += cp > 0x7FF
                bl += cp > 0xFFFF
                off = np.zeros(m + 1, np.int64)
                np.cumsum(bl, out=off[1:])
                s_ = off[:n_g]
                e_ = off[np.minimum(np.arange(n_g) + k, m)]
                bufs.append(
                    np.frombuffer(text.encode("utf-8"), np.uint8)
                )
                starts_l.append(s_ + base)
                lens_l.append(e_ - s_)
                ids.append(doc_id)
                counts.append(n_g)
                base += len(bufs[-1])
            out_ids, out_fps, out_mask = [], [], []
            if ids:
                buf = np.concatenate(bufs)
                starts = np.concatenate(starts_l)
                glens = np.concatenate(lens_l)
                h = np.empty(len(starts), u64)
                for c0 in range(0, len(starts), chunk_grams):
                    c1 = min(c0 + chunk_grams, len(starts))
                    h[c0:c1] = md5_word1(
                        buf, starts[c0:c1], glens[c0:c1]
                    ).astype(u64)
                bounds = np.zeros(len(ids) + 1, np.int64)
                np.cumsum(counts, out=bounds[1:])
                for di, doc_id in enumerate(ids):
                    hh = h[bounds[di] : bounds[di + 1]]
                    packed = (hh << u64(pos_bits)) | np.arange(
                        len(hh), dtype=u64
                    )
                    if len(packed) >= w:
                        mins = sliding_window_view(packed, w).min(axis=1)
                    else:
                        mins = packed.min(keepdims=True)
                    fps = np.unique(mins >> u64(pos_bits))
                    out_ids.append(np.full(len(fps), doc_id, np.int64))
                    out_fps.append(fps.astype(np.int64))
                    out_mask.append(np.zeros(len(fps), bool))
            for doc_id in nulls:  # (doc_id, NULL) — expression parity
                out_ids.append(np.full(1, doc_id, np.int64))
                out_fps.append(np.zeros(1, np.int64))
                out_mask.append(np.ones(1, bool))
            if out_ids:
                fp_col = pd.arrays.IntegerArray(
                    np.concatenate(out_fps), np.concatenate(out_mask)
                )
                yield pd.DataFrame(
                    {"doc_id": np.concatenate(out_ids), "fp": fp_col}
                )
            else:
                yield pd.DataFrame(
                    {
                        "doc_id": np.array([], np.int64),
                        "fp": pd.array([], dtype="Int64"),
                    }
                )

    return docs.select("doc_id", "text").mapInPandas(
        gen, "doc_id bigint, fp bigint"
    )


def _stop_cap(
    n_docs: int, max_df_frac: float | None, max_df_abs: int | None
) -> int | None:
    """Stop-fingerprint document-frequency cap: min of the fractional
    and absolute bounds (floor 2 keeps df=2 — the minimal pair signal
    — alive on tiny corpora), or None when both are disabled.

    The fractional cap alone is NOT scale-closed: at 0.1·n docs per
    fingerprint the pair fan-out is O((0.1n)²) — quadratic again in
    the adversarial limit. The absolute bound makes per-fingerprint
    join work CONSTANT as the corpus grows (docs/SCALE.md addendum 2
    measured the df≈500 configuration at 10×: 3.2× wall, output-bound)
    — so the library default keeps both, switching from fractional to
    absolute at n_docs = max_df_abs / max_df_frac (5k docs at the
    defaults). int() truncation matches the oracle's trunc(); both
    engines see an exact product for n ≤ 2^52."""
    if max_df_frac is None and max_df_abs is None:
        return None
    cands = []
    if max_df_frac is not None:
        cands.append(int(n_docs * max_df_frac))
    if max_df_abs is not None:
        cands.append(max_df_abs)
    return max(2, min(cands))


def winnow_near_dup(
    docs: DataFrame,
    min_shared: int = 5,
    min_overlap: float = 0.5,
    gram_hash: str = "xxhash64",
    max_df_frac: float | None = 0.1,
    max_df_abs: int | None = 500,
) -> DataFrame:
    """Containment near-dup via winnowing sketches: pairs sharing at
    least ``min_shared`` fingerprints AND whose shared count covers at
    least ``min_overlap`` of the SMALLER sketch. Catches shared
    passages (one doc containing a chunk of another) that whole-doc
    token-set Jaccard structurally misses — MOSS's plagiarism-
    detection use of the sketch.

    ``max_df_frac``: stop-fingerprint rule (the published MOSS
    behavior): fingerprints appearing in more than
    ``max(2, trunc(n_docs * max_df_frac))`` documents are dropped from
    every sketch (including the containment denominator) before
    pairing. Window-minimum selection makes fingerprints rare WITHIN a
    doc, but across docs a boilerplate passage (license header, site
    template) puts the same fingerprint in thousands of docs and the
    self-join blows up quadratically on it — at sf0.1 the synthetic
    corpus has 5k docs drawing from only ~1k distinct fingerprints and
    the uncapped join generates 590M rows / 615k "pairs" (5% of all
    doc pairs — noise, not signal). Capped at 10%: 48M join rows,
    2.2k pairs, and every surviving match is a genuinely rare shared
    passage. The floor of 2 keeps df=2 fingerprints (the minimal pair
    signal) alive on tiny corpora. ``None`` disables (exact but
    quadratic on template-heavy corpora).

    ``max_df_abs``: the scale-closing absolute bound — the effective
    cap is ``max(2, min(trunc(n·frac), max_df_abs))`` (see
    :func:`_stop_cap`). A fractional cap alone re-admits O((frac·n)²)
    pair fan-out as n grows; the absolute bound keeps per-fingerprint
    join work constant at any corpus size (measured at 10× in
    docs/SCALE.md addendum 2). Defaults switch from fractional to
    absolute at n = 5k docs; since round 14 the contract row grades
    this same default (its oracle encodes the min of both caps).

    Scale: stop-fingerprint census is one count per distinct
    (fp, doc) — the stop list itself is provably small (at most
    avg_sketch_size / max_df_frac entries regardless of corpus size),
    so it collects to the driver and inlines as an InSet filter (an
    anti-join would duplicate the census subtree per consumer in the
    adaptive plan); pair output is bounded by real sketch overlap.
    One eager census job, then one sketch pass, one equi-join, one
    count aggregate. Two measured local-mode hazards
    are handled structurally: (a) a single-file input leaves the
    CPU-bound sketch on one core, so under-partitioned inputs fan out
    first (round-robin; a no-op on any real multi-split source); (b)
    the pair census is a HIGH-cardinality aggregate (most candidate
    pairs are distinct), where map-side partial aggregation is pure
    overhead — an explicit pinned repartition on the pair key makes
    each final hash map cache-sized and stops AQE coalescing the
    expanding join's output stage down to 2 tasks (input-byte
    estimates are blind to join fan-out). Measured at sf0.1: 7.7 s ->
    4.0 s for the census leg. ``gram_hash``: "xxhash64" / "md5"
    (expression path), "md5_fast" (the vectorized exact-md5 kernel —
    same values as "md5", oracle-seam preserved) or "fast" (the
    vectorized xxhash-family twin, cheapest, no oracle seam)."""
    spark = docs.sparkSession
    par = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par)
    if gram_hash == "fast":
        fps = winnow_fingerprints_fast(docs)
    elif gram_hash == "md5_fast":
        fps = winnow_fingerprints_md5_fast(docs)
    else:
        fps = winnow_fingerprints(docs, gram_hash=gram_hash)
    # Materialize the sketch ONCE (round 15): it has THREE consumers
    # whose subtrees the planner cannot share — the stop-census job,
    # the pair-join exchange (its b-side IS a ReusedExchange), and the
    # sketch-size aggregate — so without this the hashing kernel
    # lineage re-evaluates 3x (the dominant per-row cost at sf10:
    # ~3x the q_winnowing wall buried inside this row).
    # localCheckpoint, NOT persist(): the cache manager matches by
    # analyzed-plan equality, so a persist here would let a repeated
    # identical call (bench repeats, retried jobs) silently read the
    # first call's cache and measure nothing; checkpointing ties the
    # materialization to THIS DataFrame only. Lineage truncation means
    # an executor loss re-runs the job instead of recomputing
    # partitions — the standard batch-operator trade, same as the
    # ingest_batch scratch-parquet idiom. The sketch is ~2 BIGINTs per
    # w tokens (orders of magnitude under the text), so executor
    # storage bounds it at any corpus size.
    fps = fps.localCheckpoint(eager=True)
    cap = _stop_cap(
        docs.count() if (max_df_frac or max_df_abs) else 0,
        max_df_frac,
        max_df_abs,
    )
    if cap is not None:
        # The stop list is materialized EAGERLY and inlined as an
        # InSet filter rather than anti-joined: the census subtree
        # would otherwise appear once per downstream consumer (both
        # join sides + the size aggregate) in the adaptive plan, each
        # re-evaluating the sketch lineage. The collect is bounded by
        # theorem, not by luck: sum(df) = total fingerprint rows, so
        # at most avg_sketch_size / max_df_frac fingerprints can
        # exceed the cap — independent of corpus size.
        hot = [
            r.fp
            for r in fps.groupBy("fp")
            .agg(F.count("*").alias("df"))
            .where(F.col("df") > cap)
            .select("fp")
            .collect()
        ]
        if hot:
            fps = fps.where(~F.col("fp").isin(hot))
    sizes = fps.groupBy("doc_id").agg(F.count("*").alias("sk_sz"))
    a = fps.select(F.col("doc_id").alias("d1"), "fp")
    b = fps.select(F.col("doc_id").alias("d2"), "fp")
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    shared = (
        a.join(b, "fp")
        .where(F.col("d1") < F.col("d2"))
        .repartition(n_shuffle, "d1", "d2")
        .groupBy("d1", "d2")
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
    s1 = sizes.select(F.col("doc_id").alias("d1"), F.col("sk_sz").alias("sz1"))
    s2 = sizes.select(F.col("doc_id").alias("d2"), F.col("sk_sz").alias("sz2"))
    overlap = F.col("n_shared") / F.least("sz1", "sz2")
    return (
        shared.join(s1, "d1")
        .join(s2, "d2")
        .where(overlap >= min_overlap)
        .select("d1", "d2", "n_shared", F.round(overlap, 6).alias("containment"))
    )


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID by character-trigram profile overlap
    (oracle-checked: the whole train/score pipeline is deterministic
    relational algebra, replicated in DuckDB SQL).

    Train: docs with doc_id % 10 < 8 build per-lang top-50 trigram
    profiles. Score: every doc's trigrams join the broadcast profile;
    predicted lang = argmax overlap count (ties broken by lang asc).
    """
    docs = documents(spark, sf_dir)
    # explode the position sequence FIRST, then substr as a row-level
    # codegen expression — the transform() lambda ran interpreted per
    # trigram (guide §4.1); GenerateExec streams, so the text column is
    # referenced (not copied) per position and dropped in the same
    # codegen stage. Identical gram bag, clamped short docs included.
    grams = docs.select(
        "doc_id",
        "lang",
        "text",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.length("text") - 2, F.lit(1)))
        ).alias("__i"),
    ).select(
        "doc_id",
        "lang",
        F.col("text").substr(F.col("__i"), F.lit(3)).alias("gram"),
    )
    train = grams.where(F.col("doc_id") % 10 < 8)
    counts = train.groupBy("lang", "gram").agg(F.count("*").alias("cnt"))
    topw = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), F.col("gram"))
    profile = (
        counts.withColumn("rk", F.row_number().over(topw))
        .where(F.col("rk") <= 50)
        .select("lang", "gram")
        .withColumnRenamed("lang", "profile_lang")
    )
    test = grams.where(F.col("doc_id") % 10 >= 8).dropDuplicates(["doc_id", "gram"])
    scored = (
        test.join(F.broadcast(profile), on=test.gram == profile.gram)
        .groupBy("doc_id", "lang", "profile_lang")
        .agg(F.count("*").alias("overlap"))
    )
    pick = Window.partitionBy("doc_id").orderBy(
        F.col("overlap").desc(), F.col("profile_lang").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(pick))
        .where(F.col("rk") == 1)
        .select(
            "doc_id",
            F.col("lang").alias("actual_lang"),
            F.col("profile_lang").alias("predicted_lang"),
            F.col("overlap").cast("bigint").alias("overlap"),
        )
    )


def q_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract: winnowing document fingerprints over the corpus —
    value-checked (md5-word gram hashes + packed integer window-min
    replay identically in DuckDB). Since round 14 the row runs the
    vectorized exact-md5 kernel (winnow_fingerprints_md5_fast — same
    values bit-for-bit as the expression path, pinned in
    tests/test_winnowing.py; O(n) per doc vs the expression path's
    quadratic substring scans, 138.7 s -> measured in SCALE.md at the
    sf10 rung). Production callers with no oracle seam take
    winnow_fingerprints_fast (xxhash-family, cheapest) instead."""
    from .common import fan_out

    return winnow_fingerprints_md5_fast(
        fan_out(documents(spark, sf_dir).select("doc_id", "text"))
    )


def q_winnow_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract: containment near-dup pairs from the winnowing sketch —
    the operator a real user runs over the fingerprints (MOSS-style
    shared-passage detection). Plain SQL over the already-oracle-checked
    sketch (fingerprint equi-join + count + overlap filter), so the
    whole pipeline value-checks in DuckDB. Uses the md5 contract hash;
    production callers take the xxhash64 default. Runs the LIBRARY
    DEFAULT stop-fingerprint cap — max(2, min(trunc(0.1·n), 500)),
    mirrored cap-for-cap in the oracle SQL (greatest/least/trunc are
    plain ANSI) — so the graded row IS the scale-closed configuration.
    Through round 13 this row pinned max_df_abs=None for the then-
    frozen fractional oracle; that shape legally admitted 0.1·n-doc
    fingerprints and OOMed the sf10 bench (~1.8e9 candidate pairs,
    docs/SCALE.md r13) — the verdict-14 fix folds the absolute bound
    into both legs. At sf≤0.1 (n≤5k docs) the two caps coincide
    (trunc(0.1·n) ≤ 500), so frozen sf0.01/sf0.1 hashes are unchanged;
    at sf1+ the capped shape is the one graded AND benched. Since
    round 14 the sketch leg runs the vectorized exact-md5 kernel
    (same values as the expression path — see q_winnowing)."""
    return winnow_near_dup(
        documents(spark, sf_dir), gram_hash="md5_fast"
    ).select(
        "d1",
        "d2",
        F.col("n_shared").cast("bigint").alias("n_shared"),
        "containment",
    )


def q_vocab_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract: top-1000 corpus vocabulary with dense deterministic
    ids ((count desc, token) order) — the tokenizer build step of the
    training pipeline (operators/training.py build_vocab),
    value-checked end-to-end."""
    from .training import build_vocab

    return build_vocab(documents(spark, sf_dir)).select(
        F.col("token_id").cast("bigint").alias("token_id"),
        "token",
        F.col("cnt").cast("bigint").alias("cnt"),
    )


def _winnowing_oracle() -> str:
    """DuckDB transcription of winnow_fingerprints: identical k-gram
    extraction (1-based substr with tail clamp), identical md5-word
    hash, identical packed (h, pos) forward-window minimum."""
    from .dedup import _hex_word_duck

    pack = 1 << _WINNOW_POS_BITS
    return rf"""
WITH g AS (
  SELECT doc_id, text,
         unnest(generate_series(1, greatest(length(text) - {WINNOW_K - 1}, 1))) AS i
  FROM documents
), hashed AS (
  SELECT doc_id, i - 1 AS pos,
         {_hex_word_duck(f"md5(substr(text, i, {WINNOW_K}))", 1)} AS h
  FROM g
), win AS (
  SELECT doc_id, pos,
         min(h * {pack} + pos) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING) AS wmin,
         count(*) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING) AS wcnt
  FROM hashed
)
SELECT DISTINCT doc_id, wmin // {pack} AS fp
FROM win WHERE wcnt = {WINNOW_W} OR pos = 0
"""


def _winnow_near_dup_oracle(min_shared: int = 5, min_overlap: float = 0.5) -> str:
    """winnow_near_dup transcription: the sketch CTE (nested WITH —
    the same text as the q_winnowing oracle) feeding the stop-
    fingerprint filter, a fingerprint self-join, shared-count filter,
    and smaller-sketch containment ratio, mirroring the Spark ops
    column for column. The cap arithmetic is the library default
    greatest(2, least(trunc(0.1 * n_docs), 500)) in both engines
    (_stop_cap) — DuckDB's decimal 0.1 and Python's float 0.1
    truncate identically at contract scales, and the absolute 500
    bound is exact integer arithmetic everywhere."""
    return f"""
WITH fps0 AS ({_winnowing_oracle()}),
fps AS (
  SELECT f.doc_id, f.fp FROM fps0 f
  WHERE f.fp NOT IN (
    SELECT fp FROM fps0 GROUP BY fp
    HAVING count(*) > greatest(
      2, least(
        CAST(trunc(0.1 * (SELECT count(*) FROM documents)) AS BIGINT),
        CAST(500 AS BIGINT)))
  )
),
sizes AS (
  SELECT doc_id, count(*) AS sk_sz FROM fps GROUP BY doc_id
),
shared AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_shared
  FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
  HAVING count(*) >= {min_shared}
)
SELECT s.d1, s.d2,
       CAST(s.n_shared AS BIGINT) AS n_shared,
       round(s.n_shared * 1.0 / least(s1.sk_sz, s2.sk_sz), 6) AS containment
FROM shared s
JOIN sizes s1 ON s.d1 = s1.doc_id
JOIN sizes s2 ON s.d2 = s2.doc_id
WHERE s.n_shared * 1.0 / least(s1.sk_sz, s2.sk_sz) >= {min_overlap}
"""


ORACLE = {
    "q_winnowing": _winnowing_oracle(),
    "q_winnow_near_dup": _winnow_near_dup_oracle(),
    "q_vocab_topn": r"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+')) AS token
  FROM documents
), counts AS (
  SELECT token, count(*) AS cnt FROM toks GROUP BY token
), ranked AS (
  SELECT token, cnt,
         row_number() OVER (ORDER BY cnt DESC, token) - 1 AS token_id
  FROM counts
)
SELECT token_id, token, cnt FROM ranked WHERE token_id < 1000
""",
    "q_text_stats": r"""
WITH per_doc AS (
  SELECT lang, n_chars,
         len(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+')) AS n_tok,
         len(list_filter(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+'),
                         t -> t IN ('the', 'a', 'of', 'and'))) AS n_stop
  FROM documents
)
SELECT lang,
       count(*) AS n_docs,
       round(avg(n_chars), 6) AS avg_chars,
       round(avg(n_tok), 6) AS avg_tokens,
       round(avg(n_stop * 1.0 / n_tok), 6) AS avg_stop_ratio
FROM per_doc GROUP BY lang
""",
    "q_token_count": r"""
SELECT doc_id,
       CAST(len(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+')) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+'))) AS BIGINT) AS n_distinct_tokens,
       CAST(len(regexp_extract_all(text, '\w+|[^\w\s]', 0)) AS BIGINT) AS n_bpe_tokens,
       CAST(len(list_distinct(regexp_extract_all(text, '\w+|[^\w\s]', 0))) AS BIGINT) AS n_distinct_bpe
FROM documents
""",
    "q_lang_id": """
WITH grams AS (
  SELECT doc_id, lang, substr(text, i, 3) AS gram
  FROM documents,
       unnest(generate_series(1, greatest(length(text) - 2, 1))) AS t(i)
), train AS (
  SELECT * FROM grams WHERE doc_id % 10 < 8
), counts AS (
  SELECT lang, gram, count(*) AS cnt FROM train GROUP BY lang, gram
), profile AS (
  SELECT lang AS profile_lang, gram
  FROM (
    SELECT lang, gram,
           row_number() OVER (PARTITION BY lang
                              ORDER BY cnt DESC, gram) AS rk
    FROM counts
  ) WHERE rk <= 50
), test AS (
  SELECT DISTINCT doc_id, lang, gram FROM grams WHERE doc_id % 10 >= 8
), scored AS (
  SELECT t.doc_id, t.lang, p.profile_lang, count(*) AS overlap
  FROM test t JOIN profile p ON t.gram = p.gram
  GROUP BY t.doc_id, t.lang, p.profile_lang
)
SELECT doc_id,
       lang AS actual_lang,
       profile_lang AS predicted_lang,
       CAST(overlap AS BIGINT) AS overlap
FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY overlap DESC, profile_lang ASC) AS rk
  FROM scored
) WHERE rk = 1
""",
    "q_doc_profile": r"""
WITH t AS (
  SELECT doc_id, text, n_chars,
         len(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+')) AS n_tok,
         len(list_filter(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+'),
                         x -> x IN ('the', 'a', 'of', 'and'))) AS n_stop
  FROM documents
)
SELECT doc_id,
       """
    + exact_ratio6_sql("least(n_chars, 500) * (n_tok - n_stop)", "500 * n_tok")
    + r""" AS quality,
       md5(text) AS fp
FROM t
""",
}

QUERIES = {
    "q_text_stats": text_stats,
    "q_token_count": token_count,
    "q_doc_profile": doc_profile,
    "q_lang_id": lang_id,
}

def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract (tail, round-8 promotion): Gopher-style repetition
    metrics over the documents table — per (doc, n) the duplicate-
    n-gram fraction and top-n-gram token coverage. Was library-only
    (DuckDB-checked in tests/test_curation.py); the oracle below is
    that twin over the raw table."""
    return repetition_stats(documents(spark, sf_dir).select("doc_id", "text"))


def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract (tail, round-8 promotion): the LM-proxy quality score —
    mean unigram log-probability per document under the corpus top-1000
    vocabulary with add-one smoothing (operators/training.py). The one
    float hazard is ln(): JVM Math.log and DuckDB's libm are each
    within 1 ulp, so a 6-decimal round could in principle differ at an
    exact .0000005 boundary — on the FIXED graded corpus the outcome
    is deterministic and hash-green (verified at sf0.001/sf0.01)."""
    from .training import build_vocab, unigram_logprob_score

    # Round-15 note: the lazy vocab re-derivation costs one extra
    # documents scan (3 in the executed plan vs the inherent 2), but
    # collecting the bounded vocabulary eagerly A/B'd WORSE at sf0.1
    # (0.57 lazy vs 1.18 s — the barrier outweighs a parallel cheap
    # scan), so the graded row stays lazy. The production seam already
    # exists: ``unigram_logprob_score`` takes the vocab FRAME, and at
    # 100 TB callers pass the persisted vocab artifact, which removes
    # the re-derivation entirely.
    docs = documents(spark, sf_dir).select("doc_id", "text")
    return unigram_logprob_score(docs, build_vocab(docs))


ORACLE["q_unigram_logprob"] = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+')) AS token
  FROM documents
), counts AS (
  SELECT token, count(*) AS cnt FROM toks GROUP BY 1
), vocab AS (
  SELECT token, cnt FROM counts ORDER BY cnt DESC, token LIMIT 1000
), tot AS (
  SELECT sum(cnt) AS total, count(*) AS vsize FROM vocab
)
SELECT t.doc_id,
       round(avg(ln((coalesce(v.cnt, 0) + 1)::DOUBLE
                    / (tot.total + tot.vsize + 1))), 6) AS avg_logprob,
       count(*) AS n_tokens
FROM toks t
LEFT JOIN vocab v USING (token)
CROSS JOIN tot
GROUP BY t.doc_id
"""


ORACLE["q_repetition_stats"] = r"""
WITH base AS (
  SELECT doc_id, n, regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+') AS toks
  FROM documents, (VALUES (2), (3)) t(n)
), g AS (
  SELECT doc_id, n, len(toks) AS n_tok,
         unnest(list_transform(
           range(0, greatest(len(toks) - n, 0) + 1),
           i -> array_to_string(toks[i + 1 : i + n], ' '))) AS gram
  FROM base
), c AS (
  SELECT doc_id, n, n_tok, gram, count(*) AS c
  FROM g GROUP BY ALL
)
SELECT doc_id, n,
       round(sum(CASE WHEN c > 1 THEN c ELSE 0 END)::DOUBLE
             / sum(c), 6) AS dup_ngram_frac,
       round(least(max(c) * n / n_tok::DOUBLE, 1.0), 6) AS top_ngram_frac
FROM c GROUP BY doc_id, n, n_tok
"""


# round-6/8 promotions, registered AFTER every module's QUERIES (see
# contract.py): the driver's correctness harness checks the first 50
# registered queries, and the original 50-entry contract must keep its
# registration order — new entries append at the tail
def tfidf_top_terms(docs: DataFrame, top_n: int = 5) -> DataFrame:
    """Per-document characteristic terms by TF-IDF: tf(doc, tok) *
    ln((N+1)/(df(tok)+1)) with add-one smoothing, top ``top_n`` per
    doc ordered (score desc, token). The classic relevance weighting —
    what a curation pipeline uses for topic tagging, near-dup
    EXPLANATION (which terms made two docs similar), and
    domain-balance audits.

    Shapes: one (doc, tok) count aggregate, document frequency as a
    WINDOW count per token over that aggregate (round 15 — the df
    aggregate joined back was a second lazy consumer of tf, so the
    corpus tokenize pass ran twice; the window computes the identical
    count of (doc, token) rows per token with no re-derivation), the
    doc count as a one-row broadcast, and the per-doc top-n window.
    ln() determinism across engines: JVM Math.log and libm
    agree within 1 ulp and the 6-decimal round is boundary-free on
    the graded corpus (the q_unigram_logprob precedent)."""
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"[ \t\n\x0B\f\r]+")).alias("token")
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    n_docs = docs.select(F.count("*").alias("n_docs"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("token")
    )
    return (
        tf.withColumn("df", F.count("*").over(Window.partitionBy("token")))
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf") * F.log((F.col("n_docs") + 1) / (F.col("df") + 1)), 6
            ),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_n)
        .select("doc_id", "token", F.col("rank").cast("int").alias("rank"), "tfidf")
    )


def q_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract (tail, round-8 promotion): top-5 TF-IDF terms per
    document — the full (doc, token, rank, score) table hash-compared."""
    return tfidf_top_terms(documents(spark, sf_dir).select("doc_id", "text"))


ORACLE["q_tfidf_topterms"] = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+')) AS token
  FROM documents
), tf AS (
  SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2
), df AS (
  SELECT token, count(*) AS df FROM tf GROUP BY 1
), n AS (
  SELECT count(*) AS n_docs FROM documents
)
SELECT doc_id, token, CAST(rank AS INT) AS rank, tfidf
FROM (
  SELECT t.doc_id, t.token,
         round(t.tf * ln((n.n_docs + 1)::DOUBLE / (d.df + 1)), 6) AS tfidf,
         row_number() OVER (
           PARTITION BY t.doc_id
           ORDER BY round(t.tf * ln((n.n_docs + 1)::DOUBLE / (d.df + 1)), 6) DESC,
                    t.token) AS rank
  FROM tf t JOIN df d USING (token) CROSS JOIN n
) WHERE rank <= 5
"""


# --- quality rule pack (round 9) ---------------------------------------

# multilingual function-word list: the stopword-presence rule should
# pass well-formed text in any of the corpus languages (C4's rule is
# English-only by design; a multilingual corpus needs the union)
QUALITY_STOPWORDS = ("the", "a", "of", "de", "la", "le", "und", "der", "el", "y")


def quality_rules(
    docs: DataFrame,
    min_words: int = 5,
    max_words: int = 100_000,
    min_mean_wl: float = 2.0,
    max_mean_wl: float = 12.0,
    max_short_frac: float = 0.4,
    min_distinct_ratio: float = 0.2,
    min_stop_hits: int = 1,
    stopwords: tuple[str, ...] = QUALITY_STOPWORDS,
) -> DataFrame:
    """Gopher/C4-style document quality RULE PACK (Rae et al. 2021
    §A1.1; Raffel et al. 2020 §2.2): the filter a curation pipeline
    actually runs, with per-rule reason flags so dropped documents are
    attributable — the Dolma tagger/mixer split in one frame:

    - ``r_word_count``     word count within [min_words, max_words]
    - ``r_word_len``       mean word length within [min, max] (gibberish
                           and char-noise screens)
    - ``r_short_words``    fraction of <=2-char words bounded
    - ``r_diversity``      distinct-word ratio floor (the cheap
                           repetition screen; repetition_stats has the
                           full n-gram version)
    - ``r_stopwords``      at least ``min_stop_hits`` distinct function
                           words present (real prose contains them)
    - ``keep``             conjunction of all rules

    Pure JVM expressions over one token-array projection — no shuffle
    at all (a per-row map; the 100 TB shape is a bare scan), no UDF.
    Every emitted column is a boolean or integer, so the oracle
    hash-compares without float seams; thresholds compare single
    engine-identical divisions."""
    base = docs.select(
        "doc_id",
        _tokens(F.col("text")).alias("toks"),
        F.length(F.regexp_replace(F.col("text"), r"[ \t\n\x0B\f\r]+", "")).alias("nc"),
    )
    n_words = F.size("toks")
    mean_wl = F.col("nc") / n_words
    short_frac = (
        F.size(F.filter("toks", lambda t: F.length(t) <= 2)) / n_words
    )
    distinct_ratio = F.size(F.array_distinct("toks")) / n_words
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct("toks"), F.array(*[F.lit(s) for s in stopwords])
        )
    )
    rules = {
        "r_word_count": (n_words >= min_words) & (n_words <= max_words),
        "r_word_len": (mean_wl >= min_mean_wl) & (mean_wl <= max_mean_wl),
        "r_short_words": short_frac <= max_short_frac,
        "r_diversity": distinct_ratio >= min_distinct_ratio,
        "r_stopwords": stop_hits >= min_stop_hits,
    }
    keep = None
    for c in rules.values():
        keep = c if keep is None else (keep & c)
    return base.select(
        "doc_id",
        n_words.cast("bigint").alias("n_words"),
        *[c.alias(name) for name, c in rules.items()],
        keep.alias("keep"),
    )


def q_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract (tail, round 9): the quality rule pack over the
    documents table at default thresholds — per-doc rule flags +
    keep verdict, every cell boolean/integer (no float seam)."""
    return quality_rules(documents(spark, sf_dir).select("doc_id", "text"))


ORACLE["q_quality_rules"] = r"""
WITH t AS (
  SELECT doc_id,
         regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+') AS tk,
         length(regexp_replace(text, '[ \t\n\x0B\f\r]+', '', 'g')) AS nc
  FROM documents
), m AS (
  SELECT doc_id,
         len(tk) AS n_words,
         nc / len(tk) AS mean_wl,
         len(list_filter(tk, x -> length(x) <= 2)) / len(tk) AS short_frac,
         len(list_distinct(tk)) / len(tk) AS distinct_ratio,
         len(list_intersect(list_distinct(tk),
             ['the','a','of','de','la','le','und','der','el','y'])) AS stop_hits
  FROM t
)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       (n_words >= 5 AND n_words <= 100000) AS r_word_count,
       (mean_wl >= 2.0 AND mean_wl <= 12.0) AS r_word_len,
       (short_frac <= 0.4) AS r_short_words,
       (distinct_ratio >= 0.2) AS r_diversity,
       (stop_hits >= 1) AS r_stopwords,
       ((n_words >= 5 AND n_words <= 100000)
        AND (mean_wl >= 2.0 AND mean_wl <= 12.0)
        AND (short_frac <= 0.4)
        AND (distinct_ratio >= 0.2)
        AND (stop_hits >= 1)) AS keep
FROM m
"""


QUERIES_TAIL = {
    "q_winnowing": q_winnowing,
    "q_vocab_topn": q_vocab_topn,
    "q_winnow_near_dup": q_winnow_near_dup,
    "q_repetition_stats": q_repetition_stats,
    "q_unigram_logprob": q_unigram_logprob,
    "q_tfidf_topterms": q_tfidf_topterms,
    "q_quality_rules": q_quality_rules,
}


def inverted_index(
    docs: DataFrame, min_df: int = 2, k: int = 20
) -> DataFrame:
    """Posting-list build — the search-infra adjunct of the text
    family: per term, the document frequency and the first ``k``
    doc ids (ascending) that contain it. The scale guard is the
    ORDER of operations: postings are capped to ``k`` per term with a
    streaming ``row_number`` BEFORE any list is collected, so the
    per-group ``collect_list`` input is ≤ k rows by construction —
    stopword-scale terms (the unbounded-list hazard at 100 TB) never
    materialize a full list anywhere; their df comes from a plain
    grouped count that never builds one.

    Shape (round-15): distinct (term, doc) pairs via one grouped
    pass; per-term df is a window COUNT over the same term partition
    the top-k cap's row_number already shuffles and sorts — the old
    separate dfreq aggregate joined back re-derived the corpus-sized
    tokenize+group pass on its own second scan (executed plan:
    documents scanned twice, 0 ReusedExchange; the same defect —
    and the same fix — as q_tfidf_topterms' df). One corpus pass,
    every shuffle hashes on the term, no join."""
    from pyspark.sql.window import Window

    tok = docs.select(
        "doc_id",
        F.explode(_tokens(F.lower(F.col("text")))).alias("term"),
    ).where(F.col("term") != "")
    pairs = tok.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    w_term = Window.partitionBy("term")
    topk = (
        pairs.withColumn("df", F.count("*").over(w_term).cast("bigint"))
        .where(F.col("df") >= min_df)
        .withColumn(
            "rn", F.row_number().over(w_term.orderBy("doc_id"))
        )
        .where(F.col("rn") <= k)
    )
    return topk.groupBy("term").agg(
        F.first("df").alias("df"),
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.collect_list("doc_id")),
                lambda x: x.cast("string"),
            ),
        ).alias("postings"),
    ).select("term", "df", "postings")


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract (tail, round 9): inverted index over the documents
    table (df >= 2, first 20 postings per term)."""
    return inverted_index(documents(spark, sf_dir))


ORACLE["q_inverted_index"] = r"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(lower(text)), '[ \t\n\x0B\f\r]+')) AS term
  FROM documents
), pairs AS (
  SELECT term, doc_id FROM tok WHERE term <> '' GROUP BY 1, 2
), dfreq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM pairs GROUP BY 1
  HAVING count(*) >= 2
), topk AS (
  SELECT term, doc_id,
         row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
  FROM pairs
), postings AS (
  SELECT term,
         array_to_string(list_sort(list(doc_id)), ',') AS postings
  FROM topk WHERE rn <= 20 GROUP BY term
)
SELECT d.term, d.df, p.postings
FROM dfreq d JOIN postings p USING (term)
"""

QUERIES_TAIL["q_inverted_index"] = q_inverted_index
