"""Training-data pipeline utilities (north star §2.8 adjuncts): the
steps between "deduped corpus" and "training batches" — stratified
sampling, vocabulary building, deterministic splits, and sequence
packing. All pure DataFrame ops; everything is reproducible from the
data alone (content-hash-seeded, no RNG state to ship).

Scale notes: sampling is per-row Bernoulli on a content hash (no
shuffle); vocab building is one token aggregate + one top-k; packing
is a per-partition running sum (one shuffle on the stratify key);
splits are stateless hash arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .common import r6z


def _md5_u(key, salt: str = ""):
    """[0,1) draw from the first md5 word of (salt || key) — the
    DuckDB-replayable twin of the xxhash64 draw (the winnowing
    gram_hash='md5' oracle-seam idiom; production paths keep
    xxhash64, which is ~25% faster and not string-round-tripped)."""
    digest = F.md5(F.concat(F.lit(salt), key.cast("string")))
    word = F.conv(F.substring(digest, 1, 8), 16, 10).cast("bigint")
    return word / F.lit(float(1 << 32))


def stratified_sample(
    docs: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    hash: str = "xxhash64",
) -> DataFrame:
    """Per-stratum sampling with DETERMINISTIC membership: a row is in
    the sample iff the low 32 bits of xxhash64(key) fall under the
    stratum's fraction — reproducible across runs/executors, no RNG,
    no shuffle (unlike ``sampleBy``, whose draw depends on partition
    iteration order). ``hash='md5'`` swaps the draw for the
    md5-word seam so a SQL oracle can replay membership exactly."""
    if hash == "md5":
        u = _md5_u(F.col(key_col))
    else:
        u = (F.xxhash64(F.col(key_col)).bitwiseAND(F.lit((1 << 32) - 1))) / F.lit(
            float(1 << 32)
        )
    # per-stratum fraction as a single chained CASE expression
    expr = F.lit(0.0)
    for stratum, f in fractions.items():
        expr = F.when(F.col(strata_col) == stratum, F.lit(float(f))).otherwise(expr)
    return docs.where(u < expr)


def build_vocab(docs: DataFrame, top_n: int = 1000) -> DataFrame:
    """Corpus vocabulary: token -> (id, count), ids dense 0..top_n-1 by
    (count desc, token) — the deterministic order every tokenizer
    build step needs. One token aggregate + one global top-k
    (TakeOrdered — per-partition heads, single k-row merge)."""
    toks = docs.select(
        F.explode(F.split(F.trim("text"), r"[ \t\n\x0B\f\r]+")).alias("token")
    )
    counts = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    # The unpartitioned window LOOKS like the classic single-partition
    # scale bug (Spark warns "No Partition Defined"), but its input is
    # the post-limit frame: TakeOrdered has already reduced the corpus
    # to <= top_n rows before the window assigns dense ids, so the one
    # partition holds at most top_n (~1000) rows at ANY corpus size.
    # Asserted in tests/test_plans.py (the window sits above the limit
    # in the optimized plan, never below it).
    w = Window.orderBy(F.col("cnt").desc(), F.col("token"))
    return (
        counts.orderBy(F.col("cnt").desc(), "token")
        .limit(top_n)
        .withColumn("token_id", F.row_number().over(w) - 1)
        .select("token_id", "token", "cnt")
    )


def split_by_hash(
    docs: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "split",
    hash: str = "xxhash64",
) -> DataFrame:
    """Deterministic train/val/test assignment: buckets of the salted
    content hash partition [0,1) by the cumulative weights. Stateless
    and stable — adding documents never reassigns existing ones (the
    property random splits lose). ``hash='md5'`` swaps in the
    oracle-seam draw (see _md5_u)."""
    if hash == "md5":
        u = _md5_u(F.col(key_col), salt)
    else:
        u = (
            F.xxhash64(F.concat(F.lit(salt), F.col(key_col).cast("string")))
            .bitwiseAND(F.lit((1 << 32) - 1))
            / F.lit(float(1 << 32))
        )
    expr = None
    acc = 0.0
    for name, wgt in weights.items():
        acc += wgt
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = list(weights)[-1]
    return docs.withColumn("split", F.coalesce(expr, F.lit(last)))


def unigram_logprob_score(docs: DataFrame, vocab: DataFrame) -> DataFrame:
    """Cheap LM-style quality proxy: mean unigram log-probability of a
    document's tokens under the corpus unigram distribution (built by
    ``build_vocab``), with add-one smoothing for out-of-vocabulary
    tokens. Corpus-typical documents score high; gibberish and
    off-distribution text score low — the classic first-pass filter
    before an actual LM scores the survivors.

    One token explode + one broadcastable vocab join + one mean per
    doc; OOV handling via the left join's null branch.
    """
    total = vocab.agg(
        F.sum("cnt").alias("_total"), F.count("*").alias("_vsize")
    )
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"[ \t\n\x0B\f\r]+")).alias("token")
    )
    scored = (
        toks.join(F.broadcast(vocab.select("token", "cnt")), "token", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.log(
                (F.coalesce(F.col("cnt"), F.lit(0)) + 1)
                / (F.col("_total") + F.col("_vsize") + 1)
            ).alias("logp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.round(F.avg("logp"), 6).alias("avg_logprob"),
        F.count("*").alias("n_tokens"),
    )


def quality_gate(
    docs: DataFrame,
    min_chars: int = 10,
    max_chars: int = 100_000,
    observation_name: str = "quality_gate",
):
    """Filter + telemetry in ONE pass: rows outside the quality bounds
    are dropped, and ``observe()`` counts inputs/violations as scan-
    time metrics (surfaced via ``collect_observation`` after any
    action on the result — no second job, no count() re-scan). The
    production shape for corpus QA: the gate that feeds training also
    reports what it threw away.
    """
    from pyspark.sql import Observation

    obs = Observation(observation_name)
    bad_len = (F.col("n_chars") < min_chars) | (F.col("n_chars") > max_chars)
    bad_text = F.col("text").isNull() | (F.length(F.trim("text")) == 0)
    observed = docs.observe(
        obs,
        F.count(F.lit(1)).alias("n_input"),
        F.sum(bad_len.cast("long")).alias("n_bad_length"),
        F.sum(bad_text.cast("long")).alias("n_bad_text"),
    )
    gated = observed.where(~bad_len & ~bad_text)
    return gated, obs


def pack_documents(
    docs: DataFrame,
    token_budget: int,
    group_col: str = "lang",
    n_shards: int = 64,
    shard_hash: str = "xxhash64",
) -> DataFrame:
    """Sequence packing: assign documents to fixed-token-budget bins —
    the concat-and-split step that turns a corpus into training
    sequences. Semantics are GPT-style concat-and-split: documents in
    deterministic (doc_id) order form one token stream per shard, cut
    at exact ``token_budget`` boundaries — a document is assigned to
    the bin where it STARTS and may straddle the boundary (every bin
    is exactly full; this is not no-overflow greedy binning, which
    would leave bins underfull to keep documents whole).

    SHARDED for scale: the running sum is a window per (group, shard)
    where shard = hash(doc_id) % n_shards — one language never
    serializes into a single reducer (the naive per-group window
    would). Bins are globally unique via bin_id = shard + n_shards *
    local_bin; the cost is at most one underfull tail bin per shard,
    negligible against shard sizes. Deterministic end to end (hash
    sharding, doc_id order — no RNG).

    Returns (grp, bin_id, doc_id, n_tokens, offset); offset is the
    document's token start within its bin's stream.
    ``shard_hash='md5'`` swaps the shard draw for the md5-word seam
    (everything else — the running sum, bin and offset arithmetic —
    is already integer-exact SQL in any engine)."""
    if shard_hash == "md5":
        digest = F.md5(F.col("doc_id").cast("string"))
        word = F.conv(F.substring(digest, 1, 8), 16, 10).cast("bigint")
        shard = F.pmod(word, F.lit(n_shards))
    else:
        shard = F.pmod(F.xxhash64("doc_id"), F.lit(n_shards))
    sized = docs.select(
        F.col(group_col).alias("grp"),
        "doc_id",
        shard.alias("_shard"),
        F.size(F.split(F.trim("text"), r"[ \t\n\x0B\f\r]+")).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("grp", "_shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    local_bin = F.floor(F.col("cum_before") / token_budget)
    return (
        sized.withColumn("cum_before", before)
        .select(
            "grp",
            (F.col("_shard") + F.lit(n_shards) * local_bin).alias("bin_id"),
            "doc_id",
            "n_tokens",
            (F.col("cum_before") % token_budget).alias("offset"),
        )
    )


# --- contract registrations (round-8 tail promotions) ------------------
#
# The three sampling/packing utilities above become oracle-checked
# rows via the md5-word hash seam (the winnowing gram_hash='md5'
# idiom): membership/shard draws replay exactly in DuckDB, so the
# driver hash-compares the FULL selected set / assignment / packing
# layout, not just counts. Production callers keep xxhash64.

_STRATA_FRACTIONS = {"en": 0.5, "fr": 0.25, "es": 0.25, "de": 0.75, "zh": 0.1}
_SPLIT_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}
_MD5_U_DUCK = (
    "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT)"
    " / 4294967296.0"
)


def q_stratified_sample(spark, sf_dir: str):
    """Contract (tail): deterministic per-language sample of the
    documents table — the full kept (doc_id, lang, source) set is
    hash-compared, pinning per-row membership, not just rates."""
    from ..io import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return stratified_sample(docs, _STRATA_FRACTIONS, hash="md5")


def q_split_assign(spark, sf_dir: str):
    """Contract (tail): deterministic train/val/test assignment —
    per-split cardinality plus a sum(doc_id) checksum, so swapping any
    two documents between splits is caught without shipping 500 rows."""
    from ..io import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    out = split_by_hash(docs, _SPLIT_WEIGHTS, hash="md5")
    return out.groupBy("split").agg(
        F.count("*").alias("numdocs"), F.sum("doc_id").alias("id_checksum")
    )


WEIGHTED_SAMPLE_K = 200


def weighted_sample(
    docs: DataFrame,
    weight_col: str,
    k: int = WEIGHTED_SAMPLE_K,
    key_col: str = "doc_id",
    hash: str = "xxhash64",
    salt: str = "ws",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    A-Res): each row draws u = hash(key) ∈ (0,1) and keeps score
    ln(u)/w (the monotone form of u^(1/w)); the global top-k by score
    is exactly a weight-proportional without-replacement sample — the
    mixture-construction primitive (sample by quality/source weight)
    that stays DETERMINISTIC across runs and executors (no RNG
    state, the stratified_sample argument). The +0.5 numerator shift
    keeps u strictly positive so ln never sees 0.

    Shape: pure per-row expressions + one TakeOrdered top-k — zero
    shuffles at any corpus size. ``hash='md5'`` is the
    DuckDB-replayable seam; production keeps xxhash64."""
    key = F.col(key_col)
    if hash == "md5":
        digest = F.md5(F.concat(F.lit(salt), key.cast("string")))
        word = F.conv(F.substring(digest, 1, 8), 16, 10).cast("bigint")
    else:
        word = F.xxhash64(F.lit(salt), key).bitwiseAND(
            F.lit((1 << 32) - 1)
        )
    u = (word + F.lit(0.5)) / F.lit(float(1 << 32))
    w = F.greatest(F.col(weight_col), F.lit(1)).cast("bigint")
    score = F.log(u) / w
    return (
        docs.select(key, w.alias("w"), score.alias("_s"))
        .orderBy(F.desc("_s"), key)
        .limit(k)
        # r6z: IEEE negative-zero pairing (common.py; first observed
        # at the sf0.1 sweep — two rows with ln(u)/w ~ -5e-8). Paired
        # with + CAST(0.0 AS DOUBLE) in the oracle.
        .select(key_col, "w", r6z(F.col("_s")).alias("ares_score"))
    )


def build_mixture(
    docs: DataFrame,
    targets: dict[str, float],
    total_tokens: int,
    hash: str = "xxhash64",
    salt: str = "mix",
    pack_budget: int | None = None,
    n_shards: int = 64,
) -> DataFrame:
    """Data-mixture builder: the top-level "assemble the training mix"
    operator — given per-source target proportions in TOKENS (the unit
    mixtures are specified in; doc counts are the wrong currency when
    sources have different length distributions), select a
    deterministic weight-proportional subset of each source that meets
    its token budget, and optionally emit the packed sequence layout.

    Composition of this module's primitives: per-source integer token
    budgets ``int(total_tokens * prop)`` are fixed on the driver (no
    float seam — both engines see literal integers); within a source,
    docs are ranked by the A-Res key of :func:`weighted_sample`
    (weight = n_tokens, so selection is token-proportional and
    without-replacement); the rank order is cut at the token budget
    the way :func:`cap_per_source` cuts at a doc cap — keep while the
    running token sum BEFORE the doc is under budget, so the boundary
    doc is included (per-source overshoot < one doc; a source with
    fewer tokens than its budget contributes everything it has).
    Sources absent from ``targets`` are dropped. With ``pack_budget``
    the selection feeds :func:`pack_documents` (grouped by source) and
    the packed (grp, bin_id, doc_id, n_tokens, offset) layout is
    returned; otherwise the selected docs with their mixture
    bookkeeping (source, n_tokens, sel_rank).

    Scale: one window shuffle on ``source`` (the cap_per_source
    argument: a skewed mega-source is the hot key the budget bounds),
    plus pack_documents' sharded window when packing. Deterministic
    end to end — re-running on any cluster reproduces the mix."""
    budgets = {s: int(total_tokens * p) for s, p in targets.items()}
    kv: list = []
    for s, b in budgets.items():
        kv.extend([F.lit(s), F.lit(b)])
    budget_for = F.create_map(*kv)[F.col("source")]
    if hash == "md5":
        digest = F.md5(F.concat(F.lit(salt), F.col("doc_id").cast("string")))
        word = F.conv(F.substring(digest, 1, 8), 16, 10).cast("bigint")
    else:
        word = F.xxhash64(F.lit(salt), F.col("doc_id")).bitwiseAND(
            F.lit((1 << 32) - 1)
        )
    # +0.5 keeps u strictly positive so ln never sees 0 (the
    # weighted_sample convention, replayed verbatim in the oracle)
    u = (word + F.lit(0.5)) / F.lit(float(1 << 32))
    n_tokens = (
        F.size(F.split(F.trim("text"), r"[ \t\n\x0B\f\r]+")).cast("bigint").alias("n_tokens")
    )
    sized = docs.where(
        F.col("source").isin(list(budgets))
    ).select("doc_id", "source", "text", n_tokens)
    w = F.greatest(F.col("n_tokens"), F.lit(1)).cast("bigint")
    scored = sized.withColumn("_s", F.log(u) / w)
    win = Window.partitionBy("source").orderBy(F.desc("_s"), "doc_id")
    cum_before = F.coalesce(
        F.sum("n_tokens").over(win.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    sel = (
        scored.withColumn("cum_before", cum_before)
        .withColumn("sel_rank", F.row_number().over(win))
        .where(F.col("cum_before") < budget_for)
    )
    if pack_budget is not None:
        return pack_documents(
            sel.select("doc_id", "source", "text"),
            pack_budget,
            group_col="source",
            n_shards=n_shards,
        )
    return sel.select("doc_id", "source", "n_tokens", "sel_rank")


def mixture_census(
    docs: DataFrame,
    targets: dict[str, float],
    total_tokens: int,
    hash: str = "xxhash64",
) -> DataFrame:
    """Per-source audit of :func:`build_mixture` — what a 100 TB run
    reports before training starts: docs selected, tokens selected,
    and the integer token budget the selection was cut at."""
    budgets = {s: int(total_tokens * p) for s, p in targets.items()}
    kv: list = []
    for s, b in budgets.items():
        kv.extend([F.lit(s), F.lit(b)])
    sel = build_mixture(docs, targets, total_tokens, hash=hash)
    return sel.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("sel_tokens"),
        F.max(F.create_map(*kv)[F.col("source")]).cast("bigint").alias(
            "target_tokens"
        ),
    )


TEMP_TOTAL = 1_000_000  # contract-row mixture size (tokens)


def temperature_shares(
    docs: DataFrame,
    temperature: float = 2.0,
    total_tokens: int = TEMP_TOTAL,
    key_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-scaled mixture sizing (the mT5/XLM-R rule: sample
    key ``i`` proportional to ``c_i^(1/T)`` where ``c_i`` is its
    available token count — T=1 keeps natural proportions, T→∞ goes
    uniform, intermediate T up-weights low-resource keys). One row per
    key: available ``tokens``, the normalized ``share`` (6dp), and the
    integer token ``budget`` = floor(total · share) ready for
    :func:`build_mixture`.

    All relational, so the census replays in DuckDB: T=2.0 (the
    contract pin) evaluates the power as ``sqrt`` — the one float
    kernel both engines share bit-for-bit (the P5/P6 equivalence);
    other temperatures use ``pow`` (library path, no oracle claim).
    The share denominator is a per-term DECIMAL(25,15) sum
    (accumulation-order independence) and the budget floor is written
    explicitly on both engines (casts round in DuckDB, truncate in
    Spark — the playbook rule).

    100 TB: the doc scan partial-aggregates into a #keys-row census;
    everything after is arithmetic on that census."""
    n_tokens = F.size(F.split(F.trim(F.col(text_col)), r"[ \t\n\x0B\f\r]+"))
    census = (
        docs.select(F.col(key_col).alias("key"), n_tokens.alias("nt"))
        .groupBy("key")
        .agg(F.sum("nt").cast("bigint").alias("tokens"))
    )
    if temperature == 2.0:
        w = F.sqrt(F.col("tokens").cast("double"))
    else:
        w = F.pow(
            F.col("tokens").cast("double"), F.lit(1.0 / temperature)
        )
    weighted = census.select("key", "tokens", w.alias("w"))
    # the denominator is a global window over the #keys-row census —
    # NOT a separate agg + crossJoin, which would make the corpus
    # census a two-consumer lineage and re-scan the docs per consumer;
    # the single-partition funnel holds #keys rows, and the per-term
    # DECIMAL sum is accumulation-order independent
    tot = (
        F.sum(F.col("w").cast("decimal(25,15)"))
        .over(Window.partitionBy())
        .cast("double")
    )
    return weighted.select(
        "key",
        "tokens",
        F.round(F.col("w") / tot, 6).alias("share"),
        F.floor(F.lit(total_tokens) * F.col("w") / tot)
        .cast("bigint")
        .alias("budget"),
    )


def unimax_budgets(
    available: dict[str, int], total_tokens: int, max_epochs: float = 1.0
) -> dict[str, int]:
    """UNIMAX (Chung et al. 2023) budget allocation: split
    ``total_tokens`` as uniformly as possible across keys, except no
    key may be asked for more than ``max_epochs`` passes over its
    available tokens — the standard fix for temperature sampling's
    failure mode of epoch-ing tiny languages into memorization.

    Water-filling on the (driver-side, #keys-row) census: repeatedly
    give every unsaturated key an equal slice of what remains; keys
    whose cap is below the slice saturate at the cap and drop out.
    Deterministic, O(#keys²) worst case — #keys is mixture-sized
    (tens), never corpus-sized."""
    if total_tokens < 0 or max_epochs <= 0:
        raise ValueError("need total_tokens >= 0 and max_epochs > 0")
    caps = {k: int(max_epochs * c) for k, c in available.items()}
    out = {k: 0 for k in available}
    remaining = min(total_tokens, sum(caps.values()))
    live = {k for k, c in caps.items() if c > 0}
    while remaining > 0 and live:
        slice_ = remaining // len(live)
        if slice_ == 0:
            # hand out the last few tokens deterministically (sorted)
            for k in sorted(live)[:remaining]:
                out[k] += 1
            break
        saturated = set()
        for k in sorted(live):
            take = min(slice_, caps[k] - out[k])
            out[k] += take
            remaining -= take
            if out[k] >= caps[k]:
                saturated.add(k)
        live -= saturated
        if not saturated and slice_ > 0 and remaining < len(live):
            for k in sorted(live)[:remaining]:
                out[k] += 1
            break
    return out


def temperature_mixture(
    docs: DataFrame,
    temperature: float,
    total_tokens: int,
    key_col: str = "source",
    hash: str = "xxhash64",
    **kwargs,
) -> DataFrame:
    """Derive temperature-scaled targets from the OBSERVED per-source
    token counts and hand them to :func:`build_mixture` — the
    composition a real run uses when proportions aren't hand-picked.
    The census collect is #sources rows (bounded by construction)."""
    shares = temperature_shares(
        docs, temperature, total_tokens, key_col=key_col
    ).collect()
    tot = sum(r["budget"] for r in shares)
    targets = {
        r["key"]: (r["budget"] / tot if tot else 0.0) for r in shares
    }
    return build_mixture(docs, targets, total_tokens, hash=hash, **kwargs)


def q_temperature_shares(spark, sf_dir: str):
    """Contract (tail, round 10): T=2 temperature mixture sizing over
    the per-language token census — available tokens, normalized
    share, and the floor()'d integer budget of a 1M-token mix, all
    replayed cell-exactly (sqrt/decimal-sum/floor seams)."""
    from ..io import load_table

    docs = load_table(spark, sf_dir, "documents").select("lang", "text")
    return temperature_shares(docs)


MIXTURE_TARGETS = {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1}
MIXTURE_TOTAL = 2000


def q_data_mixture(spark, sf_dir: str):
    """Contract (tail, round 10): token-proportioned mixture census
    over four sources (40/30/20/10 of a 2000-token mix; md5 seam for
    the A-Res key) — per-source docs/tokens/budget, integer-exact."""
    from ..io import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    return mixture_census(docs, MIXTURE_TARGETS, MIXTURE_TOTAL, hash="md5")


def q_weighted_sample(spark, sf_dir: str):
    """Contract (tail, round 9): length-weighted A-Res sample of the
    documents table (md5 oracle seam), top-200 by score."""
    from ..io import load_table

    docs = load_table(spark, sf_dir, "documents")
    return weighted_sample(docs, "n_chars", hash="md5")


def q_pack_documents(spark, sf_dir: str):
    """Contract (tail): GPT-style concat-and-split sequence packing of
    the documents table (256-token bins, 8 shards) — the full
    (grp, bin_id, doc_id, n_tokens, offset) layout is hash-compared,
    pinning the running sum, bin arithmetic, and shard routing."""
    from ..io import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    return pack_documents(docs, 256, n_shards=8, shard_hash="md5")


ORACLE = {
    "q_stratified_sample": """
SELECT doc_id, lang, source FROM documents
WHERE """ + _MD5_U_DUCK + """ <
      CASE lang WHEN 'en' THEN 0.5 WHEN 'fr' THEN 0.25 WHEN 'es' THEN 0.25
                WHEN 'de' THEN 0.75 WHEN 'zh' THEN 0.1 ELSE 0.0 END
""",
    # thresholds written as running SUMS (0.8 + 0.1), not collapsed
    # literals: split_by_hash accumulates the weights in float, so the
    # val/test boundary is the double 0.8+0.1 (≠ 0.9 in the last ulp)
    # — the oracle must bound with the same bits
    "q_split_assign": """
WITH assigned AS (
  SELECT doc_id,
         CASE WHEN ("""
    + _MD5_U_DUCK.replace("doc_id", "'split' || CAST(doc_id AS VARCHAR)")
    + """) < 0.8 THEN 'train'
              WHEN ("""
    + _MD5_U_DUCK.replace("doc_id", "'split' || CAST(doc_id AS VARCHAR)")
    + """) < 0.8 + 0.1 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
SELECT split, count(*) AS numdocs, CAST(sum(doc_id) AS BIGINT) AS id_checksum
FROM assigned GROUP BY 1
""",
    "q_pack_documents": r"""
WITH sized AS (
  SELECT lang AS grp, doc_id,
         (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT) % 8 AS shard,
         CAST(len(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+')) AS BIGINT) AS n_tokens
  FROM documents
), c AS (
  SELECT grp, doc_id, shard, n_tokens,
         CAST(COALESCE(sum(n_tokens) OVER (
             PARTITION BY grp, shard ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_before
  FROM sized
)
SELECT grp, CAST(shard + 8 * (cum_before // 256) AS BIGINT) AS bin_id,
       doc_id, n_tokens, CAST(cum_before % 256 AS BIGINT) AS "offset"
FROM c
""",
    # integer token budgets (int(2000*p)) inlined as literals in BOTH
    # engines — the proportions never touch cross-engine float math
    "q_data_mixture": r"""
WITH scored AS (
  SELECT doc_id, source,
    CAST(len(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+')) AS BIGINT) AS n_tokens,
    ln((CAST(('0x' || substr(md5('mix' || CAST(doc_id AS VARCHAR)),
                             1, 8))::BIGINT AS DOUBLE)
        + CAST(0.5 AS DOUBLE)) / CAST(4294967296 AS DOUBLE))
      / CAST(greatest(len(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+')), 1)
             AS BIGINT) AS s
  FROM documents
  WHERE source IN ('src0', 'src1', 'src2', 'src3')
), c AS (
  SELECT source, n_tokens,
    CAST(COALESCE(sum(n_tokens) OVER (
        PARTITION BY source ORDER BY s DESC, doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS cum_before,
    CASE source WHEN 'src0' THEN 800 WHEN 'src1' THEN 600
                WHEN 'src2' THEN 400 WHEN 'src3' THEN 200 END AS budget
  FROM scored
)
SELECT source, count(*)::BIGINT AS n_docs,
       sum(n_tokens)::BIGINT AS sel_tokens,
       max(budget)::BIGINT AS target_tokens
FROM c WHERE cum_before < budget GROUP BY source
""",
    "q_weighted_sample": """
WITH keyed AS (
  SELECT doc_id,
         CAST(greatest(n_chars, 1) AS BIGINT) AS w,
         ln((CAST(('0x' || substr(md5('ws' || CAST(doc_id AS VARCHAR)),
                                  1, 8))::BIGINT AS DOUBLE)
             + CAST(0.5 AS DOUBLE)) / CAST(4294967296 AS DOUBLE))
           / CAST(greatest(n_chars, 1) AS BIGINT) AS s
  FROM documents
)
SELECT doc_id, w, round(s, 6) + CAST(0.0 AS DOUBLE) AS ares_score
FROM keyed ORDER BY s DESC, doc_id LIMIT 200
""",
}

QUERIES: dict = {}

QUERIES_TAIL = {
    "q_stratified_sample": q_stratified_sample,
    "q_split_assign": q_split_assign,
    "q_pack_documents": q_pack_documents,
    "q_weighted_sample": q_weighted_sample,
    "q_data_mixture": q_data_mixture,
    "q_temperature_shares": q_temperature_shares,
}

ORACLE["q_temperature_shares"] = rf"""
WITH census AS (
  SELECT lang AS key,
         CAST(sum(len(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+')))
              AS BIGINT) AS tokens
  FROM documents GROUP BY 1
),
weighted AS (
  SELECT key, tokens, sqrt(CAST(tokens AS DOUBLE)) AS w FROM census
),
tot AS (
  SELECT CAST(sum(CAST(w AS DECIMAL(25,15))) AS DOUBLE) AS tot
  FROM weighted
)
SELECT key, tokens,
       round(w / tot, 6) AS share,
       CAST(floor({TEMP_TOTAL} * w / tot) AS BIGINT) AS budget
FROM weighted, tot
"""
