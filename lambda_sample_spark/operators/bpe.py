"""BPE tokenizer training + application (SURVEY.md §2.8 adjunct):
learn byte-pair-encoding merges from a corpus and segment documents
with them — the tokenizer-fitting step of an LLM training pipeline
(Sennrich et al., ACL 2016; the subword-nmt algorithm).

Where Spark does the work (the 100 TB story): BPE learning never
iterates over the CORPUS — it iterates over the DISTINCT-WORD
frequency table, which is vocabulary-sized (Zipf: ~millions of rows
at 100 TB, further capped by ``min_count``/``max_vocab`` exactly like
production trainers). So the distributed parts are the two
corpus-sized passes — the word-frequency census (one explode + one
map-side-combined shuffle) and the apply pass (segment DISTINCT words
once, then join the segmentation back; per-doc work is a join, not a
re-segmentation) — and the merge loop runs driver-side over the
collected word table with subword-nmt's incremental pair-statistics
update (O(occurrences touched) per merge, not a full recount).
Single-node merge loops over word tables are how every production
trainer works (subword-nmt, HuggingFace tokenizers, sentencepiece);
the part that must scale with data IS the part Spark runs.

Determinism: pure integer pair counts; best pair = max by
(count, pair) with the lexicographic tie-break, so learned merges are
a pure function of the word census. No RNG anywhere.

Contract: iterative merge learning is not SQL-expressible, so through
round 13 ``q_bpe_tokens`` registered rows-only. Since round 14 it is
fully oracle-checked via the q_rf_train pattern: every cell is either
a DETERMINISTIC census DuckDB replays exactly (per-doc word count,
per-doc word-character count, the corpus vocabulary size the learner
actually collected) or a SELF-VALIDATING boolean the query itself
verifies about the learned tokenizer and the oracle asserts TRUE
(lossless round-trip: each word's subtokens concatenate back to
word+EOW; token bounds: 1 <= n_sub <= len(word)+1 — any merge-table
or segmentation bug flips a boolean and fails the hash). The merge
SEQUENCE exactness evidence lives in tests/test_bpe.py: the classic
textbook fixture reproduces the canonical merge sequence, the
incremental learner equals a brute-force recount learner
merge-for-merge on random vocabularies, and segmenting the training
vocabulary with the learned ranks replays the learn loop's own final
symbol sequences word-for-word (the subword-nmt replay property).
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table

EOW = "</w>"  # end-of-word marker; its merges encode word-final units


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The distributed half of BPE training: (word, cnt) over the
    corpus — one explode + one map-side-combined shuffle."""
    return (
        docs.select(
            F.explode(F.split(F.trim(F.col(text_col)), r"[ \t\n\x0B\f\r]+")).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def _pair_stats(vocab):
    """pair -> total count, and pair -> {word index: occurrences}."""
    stats: dict = defaultdict(int)
    index: dict = defaultdict(lambda: defaultdict(int))
    for wi, (syms, cnt) in enumerate(vocab):
        for a, b in zip(syms, syms[1:]):
            stats[(a, b)] += cnt
            index[(a, b)][wi] += 1
    return stats, index


def _merge_word(syms, pair, joined):
    out = []
    i = 0
    while i < len(syms):
        if i < len(syms) - 1 and syms[i] == pair[0] and syms[i + 1] == pair[1]:
            out.append(joined)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def learn_bpe_from_counts(
    wc: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """subword-nmt's loop with incremental statistics: each merge
    touches only the words containing the merged pair (their old pairs
    are subtracted, their new pairs added) — O(occurrences affected)
    per round, never a vocabulary recount. Stops early when no pair
    occurs twice (merging a count-1 pair memorizes noise)."""
    vocab = [(tuple(w) + (EOW,), c) for w, c in wc]
    stats, index = _pair_stats(vocab)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not stats:
            break
        # deterministic argmax: count first, then lexicographic pair
        best = max(stats.items(), key=lambda kv: (kv[1], kv[0]))[0]
        if stats[best] < 2:
            break
        merges.append(best)
        joined = best[0] + best[1]
        for wi in list(index[best]):
            syms, cnt = vocab[wi]
            for a, b in zip(syms, syms[1:]):
                stats[(a, b)] -= cnt
                index[(a, b)][wi] -= 1
                if index[(a, b)][wi] <= 0:
                    del index[(a, b)][wi]
                if stats[(a, b)] <= 0:
                    stats.pop((a, b), None)
                    index.pop((a, b), None)
            new = _merge_word(syms, best, joined)
            vocab[wi] = (new, cnt)
            for a, b in zip(new, new[1:]):
                stats[(a, b)] += cnt
                index[(a, b)][wi] += 1
    return merges


def learn_bpe_with_stats(
    docs: DataFrame,
    n_merges: int = 100,
    min_count: int = 2,
    max_vocab: int | None = 1_000_000,
    text_col: str = "text",
) -> tuple[list[tuple[str, str]], int]:
    """Fit BPE merges on a corpus; also return the size of the word
    table the learner actually consumed (the contract row's
    ``vocab_size`` cell — DuckDB replays it as the min_count-filtered
    distinct-word count capped at max_vocab). The collect is the word
    table AFTER the ``min_count`` floor and ``max_vocab`` frequency
    cap — the same bounds every production trainer applies (rare words
    can't win a merge anyway: a pair needs count >= 2). Deterministic
    cap order: (cnt desc, word) so equal-frequency words never flap."""
    wc = word_counts(docs, text_col).where(F.col("cnt") >= min_count)
    if max_vocab is not None:
        wc = wc.orderBy(F.col("cnt").desc(), "word").limit(max_vocab)
    rows = wc.collect()
    merges = learn_bpe_from_counts(
        [(r["word"], r["cnt"]) for r in rows], n_merges
    )
    return merges, len(rows)


def learn_bpe(
    docs: DataFrame,
    n_merges: int = 100,
    min_count: int = 2,
    max_vocab: int | None = 1_000_000,
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Fit BPE merges on a corpus (see learn_bpe_with_stats)."""
    return learn_bpe_with_stats(
        docs, n_merges, min_count, max_vocab, text_col
    )[0]


def segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply learned merges to one word: repeatedly merge the
    lowest-rank adjacent pair (all its occurrences) — the canonical
    BPE inference loop. Replays training exactly on training words."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        ranked = [
            (ranks[(a, b)], i)
            for i, (a, b) in enumerate(zip(syms, syms[1:]))
            if (a, b) in ranks
        ]
        if not ranked:
            break
        rank = min(r for r, _ in ranked)
        # ranks are unique per pair type, so `rank` identifies exactly
        # one pair — merge all its occurrences this pass
        out: list[str] = []
        i = 0
        while i < len(syms):
            if (
                i < len(syms) - 1
                and ranks.get((syms[i], syms[i + 1])) == rank
            ):
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def corpus_words(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, pos, word) — the exploded whitespace tokenization both the
    apply pass and the contract census run on."""
    return docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.trim(F.col(text_col)), r"[ \t\n\x0B\f\r]+")).alias(
            "pos", "word"
        ),
    ).where(F.col("word") != "")


def segment_vocab(
    words: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """(word, subtoks, n_sub) for every DISTINCT word in ``words`` —
    the vocabulary-sized segmentation table the corpus joins back
    onto. Each distinct word is segmented once (mapInPandas over the
    word frame, ranks broadcast); per-doc work downstream is a join,
    not a re-segmentation."""
    from pyspark.sql import types as T

    spark = words.sparkSession
    ranks = {p: i for i, p in enumerate(merges)}
    bc = spark.sparkContext.broadcast(ranks)
    eow = EOW  # plain closure var — see self-containment note below

    # explicit fan-out: AQE sizes the distinct's output stage by BYTES
    # and coalesces a million short strings to ~2 tasks, serializing
    # the CPU-bound Python segmentation below (measured 15.4 s -> ~2 s
    # at the 50k-doc rung); byte estimates are blind to per-row Python
    # cost, so pin the parallelism
    distinct_words = (
        words.select("word")
        .distinct()
        .repartition(spark.sparkContext.defaultParallelism)
    )

    # NB: the closure must be fully self-contained (no references to
    # module-level functions/globals) so cloudpickle ships it by value
    # — a call to segment_word here would pickle BY REFERENCE and
    # require this package on every executor (the lsh_planes /
    # multimodal idiom). test_apply_matches_per_word_segmentation
    # pins this inline twin against segment_word.
    def seg(batches):
        import pandas as pd  # local import keeps the closure standalone

        r = bc.value

        def seg_word(word):
            syms = list(word) + [eow]
            while len(syms) > 1:
                ranked = [
                    r[(a, b)]
                    for a, b in zip(syms, syms[1:])
                    if (a, b) in r
                ]
                if not ranked:
                    break
                rank = min(ranked)
                out = []
                i = 0
                while i < len(syms):
                    if (
                        i < len(syms) - 1
                        and r.get((syms[i], syms[i + 1])) == rank
                    ):
                        out.append(syms[i] + syms[i + 1])
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            return syms

        for pdf in batches:
            toks = [seg_word(w) for w in pdf["word"]]
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "subtoks": toks,
                    "n_sub": [len(t) for t in toks],
                }
            )

    seg_schema = T.StructType(
        [
            T.StructField("word", T.StringType()),
            T.StructField("subtoks", T.ArrayType(T.StringType())),
            T.StructField("n_sub", T.IntegerType()),
        ]
    )
    return distinct_words.mapInPandas(seg, seg_schema)


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Segment a corpus with learned merges. Work is proportional to
    the DISTINCT-word table, not the corpus (see segment_vocab), then
    the (word -> subtokens) map joins back onto the exploded corpus
    and re-aggregates per doc in token order. Returns
    (id, n_words, n_subwords, subword string sample via first tokens).
    """
    words = corpus_words(docs, id_col, text_col)
    word_map = segment_vocab(words, merges)
    # vocab-sized map; broadcast at test SF, co-keyed shuffle at scale
    joined = words.join(word_map, "word")
    # head sample: the first 8 SUBTOKENS can only come from the first
    # 8 WORDS (every word yields >= 1 subtoken), so only pos < 8
    # structs enter the agg buffer (collect_list drops the when()'s
    # nulls) — shuffling every doc's full token arrays just to slice
    # 8 out would make the head sample the dominant apply cost
    head_struct = F.when(
        F.col("pos") < 8, F.struct("pos", "subtoks")
    )
    return (
        joined.groupBy(id_col)
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_sub").cast("bigint").alias("n_subwords"),
            F.flatten(
                F.array_sort(F.collect_list(head_struct)).subtoks
            ).alias("head"),
        )
        .select(
            id_col,
            "n_words",
            "n_subwords",
            F.concat_ws(" ", F.slice("head", 1, 8)).alias("head_tokens"),
        )
    )


N_MERGES = 50
MAX_VOCAB = 1_000_000


def q_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract (tail; oracle-checked since round 14 via the
    q_rf_train graduation pattern — see module docstring): learn 50
    merges on the documents table (min_count=2), segment every
    document, return per-doc deterministic census cells (word count,
    word-character count, the learner's consumed vocabulary size) plus
    self-validating tokenizer booleans the oracle asserts TRUE:

    - ``roundtrip_ok`` — every word's subtokens concatenate back to
      exactly word+EOW (lossless segmentation; any merge-application
      bug flips it);
    - ``token_bounds_ok`` — every word yields between 1 and
      len(word)+1 subtokens (a merge can only ever REDUCE the
      char+EOW baseline; more tokens than characters+1 or an empty
      segmentation means a broken merge table).

    The RNG-free merge SEQUENCE itself is pinned merge-for-merge in
    tests/test_bpe.py (textbook fixture + brute-force equivalence);
    the production per-doc shape with n_subwords/head_tokens stays
    available as :func:`apply_bpe`."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    merges, vocab_size = learn_bpe_with_stats(
        docs, n_merges=N_MERGES, max_vocab=MAX_VOCAB
    )
    words = corpus_words(docs)
    word_map = segment_vocab(words, merges)
    per_word = words.join(word_map, "word")
    return (
        per_word.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum(F.length("word")).cast("bigint").alias("n_chars_ws"),
            F.every(
                F.concat_ws("", F.col("subtoks"))
                == F.concat(F.col("word"), F.lit(EOW))
            ).alias("roundtrip_ok"),
            F.every(
                (F.col("n_sub") >= 1)
                & (F.col("n_sub") <= F.length("word") + 1)
            ).alias("token_bounds_ok"),
        )
        .withColumn("vocab_size", F.lit(vocab_size).cast("bigint"))
        .select(
            "doc_id",
            "n_words",
            "n_chars_ws",
            "vocab_size",
            "roundtrip_ok",
            "token_bounds_ok",
        )
    )


QUERIES: dict = {}

QUERIES_TAIL = {
    "q_bpe_tokens": q_bpe_tokens,
}

# The census cells replay in plain SQL (same whitespace split as the
# q_vocab_topn oracle — parity proven there); the tokenizer booleans
# are asserted TRUE (self-validated in-query, the q_rf_train pattern).
ORACLE: dict = {
    "q_bpe_tokens": rf"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+')) AS word
  FROM documents
), words AS (
  SELECT doc_id, word FROM toks WHERE word <> ''
), vs AS (
  SELECT least(count(*), {MAX_VOCAB}) AS vocab_size
  FROM (SELECT word FROM words GROUP BY word HAVING count(*) >= 2)
)
SELECT w.doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(length(w.word)) AS BIGINT) AS n_chars_ws,
       (SELECT CAST(vocab_size AS BIGINT) FROM vs) AS vocab_size,
       TRUE AS roundtrip_ok,
       TRUE AS token_bounds_ok
FROM words w
GROUP BY w.doc_id
""",
}
