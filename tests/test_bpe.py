"""BPE training/application: the incremental-statistics learner must
equal a brute-force recount learner merge-for-merge, reproduce the
classic textbook example, and segmentation with the learned ranks
must replay training (the subword-nmt property). The contract row is
rows-only by design — these pins ARE its correctness evidence.
"""

from __future__ import annotations

import random

from lambda_sample_spark.operators.bpe import (
    EOW,
    _merge_word,
    apply_bpe,
    learn_bpe,
    learn_bpe_from_counts,
    q_bpe_tokens,
    segment_word,
)
from tests.conftest import SMOKE_SF_DIR


def _brute_force_learn(wc, n_merges):
    """Independent reference: full pair recount every round, same
    (count, pair) argmax and count>=2 stop."""
    vocab = {tuple(w) + (EOW,): c for w, c in wc}
    merges = []
    for _ in range(n_merges):
        stats = {}
        for syms, c in vocab.items():
            for p in zip(syms, syms[1:]):
                stats[p] = stats.get(p, 0) + c
        if not stats:
            break
        best = max(stats.items(), key=lambda kv: (kv[1], kv[0]))[0]
        if stats[best] < 2:
            break
        merges.append(best)
        vocab = {
            _merge_word(s, best, best[0] + best[1]): c
            for s, c in vocab.items()
        }
    return merges


def test_textbook_example():
    wc = [("hug", 10), ("pug", 5), ("hugs", 5)]
    m = learn_bpe_from_counts(wc, 5)
    assert m[0] == ("u", "g")          # count 20, unambiguous
    assert m[1] == ("ug", EOW)         # 15-15 tie broken lexicographic
    ranks = {p: i for i, p in enumerate(m)}
    assert segment_word("hug", ranks) == ["hug" + EOW]
    assert segment_word("pug", ranks) == ["p", "ug" + EOW]


def test_incremental_equals_brute_force_on_random_vocabs():
    rng = random.Random(7)
    letters = "abcdef"
    for trial in range(20):
        wc = [
            (
                "".join(rng.choice(letters) for _ in range(rng.randint(1, 7))),
                rng.randint(1, 40),
            )
            for _ in range(rng.randint(2, 30))
        ]
        # dedup words, keep first count (learner contract: distinct words)
        seen = {}
        for w, c in wc:
            seen.setdefault(w, c)
        wc = sorted(seen.items())
        fast = learn_bpe_from_counts(wc, 30)
        slow = _brute_force_learn(wc, 30)
        assert fast == slow, f"trial {trial}: {fast} != {slow}"


def test_segmentation_replays_training():
    rng = random.Random(11)
    wc = sorted(
        {
            "".join(rng.choice("abcd") for _ in range(rng.randint(1, 6))): rng.randint(1, 20)
            for _ in range(40)
        }.items()
    )
    merges = learn_bpe_from_counts(wc, 25)
    ranks = {p: i for i, p in enumerate(merges)}
    # replay the learn loop's end state independently
    vocab = {tuple(w) + (EOW,): None for w, _ in wc}
    for p in merges:
        vocab = {_merge_word(s, p, p[0] + p[1]): None for s in vocab}
    end_state = {s for s in vocab}
    for w, _ in wc:
        assert tuple(segment_word(w, ranks)) in end_state
        # lossless: concatenating subtokens reconstructs the word
        assert "".join(segment_word(w, ranks)) == w + EOW


def test_corpus_contract_row(spark):
    df = q_bpe_tokens(spark, SMOKE_SF_DIR).toPandas()
    assert len(df) == 500
    # the self-validating booleans hold on the real corpus (the oracle
    # asserts them TRUE, so a FALSE here is the hash gate's failure
    # mode caught early)
    assert df.roundtrip_ok.all()
    assert df.token_bounds_ok.all()
    assert (df.n_words >= 1).all()
    assert (df.n_chars_ws >= df.n_words).all()
    assert df.vocab_size.nunique() == 1 and int(df.vocab_size.iloc[0]) > 0
    # deterministic across runs
    again = q_bpe_tokens(spark, SMOKE_SF_DIR).toPandas()
    a = df.sort_values("doc_id").reset_index(drop=True)
    b = again.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_apply_bpe_compresses_corpus(spark):
    """The production per-doc shape (n_subwords/head_tokens lives in
    apply_bpe since the contract row graduated): learned merges
    compress vs char-level tokens (chars + one EOW per word)."""
    from lambda_sample_spark.io import load_table

    docs = load_table(spark, SMOKE_SF_DIR, "documents").select(
        "doc_id", "text"
    )
    merges = learn_bpe(docs, n_merges=50)
    df = apply_bpe(docs, merges).toPandas()
    assert len(df) == 500
    assert (df.n_subwords >= df.n_words).all()  # >= one subtoken/word
    char_level = (
        spark.read.parquet(f"{SMOKE_SF_DIR}/documents.parquet")
        .selectExpr(
            "sum(length(replace(text, ' ', ''))"
            " + size(split(trim(text), '\\\\s+')))"
        )
        .collect()[0][0]
    )
    assert df.n_subwords.sum() < 0.75 * char_level


def test_apply_matches_per_word_segmentation(spark):
    docs = spark.createDataFrame(
        [(1, "aa ab aa"), (2, "ab"), (3, "ba aa aa ba")],
        "doc_id BIGINT, text STRING",
    )
    merges = learn_bpe(docs, n_merges=10, min_count=1)
    out = {
        r["doc_id"]: r
        for r in apply_bpe(docs, merges).collect()
    }
    ranks = {p: i for i, p in enumerate(merges)}
    for doc_id, text in [(1, "aa ab aa"), (2, "ab"), (3, "ba aa aa ba")]:
        words = text.split()
        toks = [t for w in words for t in segment_word(w, ranks)]
        assert out[doc_id]["n_words"] == len(words)
        assert out[doc_id]["n_subwords"] == len(toks)
        assert out[doc_id]["head_tokens"] == " ".join(toks[:8])
