"""End-to-end pretraining-data pipeline: the operator surface of this
repo composed the way a real corpus run composes it. This is the
"switching user" artifact — every stage is a library operator from
``lambda_sample_spark``, chained over an arbitrary (doc_id, text,
lang, source, n_chars) frame:

  1. quality gate        (training.quality_gate — filter + telemetry)
  2. exact dedup         (dedup.dedup_exact_keep_first)
  2b. substring scrub    (substring.duplicated_spans +
                          remove_dup_spans — excise duplicated
                          passages inside surviving docs; round 10)
  3. near-dup dedup      (incremental_dedup.ingest_batch, day-one
                          commit — leaves a reusable minhash index for
                          tomorrow's batch)
  4. decontamination     (curation.decontaminate vs a benchmark set)
  5. per-source capping  (curation.cap_per_source)
  6. stratified sampling (training.stratified_sample by lang)
  6b. DSIR selection     (dsir.dsir_select — importance resampling
                          toward the target-language distribution;
                          round 9)
  7. sequence packing    (training.pack_documents into token bins)
  7b. BPE tokenization   (bpe.learn_bpe + apply_bpe on the final
                          corpus — merges fit AFTER all filtering, as
                          a real run fits its tokenizer on the data
                          it will actually train on; the per-doc
                          subword counts land next to the packed
                          assignment; round 9)
  7c. span corruption    (corruption.span_corrupt — deterministic
                          T5 masked-span (input, target) pairs for
                          encoder-decoder objectives; round 10)
  8. training order      (curation.deterministic_shuffle keyed on
                          bin_id: BINS are the unit a training loader
                          reads, so the order shuffle runs after
                          packing — shuffling docs before packing
                          would be discarded by the packer's own
                          shard/bin assignment)

Run: python examples/pretrain_pipeline.py [sf_dir] [out_dir]
(defaults: /root/testdata/sf0.001, a temp dir). Prints per-stage
survivor counts and writes the shard-ordered packed assignment as
parquet. Every stage is deterministic — two runs produce
byte-identical output. Driven by tests/test_pipeline_example.py.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def run_pipeline(
    spark: SparkSession,
    docs: DataFrame,
    bench: DataFrame,
    index_root: str,
    out_dir: str,
    source_cap: int = 20,
    sample_fractions: dict[str, float] | None = None,
    dsir_frac: float = 0.7,
    dsir_target_lang: str = "en",
    n_merges: int = 50,
    token_budget: int = 512,
    seed: int = 7,
) -> dict[str, int]:
    """Run all ten stages; return per-stage survivor counts."""
    from lambda_sample_spark.operators import incremental_dedup as inc
    from lambda_sample_spark.operators.curation import (
        cap_per_source,
        decontaminate,
        deterministic_shuffle,
    )
    from lambda_sample_spark.operators.dedup import dedup_exact_keep_first
    from lambda_sample_spark.operators.training import (
        pack_documents,
        quality_gate,
        stratified_sample,
    )

    counts: dict[str, int] = {"input": docs.count()}

    # 1. quality gate (filter + scan-time telemetry via observe();
    # the count() action below is what populates obs.get)
    gated, obs = quality_gate(docs)
    counts["quality_gate"] = gated.count()
    telemetry = obs.get

    # 2. exact dedup (persist: three later stages and their count()
    # telemetry would otherwise recompute the gate + dedup window —
    # per-stage counts are a funnel report, not free, and the cache
    # turns the funnel's quadratic re-scan into one pass per stage)
    exact = dedup_exact_keep_first(gated).persist()
    counts["exact_dedup"] = exact.count()

    # 2b. exact substring scrub (Lee et al. 2022; round 10): excise
    # every corpus passage of >= 20 chars occurring >= 2 times —
    # whole-doc dedup keeps one copy of a duplicated DOC, this removes
    # duplicated PASSAGES inside surviving docs (license headers,
    # boilerplate). Row count is unchanged (texts shrink), so the
    # funnel stays monotone; docs_touched is reported separately.
    from lambda_sample_spark.operators.substring import (
        duplicated_spans,
        remove_dup_spans,
    )

    spans = duplicated_spans(exact.select("doc_id", "text"), min_len=20)
    scrubbed = (
        remove_dup_spans(exact.select("doc_id", "text"), spans)
        # a doc that was ENTIRELY duplicated material scrubs to empty
        # — drop it (it has no training value and downstream stages
        # assume at least one token)
        .where(F.length(F.trim("text")) > 0)
        .join(exact.drop("text"), "doc_id")
        .persist()
    )
    counts["substring_scrub_docs_touched"] = (
        spans.select("doc_id").distinct().count()
    )
    counts["substring_scrub"] = scrubbed.count()
    exact.unpersist()
    exact = scrubbed

    # 3. near-dup dedup — day-one ingest against an empty index; the
    # committed index is tomorrow's broadcast-semi-join target.
    # ingest_batch materializes its flags to the ingest_log, so this
    # cuts lineage on its own.
    flags = inc.ingest_batch(spark, index_root, exact.select("doc_id", "text"))
    survivors = flags.where(~F.col("is_near_dup")).select("doc_id")
    near = exact.join(survivors, "doc_id")
    counts["near_dedup"] = near.count()

    # 4. decontamination against the benchmark set
    clean = decontaminate(near, bench)
    counts["decontaminate"] = clean.count()

    # 5. per-source frequency capping
    capped = cap_per_source(clean, cap=source_cap).drop("rk").persist()
    counts["source_cap"] = capped.count()

    # 6. stratified sampling by language
    fractions = sample_fractions or {
        r.lang: 1.0 for r in capped.select("lang").distinct().collect()
    }
    sampled = stratified_sample(capped, fractions).persist()
    counts["stratified_sample"] = sampled.count()

    # 6b. DSIR importance selection toward the target-language
    # distribution (threshold cut by gkey — no global sort)
    from lambda_sample_spark.operators.bpe import apply_bpe, learn_bpe
    from lambda_sample_spark.operators.dsir import dsir_select

    picked_ids = dsir_select(
        sampled, F.col("lang") == dsir_target_lang, frac=dsir_frac
    ).select("doc_id")
    selected = sampled.join(picked_ids, "doc_id").persist()
    counts["dsir_select"] = selected.count()

    # 7. sequence packing into token-budget bins (whitespace tokens —
    # the packer's budget unit; swap in n_subwords for BPE budgets)
    packed = pack_documents(selected, token_budget=token_budget)
    counts["packed_docs"] = packed.count()

    # 7b. tokenizer fit + tokenization on the FINAL corpus (a real
    # run fits BPE on the data it will train on, after all filtering);
    # per-doc subword counts written next to the packed assignment
    merges = learn_bpe(selected, n_merges=n_merges)
    tokens = apply_bpe(selected, merges)
    tokens.write.mode("overwrite").parquet(f"{out_dir}/tokens")
    counts["bpe_tokenized"] = spark.read.parquet(f"{out_dir}/tokens").count()

    # 7c. span-corruption pairs (T5 objective; round 10): the
    # masked-span (input, target) construction over the selected
    # corpus — deterministic hash-grid spans, so the pairs are a pure
    # function of the data (resumed shards and re-runs agree). Written
    # beside the packed assignment; an encoder-decoder run packs THESE
    # instead of the raw docs.
    from lambda_sample_spark.operators.corruption import span_corrupt

    pairs = span_corrupt(selected.select("doc_id", "text"))
    pairs.write.mode("overwrite").parquet(f"{out_dir}/span_pairs")
    counts["span_pairs"] = spark.read.parquet(
        f"{out_dir}/span_pairs"
    ).count()

    # 8. deterministic training order over the BINS (the unit a
    # loader reads): same bin -> same shard, shards contiguous,
    # reproducible per seed. Ordering docs before packing would be
    # discarded by the packer's own shard/bin assignment — order what
    # the consumer actually iterates.
    ordered = deterministic_shuffle(
        packed, seed=seed, key_col="bin_id", n_shards=8
    )
    ordered.write.mode("overwrite").parquet(f"{out_dir}/packed")
    for df in (exact, capped, sampled, selected):
        df.unpersist()
    counts.update({f"telemetry_{k}": int(v) for k, v in telemetry.items()})
    return counts


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="pipeline_out_"
    )
    from lambda_sample_spark.io import load_table
    from lambda_sample_spark.session import get_spark

    spark = get_spark(app_name="pretrain-pipeline-example")
    docs = load_table(spark, sf_dir, "documents")
    # benchmark set: a handful of corpus docs standing in for an eval
    # suite (so decontamination provably fires)
    bench = (
        docs.orderBy("doc_id")
        .limit(3)
        .select(F.concat(F.lit("b-"), F.col("doc_id")).alias("bench_id"), "text")
    )
    with tempfile.TemporaryDirectory(prefix="pipeline_idx_") as idx:
        counts = run_pipeline(spark, docs, bench, idx, out_dir)
    for stage, n in counts.items():
        print(f"{stage:20s} {n}")
    print(f"packed parquet at {out_dir}/packed")
    spark.stop()


if __name__ == "__main__":
    main()
