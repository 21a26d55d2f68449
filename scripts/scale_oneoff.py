"""One-off scale-ladder rung (docs/SCALE.md): inflate the sf0.1
documents table by $FACTOR (default 80x -> 400k docs), run the
selected operators once each, and print wall time + shuffle-write
bytes. NOT part of CI (keep the suite bounded) — run by hand, record
the numbers in docs/SCALE.md.

Usage: python scripts/scale_oneoff.py [factor] [ops]
  ops: comma list of ngram,winnow,winnowpairs,ingest,semdedup,cc
       (default ngram,winnow,ingest — the round-6/7 ladder);
       semdedup inflates the EMBEDDINGS table by the factor instead
       (sf0.1 has 2k vectors: factor 100 -> 200k, 400 -> 800k) and
       runs index-build + semantic_dedup_indexed over the persisted
       cells — the round-8 rung for the ops now dominating the bench;
       cc runs connected_components on a synthetic hash-random graph
       with 5000*factor nodes and 1.2x that in edges;
       pq inflates the embeddings like semdedup and measures
       persisted IVF-PQ index build + a 5-query pruned probe.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# reuse the deterministic inflater the stress suite pins against
sys.path.insert(0, REPO)
from tests.test_scale_stress import _inflate_docs  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402


def shuffle_written(spark) -> int:
    store = spark.sparkContext._jsc.sc().statusStore()
    execs = store.executorList(False)
    return sum(execs.apply(i).totalShuffleWrite() for i in range(execs.size()))


def measure(spark, label, fn):
    t0 = time.perf_counter()
    s0 = shuffle_written(spark)
    out = fn()
    wall = time.perf_counter() - t0
    time.sleep(1.0)
    print(
        f"{label}: {wall:.1f}s, "
        f"{(shuffle_written(spark) - s0) / 1e6:.0f} MB shuffle, out={out}"
    )


def _inflate_embeddings(spark, work: str, factor: int, name: str):
    """Inflate the sf0.1 embeddings (2k vectors) by ``factor`` with a
    deterministic per-copy perturbation; returns (frame, row count).
    Shared by the semdedup and pq rungs — one recipe, two consumers."""
    base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    copies = spark.range(factor).select(F.col("id").alias("copy"))
    emb_path = os.path.join(work, name)
    t0 = time.perf_counter()
    (
        base.select("vec_id", "embedding")
        .crossJoin(copies)
        .select(
            (F.col("vec_id") * factor + F.col("copy")).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: x.cast("double")
                + 0.01 * F.sin(F.col("copy") * 1.7 + i.cast("double")),
            ).alias("vec"),
        )
        .repartition(32)
        .write.parquet(emb_path)
    )
    emb = spark.read.parquet(emb_path)
    n = emb.count()
    print(
        f"inflated embeddings: {n} vectors ({factor}x sf0.1), "
        f"built in {time.perf_counter() - t0:.0f}s"
    )
    return emb, n


def run_semdedup_rung(spark, work: str, factor: int) -> None:
    """Inflate the sf0.1 embeddings (2k vectors) by ``factor`` with a
    deterministic per-copy perturbation, then measure the two halves
    of the round-8 contract shape separately: (1) quantizer fit +
    assignment write (the one full-data pass), (2) semantic dedup over
    the persisted cells (census/pairing/election re-reads)."""
    from lambda_sample_spark.operators.similarity import (
        ivf_index,
        semantic_dedup_indexed,
        semdedup_cells_for,
    )

    emb, n = _inflate_embeddings(spark, work, factor, "emb.parquet")
    k = semdedup_cells_for(n)
    idx = os.path.join(work, "semdedup_idx")
    parts = max(1, min(2048, (n + 99_999) // 100_000))

    def build():
        cents, assigned = ivf_index(emb, k)
        assigned.select("vec_id", "vec", "cluster").repartition(parts).write.mode(
            "overwrite"
        ).parquet(f"{idx}/cells")
        return k

    measure(spark, f"semdedup_index_build[k={k}]@{n}", build)

    def dedup_full():
        # noop-sink force, NOT count(): count over the final left join
        # lets Catalyst eliminate the join entirely (distinct right
        # side, no referenced columns) and the measurement collapses
        # to the cells scan
        df = semantic_dedup_indexed(spark, idx)
        df.write.format("noop").mode("overwrite").save()
        return "forced"

    measure(spark, f"semantic_dedup_indexed@{n}", dedup_full)


def run_pq_rung(spark, work: str, factor: int) -> None:
    """IVF-PQ at scale: inflate the sf0.1 embeddings (2k vectors) by
    ``factor`` with the semdedup rung's deterministic perturbation,
    build + persist the residual-PQ index (the one full-data pass:
    assignment + encode + partitioned write), then probe 5 queries
    (partition-pruned scan + ADC + exact refine)."""
    from lambda_sample_spark.operators.pq import (
        ivfpq_probe_index,
        ivfpq_write_index,
    )

    emb, n = _inflate_embeddings(spark, work, factor, "pq_emb.parquet")
    idx = os.path.join(work, "pq_idx")
    measure(
        spark,
        f"ivfpq_write_index@{n}",
        lambda: ivfpq_write_index(emb, idx, n=n),
    )
    queries = [
        (int(r["vec_id"]), list(r["vec"]))
        for r in emb.where(F.col("vec_id") < 5).collect()
    ]
    measure(
        spark,
        f"ivfpq_probe_index@{n}",
        lambda: ivfpq_probe_index(spark, idx, queries).count(),
    )


def run_cc_rung(spark, work: str, factor: int) -> None:
    """Connected components at scale, isolated from pair generation:
    a deterministic hash-random graph with n = 5000 * factor nodes and
    ~1.2n edges (supercritical — one giant component plus fringe), CC
    run with scratch-parquet materialization (the cluster-faithful
    mode). Wall + shuffle recorded; the O(log n) round count shows up
    as the job count, not the wall."""
    from lambda_sample_spark.operators.graph import connected_components

    n = 5000 * factor
    m = int(1.2 * n)
    edges = (
        spark.range(m)
        .select(
            (F.abs(F.xxhash64(F.col("id"), F.lit("s"))) % n).alias("src"),
            (F.abs(F.xxhash64(F.col("id"), F.lit("d"))) % n).alias("dst"),
        )
        .repartition(32)
    )
    nodes = spark.range(n).select(F.col("id").alias("node"))

    def run():
        lab = connected_components(
            edges, nodes=nodes, scratch_dir=os.path.join(work, "cc")
        )
        n_comp = lab.select("comp").distinct().count()
        return f"{n_comp} components"

    measure(spark, f"connected_components@{n}n/{m}e", run)


def run_pagerank_rung(spark, work: str, factor: int) -> None:
    """PageRank at scale, isolated from edge derivation: the CC rung's
    deterministic hash-random graph recipe (n = 5000 * factor nodes,
    3n weighted directed edges) through 3 fixed power-iteration
    rounds. Linear-in-|E| per-round shuffle is the claim to check."""
    from lambda_sample_spark.operators.rank import pagerank

    n = 5000 * factor
    m = 3 * n
    edges = (
        spark.range(m)
        .select(
            (F.abs(F.xxhash64(F.col("id"), F.lit("ps"))) % n).alias("src"),
            (F.abs(F.xxhash64(F.col("id"), F.lit("pd"))) % n).alias("dst"),
            (1 + F.abs(F.xxhash64(F.col("id"), F.lit("pw"))) % 10)
            .cast("double")
            .alias("w"),
        )
        .repartition(32)
    )

    def run():
        ranks = pagerank(edges, iters=3)
        row = ranks.agg(
            F.count("*").alias("n"), F.sum("r").alias("mass")
        ).collect()[0]
        return f"{row['n']} nodes, mass={row['mass']:.4f}"

    measure(spark, f"pagerank@{n}n/{m}e", run)


def run_interval_rung(spark, work: str, factor: int) -> None:
    """Bin-bucketed interval join at scale: probe = 100k * factor
    point events over a ~factor-week span, intervals = probe/50
    5-minute windows — both sides too big to broadcast at high
    factors, so this exercises the genuine large×large bin-join path
    (probe-side rows dominate; expansion bounded at 2 bins/interval)."""
    from lambda_sample_spark.operators.rangejoin import interval_semi_join

    n = 100_000 * factor
    m = n // 50
    span_ms = 14 * 86_400_000 * max(1, factor // 10)
    probe = (
        spark.range(n)
        .select(
            F.col("id"),
            (F.abs(F.xxhash64(F.col("id"), F.lit("t"))) % span_ms).alias("t"),
        )
        .repartition(32)
    )
    iv = spark.range(m).select(
        (F.abs(F.xxhash64(F.col("id"), F.lit("s"))) % span_ms).alias("s")
    ).withColumn("e", F.col("s") + 300_000)

    def run():
        return f"{interval_semi_join(probe, iv, 't', 's', 'e').count()} flagged"

    measure(spark, f"interval_join@{n}p/{m}iv", run)


def run_sf1_rung(
    spark, work: str, factor: int = 10, names: tuple = None
) -> None:
    """The sf1 rung (round-8 verdict task 6): inflate sf0.1 to
    sf1-equivalent row counts (~6M lineitem at factor 10) with
    JOIN-CONSISTENT key remapping — every copy c rewrites the fact AND
    dim keys as key*factor + c, so referential integrity and join
    fan-outs match a real larger scale factor — then run the headline
    contract queries against the inflated directory unchanged (it
    mimics an sf dir: <table>.parquet files) and record wall + shuffle
    bytes for docs/SCALE.md's 10x-rung check of the 100x claims."""
    import __spark_entry__ as entrymod

    if names is None:
        names = SF1_NAMES
    F_ = factor
    copies = spark.range(F_).select(F.col("id").alias("copy"))
    src = "/root/testdata/sf0.1"

    def inflate(name: str, keyed: dict[str, bool]):
        """keyed: column -> remap? (key*F + copy for join keys and ids)"""
        base = spark.read.parquet(f"{src}/{name}.parquet")
        cols = [
            (F.col(c) * F_ + F.col("copy")).alias(c) if keyed.get(c) else F.col(c)
            for c in base.columns
        ]
        t0 = time.perf_counter()
        base.crossJoin(copies).select(cols).repartition(32).write.parquet(
            os.path.join(work, f"{name}.parquet")
        )
        n = spark.read.parquet(os.path.join(work, f"{name}.parquet")).count()
        print(f"inflated {name}: {n} rows in {time.perf_counter() - t0:.0f}s")

    def copy_dim(name: str):
        spark.read.parquet(f"{src}/{name}.parquet").write.parquet(
            os.path.join(work, f"{name}.parquet")
        )

    inflate("orders", {"o_orderkey": True, "o_custkey": True})
    inflate(
        "lineitem",
        {"l_orderkey": True, "l_suppkey": True},  # l_partkey stays (part is 1x)
    )
    inflate("customer", {"c_custkey": True})
    inflate("supplier", {"s_suppkey": True})
    inflate("events", {"event_id": True, "user_id": True})
    for d in ("region", "nation", "part"):
        copy_dim(d)
    base_docs = spark.read.parquet(f"{src}/documents.parquet")
    t0 = time.perf_counter()
    _inflate_docs(spark, base_docs, F_).coalesce(16).write.parquet(
        os.path.join(work, "documents.parquet")
    )
    n_docs = spark.read.parquet(os.path.join(work, "documents.parquet")).count()
    print(f"inflated documents: {n_docs} rows in {time.perf_counter() - t0:.0f}s")

    queries = entrymod.queries()
    for name in names:
        def force(_name=name):
            queries[_name](spark, work).write.format("noop").mode(
                "overwrite"
            ).save()
            return "forced"

        measure(spark, f"{name}@sf{factor / 10:g}", force)
        measure(spark, f"{name}@sf{factor / 10:g}#2", force)  # warm repeat


# the round-8 headline set
SF1_NAMES = (
    "q_fast_anomaly",
    "q_tpch_q18",
    "q_tpch_q21",
    "q_dedup_near",
    "q_contamination",
)

# round-10 task: the round-9 operator families added AFTER the sf1
# addendum (behavior/timeseries/stats/profiling/market/fuzzy/
# retrieval/skyline) had no >=10x measurement — run their most
# expensive contract rows, plus the new round-10 substring-dedup op
SF1_R9_NAMES = (
    "q_data_profile",
    "q_ewma_smooth",
    "q_seasonal_baseline",
    "q_funnel",
    "q_sensor_corr",
    "q_entity_match",
    "q_pareto_front",
    "q_substring_dedup",
)


def run_partops_rung(spark, work: str, factor: int) -> None:
    """Round-10 rung for the two part-catalog operators the sf1 rung
    can't exercise (it copies `part` 1x as a fixed dim): inflate part
    ``factor``x with remapped keys and per-copy name perturbation
    (` v<copy>` suffix — distinct catalog entries, realistic near-miss
    spellings for the Levenshtein band), then run the fuzzy
    entity-match and Pareto-frontier contract rows against it."""
    import __spark_entry__ as entrymod

    base = spark.read.parquet("/root/testdata/sf0.1/part.parquet")
    copies = spark.range(factor).select(F.col("id").alias("copy"))
    cols = []
    for c in base.columns:
        if c == "p_partkey":
            cols.append((F.col(c) * factor + F.col("copy")).alias(c))
        elif c == "p_name":
            cols.append(
                F.concat(F.col(c), F.lit(" v"), F.col("copy")).alias(c)
            )
        else:
            cols.append(F.col(c))
    base.crossJoin(copies).select(cols).repartition(16).write.parquet(
        os.path.join(work, "part.parquet")
    )
    n = spark.read.parquet(os.path.join(work, "part.parquet")).count()
    print(f"inflated part: {n} rows")
    queries = entrymod.queries()
    for name in ("q_entity_match", "q_pareto_front"):
        def force(_name=name):
            queries[_name](spark, work).write.format("noop").mode(
                "overwrite"
            ).save()
            return "forced"

        measure(spark, f"{name}@part x{factor}", force)
        measure(spark, f"{name}@part x{factor}#2", force)


def run_cooccur_rung(spark, factor: int) -> None:
    """Round-9 market-basket rung: inflate the sf0.1 (order, brand)
    membership by ``factor`` (copy c shifts orderkey, so baskets —
    and therefore the per-basket pair fanout — keep their original
    size while basket COUNT scales), then run cooccurrence_lift."""
    from lambda_sample_spark.operators.market import cooccurrence_lift

    li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    part = spark.read.parquet("/root/testdata/sf0.1/part.parquet")
    base = li.join(part, li.l_partkey == part.p_partkey).select(
        "l_orderkey", "p_brand"
    )
    copies = spark.range(factor).select(F.col("id").alias("c"))
    items = base.crossJoin(copies).select(
        (F.col("l_orderkey") * factor + F.col("c")).alias("bk"),
        F.col("p_brand").alias("item"),
    )
    n = items.count()
    measure(
        spark,
        f"cooccur_lift@{n}rows(x{factor})",
        lambda: cooccurrence_lift(items, "bk", "item").count(),
    )


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 80
    ops = set(
        (sys.argv[2] if len(sys.argv) > 2 else "ngram,winnow,ingest").split(",")
    )
    from lambda_sample_spark.session import get_spark
    from lambda_sample_spark.operators import dedup, incremental_dedup as inc

    spark = get_spark(app_name="scale-oneoff")
    work = tempfile.mkdtemp(prefix="scale_oneoff_")

    if ops & {"ngram", "winnow", "winnowpairs", "ingest", "dsir", "bpe", "bm25", "substr", "substrskew", "video", "ccnet", "nbq", "bloom", "chunk", "corrupt", "blocklist", "html"}:
        base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        docs_path = os.path.join(work, "documents.parquet")
        t0 = time.perf_counter()
        _inflate_docs(spark, base, factor).coalesce(16).write.parquet(docs_path)
        docs = spark.read.parquet(docs_path)
        n = docs.count()
        print(f"inflated corpus: {n} docs ({factor}x sf0.1), "
              f"built in {time.perf_counter() - t0:.0f}s at {docs_path}")

        # the inflated workdir mimics an sf dir (documents.parquet
        # inside), so the contract operator runs against it unchanged
        if "ngram" in ops:
            measure(
                spark,
                f"ngram_jaccard@{n}",
                lambda: dedup.ngram_jaccard(spark, work).count(),
            )

        if "winnow" in ops:
            from lambda_sample_spark.operators.text import (
                winnow_fingerprints,
                winnow_fingerprints_fast,
            )

            measure(
                spark,
                f"winnow_fast@{n}",
                lambda: winnow_fingerprints_fast(
                    docs.select("doc_id", "text")
                ).count(),
            )
            for gh in ("xxhash64", "md5"):
                measure(
                    spark,
                    f"winnow_fingerprints[{gh}]@{n}",
                    lambda gh=gh: winnow_fingerprints(
                        docs.select("doc_id", "text"), gram_hash=gh
                    ).count(),
                )

        if "video" in ops:
            # full contract pipeline against the inflated workdir:
            # synthesize + container parse + per-frame decode/dHash
            # (the CPU-bound mapInPandas pass), then the pair join
            # over the scratch-materialized distinct hash table
            from lambda_sample_spark.operators import video as vd

            measure(
                spark,
                f"video_frame_hashes@{n}",
                lambda: vd.q_video_frame_hashes(spark, work).count(),
            )
            measure(
                spark,
                f"video_near_dup@{n}",
                lambda: vd.q_video_near_dup(spark, work).count(),
            )

        if "ccnet" in ops:
            # train (2 corpus passes) + persist LM + score (1 pass) +
            # bucket; staging writes included in the wall
            from lambda_sample_spark.operators import ccnet as cn

            measure(
                spark,
                f"ccnet_buckets@{n}",
                lambda: cn.q_ccnet_buckets(spark, work).count(),
            )

        if "winnowpairs" in ops:
            # the round-9 capped containment operator at scale. The
            # stop cap is configured per its own scale guidance: a
            # FRACTIONAL cap lets per-fingerprint work grow
            # quadratically with the corpus, so larger corpora pass a
            # smaller frac holding the ABSOLUTE df bound (~500 docs,
            # matching the sf0.1 contract row's trunc(0.1*5000)) —
            # per-fp join work then stays constant and total work
            # scales with corpus size x output density.
            from lambda_sample_spark.operators.text import winnow_near_dup

            frac_for_500 = 500.0 / n
            measure(
                spark,
                f"winnow_near_dup[fast,max_df~500]@{n}",
                lambda: winnow_near_dup(
                    docs.select("doc_id", "text"),
                    gram_hash="fast",
                    max_df_frac=frac_for_500,
                ).count(),
            )

        if "dsir" in ops:
            # round-9 importance-resampling rung: two corpus passes
            # (fit census + score), production xxhash64 gram hashing
            from lambda_sample_spark.operators.dsir import dsir_scores

            measure(
                spark,
                f"dsir_scores[xxhash64]@{n}",
                lambda: dsir_scores(
                    docs.select("doc_id", "lang", "text"),
                    F.col("lang") == "en",
                ).count(),
            )

        if "bpe" in ops:
            # round-9 tokenizer rung: word census + driver merge loop
            # + distinct-word segmentation joined back per doc
            from lambda_sample_spark.operators.bpe import (
                apply_bpe,
                learn_bpe,
            )

            def _bpe():
                merges = learn_bpe(docs.select("text"), n_merges=50)
                return apply_bpe(
                    docs.select("doc_id", "text"), merges
                ).count()

            measure(spark, f"bpe_learn50_apply@{n}", _bpe)

        if "bm25" in ops:
            # round-9 retrieval rung: census pass + shuffle-free
            # scoring scan — wall should track the scan linearly and
            # shuffle bytes stay ~0
            from lambda_sample_spark.operators.retrieval import bm25_topk

            measure(
                spark,
                f"bm25_topk@{n}",
                lambda: bm25_topk(docs.select("doc_id", "text")).count(),
            )

        if "nbq" in ops:
            # round-10 classifier rung: NB train (gram census + prior
            # scan) + broadcast-model scoring, production xxhash64
            from lambda_sample_spark.operators.classifier import (
                score_nb,
                train_nb,
            )

            def _nbq():
                wp = os.path.join(work, "nbq_model")

                def mat(df, name):
                    p = os.path.join(wp, name)
                    df.write.mode("overwrite").parquet(p)
                    return spark.read.parquet(p)

                w, c = train_nb(
                    docs.where(F.col("doc_id") % 10 < 8).select(
                        "doc_id", "lang", "text"
                    ),
                    F.col("lang") == "en",
                    materialize=mat,
                )
                w.write.mode("overwrite").parquet(wp + "/w")
                c.write.mode("overwrite").parquet(wp + "/c")
                scored = score_nb(
                    docs.select("doc_id", "text"),
                    spark.read.parquet(wp + "/w"),
                    spark.read.parquet(wp + "/c"),
                )
                # noop-force: count() would prune the decimal score sum
                scored.write.format("noop").mode("overwrite").save()
                return "forced"

            measure(spark, f"nb_train_score@{n}", _nbq)

        if "bloom" in ops:
            # round-10 Bloom decontamination rung: benchmark build +
            # inline collect + zero-join corpus probe (the wall is
            # probe-dominated; shuffle is the per-doc aggregate only)
            from lambda_sample_spark.operators.bloom import (
                bloom_build,
                bloom_probe,
            )

            def _bloom():
                bench = docs.where(F.col("doc_id") < 20).select(
                    F.col("doc_id").alias("bench_id"), "text"
                )
                bloom_probe(
                    docs.select("doc_id", "text"), bloom_build(bench)
                ).write.format("noop").mode("overwrite").save()
                return "forced"

            measure(spark, f"bloom_probe@{n}", _bloom)

        if "html" in ops:
            # round-11 extraction rung: synthesis + block scoring are
            # projections, reassembly is the one doc-keyed exchange —
            # wall should be scan-linear, shuffle ~ kept-text bytes
            from lambda_sample_spark.operators.html_extract import (
                q_html_extract,
            )

            measure(
                spark,
                f"html_extract@{n}",
                lambda: q_html_extract(spark, work)
                .write.format("noop")
                .mode("overwrite")
                .save(),
            )

        if "chunk" in ops:
            # round-10 chunking rung: pure projection — wall should be
            # scan-linear and shuffle bytes exactly 0
            from lambda_sample_spark.operators.chunking import (
                chunk_documents,
            )

            # noop-force: count() over a projection prunes the window
            # text assembly entirely (the playbook count() hazard)
            measure(
                spark,
                f"chunk_windows@{n}",
                lambda: chunk_documents(docs.select("doc_id", "text"))
                .write.format("noop")
                .mode("overwrite")
                .save(),
            )

        if "blocklist" in ops:
            # round-10 phrase-scrub rung: per-length gram probes
            # against the broadcast phrase set; only matching grams
            # shuffle
            from lambda_sample_spark.operators.blocklist import (
                BLOCKLIST,
                blocklist_hits,
            )

            measure(
                spark,
                f"blocklist_hits@{n}",
                lambda: blocklist_hits(
                    docs.select("doc_id", "text"), BLOCKLIST
                )
                .write.format("noop")
                .mode("overwrite")
                .save(),
            )

        if "corrupt" in ops:
            # round-10 span-corruption rung: per-row array algebra —
            # wall scan-linear, shuffle exactly 0
            from lambda_sample_spark.operators.corruption import (
                span_corrupt,
            )

            # noop-force (same count()-pruning hazard as chunk)
            measure(
                spark,
                f"span_corrupt@{n}",
                lambda: span_corrupt(docs.select("doc_id", "text"))
                .write.format("noop")
                .mode("overwrite")
                .save(),
            )

        if "substr" in ops:
            # round-10 exact-substring-dedup rung: production hash
            # path (8 B/position shuffle) — the contract row's
            # gram-STRING seam pays ~L bytes/position instead
            from lambda_sample_spark.operators.substring import (
                substring_dedup_census,
            )

            for rep in ("", "#2"):
                measure(
                    spark,
                    f"substring_census[hash]@{n}{rep}",
                    lambda: substring_dedup_census(
                        docs.select("doc_id", "text"), gram_col="hash"
                    ).count(),
                )

        if "substrskew" in ops:
            # round-10 skew A/B: plant ONE hot passage in 30% of the
            # inflated docs, then run the census in both count modes —
            # the window funnels every hot-gram position into one
            # sorting reducer; the join partial-aggregates it away
            from lambda_sample_spark.operators.substring import (
                substring_dedup_census,
            )

            hot = docs.select(
                "doc_id",
                F.when(
                    F.col("doc_id") % 10 < 3,
                    F.concat(
                        F.col("text"),
                        F.lit(" the quick brown fox jumps over the lazy dog"),
                    ),
                ).otherwise(F.col("text")).alias("text"),
            )
            hot.write.parquet(os.path.join(work, "hotdocs.parquet"))
            hotr = spark.read.parquet(os.path.join(work, "hotdocs.parquet"))
            for mode in ("window", "join"):
                measure(
                    spark,
                    f"substring_census[{mode},hot30%]@{n}",
                    lambda mode=mode: substring_dedup_census(
                        hotr.select("doc_id", "text"),
                        gram_col="hash",
                        count_mode=mode,
                    ).count(),
                )

        if "ingest" in ops:
            idx = os.path.join(work, "mhidx")
            half1 = docs.select("doc_id", "text").where(F.col("doc_id") % 2 == 0)
            half2 = docs.select("doc_id", "text").where(F.col("doc_id") % 2 == 1)
            measure(
                spark,
                f"ingest_batch(first half)@{n}",
                lambda: inc.ingest_batch(spark, idx, half1).count(),
            )
            measure(
                spark,
                f"ingest_batch(second half)@{n}",
                lambda: inc.ingest_batch(spark, idx, half2).count(),
            )

    if "semdedup" in ops:
        run_semdedup_rung(spark, work, factor)

    if "cc" in ops:
        run_cc_rung(spark, work, factor)

    if "pq" in ops:
        run_pq_rung(spark, work, factor)

    if "pagerank" in ops:
        run_pagerank_rung(spark, work, factor)

    if "interval" in ops:
        run_interval_rung(spark, work, factor)

    if "cooccur" in ops:
        run_cooccur_rung(spark, factor)

    if "sf1" in ops:
        run_sf1_rung(spark, work, factor, SF1_NAMES)

    if "sf1r9" in ops:
        run_sf1_rung(spark, work, factor, SF1_R9_NAMES)

    if "partops" in ops:
        run_partops_rung(spark, work, factor)

    print(f"workdir (delete when done): {work}")
    spark.stop()


if __name__ == "__main__":
    main()
