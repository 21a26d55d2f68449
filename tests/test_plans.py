"""Physical-plan audits (SURVEY.md §4): pushdown, pruning, broadcast,
partial aggregation, codegen — the scale-readiness checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from lambda_sample_spark.io import load_table
from lambda_sample_spark.operators.aggregates import group_stats, share_of_total
from lambda_sample_spark.operators.joins import lookup_join_left
from lambda_sample_spark.operators.tpch import tpch_join_agg, tpch_q6
from lambda_sample_spark.operators.windows import scan_filter_limit
from lambda_sample_spark.plans import audit
from lambda_sample_spark.plans.audit import optimized_plan


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = scan_filter_limit(spark, sf_dir)
    pushed = audit.pushed_filters(df)
    assert any("event_type" in p for p in pushed), pushed


def test_column_pruning(spark, sf_dir):
    df = load_table(spark, sf_dir, "lineitem").select("l_orderkey").limit(5)
    schemas = audit.read_schemas(df)
    assert schemas and all("l_extendedprice" not in s for s in schemas), schemas


def test_q6_pushes_all_predicates(spark, sf_dir):
    df = tpch_q6(spark, sf_dir)
    pushed = " ".join(audit.pushed_filters(df))
    assert "l_discount" in pushed and "l_quantity" in pushed, pushed


def test_dimension_joins_broadcast(spark, sf_dir):
    assert audit.has_broadcast_join(tpch_join_agg(spark, sf_dir))
    assert audit.has_broadcast_join(lookup_join_left(spark, sf_dir))


def test_aggregates_partial(spark, sf_dir):
    assert audit.has_partial_agg(group_stats(spark, sf_dir))


def test_share_of_total_scans_events_once(spark, sf_dir):
    """Round-15 invariant: the grand total is a window sum over the
    ALREADY-AGGREGATED |event_types|-row count frame, so the raw
    events are scanned exactly once (the old crossJoin-of-a-scalar
    shape re-derived the aggregate from a second events scan — its
    "no Window" pin protected a shape that was itself 2x the I/O).
    A Window is allowed, but only ABOVE the aggregate: it must never
    consume raw events."""
    import re

    plan = audit.simple_plan(share_of_total(spark, sf_dir))
    assert audit.scan_count(plan) == 1, plan
    assert "HashAggregate" in plan
    # whole-node match: a bare "Window" substring would also match
    # WindowGroupLimit (round-16 advice item 3)
    w = re.search(r"\bWindow\b(?!GroupLimit)", plan)
    if w:
        # plan prints top-down: the window must sit above (before)
        # the aggregate, i.e. it windows the grouped frame, not events
        assert w.start() < plan.index("HashAggregate"), plan


def test_big_table_scans_are_column_pruned(spark, sf_dir):
    """Round-16 (guide §6.2, verdict task 6): the hot contract paths'
    scans of the big tables must read ONLY the columns they use — the
    wide payload columns (events.props, documents.text where unused,
    embeddings.label) are the cheapest remaining scan savings at
    100 TB. Asserted per (query, table): every scan of that table in
    the plan excludes the banned columns."""
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    cases = [
        # flagship: events scan needs (event_type, ts, value) only
        ("q_fast_anomaly", "events.parquet", {"props", "user_id"}),
        # text kernel rows: documents metadata stays unread
        ("q_simhash", "documents.parquet", {"lang", "source", "n_chars"}),
        ("q_contamination", "documents.parquet", {"lang", "source", "n_chars"}),
        # ANN rows: the label column must not ride the vector scan
        ("q_ann_lsh_topk", "embeddings.parquet", {"label"}),
        ("q_similarity_topk", "embeddings.parquet", {"label"}),
        # tpch q6: only the four predicate/aggregate columns
        (
            "q_tpch_q6",
            "lineitem.parquet",
            {"l_orderkey", "l_returnflag", "l_linestatus", "l_tax"},
        ),
    ]
    for name, table, banned in cases:
        df = q[name](spark, sf_dir)
        pairs = [
            (loc, schema)
            for loc, schema in audit.scan_read_schemas(df)
            if table in loc
        ]
        assert pairs, f"{name}: no scan of {table} found"
        for loc, schema in pairs:
            hit = {c for c in banned if c in schema}
            assert not hit, f"{name} reads unused {hit} from {table}: {schema}"


def test_codegen_covers_hot_path(spark, sf_dir):
    df = group_stats(spark, sf_dir)
    assert audit.codegen_span_count(df) >= 1


def test_scan_limit_is_take_ordered(spark, sf_dir):
    plan = audit.simple_plan(scan_filter_limit(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan


def test_asof_join_has_no_join_node(spark, sf_dir):
    """The union+window as-of formulation must plan ZERO join operators
    (no BroadcastNestedLoopJoin range explosion) and exactly one
    ordered window pass."""
    from lambda_sample_spark.operators.joins_ext import asof_join

    plan = audit.simple_plan(asof_join(spark, sf_dir))
    assert "Join" not in plan, plan
    assert plan.count("Window") == 1, plan


def test_semi_anti_plan_as_such(spark, sf_dir):
    from lambda_sample_spark.operators.joins_ext import anti_join, semi_join

    assert "LeftSemi" in audit.simple_plan(semi_join(spark, sf_dir))
    assert "LeftAnti" in audit.simple_plan(anti_join(spark, sf_dir))


def test_sessionize_single_shuffle(spark, sf_dir):
    """lag + running-sum share one hash partitioning and one sort; the
    follow-up groupBy on (user_id, session_id) must not reshuffle
    (partitioning on user_id already satisfies it)."""
    from lambda_sample_spark.operators.sessions import sessionize

    plan = audit.simple_plan(sessionize(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("Sort ") <= 1 or plan.count("Sort [") <= 1


def test_rollup_is_single_shuffle_partial_agg(spark, sf_dir):
    """ROLLUP expands grouping sets BEFORE the exchange so map-side
    combine still applies: Expand node + 2 HashAggregates + 1 shuffle."""
    from lambda_sample_spark.operators.multidim import rollup_day

    plan = audit.simple_plan(rollup_day(spark, sf_dir))
    assert "Expand" in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_ngram_prefix_filter_prunes_candidate_join(spark, sf_dir):
    """PPJoin: the candidate join must consume the prefix-filtered
    frames (rnk <= ...), never an unfiltered token x token join."""
    from lambda_sample_spark.operators.dedup import ngram_jaccard

    plan = audit.formatted_plan(ngram_jaccard(spark, sf_dir))
    assert "row_number" in plan


def test_ngram_no_cartesian_or_nested_loop(spark, sf_dir):
    """The adaptive exact-Jaccard plan must stay all-equi-join: no
    CartesianProduct, no BroadcastNestedLoopJoin anywhere."""
    from lambda_sample_spark.operators.dedup import ngram_jaccard

    plan = audit.simple_plan(ngram_jaccard(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_simhash_one_explode_one_shuffle(spark, sf_dir):
    """SimHash must shuffle one row per (doc, token) exactly once, with
    the 64 vote sums computed map-side (partial agg) — and never expand
    bit positions into rows (one Generate = the token explode only)."""
    from lambda_sample_spark.operators.dedup import simhash

    df = simhash(spark, sf_dir)
    plan = audit.simple_plan(df)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("Generate") == 1, plan
    assert audit.has_partial_agg(df)


def test_runtime_bloom_filter_prunes_fact_side(spark, sf_dir):
    """Catalyst's runtime filter: a selective filter on one join side
    injects a bloom-filter predicate into the other side's scan, so
    fact rows that cannot match die before the shuffle. Thresholds
    tuned down to fire on test-sized data; assertion on the optimized
    plan (BloomFilterMightContain / bloom_filter)."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        o = load_table(spark, sf_dir, "orders").where(
            F.col("o_totalprice") > 450000  # highly selective build side
        )
        li = load_table(spark, sf_dir, "lineitem")
        joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderpriority"
        ).count()
        plan = optimized_plan(joined)
        assert "bloom_filter" in plan or "BloomFilter" in plan, plan[:1500]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_vocab_window_input_is_post_limit(spark, sf_dir):
    """build_vocab's dense-id window is unpartitioned — Spark warns
    'WindowExec: No Partition Defined' — but it is provably bounded:
    in the optimized plan the Window sits ABOVE GlobalLimit(top_n), so
    its single partition holds <= top_n rows at any corpus size (the
    corpus-sized work is all in the aggregate + TakeOrdered below the
    limit). Guards against a refactor sliding the window below the
    limit, where it would become a real single-partition sort of the
    whole vocabulary."""
    from lambda_sample_spark.operators.common import documents
    from lambda_sample_spark.operators.training import build_vocab

    top_n = 1000
    df = build_vocab(documents(spark, sf_dir), top_n=top_n)
    plan = optimized_plan(df)
    w = plan.index("Window ")
    lim = plan.index(f"GlobalLimit {top_n}")
    assert w < lim, plan[:1500]  # window consumes the post-limit frame
    # and the frame really is <= top_n rows
    assert df.count() <= top_n
