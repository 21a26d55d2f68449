"""Connected components over an edge list (SURVEY.md §2.8 adjunct):
the clustering backbone every near-duplicate family ends with —
minhash buckets, winnow fingerprint matches, embedding neighbors, and
Jaccard pairs all reduce to "label each node with its component
minimum". dedup.py inlines a bounded 2-round variant for its banded
buckets; this module is the GENERAL operator: arbitrary edge lists,
iterated to convergence, usable on any pair output.

Algorithm: min-label propagation with pointer jumping (the
alternating min-label family — cf. Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC 2014; Rastogi et al.,
"Finding Connected Components in Map-Reduce in Logarithmic Rounds",
ICDE 2013 hash-to-min). Each round is (a) one neighbor-min hash
aggregate and (b) one label-table self-join (the jump), so labels
reach the component minimum in O(log n) rounds — a 200-node chain
converges in ~7, not 200. Convergence is driver-checked per round
(one bounded count() job); no pairwise expansion, no pair output,
ever — state is exactly one (node, comp) row per node.

Iterative lineage is CUT every round — re-planning round k's labels
from the raw edges is O(k) deep and sends Catalyst optimization time
superlinear (measured: a 10-round run over an unmaterialized
23-exchange edge subtree never finished planning). The edge list is
materialized once up front and each round's labels after the jump:
``localCheckpoint`` by default (executor storage, reclaimed by the
ContextCleaner once the round frame is dereferenced — nothing stays
pinned in a long-lived session), or alternating parquet paths under
``scratch_dir`` (the semantic-dedup contract pattern; also the
fault-tolerant choice on a real cluster, where localCheckpoint dies
with an executor).

100 TB notes: both per-round shuffles hash on node id, so successive
rounds reuse the same partitioning profile; state is one (node, comp)
row per node, independent of edge count or round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    max_rounds: int = 20,
    scratch_dir: str | None = None,
) -> DataFrame:
    """Label every node with the MINIMUM node id of its connected
    component. ``edges`` is an undirected edge list (each pair listed
    once, either orientation); NULL endpoints are dropped. ``nodes``
    optionally adds to the node universe (first column) so isolated
    nodes appear with their own id as the component; edge endpoints
    are ALWAYS included — an explicit ``nodes`` frame that omits an
    endpoint must not silently sever the paths running through it.
    Returns (node, comp).

    Raises after ``max_rounds`` without convergence — on a connected
    diameter-d graph the bound needs only O(log d) rounds, so hitting
    it means the input is pathological, not that more rounds would be
    fine to skip.
    """
    spark = edges.sparkSession
    # checkpointed frames superseded during the loop — unpersisted
    # eagerly so a long-lived session (the driver's contract sweep)
    # never accumulates dead round blocks; only the RETURNED frame's
    # blocks stay (the ContextCleaner reclaims them on dereference)
    retired: list[DataFrame] = []

    def _materialize(df: DataFrame, slot: str) -> DataFrame:
        if scratch_dir is None:
            return df.localCheckpoint(eager=True)
        path = f"{scratch_dir}/{slot}"
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    def _retire(df: DataFrame) -> None:
        if scratch_dir is None:
            retired.append(df)

    def _sweep(keep: DataFrame) -> None:
        for df in retired:
            if df is not keep:
                try:
                    df.unpersist(blocking=False)
                except Exception:
                    pass

    e = edges.select(
        F.col(src).cast("bigint").alias("a"), F.col(dst).cast("bigint").alias("b")
    ).where(F.col("a").isNotNull() & F.col("b").isNotNull())
    und = _materialize(
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b"))),
        "cc_edges",
    )
    endpoints = und.select(F.col("a").alias("node"))
    if nodes is None:
        universe = endpoints.distinct()
    else:
        first = nodes.columns[0]
        universe = (
            nodes.select(F.col(first).cast("bigint").alias("node"))
            .where(F.col(first).isNotNull())
            .unionByName(endpoints)
            .distinct()
        )
    lab = universe.withColumn("comp", F.col("node"))

    for rnd in range(max_rounds):
        # (a) neighbor min: the best label visible across one hop
        nbr = (
            und.join(lab, und.b == lab.node)
            .groupBy(F.col("a").alias("nb_node"))
            .agg(F.min("comp").alias("nmin"))
        )
        stepped = lab.join(nbr, lab.node == F.col("nb_node"), "left").select(
            "node",
            F.col("comp").alias("old_comp"),
            F.least(F.col("comp"), F.coalesce("nmin", F.col("comp"))).alias("comp"),
        )
        # (b) pointer jump: comp := comp(comp) — doubles the effective
        # propagation distance per round (log-round convergence)
        parent = stepped.select(
            F.col("node").alias("p_node"), F.col("comp").alias("p_comp")
        )
        new = stepped.join(parent, stepped.comp == parent.p_node, "left").select(
            "node", "old_comp", F.coalesce("p_comp", "comp").alias("comp")
        )
        # alternating slots: round r reads r-1's files while writing
        # its own — never overwrite a path still feeding the lineage.
        # The previous label rides along as old_comp, so the
        # convergence check is a filter-count over the materialized
        # frame — no new-vs-old join, no extra shuffle per round.
        new = _materialize(new, f"cc_round_{rnd % 2}")
        _retire(new)
        changed = new.where(F.col("comp") != F.col("old_comp")).count()
        lab = new.select("node", "comp")
        if changed == 0:
            _retire(und)
            _sweep(keep=new)
            return lab
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds"
    )


def cc_ingest(
    labels: DataFrame,
    new_edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    **kwargs,
) -> DataFrame:
    """Incremental connected components: fold a NEW edge batch into an
    existing (node, comp) labeling without rescanning the original
    edge set — the steady-state companion to the minhash ingest path
    (incremental_dedup), where tonight's near-dup pairs must update
    yesterday's cluster assignments.

    The existing labeling IS a spanning structure of its components
    (each a star: node -> comp), so CC over (star edges ∪ new batch)
    yields exactly CC over (all original edges ∪ new batch) — star
    edges preserve connectivity and add none. Work is bounded by
    |nodes| + |new batch|, independent of historical edge volume, and
    stars have diameter 2, so convergence stays in the low-round
    regime regardless of how the original graph looked. New nodes
    appearing only in the batch join the universe automatically.

    Returns the refreshed (node, comp). Labels stay min-node ids, so
    repeated ingests are stable: an untouched component keeps its
    representative."""
    star = labels.select(F.col("node").alias("a"), F.col("comp").alias("b")).where(
        F.col("a") != F.col("b")
    )
    batch = new_edges.select(
        F.col(src).cast("bigint").alias("a"), F.col(dst).cast("bigint").alias("b")
    )
    # universe: the labeled nodes (isolated ones must persist); batch
    # endpoints join automatically (connected_components always folds
    # edge endpoints in — and drops NULL endpoints with their edges)
    return connected_components(
        star.unionByName(batch), src="a", dst="b",
        nodes=labels.select("node"), **kwargs
    )


def q_connected_components(spark, sf_dir: str) -> DataFrame:
    """Contract (tail, round-8 promotion): dedup clustering as a graph
    problem — connected components over the exact >= 0.95-Jaccard
    near-dup pairs (q_ngram_jaccard's output), every document labeled
    with its cluster minimum, isolated docs labeling themselves. The
    oracle replays the converged fixpoint with a recursive CTE
    (reachability closure + min), so the hash compare pins the FULL
    labeling, independent of how many rounds propagation took.

    Runs in scratch-parquet mode at a DETERMINISTIC per-sf_dir path
    (overwrite — the q_semantic_dedup pattern): the driver's
    long-lived session gets zero persistent RDD blocks from this row
    (test_no_cache_leak), and repeated sweeps reuse one directory."""
    import hashlib
    import os
    import tempfile

    from ..io import load_table
    from .dedup import ngram_jaccard

    pairs = ngram_jaccard(spark, sf_dir).select("d1", "d2")
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    scratch = os.path.join(tempfile.gettempdir(), f"lss_cc_{tag}")
    lab = connected_components(
        pairs, src="d1", dst="d2", nodes=docs, scratch_dir=scratch
    )
    return lab.select(
        F.col("node").alias("doc_id"), F.col("comp").alias("component")
    )


def _cc_oracle() -> str:
    from .dedup import ORACLE as _DEDUP_ORACLE

    pairs_sql = _DEDUP_ORACLE["q_ngram_jaccard"].strip()
    return f"""
WITH RECURSIVE pairs AS (
{pairs_sql}
), und AS (
  SELECT d1 AS s, d2 AS t FROM pairs
  UNION ALL
  SELECT d2 AS s, d1 AS t FROM pairs
), reach(node, comp) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT u.s, r.comp FROM reach r JOIN und u ON u.t = r.node
)
SELECT node AS doc_id, CAST(min(comp) AS BIGINT) AS component
FROM reach GROUP BY 1
"""


ORACLE = {"q_connected_components": _cc_oracle()}

QUERIES: dict = {}

QUERIES_TAIL = {"q_connected_components": q_connected_components}
