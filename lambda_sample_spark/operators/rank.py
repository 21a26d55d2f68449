"""Weighted PageRank over an edge list (SURVEY.md §2.8 adjunct):
the graph-centrality companion to connected components — the ranking
signal large-scale corpus curation uses for source/host quality
weighting (Common-Crawl-style host ranking: rank domains by the link
graph, weight documents by their host's rank), and the second
iterative-graph shape (after CC) a 100 TB engine must run without
pairwise blowup.

Algorithm: classic power iteration with damping — r' = (1-d)/N +
d · Σ_in(w_norm · r) — run a FIXED number of rounds so the result is
a deterministic function of the edge list (the contract/oracle
choice; production callers iterate to an L1 tolerance instead). Each
round is one edge⋈rank equi join + one grouped sum, both hashing on
node ids: linear in |E| per round, state is one (node, rank) row per
node, no pairwise products ever materialize.

Oracle exactness: out-weights and edge weights accumulate in exact
DECIMAL (the tpch_q9 pattern), normalization is a single double
division, and every per-edge contribution is cast to DECIMAL(25,15)
before its SUM — accumulation order can never move a bit, so DuckDB's
unrolled-CTE replay matches Spark cell-for-cell.

100 TB notes: rank state re-shuffles on the same node-id hash every
round (one partitioning profile end-to-end); dangling mass is handled
per-node via the (1-d)/N floor + coalesce(0) — no global dangling
redistribution job. For >10 rounds, cut lineage with the
connected-components localCheckpoint idiom (graph.py:110); at 3
contract rounds Catalyst plans the unrolled tree directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DAMPING = 0.85
TELEPORT = 0.15  # 1 - DAMPING, kept as a literal: (1.0-0.85) in
# binary is 0.15000000000000002 while the SQL literal 0.15 is the
# nearest-double of 0.15 — the oracle and the engine must agree on
# which constant they add every round


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    iters: int = 3,
) -> DataFrame:
    """Weighted PageRank after ``iters`` fixed power-iteration rounds.
    ``edges`` is a directed weighted edge list (weights exact — pass
    DECIMAL-accumulated sums for cross-engine determinism); returns
    one (node, r) row per node appearing as a source or target.

    Iterative lineage is CUT the connected-components way
    (graph.py:110): the normalized edge list and node universe
    materialize ONCE via localCheckpoint (re-planning them under every
    round's join doubled work per round — measured 18.9 s → ~4 s on
    the 100k-node ladder rung), each round's rank table materializes
    before feeding the next, and every superseded checkpoint is
    released on the way out (long-lived sessions accumulate zero
    blocks; ``unpersist_checkpoint`` handles the LogicalRDD seam).
    One scalar ``count()`` job fixes N up front (the CC edge-count
    idiom); everything else is joins + grouped sums on node ids."""
    from .graph import unpersist_checkpoint

    retired: list[DataFrame] = []
    # bound before the try: if nodes.count()/localCheckpoint fails
    # mid-setup, the finally's `df is not ranks` test must not raise
    # UnboundLocalError and mask the real exception
    ranks: DataFrame | None = None
    try:
        # materialize the edge list FIRST: it feeds three lazy
        # consumers (node universe, out-weight census, normalized
        # edges) and is typically the reduction of a corpus-sized
        # join — without this cut each consumer re-runs that
        # derivation (round 15: the nations contract row re-ran the
        # lineitem⋈orders fact join 3x, 4.4 s → 2.0 s)
        edges = edges.localCheckpoint(eager=True)
        retired.append(edges)
        nodes = (
            edges.select(F.col(src).alias("node"))
            .union(edges.select(F.col(dst).alias("node")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        retired.append(nodes)
        n = nodes.count()
        outw = edges.groupBy(src).agg(F.sum(weight).alias("ow"))
        wn = (
            edges.join(outw, src)
            .select(
                F.col(src).alias("e_src"),
                F.col(dst).alias("e_dst"),
                (
                    F.col(weight).cast("double")
                    / F.col("ow").cast("double")
                ).alias("wn"),
            )
            .localCheckpoint(eager=True)
        )
        retired.append(wn)
        ranks = nodes.select("node", F.lit(1.0 / n).alias("r"))
        for it in range(iters):
            contrib = (
                wn.join(ranks, wn["e_src"] == ranks["node"])
                .groupBy(F.col("e_dst").alias("node"))
                .agg(
                    F.sum(
                        (F.col("wn") * F.col("r")).cast("decimal(25,15)")
                    )
                    .cast("double")
                    .alias("c")
                )
            )
            ranks = nodes.join(contrib, "node", "left").select(
                "node",
                (
                    F.lit(TELEPORT / n)
                    + DAMPING * F.coalesce(F.col("c"), F.lit(0.0))
                ).alias("r"),
            )
            ranks = ranks.localCheckpoint(eager=True)
            retired.append(ranks)
        # the RETURNED frame keeps its checkpoint (the ContextCleaner
        # reclaims those blocks when the caller dereferences it — the
        # CC contract pattern); everything superseded is swept NOW,
        # including on failure paths
        return ranks
    finally:
        for df in retired:
            if df is not ranks:
                unpersist_checkpoint(df)


def q_pagerank_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract (tail, round 9): trade-flow centrality — PageRank over
    the customer-nation -> supplier-nation graph weighted by lineitem
    revenue (3 rounds, d = 0.85). The heavy work is the fact-table
    edge derivation (lineitem⋈orders shuffle on orderkey; customer /
    supplier / nation broadcast), which reduces 100 TB of facts to a
    bounded |nations|² edge list before any iteration starts."""
    from ..io import load_table
    from .common import r6

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")

    vol = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    ).cast("decimal(18,6)")
    edges = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(nat.select(F.col("n_nationkey").alias("cnk"),
                                   F.col("n_name").alias("src"))),
            F.col("c_nationkey") == F.col("cnk"),
        )
        .join(
            F.broadcast(nat.select(F.col("n_nationkey").alias("snk"),
                                   F.col("n_name").alias("dst"))),
            F.col("s_nationkey") == F.col("snk"),
        )
        .groupBy("src", "dst")
        .agg(F.sum(vol).alias("w"))
    )
    return pagerank(edges).select(
        F.col("node").alias("nation"), r6(F.col("r")).alias("rank")
    )


def _rank_round_sql(prev: str, out: str) -> str:
    """One unrolled power-iteration round of the oracle CTE chain."""
    return f"""{out} AS (
  SELECT n.node,
         CAST(0.15 AS DOUBLE) / (SELECT n FROM nn)
         + CAST(0.85 AS DOUBLE) * coalesce(c.c, CAST(0 AS DOUBLE)) AS r
  FROM nodes n LEFT JOIN (
    SELECT wn.dst AS node,
           CAST(sum(CAST(wn.wn * {prev}.r AS DECIMAL(25,15))) AS DOUBLE) AS c
    FROM wn JOIN {prev} ON wn.src = {prev}.node
    GROUP BY 1
  ) c USING (node)
)"""


ORACLE = {
    "q_pagerank_nations": f"""
WITH edges AS (
  SELECT cn.n_name AS src, sn.n_name AS dst,
         sum(CAST(l.l_extendedprice * (1.0 - l.l_discount)
                  AS DECIMAL(18,6))) AS w
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
  GROUP BY 1, 2
), outw AS (
  SELECT src, sum(w) AS ow FROM edges GROUP BY 1
), wn AS (
  SELECT e.src, e.dst,
         CAST(e.w AS DOUBLE) / CAST(o.ow AS DOUBLE) AS wn
  FROM edges e JOIN outw o USING (src)
), nodes AS (
  SELECT src AS node FROM edges UNION SELECT dst FROM edges
), nn AS (
  SELECT count(*) AS n FROM nodes
), r0 AS (
  SELECT node, CAST(1 AS DOUBLE) / (SELECT n FROM nn) AS r FROM nodes
), {_rank_round_sql("r0", "r1")}, {_rank_round_sql("r1", "r2")},
{_rank_round_sql("r2", "r3")}
SELECT node AS nation, round(r, 6) AS rank FROM r3
""",
}

QUERIES: dict = {}

QUERIES_TAIL = {"q_pagerank_nations": q_pagerank_nations}
