"""Market-basket co-occurrence analysis (SURVEY.md §2.8 adjunct):
pairwise item co-occurrence with support and lift — association-rule
mining's counting core (the A-priori first pass), and the relational
cousin of the X34 PMI table (PMI reasons over row counts; lift over
basket membership).

Scale notes: the corpus reduces to one row per basket (a single
grouped collect_set whose width is bounded by the item vocabulary —
here brands, |V| = 25), pairs then expand IN-TASK via higher-order
array functions (sorted array → upper-triangle pairs), so there is
NO self-join and the per-basket fanout is bounded by
|basket| choose 2 — never corpus x corpus. Item marginals and the
basket total are a bounded census (<= |V| rows): they materialize
eagerly driver-side and inline as map literals (the DSIR idiom),
keeping the contract plan at exactly ONE corpus pass — lazy marginal
branches would re-run the basket aggregate per consumer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import r6
from ..io import load_table

# upper bound on distinct items accepted for the literal-inlined
# marginal census; past this, marginals should stay a broadcast-join
# table instead (same math, one more corpus pass)
MAX_INLINE_ITEMS = 10_000


def cooccurrence_lift(
    items: DataFrame, basket_col: str, item_col: str
) -> DataFrame:
    """Pairwise co-occurrence over (basket, item) rows: for every
    unordered item pair {a < b} the number of baskets containing
    both, the pair's support n_ab / n_baskets, and its lift
    n_ab·N / (n_a·n_b) (lift > 1 = the items co-occur more often
    than independence predicts). Returns
    (item_a, item_b, n_ab, support, lift)."""
    baskets = items.groupBy(F.col(basket_col).alias("bk")).agg(
        F.array_sort(F.collect_set(F.col(item_col))).alias("arr")
    )
    # pin the expansion stage's parallelism: basket rows are BYTES-
    # small, so AQE coalesces the post-aggregate stage to a few tasks
    # and the CPU-bound higher-order pair expansion serializes (the
    # winnow_near_dup hazard, text.py:398 — input-byte estimates are
    # blind to explode fan-out). Measured at 32x sf0.1: the pair
    # census leg dropped 109 s -> ~14 s.
    n_shuffle = int(
        items.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    baskets = baskets.repartition(n_shuffle, "bk")
    # upper-triangle pairs from the sorted array, expanded in-task:
    # posexplode each element, pair it with the array's tail past its
    # position (slice clamps at the end). A nested
    # transform/flatten/struct formulation computes the same pairs
    # but runs ~7x slower — higher-order lambdas are interpreted
    # per-element while posexplode+slice stays in codegen.
    pairs = baskets.select(
        F.posexplode("arr").alias("i", "item_a"), "arr"
    ).select(
        "item_a",
        F.explode(
            F.slice("arr", F.col("i") + F.lit(2), F.size("arr"))
        ).alias("item_b"),
    )
    census = pairs.groupBy("item_a", "item_b").agg(
        F.count("*").alias("n_ab")
    )

    # bounded marginal census: ONE eager explode-count over the
    # already-deduped basket arrays. A sentinel element appended to
    # every basket makes its count the basket TOTAL, so marginals and
    # total come out of a single aggregation (a cube/count_distinct
    # over the raw membership rows computes the same numbers but pays
    # a corpus-sized distinct — measured 52 s vs ~15 s at 32x sf0.1).
    sentinel = "\x00__baskets__"
    cen = (
        baskets.select(
            F.explode(
                F.concat("arr", F.array(F.lit(sentinel)))
            ).alias("item")
        )
        .groupBy("item")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    marg_rows = [r for r in cen if r["item"] != sentinel]
    # runtime input bounds, not test invariants — must survive python -O
    if len(marg_rows) >= len(cen):
        raise RuntimeError("sentinel census row missing")
    if len(marg_rows) > MAX_INLINE_ITEMS:
        raise ValueError(
            f"{len(marg_rows)} distinct items exceed the literal-inline "
            "bound; use a broadcast marginal table instead"
        )
    n_tot = float(next(r["n"] for r in cen if r["item"] == sentinel))
    kv: list = []
    for r in marg_rows:
        kv.extend([F.lit(r["item"]), F.lit(float(r["n"]))])
    marg = F.create_map(*kv)

    n_a = F.element_at(marg, F.col("item_a"))
    n_b = F.element_at(marg, F.col("item_b"))
    n_ab = F.col("n_ab").cast("double")
    return census.select(
        "item_a",
        "item_b",
        F.col("n_ab").cast("bigint").alias("n_ab"),
        r6(n_ab / F.lit(n_tot)).alias("support"),
        r6((n_ab * F.lit(n_tot)) / (n_a * n_b)).alias("lift"),
    )


def q_cooccur_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract (tail, round 9): brand co-occurrence over order
    baskets — lineitem⋈part derives (order, brand) membership, lift
    against brand marginals."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    items = li.join(part, li.l_partkey == part.p_partkey).select(
        "l_orderkey", "p_brand"
    )
    return cooccurrence_lift(items, "l_orderkey", "p_brand")


_COOCCUR_ORACLE = """
WITH items AS (
  SELECT DISTINCT l_orderkey AS bk, p_brand AS item
  FROM lineitem JOIN part ON l_partkey = p_partkey
), census AS (
  SELECT a.item AS item_a, b.item AS item_b, count(*) AS n_ab
  FROM items a JOIN items b ON a.bk = b.bk AND a.item < b.item
  GROUP BY 1, 2
), marg AS (
  SELECT item, count(*) AS n FROM items GROUP BY 1
), tot AS (
  SELECT count(DISTINCT bk) AS n_tot FROM items
)
SELECT c.item_a, c.item_b, CAST(c.n_ab AS BIGINT) AS n_ab,
       round(CAST(c.n_ab AS DOUBLE) / CAST(n_tot AS DOUBLE), 6)
         AS support,
       round((CAST(c.n_ab AS DOUBLE) * CAST(n_tot AS DOUBLE))
             / (CAST(ma.n AS DOUBLE) * CAST(mb.n AS DOUBLE)), 6)
         AS lift
FROM census c
JOIN marg ma ON ma.item = c.item_a
JOIN marg mb ON mb.item = c.item_b
CROSS JOIN tot
"""

QUERIES: dict = {}

QUERIES_TAIL = {"q_cooccur_lift": q_cooccur_lift}

ORACLE = {"q_cooccur_lift": _COOCCUR_ORACLE}
