"""User-behavior analytics (SURVEY.md §2.8 adjuncts): ordered funnel
conversion and cohort retention — the two product-analytics staples
an events engine is expected to answer (Amplitude/Mixpanel-class
queries), both pure relational algebra with DuckDB oracles.

Scale notes: the funnel is per-user conditional first-occurrence
chaining — each step is a filtered (user) aggregate joined on the
SAME key, so all steps co-shuffle once and AQE reuses the exchange;
the summary is a bounded (n_steps) frame. Cohort retention is two
grouped passes keyed on user then (cohort, offset) — nothing grows
beyond users x active-days. Timestamps compare at millisecond
precision (ts_ms / epoch_ms) on both engines — the nanos-vs-micros
parquet seam never reaches a comparison (the sessionize idiom).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import events, r6, ts_ms

FUNNEL_STEPS = ("view", "click", "purchase")


def funnel_conversion(
    ev: DataFrame,
    steps: tuple[str, ...] = FUNNEL_STEPS,
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Strict-order funnel: a user converts step i when their FIRST
    step-i event strictly follows their first qualifying step-(i-1)
    event (first-touch semantics, ms precision). Returns one row per
    step: (step_idx, step, n_users, conv_from_prev, conv_from_first).

    Shape (round 15): ONE corpus pass — per user, one sorted
    timestamp array per step out of a single aggregate, then the
    strict-order chain t_i = min(step-i times > t_{i-1}) as per-user
    array expressions (arrays are per-user small; a NULL t_{i-1}
    propagates, exactly the old join-back semantics), and one tiny
    census of non-null t_i flags. The previous shape filtered and
    re-joined the corpus once per step, and the lazy per-step counts
    re-ran every earlier step's scan (measured 6 events scans in the
    executed 3-step contract plan; now 1)."""
    tc = F.col(type_col)
    per_user = (
        ev.where(tc.isin(list(steps)))
        .groupBy(user_col)
        .agg(
            *[
                F.sort_array(
                    F.collect_list(F.when(tc == s, ts_ms()))
                ).alias(f"a{i}")
                for i, s in enumerate(steps)
            ]
        )
    )
    cur = per_user.withColumn("t0", F.array_min("a0"))
    for i in range(1, len(steps)):
        prev_t = F.col(f"t{i-1}")
        cur = cur.withColumn(
            f"t{i}",
            F.array_min(F.filter(f"a{i}", lambda x: x > prev_t)),
        )
    census = cur.agg(
        *[
            F.coalesce(
                F.sum(F.col(f"t{i}").isNotNull().cast("long")), F.lit(0)
            ).alias(f"n{i}")
            for i in range(len(steps))
        ]
    )
    rows = census.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i + 1).alias("step_idx"),
                        F.lit(steps[i]).alias("step"),
                        F.col(f"n{i}").cast("bigint").alias("n_users"),
                    )
                    for i in range(len(steps))
                ]
            )
        ).alias("r")
    ).select("r.*")
    # conversion ratios against the previous step and the funnel head;
    # computed via a tiny self-ordered window over the n_steps rows
    from pyspark.sql.window import Window

    w_all = Window.orderBy("step_idx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    head = F.first("n_users").over(w_all)
    prev_n = F.lag("n_users").over(Window.orderBy("step_idx"))
    return rows.select(
        "step_idx",
        "step",
        "n_users",
        r6(
            F.when(prev_n.isNull(), F.lit(1.0)).otherwise(
                F.col("n_users") / prev_n
            )
        ).alias("conv_from_prev"),
        r6(F.col("n_users") / head).alias("conv_from_first"),
    )


def cohort_retention(
    ev: DataFrame,
    user_col: str = "user_id",
) -> DataFrame:
    """Day-cohort retention matrix: users grouped by their first-seen
    day; for each (cohort day, day offset) the count of cohort users
    active that day and their event volume. Returns
    (cohort_day_ms, offset_days, n_users, n_events).

    Round-15: the cohort day is a min() WINDOW over the user
    partition, not an aggregate joined back — the join-back shape
    re-derived the fact scan on both join sides (executed plan:
    events scanned twice, 0 ReusedExchange), while the window pays
    the identical user-key shuffle the join paid and reads the fact
    once."""
    from pyspark.sql.window import Window

    day = F.unix_millis(F.date_trunc("day", "ts"))
    DAY_MS = 86_400_000
    return (
        ev.select(user_col, day.alias("d"))
        .withColumn(
            "cohort_day_ms", F.min("d").over(Window.partitionBy(user_col))
        )
        .groupBy(
            "cohort_day_ms",
            ((F.col("d") - F.col("cohort_day_ms")) / DAY_MS)
            .cast("bigint")
            .alias("offset_days"),
        )
        .agg(
            F.count_distinct(user_col).alias("n_users"),
            F.count("*").alias("n_events"),
        )
    )


def markov_transitions(
    ev: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: for each ordered (src -> dst) event-type pair, the
    transition count and the probability P(dst | src). The classic
    "what do users do next" product-analytics query, and the
    session-path cousin of the funnel above.

    Shape (round-15): one lead() window partitioned by user (ordered
    by ms + the event_id tiebreaker, the deterministic-window idiom),
    then a grouped count on (src, dst) — a frame bounded by |types|².
    The per-src normalisation is a WINDOW sum over that bounded frame,
    not an aggregate joined back: the lazy join-back shape re-derived
    the fact window once per consumer (executed plan: events scanned
    twice, 5 exchanges, 0 ReusedExchange), while the window consumes
    the pairs lineage exactly once — one fact scan, one user-key
    shuffle, one (src,dst) shuffle, plus one |types|²-row exchange."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col).orderBy(ts_ms(), "event_id")
    pairs = (
        ev.select(
            F.col(type_col).alias("src"),
            F.lead(type_col).over(w).alias("dst"),
        )
        .where(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").cast("bigint").alias("n_trans"))
    )
    tot = F.sum("n_trans").over(Window.partitionBy("src"))
    return pairs.select(
        "src",
        "dst",
        "n_trans",
        r6(F.col("n_trans") / tot).alias("prob"),
    )


def last_touch_attribution(
    ev: DataFrame,
    conversion: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Last-touch conversion attribution: each ``conversion`` event
    credits the same user's nearest strictly-preceding
    non-conversion event type ("channel"); conversions with no
    preceding touch credit '(direct)'. Returns the credit census
    (channel, n_conversions, share) — the marketing-attribution
    staple and the as-of-join cousin of the funnel (funnel asks "did
    they ever", attribution asks "what was last").

    Shape: one per-user sequence window (ms + event_id deterministic
    order) carrying the last non-conversion type via
    last(ignorenulls) over UNBOUNDED..-1 — no self-join of the fact
    table; the census is bounded by |types| so the share
    normalisation is a window over <= |types| rows."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_ms(), "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col(type_col) != conversion, F.col(type_col)),
        ignorenulls=True,
    ).over(w)
    credits = (
        ev.select(F.col(type_col).alias("t"), touch.alias("touch"))
        .where(F.col("t") == conversion)
        .groupBy(
            F.coalesce(F.col("touch"), F.lit("(direct)")).alias("channel")
        )
        .agg(F.count("*").alias("n_conversions"))
    )
    total = F.sum("n_conversions").over(Window.partitionBy())
    return credits.select(
        "channel",
        F.col("n_conversions").cast("bigint").alias("n_conversions"),
        r6(F.col("n_conversions").cast("double") / total).alias("share"),
    )


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract (tail, round 9): the view -> click -> purchase funnel
    over the events table, strict-order first-touch at ms precision."""
    return funnel_conversion(events(spark, sf_dir))


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract (tail, round 9): day-cohort retention counts."""
    return cohort_retention(events(spark, sf_dir))


def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract (tail, round 9): event-type transition matrix with
    per-source probabilities."""
    return markov_transitions(events(spark, sf_dir))


def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract (tail, round 9): last-touch credit census for
    purchase conversions."""
    return last_touch_attribution(events(spark, sf_dir))


_FUNNEL_ORACLE = """
WITH s1 AS (
  SELECT user_id, min(epoch_ms(ts)) AS t0
  FROM events WHERE event_type = 'view' GROUP BY 1
), s2 AS (
  SELECT e.user_id, min(epoch_ms(e.ts)) AS t1
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND epoch_ms(e.ts) > s1.t0
  GROUP BY 1
), s3 AS (
  SELECT e.user_id, min(epoch_ms(e.ts)) AS t2
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND epoch_ms(e.ts) > s2.t1
  GROUP BY 1
), f AS (
  SELECT 1 AS step_idx, 'view' AS step, (SELECT count(*) FROM s1) AS n_users
  UNION ALL
  SELECT 2, 'click', (SELECT count(*) FROM s2)
  UNION ALL
  SELECT 3, 'purchase', (SELECT count(*) FROM s3)
)
SELECT step_idx, step, CAST(n_users AS BIGINT) AS n_users,
       round(CASE WHEN lag(n_users) OVER (ORDER BY step_idx) IS NULL
                  THEN 1.0
                  ELSE n_users / lag(n_users) OVER (ORDER BY step_idx) END,
             6) AS conv_from_prev,
       round(n_users / first_value(n_users) OVER (ORDER BY step_idx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             6) AS conv_from_first
FROM f
"""

_COHORT_ORACLE = """
WITH d AS (
  SELECT user_id, epoch_ms(date_trunc('day', ts)) AS d FROM events
), firsts AS (
  SELECT user_id, min(d) AS cohort_day_ms FROM d GROUP BY 1
)
SELECT cohort_day_ms,
       CAST((d - cohort_day_ms) / 86400000 AS BIGINT) AS offset_days,
       count(DISTINCT user_id) AS n_users,
       count(*) AS n_events
FROM d JOIN firsts USING (user_id)
GROUP BY 1, 2
"""

QUERIES: dict = {}

_MARKOV_ORACLE = """
WITH pairs AS (
  SELECT event_type AS src,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
         ) AS dst
  FROM events
), counts AS (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS n_trans
  FROM pairs WHERE dst IS NOT NULL GROUP BY 1, 2
), totals AS (
  SELECT src, sum(n_trans) AS tot FROM counts GROUP BY 1
)
SELECT c.src, c.dst, c.n_trans, round(c.n_trans / t.tot, 6) AS prob
FROM counts c JOIN totals t USING (src)
"""

_ATTRIBUTION_ORACLE = """
WITH seq AS (
  SELECT event_type AS t,
         last_value(CASE WHEN event_type <> 'purchase'
                         THEN event_type END IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS touch
  FROM events
), credits AS (
  SELECT coalesce(touch, '(direct)') AS channel,
         count(*) AS n_conversions
  FROM seq WHERE t = 'purchase' GROUP BY 1
)
SELECT channel, CAST(n_conversions AS BIGINT) AS n_conversions,
       round(CAST(n_conversions AS DOUBLE)
             / sum(n_conversions) OVER (), 6) AS share
FROM credits
"""

QUERIES_TAIL = {
    "q_funnel": q_funnel,
    "q_cohort_retention": q_cohort_retention,
    "q_markov_transitions": q_markov_transitions,
    "q_attribution": q_attribution,
}

ORACLE = {
    "q_funnel": _FUNNEL_ORACLE,
    "q_cohort_retention": _COHORT_ORACLE,
    "q_markov_transitions": _MARKOV_ORACLE,
    "q_attribution": _ATTRIBUTION_ORACLE,
}
