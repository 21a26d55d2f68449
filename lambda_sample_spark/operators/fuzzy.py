"""Fuzzy entity matching / canonicalization (SURVEY.md §2.8 adjunct):
match dirty strings against a canonical catalog by bounded edit
distance — the record-linkage step that maps free-text product /
entity mentions onto a reference dictionary (the string cousin of
the X3 embedding nearest-neighbor lookup).

Scale notes: the catalog side is the DISTINCT-name dictionary — at
100 TB the raw table is huge but its distinct name vocabulary is
bounded (the X11 vocab argument), so it reduces once and broadcasts.
Probes stream against the broadcast dictionary with a length-band
prune (|len(a) − len(b)| ≤ max_dist is a true Levenshtein lower
bound) applied BEFORE the O(n·m) distance, so each probe pays the
full computation only on its length band. Best-match selection is a
per-probe window (dist, then lexicographic name — deterministic on
ties); unmatched probes survive with NULL via the left join, so the
output is exactly one row per probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import load_table

# dirty product-name mentions for the contract row: typos of catalog
# names, one exact hit, one tie ('ned bolt' is distance 1 from BOTH
# 'new bolt' and 'red bolt' -> lexicographic tiebreak), two misses
PROBES = (
    "red blt",
    "smal ring",
    "hot gerr",
    "blue wdget",
    "colde plate",
    "old rrod",
    "new gizmoo",
    "large anvill",
    "ned bolt",
    "red bolt",
    "purple dinosaur",
    "cold waffle",
)
MAX_DIST = 2


def fuzzy_match(
    probes: DataFrame,
    catalog: DataFrame,
    probe_col: str = "probe",
    name_col: str = "name",
    max_dist: int = MAX_DIST,
) -> DataFrame:
    """Best catalog match per probe within ``max_dist`` edits:
    (probe, match, dist, n_candidates). ``catalog`` must already be
    the distinct-name dictionary; it is broadcast. NULL match/dist
    and n_candidates = 0 when nothing is within range."""
    p, n = F.col(probe_col), F.col(name_col)
    cand = probes.join(
        F.broadcast(catalog),
        (F.abs(F.length(p) - F.length(n)) <= max_dist)
        & (F.levenshtein(p, n) <= max_dist),
        "left",
    ).select(p.alias("probe"), n.alias("match"))
    dist = F.levenshtein("probe", "match")
    w = Window.partitionBy("probe").orderBy(
        dist.asc_nulls_last(), F.col("match").asc_nulls_last()
    )
    return (
        cand.select(
            "probe",
            "match",
            dist.cast("bigint").alias("dist"),
            F.row_number().over(w).alias("rn"),
            F.count("match")
            .over(Window.partitionBy("probe"))
            .cast("bigint")
            .alias("n_candidates"),
        )
        .where(F.col("rn") == 1)
        .drop("rn")
    )


def q_entity_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract (tail, round 9): canonicalize the fixed dirty-mention
    probe set against the distinct part-name dictionary."""
    probes = spark.createDataFrame(
        [(s,) for s in PROBES], "probe STRING"
    )
    catalog = (
        load_table(spark, sf_dir, "part")
        .select(F.col("p_name").alias("name"))
        .distinct()
    )
    return fuzzy_match(probes, catalog)


_PROBE_VALUES = ", ".join(f"('{s}')" for s in PROBES)

_ENTITY_ORACLE = f"""
WITH probes(probe) AS (VALUES {_PROBE_VALUES}),
catalog AS (SELECT DISTINCT p_name AS name FROM part),
cand AS (
  SELECT p.probe, c.name AS match
  FROM probes p LEFT JOIN catalog c
    ON abs(length(p.probe) - length(c.name)) <= {MAX_DIST}
   AND levenshtein(p.probe, c.name) <= {MAX_DIST}
)
SELECT probe, match,
       CAST(levenshtein(probe, match) AS BIGINT) AS dist,
       CAST(count(match) OVER (PARTITION BY probe) AS BIGINT)
         AS n_candidates
FROM cand
QUALIFY row_number() OVER (
  PARTITION BY probe
  ORDER BY levenshtein(probe, match) ASC NULLS LAST,
           match ASC NULLS LAST
) = 1
"""

QUERIES: dict = {}

QUERIES_TAIL = {"q_entity_match": q_entity_match}

ORACLE = {"q_entity_match": _ENTITY_ORACLE}
