"""Plan-snapshot regression guard (round-8, verdict item 7).

The Exchange-count budget (test_shuffle_budget) catches accidental
extra shuffles, but a strategy FLIP that keeps the count constant —
broadcast join degrading to sort-merge, a lost partial aggregate, a
pruning-killing projection — slips through it. This suite pins the
normalized strategy skeleton (plans/audit.normalized_plan) of the ten
headline queries against checked-in snapshots; any strategy change
fails CI until the snapshot is deliberately regenerated with

    SPARK_GRAFT_UPDATE_SNAPSHOTS=1 python -m pytest tests/test_plan_snapshots.py

which is the review trail.
"""

from __future__ import annotations

import os
from pathlib import Path

import pytest

import __spark_entry__ as entrymod
from lambda_sample_spark.plans.audit import normalized_plan

SNAP_DIR = Path(__file__).parent / "plan_snapshots"
SF_DIR = "/root/testdata/sf0.001"  # plans are pinned at one fixed SF

# the ten most load-bearing plans: flagship, the heaviest TPC-H joins,
# the dedup/ANN scale paths, the sketch pipelines
SNAPSHOT_QUERIES = [
    "q_fast_anomaly",
    "q_lookup_join_left",
    "q_tpch_q5",
    "q_tpch_q18",
    "q_dedup_near",
    "q_ngram_jaccard",
    "q_ann_lsh_topk",
    "q_semantic_dedup",
    "q_cms_heavy_hitters",
    "q_sampled_quantiles",
    # round-8 additions: the widest TPC-H join tree, the
    # distinct-expand census, the decontamination gram join, and the
    # relational ADC pipeline
    "q_tpch_q8",
    "q_tpch_q16",
    "q_contamination",
    "q_pq_adc_topk",
    # round-10 additions: the classifier's broadcast-model scoring and
    # the Bloom probe's zero-join corpus plan (a broadcast degrading to
    # a shuffle join, or the inline literal degrading to a join, are
    # exactly the strategy flips this suite exists to catch)
    "q_nb_quality",
    "q_bloom_contamination",
]


@pytest.mark.parametrize("name", SNAPSHOT_QUERIES)
def test_plan_snapshot(spark, name):
    spark.catalog.clearCache()  # cached frames would rewrite subtrees
    df = entrymod.queries()[name](spark, SF_DIR)
    got = normalized_plan(df)
    snap = SNAP_DIR / f"{name}.txt"
    if os.environ.get("SPARK_GRAFT_UPDATE_SNAPSHOTS") == "1" or not snap.exists():
        snap.write_text(got + "\n")
        if os.environ.get("SPARK_GRAFT_UPDATE_SNAPSHOTS") != "1":
            pytest.fail(
                f"snapshot for {name} was missing — wrote it; commit the file"
            )
        return
    want = snap.read_text().rstrip("\n")
    assert got == want, (
        f"{name}: physical-plan strategy changed.\n--- snapshot ---\n{want}\n"
        f"--- current ---\n{got}\n"
        "If intentional, regenerate with SPARK_GRAFT_UPDATE_SNAPSHOTS=1."
    )
