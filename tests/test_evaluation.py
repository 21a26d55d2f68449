"""Evaluation operators (operators/evaluation.py): exact Mann-Whitney
AUC on hand-computable cases (incl. ties), the threshold sweep's
structural invariants, and real-separation detection on the planted
corpus. The contract row pins the full chain vs DuckDB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lambda_sample_spark.operators import classifier as C
from lambda_sample_spark.operators.evaluation import (
    auc_exact,
    confusion_grid,
)
from tests.test_classifier import _planted_docs


def _scored(spark, rows):
    return spark.createDataFrame(rows, "logodds double, is_en int")


def test_auc_hand_computed(spark):
    # perfect separation
    perfect = _scored(
        spark, [(1.0, 1), (2.0, 1), (-1.0, 0), (-2.0, 0)]
    )
    assert auc_exact(perfect).collect()[0]["auc"] == 1.0
    # perfectly inverted
    inv = _scored(spark, [(-1.0, 1), (-2.0, 1), (1.0, 0), (2.0, 0)])
    assert auc_exact(inv).collect()[0]["auc"] == 0.0
    # ties count half: pos at {1, 0}, neg at {0, -1}
    # pairs: (1>0)=1, (1>-1)=1, (0==0)=0.5, (0>-1)=1 -> U=3.5, AUC=0.875
    tied = _scored(spark, [(1.0, 1), (0.0, 1), (0.0, 0), (-1.0, 0)])
    assert auc_exact(tied).collect()[0]["auc"] == 0.875


def test_confusion_grid_invariants(spark):
    sc = _scored(
        spark,
        [(float(s), 1 if s > 0 else 0) for s in range(-5, 6) if s != 0],
    )
    rows = sorted(
        confusion_grid(sc, thresholds=[-10.0, 0.0, 10.0]).collect(),
        key=lambda r: r["thr"],
    )
    n = 10
    for r in rows:
        assert r["tp"] + r["fp"] + r["tn"] + r["fn"] == n
    # threshold below everything: all predicted positive
    assert rows[0]["tp"] == 5 and rows[0]["fp"] == 5
    # threshold above everything: all predicted negative
    assert rows[-1]["tn"] == 5 and rows[-1]["fn"] == 5
    # tpr/fpr monotone non-increasing as thr rises
    assert rows[0]["tpr"] >= rows[1]["tpr"] >= rows[2]["tpr"]
    assert rows[0]["fpr"] >= rows[1]["fpr"] >= rows[2]["fpr"]


def test_planted_separation_detected(spark):
    planted = _planted_docs(spark, n_docs=200)
    w, c = C.train_nb(
        planted.where("doc_id % 10 < 8"), F.col("y") == 1, n=1
    )
    heldout = C.score_nb(
        planted.where("doc_id % 10 >= 8"), w, c, n=1, extra_cols=()
    ).join(planted.select("doc_id", "y"), "doc_id")
    scored = heldout.select(
        "logodds", F.col("y").alias("is_en")
    )
    auc = auc_exact(scored).collect()[0]["auc"]
    assert auc >= 0.95, f"held-out AUC {auc} on a separable corpus"


def test_calibration_census_invariants(spark):
    from lambda_sample_spark.operators.evaluation import calibration_census

    import math

    # a logodds grid spanning (0,1) probabilities; labels drawn by a
    # deterministic stride so each bin has a plausible positive rate
    rows = []
    for i in range(100):
        lo = (i - 50) / 10.0
        p = 1.0 / (1.0 + math.exp(-lo))
        rows.append((lo, 1 if (i * 37 % 100) / 100.0 < p else 0))
    sc = spark.createDataFrame(rows, "logodds double, is_en int")
    out = calibration_census(sc).collect()
    bins = {r["bin"] for r in out}
    assert bins <= set(range(10))
    assert sum(r["n"] for r in out) == 100
    for r in out:
        assert 0.0 <= r["mean_prob"] <= 1.0
        assert 0.0 <= r["frac_pos"] <= 1.0
        # mean predicted prob lies inside its bin's edges (clamped top)
        lo_edge = r["bin"] / 10.0
        hi_edge = (r["bin"] + 1) / 10.0 if r["bin"] < 9 else 1.0
        assert lo_edge <= r["mean_prob"] <= hi_edge + 1e-9
