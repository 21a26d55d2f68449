"""Batch-layer ML: per-key random-forest anomaly classifiers
(SURVEY.md §2.7 M1-M3).

Reference semantics (/root/reference/):
  M1 train: Smile ``randomForest("anomaly" ~ "value", df)`` on the
     newest 20,000 rows per sensor (Trainer.scala:38-57,59-74);
     single-class training data is a logged skip (Trainer.scala:47-49).
  M2 predict: posterior P(anomaly) = ``posteriori(1)``
     (Analyzer.scala:72-83).
  M3 persistence: model blob round-trip (BinarySerializer.scala:88-101)
     -> MLlib native save/load.

Faithful variant: a loop of MLlib fits, one model per key — correct
for a small configured fleet (the reference has 4 sensors). Scalable
variant for many keys: ``groupBy(key).applyInPandas`` training one
model per group inside the workers (sketched in train_per_key_pandas —
a pure-numpy histogram scorer, since sklearn isn't in this
environment). Parity is statistical, not exact (Smile vs MLlib RNG),
matching the reference's own wide-tolerance test philosophy
(AnalyzerSpec.scala:50-54).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Label threshold ~ p96.5 of the events value distribution => ~3.5%
# positives, matching the reference fixture's anomaly rate
# (FIXTURES.md: 789/23164 ~ 3.4%). MLlib's histogram splitter cannot
# isolate rarer positives at default maxBins.
LABEL_THRESHOLD = 166.0
RECENT_TRAIN_N = 20000  # application.conf:14 (cassandra.full)
N_TREES = 50  # forest size; also pinned in the q_rf_train oracle


def _labeled_events(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "anomaly", (F.col("value") > LABEL_THRESHOLD).cast("int")
    )


def _fit_fleet(
    assembled: DataFrame, trainable: list[str], key_col: str = "event_type"
) -> dict[str, object]:
    """Fit one forest per trainable key on an already-assembled (and
    ideally persisted) frame. Fits are independent Spark jobs —
    submitted concurrently so the scheduler interleaves their stages
    instead of paying each fit's fixed costs serially.

    Every returned model is ``copy()``-ed, which drops MLlib's
    ``trainingSummary``. That is deliberate, not cosmetic: the summary
    holds the SparkSession, and once any ``observe()`` has initialized
    the session's lazy non-serializable ObservationManager (the
    documented incremental_dedup/graph.py hazard), serializing a task
    closure that captures a summary-bearing model dies with "Task not
    serializable: ObservationManager" (serialization stack: model ->
    trainingSummary -> sparkSession -> observationManager; the round-13
    full-suite flake in test_shuffle_budget[q_rf_train]). Summary-free
    models keep every downstream transform serializable regardless of
    session state; nothing in this repo reads .summary."""
    from pyspark.ml.classification import RandomForestClassifier

    if not trainable:
        return {}

    def fit_one(key: str):
        rf = RandomForestClassifier(
            featuresCol="features",
            labelCol="anomaly",
            numTrees=N_TREES,
            # default maxBins=32 buckets rare positives together with
            # negatives in one quantile bin and the tree never splits;
            # 256 bins give the splitter boundaries fine enough for a
            # few-percent positive rate
            maxBins=256,
            seed=42,
        )
        return key, rf.fit(assembled.where(F.col(key_col) == key)).copy()

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(4, len(trainable))) as pool:
        return dict(pool.map(fit_one, trainable))


def train_models(train_df: DataFrame, key_col: str = "event_type") -> dict[str, object]:
    """M1 (faithful): one MLlib RandomForest per key. Keys with a
    single label class are skipped (reference logs-and-skips).

    The driver-side loop is over the configured key fleet (4 sensors in
    the reference) — the many-keys scalable twin is
    ``train_per_key_pandas``. The input frame is cached so the per-key
    fits don't each recompute its lineage (the top-20k window), and the
    per-key class census is ONE aggregate pass, not a job per key."""
    from pyspark.ml.feature import VectorAssembler

    assembler = VectorAssembler(inputCols=["value"], outputCol="features")
    assembled = assembler.transform(train_df).persist()
    try:
        class_counts = {
            r[0]: r[1]
            for r in assembled.groupBy(key_col)
            .agg(F.countDistinct("anomaly").alias("n_classes"))
            .collect()
        }
        # keys below 2 classes are skipped: Trainer.scala:47-49 behavior
        trainable = [k for k in sorted(class_counts) if class_counts[k] >= 2]
        return _fit_fleet(assembled, trainable, key_col)
    finally:
        assembled.unpersist()


def predict_posterior(model, df: DataFrame) -> DataFrame:
    """M2: P(anomaly=1) via the probability vector."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.functions import vector_to_array

    assembled = VectorAssembler(inputCols=["value"], outputCol="features").transform(df)
    return model.transform(assembled).withColumn(
        "p_anomaly", vector_to_array(F.col("probability")).getItem(1)
    )


def export_tree_debug(model, tree_index: int = 0) -> str:
    """M4: textual decision-tree export — the MLlib equivalent of the
    reference's graphviz dump ``rf.trees()(0).dot`` (README.md:235-239).
    MLlib exposes ``toDebugString`` (indented if/else text) rather than
    dot; the use case (inspect one tree of the forest) is the same."""
    return model.trees[tree_index].toDebugString


N_BINS = 20


def train_per_key_pandas(train_df: DataFrame, key_col: str = "event_type") -> DataFrame:
    """M1 (scalable variant): many-models training via applyInPandas —
    one worker-side fit per key, no driver loop. The in-group learner
    is a pure-numpy histogram scorer (20 equi-width bins of value ->
    empirical P(anomaly|bin)) because sklearn isn't available here; a
    real deployment would drop sklearn/xgboost into the same closure.

    Returns one row per (key, bin) — scalar columns only (the model is
    the set of its bins, exploded): ``bin_lo`` is the bin's left edge,
    ``posterior`` = P(anomaly | value in bin). The bin arithmetic
    (``clamp(floor((v - vmin) / width), 0, 19)`` with
    ``width = (vmax + 1e-9 - vmin) / 20``) is plain IEEE-double ops so
    an external SQL engine reproduces it bit-for-bit.
    """
    schema = (
        f"{key_col} STRING, bin BIGINT, bin_lo DOUBLE, n_rows BIGINT, "
        "n_in_bin BIGINT, n_pos BIGINT, posterior DOUBLE"
    )
    kc = key_col
    nb = N_BINS

    def fit_group(pdf):
        import numpy as np
        import pandas as pd

        v = pdf["value"].to_numpy(dtype=np.float64)
        y = pdf["anomaly"].to_numpy(dtype=np.float64)
        vmin = float(v.min())
        width = (float(v.max()) + 1e-9 - vmin) / float(nb)
        b = np.clip(np.floor((v - vmin) / width), 0, nb - 1).astype(np.int64)
        n_in_bin = np.bincount(b, minlength=nb).astype(np.int64)
        n_pos = np.bincount(b, weights=y, minlength=nb).astype(np.int64)
        posterior = np.where(n_in_bin > 0, n_pos / np.maximum(n_in_bin, 1), 0.0)
        bins = np.arange(nb, dtype=np.int64)
        return pd.DataFrame(
            {
                kc: pdf[kc].iloc[0],
                "bin": bins,
                "bin_lo": vmin + bins * width,
                "n_rows": np.int64(len(pdf)),
                "n_in_bin": n_in_bin,
                "n_pos": n_pos,
                "posterior": posterior,
            }
        )

    return train_df.groupBy(key_col).applyInPandas(fit_group, schema=schema)


_STATS_SCHEMA = (
    "event_type STRING, n_train_rows BIGINT, n_train_pos BIGINT, "
    "train_vmin DOUBLE, train_vmax DOUBLE"
)
_FLEET_CACHE: dict[tuple[str, str], dict[str, object]] = {}


def _contract_fleet(spark: SparkSession, sf_dir: str) -> dict[str, object]:
    """Everything the RF contract rows need, built from ONE persisted
    assembled training window and memoized per (Spark app, sf_dir):

    - ``models`` — deterministic (seed=42) per-key forests, summary-
      stripped (see _fit_fleet);
    - ``stats`` — the per-key training census (rows/pos/extents —
      plain SQL over the same window, so DuckDB replays it exactly);
    - ``acc`` — each model's accuracy and positive share on its own
      training window, from ONE union-of-transforms action.

    Through round 13 these were three separate memoizers
    (_MODEL_CACHE, _STATS_CACHE, plus rf_train's own validation
    persist), each re-materializing the newest-RECENT_TRAIN_N window:
    three full events scans + window sorts where one suffices. Folding
    them into one persisted frame with one census pass (class counts
    and stats cells share an aggregate) is the round-14 q_rf_train
    cost shave. Cached values are driver-local (models + collected
    rows, bounded by the key fleet, not data size); the persisted
    window is unpersisted before returning, so nothing lingers in the
    shared session's block manager."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _FLEET_CACHE:
        return _FLEET_CACHE[key]
    from pyspark.ml.feature import VectorAssembler

    from ..operators.anomaly import recent_per_key
    from ..operators.common import events

    labeled = _labeled_events(
        recent_per_key(events(spark, sf_dir), n=RECENT_TRAIN_N)
    )
    assembled = (
        VectorAssembler(inputCols=["value"], outputCol="features")
        .transform(labeled)
        .persist()
    )
    try:
        census = (
            assembled.groupBy("event_type")
            .agg(
                F.countDistinct("anomaly").alias("n_classes"),
                F.count("*").alias("n_train_rows"),
                F.sum("anomaly").cast("bigint").alias("n_train_pos"),
                F.round(F.min("value"), 6).alias("train_vmin"),
                F.round(F.max("value"), 6).alias("train_vmax"),
            )
            .collect()
        )
        trainable = sorted(r.event_type for r in census if r.n_classes >= 2)
        models = _fit_fleet(assembled, trainable)
        # ONE action validates the whole fleet: each model's transform
        # applies to its own key's slice of the persisted window, the
        # slices union, one per-key aggregate yields every
        # accuracy/majority pair. Not thread-pooled per-key collects:
        # concurrent collectToPython calls race on the session's
        # ObservationManager (the documented Spark 4.1 flake).
        acc: dict[str, object] = {}
        if models:
            from functools import reduce

            legs = [
                m.transform(
                    assembled.where(F.col("event_type") == k)
                ).select(
                    "event_type",
                    (F.col("prediction") == F.col("anomaly"))
                    .cast("double")
                    .alias("correct"),
                    F.col("anomaly").cast("double").alias("pos"),
                )
                for k, m in sorted(models.items())
            ]
            acc = {
                r.event_type: r
                for r in reduce(lambda a, b: a.unionByName(b), legs)
                .groupBy("event_type")
                .agg(
                    F.avg("correct").alias("acc"),
                    F.avg("pos").alias("pos_share"),
                )
                .collect()
            }
    finally:
        assembled.unpersist()
    _FLEET_CACHE[key] = {
        "models": models,
        "stats": [
            (
                r.event_type,
                r.n_train_rows,
                r.n_train_pos,
                r.train_vmin,
                r.train_vmax,
            )
            for r in census
        ],
        "acc": acc,
    }
    return _FLEET_CACHE[key]


def _contract_models(spark: SparkSession, sf_dir: str) -> dict[str, object]:
    """Deterministic (seed=42) per-key forests for the contract
    queries — one fleet build shared with the census/validation (see
    _contract_fleet): q_rf_train and rf_predict_mllib run back-to-back
    in the driver gate and would otherwise each pay the training cost."""
    return _contract_fleet(spark, sf_dir)["models"]


def _train_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-key facts about the exact training frame the
    contract models fit on (newest RECENT_TRAIN_N rows per key): row
    count, class counts, feature extents — every column is plain SQL
    over the same window, so DuckDB replays it exactly (see
    tests/test_ml.py::test_rf_metadata_matches_duckdb). The cached
    value is the COLLECTED census (one row per key — bounded by the
    key fleet, not data size), rebuilt into a local DataFrame per
    call, so the contract plan stays exchange-free."""
    return spark.createDataFrame(
        _contract_fleet(spark, sf_dir)["stats"], _STATS_SCHEMA
    )


def rf_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract (oracle-checked since round 13): train per-key forests
    on the newest 20k rows per key; report model facts as
    DETERMINISTIC cells plus SELF-VALIDATING booleans (the
    q_approx_distinct_users pattern — the cell the oracle checks is a
    claim the query itself verifies about the RNG-dependent model):

    - ``num_trees`` — the configured forest size (50), deterministic;
    - ``n_train_rows / n_train_pos / train_vmin / train_vmax`` — the
      exact training-window census, DuckDB-replayable (same W1 window);
    - ``importance_normalized`` — MLlib normalizes featureImportances
      to sum 1 (or all-zero when no tree split); over the single
      feature that means fi in {0.0, 1.0} exactly, whatever the RNG;
    - ``train_acc_ok`` — the fitted forest's accuracy ON ITS OWN
      training window is at least the majority-class share (the
      no-skill baseline): any seed/partitioning draw that produced a
      worse-than-baseline model flips this cell and fails the hash
      gate. The testdata margin is wide (acc ~0.999 vs majority
      ~0.96 — the label is a value threshold, so the one feature
      separates cleanly); 1e-9 guards exact-tie float compares only.

    Through round 12 this row was rows-only with an RNG-dependent
    feature_importance column; the booleans replace it so every cell
    is either deterministic or a model-quality invariant, and the
    oracle asserts them TRUE (ml/forest.py ORACLE). The training
    window, census, fits, and the one union-of-transforms validation
    action all come from the shared fleet build (_contract_fleet), so
    this function does no heavy work of its own."""
    fleet = _contract_fleet(spark, sf_dir)
    acc = fleet["acc"]
    rows = []
    for k, m in sorted(fleet["models"].items()):
        fi = (
            float(m.featureImportances[0])
            if len(m.featureImportances)
            else 0.0
        )
        majority = max(acc[k].pos_share, 1.0 - acc[k].pos_share)
        rows.append(
            (
                k,
                int(m.getNumTrees),
                fi in (0.0, 1.0),
                acc[k].acc >= majority - 1e-9,
            )
        )
    facts = spark.createDataFrame(
        rows,
        "event_type STRING, num_trees BIGINT, "
        "importance_normalized BOOLEAN, train_acc_ok BOOLEAN",
    )
    # both sides are key-fleet-sized local frames; broadcast keeps the
    # plan exchange-free (plan-time SMJ would shuffle both tiny sides)
    return facts.join(F.broadcast(_train_stats(spark, sf_dir)), "event_type").select(
        "event_type",
        "num_trees",
        "n_train_rows",
        "n_train_pos",
        "train_vmin",
        "train_vmax",
        "importance_normalized",
        "train_acc_ok",
    )


PROBES = (10.0, 480.0, 166.0)  # AnalyzerSpec's sample triple


def rf_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract (oracle-checked since round 11): posterior P(anomaly)
    for the probe triple per trainable key, scored with the
    DETERMINISTIC histogram model (train_per_key_pandas's bin
    arithmetic — plain IEEE ops DuckDB replays bit-for-bit) fit on the
    SAME newest-RECENT_TRAIN_N window the forests train on. The MLlib
    forest posterior remains available as the production twin
    (:func:`rf_predict_mllib`, tolerance-banded per the reference's
    AnalyzerSpec philosophy — its RNG-dependent posteriors are why
    this row was rows-only through round 10). Key eligibility matches
    the forest path: single-class keys are skipped
    (Trainer.scala:47-49).

    Plan: the per-key window is the one exchange; the extent census,
    the per-(key,bin) census, and the probe join all reuse its
    event_type clustering (subset-key distribution), with the
    key-fleet-sized model tables broadcast."""
    from ..operators.anomaly import recent_per_key
    from ..operators.common import events

    labeled = _labeled_events(
        recent_per_key(events(spark, sf_dir), n=RECENT_TRAIN_N)
    )
    # stage the training window ONCE (round 15): it is bounded by
    # keys × RECENT_TRAIN_N rows, and both the eager extent collect
    # below and the per-(key, bin) census would otherwise each run the
    # corpus-sized recent-window pass (the q_ccnet scratch idiom —
    # contract rows must not hold persisted RDDs, test_no_cache_leak)
    import hashlib
    import os
    import tempfile

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    path = os.path.join(tempfile.gettempdir(), f"lss_rfp_{tag}", "labeled")
    labeled.select("event_type", "value", "anomaly").write.mode(
        "overwrite"
    ).parquet(path)
    labeled = spark.read.parquet(path)
    # the extent census is key-fleet-sized and feeds THREE consumers
    # (per-bin probe side, probe cross join, output counts): collect it
    # eagerly and inline as a local frame, or the adaptive plan re-runs
    # the full training window once per consumer (the playbook
    # multiple-lazy-consumers hazard — measured 3 exchanges vs 1)
    ext_rows = (
        labeled.groupBy("event_type")
        .agg(
            F.count("*").alias("n_train_rows"),
            F.sum("anomaly").cast("bigint").alias("n_train_pos"),
            F.min("value").alias("vmin"),
            ((F.max("value") + F.lit(1e-9) - F.min("value")) / N_BINS).alias(
                "width"
            ),
        )
        .where(
            (F.col("n_train_pos") > 0)
            & (F.col("n_train_pos") < F.col("n_train_rows"))
        )
        .collect()
    )
    ext_schema = (
        "event_type STRING, n_train_rows BIGINT, n_train_pos BIGINT, "
        "vmin DOUBLE, width DOUBLE"
    )
    ext = spark.createDataFrame(ext_rows, ext_schema)

    def bin_of(value_col):
        return F.least(
            F.greatest(
                F.floor((value_col - F.col("vmin")) / F.col("width")).cast(
                    "bigint"
                ),
                F.lit(0),
            ),
            F.lit(N_BINS - 1),
        )

    per_bin = (
        labeled.join(F.broadcast(ext.select("event_type", "vmin", "width")), "event_type")
        .groupBy("event_type", bin_of(F.col("value")).alias("bin"))
        .agg(
            F.count("*").alias("n_in_bin"),
            F.sum("anomaly").cast("bigint").alias("n_pos"),
        )
    )
    probes = spark.createDataFrame([(v,) for v in PROBES], "value DOUBLE")
    scored = (
        ext.crossJoin(F.broadcast(probes))
        .withColumn("bin", bin_of(F.col("value")))
        .join(F.broadcast(per_bin), ["event_type", "bin"], "left")
    )
    return scored.select(
        "event_type",
        "value",
        F.coalesce(
            F.col("n_pos").cast("double") / F.col("n_in_bin"), F.lit(0.0)
        ).alias("p_anomaly"),
        (F.col("value") > F.lit(LABEL_THRESHOLD)).alias("above_threshold"),
        "n_train_rows",
        "n_train_pos",
    )


def rf_predict_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production twin of :func:`rf_predict`: the MLlib forest
    posterior (rows-only by MLlib RNG; tolerance goldens in
    tests/test_ml.py)."""
    models = _contract_models(spark, sf_dir)
    probes = spark.createDataFrame([(v,) for v in PROBES], "value DOUBLE")
    outs = []
    for key, model in sorted(models.items()):
        scored = predict_posterior(model, probes).select(
            F.lit(key).alias("event_type"), "value", "p_anomaly"
        )
        outs.append(scored)
    if not outs:
        return spark.createDataFrame(
            [],
            "event_type STRING, value DOUBLE, p_anomaly DOUBLE, "
            "above_threshold BOOLEAN, n_train_rows BIGINT, n_train_pos BIGINT",
        )
    from functools import reduce

    scored = reduce(DataFrame.unionByName, outs)
    stats = _train_stats(spark, sf_dir).select(
        "event_type", "n_train_rows", "n_train_pos"
    )
    return scored.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "value",
        "p_anomaly",
        (F.col("value") > F.lit(LABEL_THRESHOLD)).alias("above_threshold"),
        "n_train_rows",
        "n_train_pos",
    )


def q_histogram_models(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract: the scalable many-models path — oracle-checked since
    the histogram learner is deterministic (its bin arithmetic is plain
    IEEE-double ops DuckDB reproduces exactly)."""
    from ..operators.common import events

    labeled = _labeled_events(events(spark, sf_dir))
    return train_per_key_pandas(labeled)


# q_rf_train graduated from rows-only in round 13: its cells are the
# deterministic training-window census + config constants + model
# invariants the query itself verifies (see rf_train docstring), so
# the oracle replays the census and asserts the invariants TRUE — a
# regressed model flips a boolean and fails the hash, exactly the
# q_approx_distinct_users pattern. q_rf_predict scores with the
# deterministic histogram model since round 11 and is fully
# oracle-checked, with the MLlib posterior kept as the
# tolerance-banded production twin (rf_predict_mllib).
ORACLE: dict[str, str] = {
    "q_rf_train": f"""
WITH recent AS (
  SELECT event_type, value,
         row_number() OVER (
           PARTITION BY event_type
           ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
), lab AS (
  SELECT event_type, value,
         CASE WHEN value > {LABEL_THRESHOLD} THEN 1 ELSE 0 END AS anomaly
  FROM recent WHERE rn <= {RECENT_TRAIN_N}
)
SELECT event_type,
       CAST({N_TREES} AS BIGINT) AS num_trees,
       CAST(count(*) AS BIGINT) AS n_train_rows,
       CAST(sum(anomaly) AS BIGINT) AS n_train_pos,
       round(min(value), 6) AS train_vmin,
       round(max(value), 6) AS train_vmax,
       TRUE AS importance_normalized,
       TRUE AS train_acc_ok
FROM lab GROUP BY event_type
HAVING sum(anomaly) > 0 AND sum(anomaly) < count(*)
""",
    "q_rf_predict": f"""
WITH recent AS (
  SELECT event_type, value,
         row_number() OVER (
           PARTITION BY event_type
           ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
), lab AS (
  SELECT event_type, value,
         CASE WHEN value > {LABEL_THRESHOLD} THEN 1 ELSE 0 END AS anomaly
  FROM recent WHERE rn <= {RECENT_TRAIN_N}
), ext AS (
  SELECT event_type,
         count(*) AS n_train_rows,
         sum(anomaly) AS n_train_pos,
         min(value) AS vmin,
         (max(value) + 1e-9 - min(value)) / {N_BINS}.0 AS width
  FROM lab GROUP BY event_type
  HAVING sum(anomaly) > 0 AND sum(anomaly) < count(*)
), per_bin AS (
  SELECT l.event_type,
         LEAST(GREATEST(CAST(floor((l.value - e.vmin) / e.width) AS BIGINT),
                        0), {N_BINS - 1}) AS bin,
         count(*) AS n_in_bin,
         sum(l.anomaly) AS n_pos
  FROM lab l JOIN ext e USING (event_type)
  GROUP BY 1, 2
), probes AS (
  SELECT unnest([{", ".join(f"CAST({v} AS DOUBLE)" for v in PROBES)}]) AS value
)
SELECT e.event_type,
       p.value,
       COALESCE(CAST(b.n_pos AS DOUBLE) / b.n_in_bin, 0.0) AS p_anomaly,
       p.value > {LABEL_THRESHOLD} AS above_threshold,
       CAST(e.n_train_rows AS BIGINT) AS n_train_rows,
       CAST(e.n_train_pos AS BIGINT) AS n_train_pos
FROM ext e
CROSS JOIN probes p
LEFT JOIN per_bin b
  ON b.event_type = e.event_type
 AND b.bin = LEAST(GREATEST(CAST(floor((p.value - e.vmin) / e.width)
                                 AS BIGINT), 0), {N_BINS - 1})
""",
    "q_histogram_models": f"""
WITH lab AS (
  SELECT event_type, value,
         CASE WHEN value > {LABEL_THRESHOLD} THEN 1 ELSE 0 END AS anomaly
  FROM events
), ext AS (
  SELECT event_type,
         count(*) AS n_rows,
         min(value) AS vmin,
         (max(value) + 1e-9 - min(value)) / 20.0 AS width
  FROM lab GROUP BY event_type
), binned AS (
  SELECT l.event_type,
         LEAST(GREATEST(CAST(floor((l.value - e.vmin) / e.width) AS BIGINT), 0), 19) AS bin,
         l.anomaly
  FROM lab l JOIN ext e USING (event_type)
), per_bin AS (
  SELECT event_type, bin, count(*) AS n_in_bin, sum(anomaly) AS n_pos
  FROM binned GROUP BY event_type, bin
), grid AS (
  SELECT e.event_type, e.n_rows, e.vmin, e.width, gs.bin
  FROM ext e CROSS JOIN (SELECT unnest(generate_series(0, 19)) AS bin) gs
)
SELECT g.event_type,
       CAST(g.bin AS BIGINT) AS bin,
       g.vmin + g.bin * g.width AS bin_lo,
       CAST(g.n_rows AS BIGINT) AS n_rows,
       CAST(COALESCE(p.n_in_bin, 0) AS BIGINT) AS n_in_bin,
       CAST(COALESCE(p.n_pos, 0) AS BIGINT) AS n_pos,
       CASE WHEN COALESCE(p.n_in_bin, 0) > 0
            THEN CAST(p.n_pos AS DOUBLE) / p.n_in_bin ELSE 0.0 END AS posterior
FROM grid g LEFT JOIN per_bin p USING (event_type, bin)
"""
}

QUERIES = {
    "q_rf_train": rf_train,
    "q_rf_predict": rf_predict,
    "q_histogram_models": q_histogram_models,
}
