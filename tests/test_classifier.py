"""Model-quality pins for the fastText-family classifier
(operators/classifier.py). The contract row q_nb_quality certifies the
train→persist→score machinery cell-exactly vs DuckDB (the driver
corpus has no learnable lang signal — measured in the module
docstring); THESE tests certify the models actually learn, on a
planted separable corpus: positive docs draw from a shifted
vocabulary, so a working linear model must hit near-perfect held-out
accuracy, and a broken one (wrong smoothing sign, swapped classes,
prior bug) lands near chance."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from lambda_sample_spark.operators import classifier as C

POS_VOCAB = [f"pos{i}" for i in range(20)]
NEG_VOCAB = [f"neg{i}" for i in range(20)]
SHARED = [f"common{i}" for i in range(20)]


def _planted_docs(spark, n_docs: int = 300, words_per_doc: int = 40):
    """Deterministic labeled corpus: doc i is positive iff i % 2 == 0;
    each doc mixes class vocabulary with shared words 70/30."""
    rng = random.Random(7)
    rows = []
    for i in range(n_docs):
        pos = i % 2 == 0
        vocab = POS_VOCAB if pos else NEG_VOCAB
        words = [
            rng.choice(vocab) if rng.random() < 0.7 else rng.choice(SHARED)
            for _ in range(words_per_doc)
        ]
        rows.append((i, " ".join(words), 1 if pos else 0))
    return spark.createDataFrame(rows, "doc_id long, text string, y int")


@pytest.fixture(scope="module")
def planted(spark):
    return _planted_docs(spark).cache()


def test_nb_learns_planted_split(spark, planted):
    train = planted.where(F.col("doc_id") % 10 < 8)
    weights, consts = C.train_nb(train, F.col("y") == 1, n=1)
    scored = C.score_nb(
        planted, weights, consts, n=1, extra_cols=("y",)
    ).where(F.col("doc_id") % 10 >= 8)
    rows = scored.collect()
    assert len(rows) == 60
    acc = sum(1 for r in rows if r["pred"] == r["y"]) / len(rows)
    assert acc >= 0.9, f"held-out accuracy {acc}"


def test_nb_model_artifact_bounded(spark, planted):
    weights, consts = C.train_nb(planted, F.col("y") == 1, n=1)
    assert weights.count() <= C.N_BUCKETS
    crow = consts.collect()
    assert len(crow) == 1
    # unseen-bucket default equals the ratio formula at c1=c0=0
    # (ln((t0+B)/(t1+B))): more negative-class tokens => positive w_def
    assert set(crow[0].asDict()) == {"bias", "w_def"}


def test_nb_persisted_model_scores_identically(spark, planted, tmp_path):
    weights, consts = C.train_nb(planted, F.col("y") == 1, n=1)
    weights.write.parquet(str(tmp_path / "w"))
    consts.write.parquet(str(tmp_path / "c"))
    w2 = spark.read.parquet(str(tmp_path / "w"))
    c2 = spark.read.parquet(str(tmp_path / "c"))
    direct = C.score_nb(planted, weights, consts, n=1).collect()
    reloaded = C.score_nb(planted, w2, c2, n=1).collect()
    key = lambda r: r["doc_id"]  # noqa: E731
    assert sorted(direct, key=key) == sorted(reloaded, key=key)


def test_lr_planted_auc_and_roundtrip(spark, planted, tmp_path):
    from pyspark.ml.classification import LogisticRegressionModel
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    train = planted.where(F.col("doc_id") % 10 < 8)
    model = C.train_lr(train, F.col("y") == 1, n=1)
    heldout = C.bag_vectors(
        planted.where(F.col("doc_id") % 10 >= 8), F.col("y") == 1, n=1
    )
    pred = model.transform(heldout)
    auc = BinaryClassificationEvaluator(labelCol="y").evaluate(pred)
    assert auc >= 0.95, f"held-out AUC {auc}"

    path = str(tmp_path / "lr_model")
    model.save(path)
    again = LogisticRegressionModel.load(path).transform(heldout)
    a = {r["doc_id"]: r["prediction"] for r in pred.collect()}
    b = {r["doc_id"]: r["prediction"] for r in again.collect()}
    assert a == b


def test_incremental_update_equals_full_retrain(spark, planted, tmp_path):
    """The X14 steady-state story for the classifier: censuses are
    exact integers, so batch-merged sufficient statistics derive the
    IDENTICAL model a full retrain over everything produces."""
    model_dir = str(tmp_path / "inc_model")
    b1 = planted.where("doc_id < 100")
    b2 = planted.where("doc_id >= 100 AND doc_id < 200")
    b3 = planted.where("doc_id >= 200")

    C.nb_commit(spark, model_dir, *C.nb_census(b1, F.col("y") == 1, n=1))
    C.nb_update(spark, model_dir, b2, F.col("y") == 1, n=1)
    C.nb_update(spark, model_dir, b3, F.col("y") == 1, n=1)

    w_inc, c_inc = C.load_nb_model(spark, model_dir)
    w_full, c_full = C.train_nb(planted, F.col("y") == 1, n=1)
    key = lambda r: r["bucket"]  # noqa: E731
    assert sorted(w_inc.collect(), key=key) == sorted(
        w_full.collect(), key=key
    )
    assert c_inc.collect() == c_full.collect()
    # three commits -> version 3 of every table
    from lambda_sample_spark.sources.warehouse import current_version

    assert current_version(model_dir) == 3

    # scoring through the versioned loader equals scoring the frames
    a = C.score_nb(planted, w_inc, c_inc, n=1).collect()
    b = C.score_nb(planted, w_full, c_full, n=1).collect()
    k2 = lambda r: r["doc_id"]  # noqa: E731
    assert sorted(a, key=k2) == sorted(b, key=k2)


def test_quality_sink_reads_versioned_model(spark, planted, tmp_path):
    from lambda_sample_spark.streaming.quality import quality_sink

    model_dir = str(tmp_path / "v_model")
    C.nb_commit(
        spark, model_dir, *C.nb_census(planted, F.col("y") == 1, n=1)
    )
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    planted.select("doc_id", "text").write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = quality_sink(stream, model_dir, out, str(tmp_path / "ckpt"), n=1)
    q.awaitTermination(120)
    kept = spark.read.parquet(f"{out}/keep/*")
    quar = spark.read.parquet(f"{out}/quarantine/*")
    assert kept.count() + quar.count() == planted.count()


def test_bag_vectors_slot_alignment(spark):
    """Review catch: element_at on a MAP is by key, not position —
    bucket b's count must land in feature slot b exactly."""
    docs = spark.createDataFrame(
        [(1, "alpha alpha beta")], "doc_id long, text string"
    )
    from lambda_sample_spark.operators.dsir import _bucketed_grams

    buckets = [
        r["bucket"]
        for r in _bucketed_grams(
            docs, "doc_id", "text", 1, 16, "xxhash64"
        ).collect()
    ]
    vec = C.bag_vectors(docs, n=1, n_buckets=16).collect()[0][
        "features"
    ].toArray()
    import collections

    expect = collections.Counter(buckets)
    for b in range(16):
        assert vec[b] == float(expect.get(b, 0)), (b, vec.tolist(), expect)
