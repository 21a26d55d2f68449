"""Steady-state NIGHTLY ingest: the incremental operators of this
repo composed into one flow — what a production corpus pipeline runs
per arriving batch, with every piece of state persisted and bounded
by batch size (never corpus size):

  1. near-dup gate      incremental_dedup.ingest_batch — minhash the
                        batch, match vs the PERSISTED band index +
                        within-batch, commit survivors' bands as the
                        next index version
  1b. substring scrub   incremental_substring.scrub_batch — excise
                        passages duplicated vs the persisted
                        gram-count index (+ within batch), commit the
                        batch's counts (round 10)
  2. cluster upkeep     graph.cc_ingest — fold the batch's (doc, rep)
                        near-dup edges into the persisted (node, comp)
                        labeling; new isolated docs registered first
  3. corpus upsert      warehouse.merge_versioned — survivors land in
                        the hash-bucketed versioned store; only
                        touched buckets rewrite, the rest hardlink
  4. ANN upkeep         pq.ivfpq_write_index on night one, then
                        pq.ivfpq_append_index — frozen centroids +
                        codebooks, append-only cluster cells (retrain
                        on periodic full rebuilds, the FAISS practice)
  5. model refresh      classifier.nb_update — the night's survivors
                        fold into the quality model's exact-integer
                        sufficient statistics; refreshed ≡ full
                        retrain, versioned pointer-swap commit
                        (round 10)

Each stage is idempotent-ish state machinery a real pipeline keeps:
the minhash index, the cluster labels, the corpus table and the ANN
index all survive the process and tomorrow's batch picks them up.
tests/test_nightly_ingest.py pins the composition's guarantees: the
labels equal a full CC recompute over every ingested edge; the corpus
is a consistent SUPERSET of the one-shot survivors (the survivor-only
band index dedups each batch against KEPT docs, so a transitive
near-dup chain split across nights can keep a tail member the
one-shot run drops — bounded, and every surplus doc is a
one-shot-flagged dup); the ANN index stays in lockstep with the
corpus and serves every night's rows.

Run: python examples/nightly_ingest.py [sf_dir] [state_dir]
(defaults: /root/testdata/sf0.001, a temp dir; splits documents into
3 "nights" by doc_id and prints per-night survivor/cluster counts).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from lambda_sample_spark.operators import incremental_dedup as inc  # noqa: E402
from lambda_sample_spark.operators.incremental_substring import (  # noqa: E402
    scrub_batch,
)
from lambda_sample_spark.operators.substring import (  # noqa: E402
    remove_dup_spans,
)
from lambda_sample_spark.operators.graph import (  # noqa: E402
    cc_ingest,
    connected_components,
    unpersist_checkpoint,
)
from lambda_sample_spark.operators.pq import (  # noqa: E402
    ivfpq_append_index,
    ivfpq_write_index,
)
from lambda_sample_spark.sources.warehouse import (  # noqa: E402
    current_version,
    merge_versioned,
    read_versioned,
    write_versioned,
)


def nightly_ingest(
    spark: SparkSession,
    state_dir: str,
    docs_batch: DataFrame,
    emb_batch: DataFrame | None = None,
    n_buckets: int = 8,
    night_id: str | None = None,
) -> dict:
    """One night: ingest ``docs_batch`` (doc_id, text) and optionally
    ``emb_batch`` (vec_id, vec — embeddings of the batch docs) against
    the persisted state under ``state_dir``. Returns per-stage counts.

    ``night_id`` (a stable orchestrator-assigned run key) makes the
    ANN append replay-safe: a retried night re-links the same staged
    files instead of appending duplicates (pq.ivfpq_append_index
    batch_token). Whole-night replay idempotence for the OTHER stages
    is the orchestrator's checkpointing job (the streaming legs carry
    their own markers — see streaming/substring_scrub.py).
    """
    index_root = os.path.join(state_dir, "minhash_index")
    corpus_root = os.path.join(state_dir, "corpus")
    labels_root = os.path.join(state_dir, "labels")
    ann_root = os.path.join(state_dir, "ann_index")

    # 1. near-dup gate against the persisted index (+ within batch)
    flags = inc.ingest_batch(spark, index_root, docs_batch)
    survivors = docs_batch.join(
        flags.where(~F.col("is_near_dup")).select("doc_id"), "doc_id"
    )

    # 1b. exact-substring scrub at ingest (round 10): flag passages of
    # the survivors duplicated against everything ingested so far (+
    # within batch) via the persisted gram-count index, excise them
    # before the corpus upsert, and commit the batch's gram counts so
    # tomorrow's copy of the same passage is caught on arrival. Doc
    # ids are untouched (texts shrink; a fully-boilerplate doc stores
    # as empty rather than vanishing — downstream stages own the drop
    # decision).
    spans = scrub_batch(
        spark, os.path.join(state_dir, "substr_index"), survivors
    )
    n_scrubbed_docs = spans.select("doc_id").distinct().count()
    survivors = remove_dup_spans(survivors, spans)

    # 2. cluster-label upkeep: register the batch's nodes, then fold
    # the night's (doc -> kept rep) edges in. The labeling is a
    # versioned table like everything else.
    edges = flags.where(F.col("is_near_dup")).select(
        F.col("doc_id").alias("src"), F.col("rep_id").alias("dst")
    )
    if current_version(labels_root) is None:
        labels = connected_components(
            edges, nodes=docs_batch.select("doc_id")
        )
    else:
        prev = read_versioned(spark, labels_root)
        fresh = (
            docs_batch.select(F.col("doc_id").alias("node"))
            .join(prev.select("node"), "node", "left_anti")
            .withColumn("comp", F.col("node"))
        )
        labels = cc_ingest(prev.unionByName(fresh), edges)
    write_versioned(labels.select("node", "comp"), labels_root)
    unpersist_checkpoint(labels)  # rounds ran on localCheckpoint
    labels = read_versioned(spark, labels_root)

    # 3. corpus upsert: survivors only; bounded-work bucketed MERGE
    merge_versioned(
        spark, corpus_root, survivors, keys=["doc_id"], n_buckets=n_buckets
    )

    # 4. ANN upkeep over the survivors' embeddings
    n_appended = 0
    if emb_batch is not None:
        emb_surv = emb_batch.join(
            survivors.select(F.col("doc_id").alias("vec_id")), "vec_id"
        )
        if not os.path.isdir(os.path.join(ann_root, "centroids")):
            ivfpq_write_index(emb_surv, ann_root)
        else:
            ivfpq_append_index(emb_surv, ann_root, batch_token=night_id)
        n_appended = emb_surv.count()

    # 5. quality-model refresh (round 10): fold the night's survivors
    # into the NB classifier's sufficient statistics — exact-integer
    # census merge, so the refreshed model equals a full retrain over
    # every night so far; the streaming/quality.py filter hot-swaps to
    # the committed version on its next batch. Weak label: the even
    # doc_id split (stands in for provenance labels a real run has).
    from lambda_sample_spark.operators.classifier import (
        has_nb_model,
        nb_census,
        nb_commit,
        nb_update,
    )

    model_root = os.path.join(state_dir, "quality_model")
    lbl = F.col("doc_id") % 2 == 0
    # has_nb_model, NOT a bare current_version check: a model committed
    # under the legacy per-table layout has no model-level pointer, and
    # the pointer test alone would take the fresh-train branch —
    # silently discarding the accumulated census (nb_update handles
    # every layout and its nb_commit migrates to the current one)
    if not has_nb_model(model_root):
        nb_commit(spark, model_root, *nb_census(survivors, lbl, n=1))
    else:
        nb_update(spark, model_root, survivors, lbl, n=1)

    return {
        "batch": flags.count(),
        "scrubbed_docs": n_scrubbed_docs,
        "survivors": survivors.count(),
        "clusters": labels.select("comp").distinct().count(),
        "corpus": read_versioned(spark, corpus_root).count(),
        "ann_appended": n_appended,
    }


def main() -> None:
    import tempfile

    from lambda_sample_spark.io import load_table
    from lambda_sample_spark.functions.vectors import as_double
    from lambda_sample_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    state = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="nightly_")
    spark = get_spark(app_name="nightly-ingest")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("vec")
    )
    cuts = [0, 170, 340, 10**9]
    for night in range(3):
        lo, hi = cuts[night], cuts[night + 1]
        stats = nightly_ingest(
            spark,
            state,
            docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)),
            emb.where((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)),
        )
        print(f"night {night}: {stats}")
    spark.stop()


if __name__ == "__main__":
    main()
