"""Streaming curation gate: the ingest-path filter chain composed in
ONE foreachBatch handler — what a live corpus intake runs on every
micro-batch before anything lands in the training store:

  a. blocklist       operators/blocklist.blocklist_filter — drop docs
                     containing banned phrases (stateless)
  b. PII redaction   operators/curation.redact_pii — rewrite emails/
                     IPs/phones/SSNs to typed tokens (stateless)
  c. substring scrub incremental_substring.scrub_batch — excise
                     passages duplicated against everything ingested
                     so far (+ within batch); the persisted gram-count
                     index is the cross-batch state, with the replay
                     marker riding INSIDE the versioned count MERGE
                     (the scrub_sink recipe: warehouse.version_meta)
  d. quality route   classifier.score_nb via load_nb_model — keep vs
                     quarantine under batch=<id> overwrite sinks
                     (structurally idempotent), per-batch audit row

Stages a/b/d are stateless or read-only per batch, so their replays
are safe by construction; only stage c mutates cross-batch state.
Stage d runs BEFORE stage c's commit (scrub_batch's pre_commit hook),
so there is no window where the merge has landed but the routed
output has not: a crash before the merge replays the whole batch
against the unchanged index (same spans, overwrite sinks rewrite in
place); a crash after the merge is skipped by the marker, and every
earlier effect already ran. The model and the gram index are both
versioned pointer-swap stores — refreshing either between batches is
safe.

tests/test_streaming_curation.py drives two waves: a blocklisted doc
never reaches any sink, PII is rewritten in the kept output, a
passage seen in wave 1 is excised from its wave-2 copy on arrival,
and the kept/quarantined split equals the batch operators applied by
hand.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def curation_sink(
    stream: DataFrame,
    state_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    phrases: list[str],
    threshold: float = 0.0,
    nb_n: int = 2,
    min_len: int = 20,
    min_count: int = 2,
    trigger_available_now: bool = True,
):
    """Start the gate over a (doc_id, text) stream; returns the
    StreamingQuery. State layout under ``state_dir``: ``substr_index``
    (gram counts, versioned) and ``quality_model`` (the nb_commit
    layout). Outputs under ``out_dir``: ``keep/batch=<id>``,
    ``quarantine/batch=<id>``, ``metrics/batch=<id>``."""
    # bind imports once here rather than per batch inside the handler
    # (foreachBatch handlers run on the driver — no cloudpickle
    # self-containment concern)
    from lambda_sample_spark.operators.blocklist import blocklist_filter
    from lambda_sample_spark.operators.classifier import (
        load_nb_model,
        score_nb,
    )
    from lambda_sample_spark.operators.curation import redact_pii
    from lambda_sample_spark.operators.incremental_substring import (
        scrub_batch,
    )
    from lambda_sample_spark.operators.substring import remove_dup_spans
    from lambda_sample_spark.streaming.quality import route_quality
    from lambda_sample_spark.streaming.substring_scrub import (
        batch_committed,
        run_token,
    )

    index_root = os.path.join(state_dir, "substr_index")
    counts_root = os.path.join(index_root, "gram_counts")
    model_dir = os.path.join(state_dir, "quality_model")
    token = run_token(checkpoint_dir, suffix="_curation_token")

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # stage-c idempotence (the scrub_sink recipe): the marker rides
        # inside the versioned count merge; "merged" implies stage d's
        # routed output landed too (routing runs in pre_commit below)
        if batch_committed(counts_root, token, batch_id):
            return
        docs = batch_df.select("doc_id", "text")
        if not docs.take(1):
            return
        # a. + b. stateless filters (an EMPTY blocklist is a valid
        # 'PII+scrub+quality only' config — blocklist_hits rejects it,
        # so gate the stage rather than crash every batch)
        if phrases:
            docs = blocklist_filter(docs, phrases)
        docs = redact_pii(docs, count_hits=False)

        def route(final_docs: DataFrame) -> None:
            # d. quality route against the current model version (the
            # shared routing/audit tail — streaming/quality.
            # route_quality; batch=<id> overwrite sinks, replay-safe)
            weights, consts = load_nb_model(spark, model_dir)
            scored = score_nb(final_docs, weights, consts, n=nb_n).join(
                final_docs, "doc_id"
            )
            route_quality(scored, out_dir, batch_id, threshold)

        # c. stateful passage scrub: route the scrubbed docs BEFORE the
        # count merge commits, marker inside the commit
        if docs.take(1):
            scrub_batch(
                spark, index_root, docs, min_len=min_len,
                min_count=min_count,
                log_label=f"{token}-{batch_id}",
                commit_meta=f"{token}:{batch_id}",
                pre_commit=lambda spans: route(
                    remove_dup_spans(docs, spans)
                ),
            )
        else:
            route(docs)

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
