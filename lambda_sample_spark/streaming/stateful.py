"""Stateful streaming fast-anomaly: the per-key COUNT-based window
kept in operator state (SURVEY.md §7 Phase 4 hard part (a)).

The reference re-reads its store every trigger (CassandraClient.scala:
23-25 feeding Analyzer.scala:47-59) — that recompute-per-trigger
formulation is streaming/pipeline.py. This module is the stateful
alternative: ``applyInPandasWithState`` keeps each sensor's newest-N
ring buffer in Spark-managed state, so a trigger touches only the new
rows instead of rescanning the store.

Scale notes: state is partitioned by sensor key across executors and
checkpointed; per-key state is bounded (N values, ~1.6 KB at N=200),
so total state = O(#keys * N) regardless of stream length. This is the
formulation that survives unbounded streams at cluster scale; the
recompute variant's trigger cost grows with store size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout

RECENT_N = 200

OUTPUT_SCHEMA = (
    "sensor STRING, n BIGINT, avg_value DOUBLE, sd_value DOUBLE, "
    "latest_value DOUBLE, fast_anomaly DOUBLE"
)
STATE_SCHEMA = "values ARRAY<DOUBLE>, ts_ms ARRAY<LONG>"


def stateful_fast_anomaly(entries_stream: DataFrame, recent_n: int = RECENT_N) -> DataFrame:
    """Wire the stateful window over a streaming (sensor, ts, value)
    frame; emits one updated analysis row per sensor per trigger.

    The update function is a closure (not a module-level function) so
    cloudpickle ships it BY VALUE: executor Python workers never need
    this package importable — required because the driver contract runs
    under an external harness whose workers don't share our sys.path.
    """
    from pyspark.sql import functions as F

    def update_window(key, pdfs, state):
        """Fold new rows into the per-sensor newest-N ring buffer and
        emit one analysis row (the reference's A5 aggregate:
        population stddev + ((|latest-avg|)-sd)/(2sd) clamped to [0,1],
        Analyzer.scala:47-59; NULL where sd == 0)."""
        import pandas as pd

        if state.exists:
            (values, ts_ms) = state.get
            values, ts_ms = list(values), list(ts_ms)
        else:
            values, ts_ms = [], []

        for pdf in pdfs:
            for ts, v in zip(pdf["ts_ms"], pdf["value"]):
                # NULL/NaN guard (the layer-wide contract the bottom-k
                # twin already enforces): a corrupt payload's NULL
                # value arrives as NaN and would poison avg/sd to NaN
                # — and min(1.0, nan) is 1.0 in Python, a spurious
                # MAXIMUM anomaly score; a NULL ts would crash int()
                if v is None or v != v or ts is None or ts != ts:
                    continue
                values.append(float(v))
                ts_ms.append(int(ts))

        if not values:
            state.update((values, ts_ms))
            return

        # newest-N by timestamp (stable for equal ts: later arrival
        # wins). Documented divergence from the recompute twin: the
        # snapshot path breaks ms-truncated ts ties by VALUE (it has
        # no arrival order to use), so on tie-bearing input the two
        # formulations may score a different "latest" — at the
        # designed ingest rates (sensor, ts) is unique and they agree
        order = sorted(range(len(ts_ms)), key=lambda i: (ts_ms[i], i))[-recent_n:]
        values = [values[i] for i in order]
        ts_ms = [ts_ms[i] for i in order]
        state.update((values, ts_ms))

        n = len(values)
        avg = sum(values) / n
        sd = (sum((v - avg) ** 2 for v in values) / n) ** 0.5  # population
        latest = values[-1]
        if sd == 0:
            score = None
        else:
            score = max(0.0, min(1.0, (abs(latest - avg) - sd) / (2 * sd)))
        yield pd.DataFrame(
            {
                "sensor": [key[0]],
                "n": [n],
                "avg_value": [avg],
                "sd_value": [sd],
                "latest_value": [latest],
                "fast_anomaly": [score],
            }
        )

    prepared = entries_stream.select(
        "sensor", F.unix_millis("ts").alias("ts_ms"), "value"
    )
    return prepared.groupBy("sensor").applyInPandasWithState(
        update_window,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


BOTTOMK_OUT_SCHEMA = (
    "window_start_ms LONG, event_type STRING, event_id LONG, "
    "value DOUBLE, h STRING"
)
# vnull carries value's NULL mask explicitly: Arrow->pandas floats
# can't distinguish NULL from NaN, and the emitted sample must keep
# NULLs as NULLs so the downstream sample median (which skips NULLs)
# sees what a batch-built sample would
BOTTOMK_STATE_SCHEMA = (
    "hs ARRAY<STRING>, ids ARRAY<LONG>, vals ARRAY<DOUBLE>, "
    "vnull ARRAY<BOOLEAN>"
)


def stateful_windowed_bottomk(
    events_stream: DataFrame,
    k: int | None = None,
    window_minutes: int = 10,
    watermark_delay: str = "5 minutes",
) -> DataFrame:
    """Fixed-SIZE uniform sample per event-time window on an unbounded
    stream — the stateful complement to the stateless fixed-RATE
    ``watermark.hash_sampled_stream``, and the streaming twin of the
    batch bottom-k sketch (operators/multidim.py, whose BOTTOMK_K is
    the shared default so the two layers' k cannot drift): keep the k
    rows with the smallest md5(event_id) per (window, event_type) in
    Spark-managed state (EXACTLY k rows per group — bounded no matter
    the window's volume), emit the FINAL sample exactly once when the
    watermark closes the window (EventTimeTimeout), then evict the
    state. Append-mode output: sinks see one finished sample per
    window, identical to what the batch _bottomk computes over the
    same rows (tested).

    NULL handling follows the layer-wide contract: NULL-keyed (or
    NULL-timestamped) rows are excluded up front — the batch sketch's
    NULLS LAST pin keeps them out of every sample too — while NULL
    VALUES stay in the sample as NULLs (a value-NULL row still owns
    its hash slot, exactly as in the batch window). To roll stream
    sink rows up with ``bottomk_merge``, convert them to the batch
    sketch schema first with ``stream_samples_as_sketch``.
    """
    from pyspark.sql import functions as F

    from ..operators.multidim import BOTTOMK_K

    if k is None:
        k = BOTTOMK_K
    window_ms = window_minutes * 60_000

    def update(key, pdfs, state):
        import pandas as pd

        wstart_ms, etype = key
        if state.hasTimedOut:
            # state arrays are stored in (h, id) keep-order — emit as-is
            hs, ids, vals, vnull = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "window_start_ms": [int(wstart_ms)] * len(hs),
                    "event_type": [etype] * len(hs),
                    "event_id": [int(i) for i in ids],
                    # object column: None survives to SQL NULL, floats
                    # stay doubles
                    "value": pd.Series(
                        [None if n else float(v) for v, n in zip(vals, vnull)],
                        dtype=object,
                    ),
                    "h": list(hs),
                }
            )
            return
        if state.exists:
            hs, ids, vals, vnull = (list(c) for c in state.get)
        else:
            hs, ids, vals, vnull = [], [], [], []
        for pdf in pdfs:
            isna = pdf["value"].isna()
            for h, i, v, n in zip(
                pdf["h"], pdf["event_id"], pdf["value"], isna
            ):
                hs.append(str(h))
                ids.append(int(i))
                vals.append(0.0 if n else float(v))
                vnull.append(bool(n))
        keep = sorted(range(len(hs)), key=lambda j: (hs[j], ids[j]))[:k]
        state.update(
            (
                [hs[j] for j in keep],
                [ids[j] for j in keep],
                [vals[j] for j in keep],
                [vnull[j] for j in keep],
            )
        )
        # fire when the watermark passes the window end
        state.setTimeoutTimestamp(int(wstart_ms) + window_ms)
        return

    prepared = (
        events_stream.withWatermark("ts", watermark_delay)
        # NULL-keyed / NULL-timestamped rows are not sampleable (the
        # layer contract); dropping them here also keeps the update fn
        # free of NaN-id crashes
        .where(F.col("ts").isNotNull() & F.col("event_id").isNotNull())
        .select(
            "ts",
            F.unix_millis(
                F.window("ts", f"{window_minutes} minutes").start
            ).alias("wstart_ms"),
            "event_type",
            "event_id",
            "value",
            F.md5(F.col("event_id").cast("string")).alias("h"),
        )
    )
    return prepared.groupBy("wstart_ms", "event_type").applyInPandasWithState(
        update,
        outputStructType=BOTTOMK_OUT_SCHEMA,
        stateStructType=BOTTOMK_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def stream_samples_as_sketch(samples: DataFrame) -> DataFrame:
    """Adapt stream-built sample sink rows (window_start_ms LONG) to
    the batch sketch schema (bucket TIMESTAMP, event_type, event_id,
    value, h) so ``operators.multidim.bottomk_merge`` consumes them
    directly; unix_millis/timestamp_millis round-trip exactly."""
    from pyspark.sql import functions as F

    return samples.select(
        F.timestamp_millis("window_start_ms").alias("bucket"),
        "event_type",
        "event_id",
        "value",
        "h",
    )
