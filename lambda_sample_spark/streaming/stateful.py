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
                values.append(float(v))
                ts_ms.append(int(ts))

        # newest-N by timestamp (stable for equal ts: later arrival wins)
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
