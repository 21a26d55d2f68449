"""Round-9 additions: robust (median/MAD) outlier census and the
inverted-index build — crafted-data semantics + contract rows vs
their DuckDB oracles."""

from __future__ import annotations

from lambda_sample_spark.operators.anomaly import (
    ORACLE as ANOMALY_ORACLE,
    robust_zscore,
)
from lambda_sample_spark.operators.behavior import (
    ORACLE as BEHAVIOR_ORACLE,
    markov_transitions,
    q_markov_transitions,
)
from lambda_sample_spark.operators.text import (
    ORACLE as TEXT_ORACLE,
    inverted_index,
    q_inverted_index,
)
from tests.conftest import SMOKE_SF_DIR
from tests.oracle_harness import compare, duckdb_con


def test_robust_zscore_resists_the_outlier(spark, tmp_path):
    # values 1..9 plus a wild 100: median 5.5, MAD 2.5, threshold
    # 4.4478*2.5 = 11.1195 -> ONLY the wild value is flagged. The
    # mean/stddev sweep would have been dragged toward the outlier.
    import pandas as pd

    rows = [(i, "2024-01-01", 1, "a", float(v), "{}")
            for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 100])]
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).assign(ts=pd.Timestamp("2024-01-01")).to_parquet(
        tmp_path / "events.parquet"
    )
    out = robust_zscore(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["median"] == 5.5 and r["mad"] == 2.5 and r["n_outliers"] == 1


def test_markov_per_user_and_ties(spark):
    from datetime import datetime

    # user 1: A->B->A; user 2: B (no transition); transitions never
    # cross users. Same-ms tie broken by event_id (2 before 3).
    ev = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 0, 0, 1), 1, "A", 0.0, "{}"),
            (2, datetime(2024, 1, 1, 0, 0, 2), 1, "B", 0.0, "{}"),
            (3, datetime(2024, 1, 1, 0, 0, 2), 1, "A", 0.0, "{}"),
            (4, datetime(2024, 1, 1, 0, 0, 9), 2, "B", 0.0, "{}"),
        ],
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING",
    )
    got = {
        (r["src"], r["dst"]): (r["n_trans"], r["prob"])
        for r in markov_transitions(ev).collect()
    }
    assert got == {("A", "B"): (1, 1.0), ("B", "A"): (1, 1.0)}


def test_inverted_index_caps_postings_before_collect(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a c"), (3, "a")],
        "doc_id BIGINT, text STRING",
    )
    out = {
        r["term"]: (r["df"], r["postings"])
        for r in inverted_index(docs, min_df=2, k=2).collect()
    }
    # df counts ALL 3 docs; postings capped at k=2 lowest doc ids;
    # singleton terms (b, c) fall below min_df
    assert out == {"a": (3, "1,2")}


def test_contract_rows_vs_oracle(spark):
    con = duckdb_con(SMOKE_SF_DIR)
    from lambda_sample_spark.operators.anomaly import robust_zscore as q_rz

    for name, q, sql in [
        ("q_robust_zscore", q_rz, ANOMALY_ORACLE["q_robust_zscore"]),
        ("q_markov_transitions", q_markov_transitions,
         BEHAVIOR_ORACLE["q_markov_transitions"]),
        ("q_inverted_index", q_inverted_index,
         TEXT_ORACLE["q_inverted_index"]),
    ]:
        sdf = q(spark, SMOKE_SF_DIR)
        odf = con.execute(sql).fetchdf()
        assert compare(name, sdf, odf) == []


def test_seasonal_baseline_flags_only_the_off_profile_value(spark, tmp_path):
    """Train half: hour-10 values tight around 10 (sigma ~ 0.8);
    test half: one hour-10 event at the baseline mean (not flagged)
    and one far off profile (flagged)."""
    from datetime import datetime, timedelta

    import pandas as pd

    t0 = datetime(2024, 1, 1, 10, 0, 0)
    rows = []
    # train slice (day 1, hour 10): values 9, 10, 11 -> mu=10,
    # sigma=sqrt(2/3)~0.816; 2 sigma band = [8.37, 11.63]
    for i, v in enumerate([9.0, 10.0, 11.0]):
        rows.append((i, t0 + timedelta(minutes=i), 1, "a", v, "{}"))
    # test slice (day 3, hour 10 — past the midpoint of the range):
    # 10.0 inside the band, 50.0 far outside
    t1 = datetime(2024, 1, 3, 10, 0, 0)
    rows.append((10, t1, 1, "a", 10.0, "{}"))
    rows.append((11, t1 + timedelta(minutes=1), 1, "a", 50.0, "{}"))
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")

    from lambda_sample_spark.operators.anomaly import seasonal_baseline

    out = seasonal_baseline(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["hod"] == 10 and r["n_test"] == 2 and r["n_flagged"] == 1
    assert r["mu"] == 10.0


def test_seasonal_baseline_contract_vs_oracle(spark):
    from lambda_sample_spark.operators.anomaly import (
        ORACLE as AN_ORACLE,
        seasonal_baseline as q_sb,
    )

    con = duckdb_con(SMOKE_SF_DIR)
    sdf = q_sb(spark, SMOKE_SF_DIR)
    odf = con.execute(AN_ORACLE["q_seasonal_baseline"]).fetchdf()
    assert compare("q_seasonal_baseline", sdf, odf) == []
