"""Real Spark-Connect leg (round-11 verdict task #4).

The capability shim (plans/shim.py) is pinned byte-identical on
classic and fallback-tested via FORCE_FALLBACK; this module closes the
remaining gap by driving an ACTUAL Connect server:

  - the server boot test needs only the shipped JVM jar
    (spark-connect_2.13, present in the pip pyspark distribution) —
    it proves the server-side leg of this environment works.
  - the contract-subset tests need the Python Connect CLIENT, whose
    hard dependencies (grpcio, protobuf) are not installed in this
    container and cannot be (no pip) — they skip with that reason, the
    same documented-env-gap treatment as the Kafka broker and Pillow.
    In any grpc-enabled environment they run the shim consumers the
    verdict named (CC's checkpoint loop, plan-audit text, shuffle
    budget counting) through a genuine ``sc://`` session.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
import time
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SMOKE_SF = "/root/testdata/sf0.001"


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spark_dist() -> Path:
    import pyspark

    return Path(pyspark.__file__).resolve().parent


def _boot_server(port: int) -> subprocess.Popen:
    dist = _spark_dist()
    jar = next((dist / "jars").glob("spark-connect_*.jar"))
    return subprocess.Popen(
        [
            str(dist / "bin" / "spark-submit"),
            "--class",
            "org.apache.spark.sql.connect.service.SparkConnectServer",
            "--master",
            "local[4]",
            "--conf",
            f"spark.connect.grpc.binding.port={port}",
            "--conf",
            "spark.ui.enabled=false",
            "--conf",
            "spark.sql.shuffle.partitions=4",
            str(jar),
        ],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )


def _wait_listening(port: int, timeout: float = 90.0) -> bool:
    deadline = time.time() + timeout
    while time.time() < deadline:
        s = socket.socket()
        s.settimeout(2)
        try:
            s.connect(("127.0.0.1", port))
            return True
        except OSError:
            time.sleep(1.0)
        finally:
            s.close()
    return False


def test_connect_server_boots_and_listens():
    """The JVM Connect server from the shipped distribution starts and
    accepts TCP on its gRPC port — the server half of the real-Connect
    leg, provable without the Python client."""
    port = _free_port()
    proc = _boot_server(port)
    try:
        assert _wait_listening(port), "Connect server never opened its port"
        assert proc.poll() is None, "server process exited early"
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()


@pytest.fixture(scope="module")
def remote_spark():
    """A genuine sc:// session against a locally booted server.
    Client import is the gate: grpcio/protobuf are absent in this
    container (no pip), so these skip here and run wherever the
    client deps exist."""
    pytest.importorskip(
        "grpc", reason="Spark Connect Python client needs grpcio (not installed)"
    )
    pytest.importorskip(
        "google.protobuf",
        reason="Spark Connect Python client needs protobuf (not installed)",
    )
    from pyspark.sql import SparkSession

    port = _free_port()
    proc = _boot_server(port)
    if not _wait_listening(port):
        proc.kill()
        pytest.fail("Connect server never opened its port")
    spark = SparkSession.builder.remote(f"sc://localhost:{port}").getOrCreate()
    yield spark
    spark.stop()
    proc.terminate()
    try:
        proc.wait(timeout=30)
    except subprocess.TimeoutExpired:
        proc.kill()


def test_shim_consumers_under_real_connect(remote_spark):
    """The shim's public-API fallback, driven by a real Connect frame
    (not FORCE_FALLBACK): plan text flows, optimized-plan slicing
    works, checkpoint release reports no eager path."""
    from lambda_sample_spark.plans import shim

    df = remote_spark.range(100).selectExpr("id % 7 AS k").groupBy("k").count()
    txt = shim.explain_string(df, "simple")
    assert "Physical Plan" in txt or "HashAggregate" in txt
    phys = shim.physical_plan(df)
    assert "HashAggregate" in phys or "Aggregate" in phys
    opt = shim.optimized_plan(df)
    assert opt.strip()
    ck = df.localCheckpoint()
    assert shim.release_checkpoint(ck) is False  # no eager path on Connect


def test_contract_subset_under_real_connect(remote_spark):
    """The verdict's named shim consumers, oracle-checked through a
    real sc:// session: flagship, broadcast lookup join, and the
    iterative CC operator (localCheckpoint loop + shim release)."""
    sys.path.insert(0, str(REPO))
    try:
        import __spark_entry__ as entrymod
        from tests.oracle_harness import compare, duckdb_con
    finally:
        sys.path.pop(0)

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duckdb_con(SMOKE_SF)
    os.environ.setdefault("SPARK_GRAFT_ORACLE_SF", SMOKE_SF)

    for name in ("q_fast_anomaly", "q_lookup_join_left", "q_connected_components"):
        sdf = queries[name](remote_spark, SMOKE_SF)
        if name in oracles:
            odf = con.execute(oracles[name]).fetchdf()
            assert not compare(name, sdf, odf), f"{name} mismatch under Connect"
        else:
            assert sdf.count() >= 0
