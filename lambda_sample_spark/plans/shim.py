"""Capability shim over the JVM-internal seams (round-11 verdict #2).

Classic PySpark exposes the JVM QueryExecution through ``df._jdf`` —
fast and exact, but a PRIVATE API: it does not exist under Spark
Connect (the deployment shape a 1000-executor cluster increasingly
has) and is free to move between minor versions. Every internal
access in the package routes through this module, which prefers the
classic fast path and falls back to PUBLIC API only:

  - plan text: ``DataFrame.explain(mode=...)`` captured from stdout —
    on classic this calls the exact same explainString the fast path
    does (pyspark/sql/classic/dataframe.py), so the two paths are
    byte-identical there (pinned in tests/test_connect_shim.py), and
    on Connect it is the supported remote explain.
  - optimized logical plan: sliced from ``explain('extended')``'s
    sectioned output.
  - checkpoint release: classic walks the analyzed plan's leaves to
    unpersist LogicalRDD blocks eagerly (graph.unpersist_checkpoint's
    historical behavior); under Connect there is no public eager
    release — server-side GC of the dropped plan is the contract — so
    the fallback is plain ``unpersist`` and a False return.

``FORCE_FALLBACK`` pins the public-API path for tests (the contract
must stay green with the fast path unavailable).
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame

FORCE_FALLBACK = False


def _jqe(df: DataFrame):
    """The JVM QueryExecution, or None when unavailable (Spark
    Connect, a future classic that drops the attribute, or the test
    override)."""
    if FORCE_FALLBACK:
        return None
    jdf = getattr(df, "_jdf", None)
    if jdf is None:
        return None
    try:
        return jdf.queryExecution()
    except Exception:
        return None


def explain_string(df: DataFrame, mode: str = "simple") -> str:
    """The text ``df.explain(mode=...)`` prints, as a string."""
    qe = _jqe(df)
    if qe is not None:
        try:
            return df._sc._jvm.PythonSQLUtils.explainString(qe, mode)
        except Exception:
            pass
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def _section(text: str, head: str) -> str:
    """One ``== Head ==`` section of a multi-section explain dump.
    Sections split only on COLUMN-0 headers — adaptive plans embed
    indented ``+- == Final Plan ==`` markers that are part of the
    plan body, not section boundaries."""
    start = text.index(head) + len(head)
    m = re.search(r"^== ", text[start:], flags=re.M)
    end = start + m.start() if m else len(text)
    return text[start:end].strip("\n")


def physical_plan(df: DataFrame) -> str:
    """``executedPlan().toString()`` — the physical plan text (for an
    already-executed adaptive frame, the FINAL plan on classic)."""
    qe = _jqe(df)
    if qe is not None:
        return qe.executedPlan().toString()
    text = explain_string(df, "simple")
    if "== Physical Plan ==" in text:
        return _section(text, "== Physical Plan ==\n")
    return text


def optimized_plan(df: DataFrame) -> str:
    """``optimizedPlan().toString()`` — the optimized logical plan."""
    qe = _jqe(df)
    if qe is not None:
        return qe.optimizedPlan().toString()
    return _section(
        explain_string(df, "extended"), "== Optimized Logical Plan ==\n"
    )


def release_checkpoint(df: DataFrame) -> bool:
    """Eagerly release a ``localCheckpoint`` frame's RDD blocks.
    Returns True iff an eager release happened (classic only); the
    caller falls back to plain ``unpersist`` otherwise."""
    qe = _jqe(df)
    if qe is None:
        return False
    try:
        leaves = qe.analyzed().collectLeaves()
        found = False
        for i in range(leaves.size()):
            leaf = leaves.apply(i)
            if leaf.getClass().getName().endswith("LogicalRDD"):
                leaf.rdd().unpersist(False)
                found = True
        return found
    except Exception:
        return False
