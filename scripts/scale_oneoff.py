"""One-off scale-ladder rung (docs/SCALE.md): inflate the sf0.1
documents table by $FACTOR (default 80x -> 400k docs), run
q_ngram_jaccard's operator and the X14 ingest_batch composite once
each, and print wall time + shuffle-write bytes. NOT part of CI (keep
the suite bounded) — run by hand, record the numbers in docs/SCALE.md.

Usage: python scripts/scale_oneoff.py [factor]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# reuse the deterministic inflater the stress suite pins against
sys.path.insert(0, REPO)
from tests.test_scale_stress import _inflate_docs  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402


def shuffle_written(spark) -> int:
    store = spark.sparkContext._jsc.sc().statusStore()
    execs = store.executorList(False)
    return sum(execs.apply(i).totalShuffleWrite() for i in range(execs.size()))


def measure(spark, label, fn):
    t0 = time.perf_counter()
    s0 = shuffle_written(spark)
    out = fn()
    wall = time.perf_counter() - t0
    time.sleep(1.0)
    print(
        f"{label}: {wall:.1f}s, "
        f"{(shuffle_written(spark) - s0) / 1e6:.0f} MB shuffle, out={out}"
    )


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 80
    from lambda_sample_spark.session import get_spark
    from lambda_sample_spark.operators import dedup, incremental_dedup as inc

    spark = get_spark(app_name="scale-oneoff")
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    work = tempfile.mkdtemp(prefix="scale_oneoff_")
    docs_path = os.path.join(work, "documents.parquet")
    t0 = time.perf_counter()
    _inflate_docs(spark, base, factor).coalesce(16).write.parquet(docs_path)
    docs = spark.read.parquet(docs_path)
    n = docs.count()
    print(f"inflated corpus: {n} docs ({factor}x sf0.1), "
          f"built in {time.perf_counter() - t0:.0f}s at {docs_path}")

    # the inflated workdir mimics an sf dir (documents.parquet inside),
    # so the contract operator runs against it unchanged
    measure(
        spark,
        f"ngram_jaccard@{n}",
        lambda: dedup.ngram_jaccard(spark, work).count(),
    )

    from lambda_sample_spark.operators.text import (
        winnow_fingerprints,
        winnow_fingerprints_fast,
    )

    measure(
        spark,
        f"winnow_fast@{n}",
        lambda: winnow_fingerprints_fast(docs.select("doc_id", "text")).count(),
    )
    for gh in ("xxhash64", "md5"):
        measure(
            spark,
            f"winnow_fingerprints[{gh}]@{n}",
            lambda gh=gh: winnow_fingerprints(
                docs.select("doc_id", "text"), gram_hash=gh
            ).count(),
        )

    idx = os.path.join(work, "mhidx")
    half1 = docs.select("doc_id", "text").where(F.col("doc_id") % 2 == 0)
    half2 = docs.select("doc_id", "text").where(F.col("doc_id") % 2 == 1)
    measure(
        spark,
        f"ingest_batch(first half)@{n}",
        lambda: inc.ingest_batch(spark, idx, half1).count(),
    )
    measure(
        spark,
        f"ingest_batch(second half)@{n}",
        lambda: inc.ingest_batch(spark, idx, half2).count(),
    )
    print(f"workdir (delete when done): {work}")
    spark.stop()


if __name__ == "__main__":
    main()
