"""Cache-leak regression guard (round-2 verdict #7): contract queries
run in the driver's single long-lived session, so any .persist() a
query takes and never releases accumulates across the 50-query gate.
Every query must leave zero persistent RDDs behind once its result is
materialized. (The RF model trainer persists inside train_models but
unpersists in a finally block; it must come out clean too.)
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

# the three queries the round-2 verdict flagged for unbounded persist
# lifetime, plus the RF path that persists-and-releases internally
LEAK_SUSPECTS = ["q_ngram_jaccard", "q_dedup_near", "q_ann_lsh_topk", "q_rf_train"]


@pytest.mark.parametrize("name", LEAK_SUSPECTS)
def test_no_persistent_rdds_after_query(spark, sf_dir, name):
    spark.catalog.clearCache()
    fn = entrymod.queries()[name]
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    leaked = dict(spark.sparkContext._jsc.getPersistentRDDs())
    assert not leaked, f"{name} left {len(leaked)} persistent RDDs cached"
