"""S11 per-partition push sink: batching, retry/backoff, dead-letter report.

Transports are defined INSIDE each test so cloudpickle ships them by value
(the test module itself is not importable on executor workers) — the same
injectable-transport DI seam the reference's loader uses for its REST client.
"""

import pytest
from pyspark.sql import functions as F

from infoscience_imports_spark.sources.rest_sink import write_batched


def _flaky_transport():
    """Fails the FIRST call in each task (deserialized copy), then succeeds."""
    state = {"calls": 0}

    def transport(records):
        state["calls"] += 1
        if state["calls"] == 1:
            raise RuntimeError("transient connect error")

    return transport


def _poison_transport():
    """Permanently rejects batches containing a poisoned key."""

    def transport(records):
        if any(r["id"] % 97 == 0 for r in records):
            raise RuntimeError("409 conflict")

    return transport


def test_batching_and_retry_delivers_everything(spark):
    df = spark.range(0, 500).repartition(4).withColumn("v", F.col("id") * 2)
    status = write_batched(
        df, _flaky_transport(), key_col="id", batch_size=64, sleep=lambda _s: None
    ).collect()
    assert all(r["status"] == "ok" for r in status)
    assert sum(r["n_rows"] for r in status) == 500
    assert all(r["n_rows"] <= 64 for r in status)
    # the first batch of every partition needed exactly one retry
    by_part = {}
    for r in status:
        by_part.setdefault(r["partition_id"], []).append(r)
    for rows in by_part.values():
        rows.sort(key=lambda r: r["batch_idx"])
        assert rows[0]["attempts"] == 2
        assert all(r["attempts"] == 1 for r in rows[1:])
    # key range stamps cover re-selection of a batch
    assert all(r["first_key"] is not None and r["last_key"] is not None for r in status)


def test_dead_letter_batches_are_recorded_not_raised(spark):
    df = spark.range(0, 300).repartition(3)
    status = write_batched(
        df, _poison_transport(), key_col="id", batch_size=50,
        max_retries=2, sleep=lambda _s: None,
    ).collect()
    failed = [r for r in status if r["status"] == "failed"]
    ok = [r for r in status if r["status"] == "ok"]
    # ids 0, 97, 194, 291 are poisoned — at least one batch fails, rest land
    assert failed and ok
    assert all(r["attempts"] == 3 for r in failed)  # max_retries + 1
    assert all("409" in r["error"] for r in failed)
    assert sum(r["n_rows"] for r in status) == 300  # every row accounted for


def test_on_failure_raise_propagates(spark):
    df = spark.range(0, 100).coalesce(1)
    with pytest.raises(Exception, match="409|Py4J"):
        write_batched(
            df, _poison_transport(), batch_size=100, max_retries=1,
            sleep=lambda _s: None, on_failure="raise",
        ).collect()
