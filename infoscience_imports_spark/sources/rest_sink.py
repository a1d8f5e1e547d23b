"""S11 — generic per-partition push sink (batching + retry + dead-letter).

Reference parity: the DSpace REST loader pushes one record at a time with
per-record error handling (``data_pipeline/loader.py:1570-1684``) behind an
injectable client (the DI seam at ``loader.py:135-153``). The web-scale
shape is ``foreachPartition``-style delivery: each partition walks its rows
once, groups them into bounded batches, and pushes every batch through an
injected transport with exponential-backoff retries — no driver round-trips,
no per-row Python overhead beyond the row dict itself.

Implemented over ``mapInPandas`` rather than ``foreachPartition`` so the
delivery *report* is data: one status row per attempted batch
(partition, batch index, rows, attempts, ok/failed, error), which the caller
can aggregate, join back to the input, or persist as a dead-letter table.
``foreachPartition`` would swallow that story into logs; a sink that cannot
say what it failed to deliver cannot be resumed.

Scale notes:
  * the transport is invoked executor-side only; its failures never abort
    the job unless ``on_failure='raise'`` (then Spark's task retry takes
    over — idempotent transports only);
  * batch memory is bounded by ``batch_size`` rows (the Arrow batch is
    walked incrementally, never re-materialized);
  * ``sleep`` is injectable so tests (and rate-limit-aware callers) control
    backoff without wall-clock waits.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark import TaskContext
from pyspark.sql import DataFrame

STATUS_SCHEMA = (
    "partition_id int, batch_idx int, n_rows int, attempts int, "
    "status string, error string, first_key string, last_key string"
)


def write_batched(
    df: DataFrame,
    transport: Callable[[list[dict]], None],
    key_col: str | None = None,
    batch_size: int = 100,
    max_retries: int = 3,
    backoff_base_s: float = 0.05,
    sleep: Callable[[float], None] | None = None,
    on_failure: str = "record",
) -> DataFrame:
    """Push ``df`` through ``transport`` in per-partition batches.

    ``transport(records)`` receives a list of row dicts and raises to signal
    a failed delivery; the batch is retried up to ``max_retries`` times with
    exponential backoff, then either recorded as a dead-letter status row
    (``on_failure='record'``, default) or re-raised to Spark
    (``on_failure='raise'``). Returns the status DataFrame — one row per
    batch; nothing is delivered until an action runs it (align the action
    with the caller's checkpoint commit for exactly-once bookkeeping).

    ``key_col`` (if given) stamps each status row with the first/last key of
    the batch so failed batches can be re-selected from the source table.
    """
    if on_failure not in ("record", "raise"):
        raise ValueError(f"on_failure must be 'record' or 'raise', got {on_failure!r}")

    def kernel(batches):
        import time as _time

        import pandas as pd

        do_sleep = sleep if sleep is not None else _time.sleep
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        out: list[tuple] = []
        buf: list[dict] = []
        bidx = 0

        def flush():
            nonlocal bidx, buf
            if not buf:
                return
            records, buf = buf, []
            fk = str(records[0][key_col]) if key_col else None
            lk = str(records[-1][key_col]) if key_col else None
            attempt = 0
            while True:
                attempt += 1
                try:
                    transport(records)
                    out.append((pid, bidx, len(records), attempt, "ok", None, fk, lk))
                    break
                except Exception as e:  # noqa: BLE001 — transport errors are data
                    if attempt > max_retries:
                        if on_failure == "raise":
                            raise
                        out.append(
                            (pid, bidx, len(records), attempt, "failed", str(e)[:200], fk, lk)
                        )
                        break
                    do_sleep(backoff_base_s * (2 ** (attempt - 1)))
            bidx += 1

        for pdf in batches:
            for rec in pdf.to_dict("records"):
                buf.append(rec)
                if len(buf) >= batch_size:
                    flush()
        flush()
        yield pd.DataFrame(
            out,
            columns=[
                "partition_id",
                "batch_idx",
                "n_rows",
                "attempts",
                "status",
                "error",
                "first_key",
                "last_key",
            ],
        )

    return df.mapInPandas(kernel, schema=STATUS_SCHEMA)
