"""Custom stateful streaming operator via ``applyInPandasWithState``.

The incremental dedup path (incremental.py) uses ``foreachBatch`` because
its state is a partitioned TABLE (band buckets, doc signatures). This module
covers the other streaming-state shape the engine needs at crawl scale:
per-KEY running aggregates held in the streaming state store itself —
here, a per-host crawl profile (pages seen, approximate distinct content
digests) maintained with ``applyInPandasWithState``.

Distinct counting uses a HyperLogLog sketch (Flajolet, Fusy, Gandouet,
Meunier, AofA'07 — public literature) with ``2^p`` single-byte registers:
per-host state is a fixed ~``2^p``-byte blob no matter how many pages the
host emits, which is what makes the operator safe on a 10^12-page stream —
exact per-host digest sets would make state linear in the corpus. Standard
bias-corrected estimate with the small-range (linear counting) correction;
p=10 gives ~3.25% relative error at 1 KB per host.

At 100 TB the grouping key (host) is skewed (mega-hosts); the state store
hash-partitions by key, and a mega-host costs O(batch rows) per trigger to
fold into 1 KB of state — no per-host memory growth, no shuffle beyond the
one groupBy.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.text import extract_text_col, normalize_text_col

OUTPUT_SCHEMA = StructType(
    [
        StructField("host", StringType(), False),
        StructField("n_pages", LongType(), False),
        StructField("approx_unique_docs", DoubleType(), False),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_pages", LongType(), False),
        StructField("registers", BinaryType(), False),
    ]
)


# exact vectorized count-leading-zeros via 16-bit chunks (float log2 would
# mis-rank values whose rounding crosses a power of two near 2^63)
_CLZ16 = np.array([16 - int(i).bit_length() for i in range(1 << 16)], dtype=np.uint8)


def _clz64(x: np.ndarray) -> np.ndarray:
    c0 = _CLZ16[(x >> np.uint64(48)).astype(np.int64)]
    c1 = _CLZ16[((x >> np.uint64(32)) & np.uint64(0xFFFF)).astype(np.int64)]
    c2 = _CLZ16[((x >> np.uint64(16)) & np.uint64(0xFFFF)).astype(np.int64)]
    c3 = _CLZ16[(x & np.uint64(0xFFFF)).astype(np.int64)]
    return np.where(
        c0 < 16,
        c0,
        np.where(c1 < 16, 16 + c1, np.where(c2 < 16, 32 + c2, 48 + c3)),
    ).astype(np.int64)


def _hll_fold(registers: np.ndarray, hashes: np.ndarray, p: int) -> np.ndarray:
    """Fold uint64 hashes into the register array (max of rank per bucket)."""
    idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
    rest = hashes << np.uint64(p)  # suffix bits left-aligned; zero suffix -> clz 64
    rank = np.minimum(_clz64(rest) + 1, 64 - p + 1).astype(np.uint8)
    np.maximum.at(registers, idx, rank)
    return registers


def _hll_estimate(registers: np.ndarray, p: int) -> float:
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-registers.astype(np.float64)))
    zeros = int(np.count_nonzero(registers == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear-counting small-range correction
    return float(est)


def host_profile_stream(pages_stream: DataFrame, p: int = 10) -> DataFrame:
    """Streaming per-host crawl profile with bounded (~2^p bytes/host) state.

    Input: the (url, warc_ts, html, ...) page stream. Output mode "update":
    one row per host per trigger with the running totals.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    digests = pages_stream.select(
        F.regexp_extract("url", r"^https?://([^/]+)", 1).alias("host"),
        F.xxhash64(normalize_text_col(extract_text_col(F.col("html")))).alias("digest"),
    )

    def update(key, pdfs, state):
        import pandas as pd

        if state.exists:
            n_pages, reg_bytes = state.get
            registers = np.frombuffer(reg_bytes, dtype=np.uint8).copy()
        else:
            n_pages = 0
            registers = np.zeros(1 << p, dtype=np.uint8)
        for pdf in pdfs:
            n_pages += len(pdf)
            hashes = pdf["digest"].to_numpy().astype(np.int64).view(np.uint64)
            registers = _hll_fold(registers, hashes, p)
        state.update((n_pages, bytearray(registers.tobytes())))
        yield pd.DataFrame(
            {
                "host": [key[0]],
                "n_pages": [n_pages],
                "approx_unique_docs": [_hll_estimate(registers, p)],
            }
        )

    return digests.groupBy("host").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
