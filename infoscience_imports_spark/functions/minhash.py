"""128-perm MinHash kernel — NumPy-vectorized, Arrow-batched.

Spark's built-in MinHashLSH is a JVM ML model that owns its banding and does
not fit a checkpointed stage contract (SURVEY.md §7.3), so the signature
kernel lives here: h_i(x) = (a_i * x + b_i) over uint64 with the top 32 bits
kept — a multiply-shift universal family, standard for MinHash.

For a doc with shingle set S (m values) the kernel computes
``min over S of (A[:,None] * S[None,:] + B[:,None]) >> 32`` blockwise —
one (num_perms x m) uint64 matrix per doc, no per-shingle Python.
"""

from __future__ import annotations

import numpy as np

from ..config import DedupConfig, DEFAULT_CONFIG


def perm_params(cfg: DedupConfig = DEFAULT_CONFIG) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) parameter vectors for the permutation family."""
    rng = np.random.default_rng(cfg.minhash_seed)
    a = rng.integers(1, 1 << 61, size=cfg.num_perms, dtype=np.uint64) | np.uint64(1)  # odd
    b = rng.integers(0, 1 << 61, size=cfg.num_perms, dtype=np.uint64)
    return a, b


_EMPTY_SENTINEL = np.int64((1 << 31) - 1)  # signature value for empty docs


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """int64[num_perms] signature of one shingle set (uint64 values)."""
    if shingles.size == 0:
        return np.full(a.shape[0], _EMPTY_SENTINEL, dtype=np.int64)
    # (P, m) matrix; uint64 wrap-around multiply-add, keep top 32 bits
    hv = (a[:, None] * shingles[None, :] + b[:, None]) >> np.uint64(32)
    return hv.min(axis=1).astype(np.int64)


def minhash_batch(shingle_sets: list[np.ndarray], cfg: DedupConfig = DEFAULT_CONFIG) -> list[np.ndarray]:
    """Signatures for a batch of shingle sets (used inside the Arrow UDF)."""
    a, b = perm_params(cfg)
    return [minhash_signature(s, a, b) for s in shingle_sets]


def minhash_signatures_stacked(
    shingle_sets: list[np.ndarray | None],
    a: np.ndarray,
    b: np.ndarray,
    chunk_elems: int = 4_000_000,
) -> np.ndarray:
    """(n_docs, num_perms) int64 signatures for a whole batch in a few
    NumPy calls instead of one per doc.

    Web docs are short (tens of shingles), so the per-doc
    :func:`minhash_signature` spends more time in NumPy call/allocation
    overhead than in the multiply-add (measured: the signature kernel ran
    ~33 CPU-s over 50k ~45-token docs; batched it is ~3x cheaper). All
    shingle arrays are concatenated once; the (total_m, P) hash matrix is
    computed in bounded chunks (``chunk_elems`` values ≈ 32 MB at P=128)
    and per-doc minima come from ``np.minimum.reduceat`` over the segment
    starts. Identical output to the per-doc kernel by construction: same
    uint64 wrap-around multiply-add, same >>32, same per-set minimum, same
    empty-set sentinel (pinned by tests/test_kernels.py equivalence test).
    """
    n = len(shingle_sets)
    P = a.shape[0]
    out = np.full((n, P), _EMPTY_SENTINEL, dtype=np.int64)
    lens = np.fromiter(
        (0 if s is None else s.size for s in shingle_sets), dtype=np.int64, count=n
    )
    nz = np.flatnonzero(lens)
    if nz.size == 0:
        return out
    arrays = [np.asarray(shingle_sets[i], dtype=np.uint64) for i in nz]
    S = np.concatenate(arrays)
    seg_lens = lens[nz]
    starts = np.zeros(nz.size, dtype=np.int64)
    np.cumsum(seg_lens[:-1], out=starts[1:])
    # chunk over whole documents so every reduceat segment stays inside one
    # chunk; bound = chunk_elems total hash-matrix values per chunk
    max_rows = max(int(seg_lens.max()), chunk_elems // P)
    mins = np.empty((nz.size, P), dtype=np.uint64)
    doc_lo = 0
    with np.errstate(over="ignore"):  # uint64 wrap-around IS the hash family
        while doc_lo < nz.size:
            doc_hi = doc_lo
            row_lo = starts[doc_lo]
            row_hi = row_lo
            while doc_hi < nz.size and (row_hi - row_lo) + seg_lens[doc_hi] <= max_rows:
                row_hi += seg_lens[doc_hi]
                doc_hi += 1
            H = (S[row_lo:row_hi, None] * a[None, :] + b[None, :]) >> np.uint64(32)
            mins[doc_lo:doc_hi] = np.minimum.reduceat(
                H, starts[doc_lo:doc_hi] - row_lo, axis=0
            )
            doc_lo = doc_hi
    out[nz] = mins.astype(np.int64)
    return out
