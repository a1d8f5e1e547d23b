"""Shingling kernels: token hashing + k-gram shingle hashing, NumPy-vectorized.

The reference builds its fuzzy surrogate key by concatenating a cleaned title
with the publication year (``data_pipeline/deduplicator.py:51``); the
web-scale analogue (per BASELINE.json) is 5-gram token shingling of the
normalized text, each shingle compressed to a 63-bit hash.

Hot path: tokens are hashed once per *unique* token per Arrow batch
(memoized blake2b-8), then shingle hashes are computed fully vectorized as an
order-sensitive mix of k shifted uint64 arrays — no per-shingle Python.
"""

from __future__ import annotations

from hashlib import blake2b

import numpy as np

# Distinct odd 64-bit multipliers make the k-token mix order-sensitive
# ("a b c d e" != "e d c b a") while staying a pure vectorized expression.
_POS_MULTIPLIERS = np.array(
    [
        0x9E3779B97F4A7C15,
        0xC2B2AE3D27D4EB4F,
        0x165667B19E3779F9,
        0x27D4EB2F165667C5,
        0x85EBCA77C2B2AE63,
        0xFF51AFD7ED558CCD,
        0xC4CEB9FE1A85EC53,
        0x2545F4914F6CDD1D,
    ],
    dtype=np.uint64,
)

_MASK63 = np.uint64((1 << 63) - 1)


def hash_token(token: str) -> int:
    """64-bit stable hash of one token (blake2b, 8-byte digest)."""
    return int.from_bytes(blake2b(token.encode("utf-8"), digest_size=8).digest(), "big")


def token_hashes(tokens: list[str], memo: dict[str, int] | None = None) -> np.ndarray:
    """uint64 hash per token; memo amortizes repeated tokens within a batch."""
    if memo is None:
        memo = {}
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        h = memo.get(t)
        if h is None:
            h = hash_token(t)
            memo[t] = h
        out[i] = h
    return out


def shingle_hashes(tok_hashes: np.ndarray, k: int) -> np.ndarray:
    """Distinct 63-bit hashes of all k-token shingles, vectorized.

    For n tokens returns up to n-k+1 unique values. If n < k the whole token
    sequence is treated as one shingle (mix of what's there) so short docs
    still participate — mirrors the reference keeping short titles keyed
    (``deduplicator.py:44-51``).
    """
    if k > len(_POS_MULTIPLIERS):
        raise ValueError(f"k={k} exceeds supported max {len(_POS_MULTIPLIERS)}")
    n = len(tok_hashes)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if n < k:
        with np.errstate(over="ignore"):  # uint64 wrap-around is the hash
            acc = np.uint64(0)
            for j in range(n):
                acc ^= tok_hashes[j] * _POS_MULTIPLIERS[j]
        return np.unique(np.array([acc & _MASK63], dtype=np.uint64))
    m = n - k + 1
    acc = np.zeros(m, dtype=np.uint64)
    for j in range(k):
        acc ^= tok_hashes[j : j + m] * _POS_MULTIPLIERS[j]
    return np.unique(acc & _MASK63)


def text_shingles(text: str, k: int, memo: dict[str, int] | None = None) -> np.ndarray:
    """Normalized-text -> sorted unique uint64 shingle hashes."""
    toks = text.split()
    return shingle_hashes(token_hashes(toks, memo), k)
