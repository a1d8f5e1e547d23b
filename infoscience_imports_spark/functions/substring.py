"""Bounded exact-substring check (vectorized Rabin-Karp).

The containment verify kernels ran CPython's ``needle in haystack``
(verify.py / containment.py final guard). CPython's adaptive search is
usually linear but degrades toward O(n·m) below its two-way-algorithm
cutoffs on pathological self-similar inputs — exactly the boilerplate-heavy
near-dup pairs this pipeline feeds it (round-2 verdict #4). This form is
O(n + m + candidates·m/2^64) worst case w.h.p.: one vectorized uint64
rolling-hash pass over the haystack, byte equality only at hash-match
positions.

Bytes-level matching is equivalent to str-level for valid UTF-8 (the
encoding is self-synchronizing: a needle's byte sequence cannot appear at a
non-character boundary of a valid haystack).
"""

from __future__ import annotations

import numpy as np

_B = np.uint64(1099511628211)  # FNV-1a prime; odd -> invertible mod 2^64
_BINV = np.uint64(pow(int(_B), -1, 1 << 64))


def contains_substring(needle: str, haystack: str) -> bool:
    """Exact ``needle in haystack`` with bounded worst-case cost."""
    if not needle:
        return True
    nb = needle.encode("utf-8")
    hb = haystack.encode("utf-8")
    m, n = len(nb), len(hb)
    if m > n:
        return False
    if m < 64 or n < (1 << 16):
        # CPython's adaptive search (memchr for short needles, two-way for
        # long ones) beats the numpy setup by ~20x on page-sized texts
        # (measured 3.3 vs 71.7 us on a 4 KB haystack); the vectorized pass
        # only pays off once the haystack is large enough to amortize its
        # ~6 full-array allocations
        return nb in hb
    h = np.frombuffer(hb, dtype=np.uint8).astype(np.uint64)
    q = np.frombuffer(nb, dtype=np.uint8).astype(np.uint64)
    with np.errstate(over="ignore"):
        # powers of B and B^-1 (mod 2^64) via wrapping cumprod
        b_pows = np.full(n, _B, dtype=np.uint64)
        b_pows[0] = np.uint64(1)
        b_pows = b_pows.cumprod(dtype=np.uint64)
        binv_pows = np.full(n, _BINV, dtype=np.uint64)
        binv_pows[0] = np.uint64(1)
        binv_pows = binv_pows.cumprod(dtype=np.uint64)
        # prefix sums S[i] = sum_{j<=i} h[j] * B^-j; window hash of
        # [i, i+m) = B^(i+m-1) * (S[i+m-1] - S[i-1]) = sum h[i+j] B^(m-1-j)
        s = (h * binv_pows).cumsum(dtype=np.uint64)
        ends = np.arange(m - 1, n)
        prev = np.concatenate(([np.uint64(0)], s[: n - m]))
        win = (s[ends] - prev) * b_pows[ends]
        target = (q * b_pows[:m][::-1]).sum(dtype=np.uint64)
    for i in np.nonzero(win == target)[0].tolist():
        if hb[i : i + m] == nb:
            return True
    return False
