"""Driver-side CPU attribution for the Python/Arrow hot kernels.

Wall-clock on this host is contention-poisoned (BENCH/BASELINE.md), so this
microbench times the *pure kernels* with ``time.process_time`` (CPU charged
to this process only) over the same synthetic corpus the pipeline runs on.
It answers "where do the Python CPU seconds of the signatures / postings /
verify kernels actually go?" — the input any kernel rewrite must be judged
against (per-change before/after numbers land in BENCH/BASELINE.md).

Usage: python scripts/microbench_kernels.py [--docs 4000] [--pairs 20000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(label: str, fn, *args, repeat: int = 1, **kw):
    t0 = time.process_time()
    out = None
    for _ in range(repeat):
        out = fn(*args, **kw)
    dt = (time.process_time() - t0) / repeat
    print(f"{label:42s} {dt * 1000:10.1f} ms")
    return out, dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=4000)
    ap.add_argument("--pairs", type=int, default=20000)
    args = ap.parse_args()

    from infoscience_imports_spark.config import DedupConfig
    from infoscience_imports_spark.functions.minhash import (
        minhash_signature,
        perm_params,
    )
    from infoscience_imports_spark.functions.shingles import (
        shingle_hashes,
        token_hashes,
    )
    from infoscience_imports_spark.functions.simhash import simhash64
    from infoscience_imports_spark.functions.text import (
        extract_text_py,
        normalize_text_py,
    )
    from infoscience_imports_spark.operators.signatures import band_keys
    from infoscience_imports_spark.sources.synthetic import _vocab, gen_row

    cfg = DedupConfig()
    n = args.docs
    vocab = _vocab(42)
    rows = [gen_row(i, n, 42, vocab) for i in range(n)]
    htmls = [r["html"] for r in rows]
    print(f"corpus: {n} docs, avg html {sum(len(h) for h in htmls) / n:.0f} B")

    texts, _ = timed(
        "extract+normalize (per-doc Python)",
        lambda: [normalize_text_py(extract_text_py(bytes(h))) for h in htmls],
    )
    tok_lists, _ = timed("str.split", lambda: [t.split() for t in texts])
    n_tok = sum(len(t) for t in tok_lists)
    print(f"  tokens total {n_tok} (avg {n_tok / n:.0f}/doc)")

    memo: dict[str, int] = {}
    th_lists, t_tok = timed(
        "token_hashes (memoized)", lambda: [token_hashes(t, memo) for t in tok_lists]
    )
    # second pass = all memo hits: isolates loop overhead from blake2b cost
    _, t_tok_hit = timed(
        "token_hashes (all memo hits)", lambda: [token_hashes(t, memo) for t in tok_lists]
    )
    print(f"  blake2b share ~{(t_tok - t_tok_hit) * 1000:.1f} ms, uniq toks {len(memo)}")

    sh_lists, t_sh = timed(
        "shingle_hashes k=%d" % cfg.shingle_k,
        lambda: [shingle_hashes(th, cfg.shingle_k) for th in th_lists],
    )
    a, b = perm_params(cfg)
    _, t_mh = timed(
        "minhash_signature x%d perms" % cfg.num_perms,
        lambda: [minhash_signature(s, a, b) for s in sh_lists],
    )
    mh = [minhash_signature(s, a, b) for s in sh_lists]
    _, t_bk = timed("band_keys", lambda: band_keys(np.stack(mh), cfg.lsh_bands))
    _, t_sim = timed(
        "simhash64 (title prefix)", lambda: [simhash64(th[:12]) for th in th_lists]
    )

    # verify-pair kernel: intersect two sorted-unique shingle arrays
    rng = np.random.default_rng(7)
    i1 = rng.integers(0, n, size=args.pairs)
    i2 = rng.integers(0, n, size=args.pairs)
    _, t_int = timed(
        "np.intersect1d x%d pairs" % args.pairs,
        lambda: [
            np.intersect1d(sh_lists[a_], sh_lists[b_], assume_unique=True).size
            for a_, b_ in zip(i1, i2)
        ],
    )

    def ss_count(s1: np.ndarray, s2: np.ndarray) -> int:
        if s1.size > s2.size:
            s1, s2 = s2, s1
        idx = np.searchsorted(s2, s1)
        idx[idx == s2.size] = 0
        return int((s2[idx] == s1).sum())

    cnt_a = [
        np.intersect1d(sh_lists[a_], sh_lists[b_], assume_unique=True).size
        for a_, b_ in zip(i1, i2)
    ]
    cnt_b, t_ss = timed(
        "searchsorted intersect-count (same pairs)",
        lambda: [ss_count(sh_lists[a_], sh_lists[b_]) for a_, b_ in zip(i1, i2)],
    )
    assert cnt_a == cnt_b, "searchsorted count must equal intersect1d"

    per_doc = {
        "token_hashes_us": t_tok / n * 1e6,
        "shingle_hashes_us": t_sh / n * 1e6,
        "minhash_us": t_mh / n * 1e6,
        "simhash_us": t_sim / n * 1e6,
    }
    print("per-doc:", {k: round(v, 1) for k, v in per_doc.items()})
    print(
        "per-pair: intersect1d %.1f us vs searchsorted %.1f us (%.2fx)"
        % (t_int / args.pairs * 1e6, t_ss / args.pairs * 1e6, t_int / max(t_ss, 1e-12))
    )


if __name__ == "__main__":
    main()
