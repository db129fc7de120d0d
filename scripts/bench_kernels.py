"""Kernel microbenchmarks mirroring the reference's criterion workloads
(/root/reference/benches/rand_benchmarks.rs): seeded random pairs at string
lengths {10, 100, 1000} with k = len/10, and search over haystacks
{100, 1000} with needle = len/10, k = len/100, planted matches = len/20.

The reference publishes no absolute numbers (BASELINE.md) — this records
ours, per batch-kernel call and per pair, single process. Run:
    python scripts/bench_kernels.py
"""

from __future__ import annotations

import json
import random
import sys
import time

sys.path.insert(0, "/root/repo")

from triple_accel_ray.kernels import (  # noqa: E402
    SEARCH_ALL,
    hamming_search_naive_with_opts,
    levenshtein_search_naive_with_opts,
)
from triple_accel_ray.kernels.batch import (  # noqa: E402
    hamming_batch,
    levenshtein_k_batch,
)


def rand_str(rng, n):
    return bytes(rng.randrange(33, 127) for _ in range(n))


def mutate(rng, s, k):
    b = bytearray(s)
    edits = rng.randrange(max(1, k // 2), k + 1) if k else 0
    for _ in range(edits):
        op = rng.randrange(3)
        if op == 0 and b:
            b[rng.randrange(len(b))] = rng.randrange(33, 127)
        elif op == 1:
            b.insert(rng.randrange(len(b) + 1), rng.randrange(33, 127))
        elif b:
            del b[rng.randrange(len(b))]
    return bytes(b)


def main():
    rng = random.Random(1234)
    out = {}

    # pairwise distance workloads
    for length in (10, 100, 1000):
        k = max(1, length // 10)
        n = 4000 if length <= 100 else 1000
        a = [rand_str(rng, length) for _ in range(n)]
        b = [mutate(rng, s, k) for s in a]
        t0 = time.perf_counter()
        levenshtein_k_batch(a, b, k)
        dt = time.perf_counter() - t0
        out[f"lev_k_len{length}"] = {
            "pairs_per_sec": round(n / dt), "k": k, "n": n}

        a_h = [rand_str(rng, length) for _ in range(n)]
        b_h = []
        for s in a_h:
            bb = bytearray(s)
            for _ in range(k):
                if bb:
                    bb[rng.randrange(len(bb))] = rng.randrange(33, 127)
            b_h.append(bytes(bb))
        t0 = time.perf_counter()
        hamming_batch(a_h, b_h)
        dt = time.perf_counter() - t0
        out[f"hamming_len{length}"] = {"pairs_per_sec": round(n / dt), "n": n}

    # search workloads (scalar kernels; one haystack per call)
    for hlen in (100, 1000):
        nlen = max(1, hlen // 10)
        k = max(1, hlen // 100)
        n = 200
        cases = []
        for _ in range(n):
            needle = rand_str(rng, nlen)
            hay = bytearray(rand_str(rng, hlen))
            # plant mutated copies
            for _ in range(max(1, hlen // 20) // max(1, nlen)):
                pos = rng.randrange(0, hlen - nlen)
                hay[pos : pos + nlen] = mutate(rng, needle, k)[:nlen]
            cases.append((needle, bytes(hay)))
        t0 = time.perf_counter()
        for needle, hay in cases:
            list(levenshtein_search_naive_with_opts(needle, hay, k, SEARCH_ALL))
        dt = time.perf_counter() - t0
        out[f"lev_search_h{hlen}"] = {"haystacks_per_sec": round(n / dt)}

        t0 = time.perf_counter()
        for needle, hay in cases:
            list(hamming_search_naive_with_opts(needle, hay, k, SEARCH_ALL))
        dt = time.perf_counter() - t0
        out[f"ham_search_h{hlen}"] = {"haystacks_per_sec": round(n / dt)}

    # long-string unit-cost tier: batched multi-word Myers vs banded DP
    from triple_accel_ray.kernels.myers_batch import myers_k_batch
    from triple_accel_ray.kernels.batch import (
        _chunk_banded_dp, _max_k_unit_k, to_byte_rows,
    )
    from triple_accel_ray.kernels.types import LEVENSHTEIN_COSTS
    import numpy as np

    def _banded_only(a_col, b_col, k):
        da, oa = to_byte_rows(a_col)
        db, ob = to_byte_rows(b_col)
        la, lb = np.diff(oa), np.diff(ob)
        short, lng = np.minimum(la, lb), np.maximum(la, lb)
        mk, uk = _max_k_unit_k(short, lng, np.int64(k), LEVENSHTEIN_COSTS)
        res = np.full(len(la), -1, np.int64)
        rr = np.nonzero((lng - short) <= uk)[0]
        _chunk_banded_dp(da, oa, db, ob, rr, mk[rr], uk[rr],
                         LEVENSHTEIN_COSTS, res)
        return res

    for L, k in ((1000, 100), (512, 76)):
        n2 = 2048
        a_col = [rand_str(rng, L) for _ in range(n2)]
        b_col = [mutate(rng, a, int(0.12 * L)) if rng.random() < 0.8
                 else rand_str(rng, L) for a in a_col]
        myers_k_batch(a_col[:128], b_col[:128], k)  # warm
        t0 = time.perf_counter()
        g1 = myers_k_batch(a_col, b_col, k)
        dt_m = time.perf_counter() - t0
        t0 = time.perf_counter()
        g2 = _banded_only(a_col, b_col, k)
        dt_b = time.perf_counter() - t0
        assert (g1 == g2).all()
        out[f"lev_long_myers_len{L}_k{k}"] = {
            "pairs_per_sec": round(n2 / dt_m),
            "banded_pairs_per_sec": round(n2 / dt_b),
            "speedup": round(dt_b / dt_m, 1),
        }

    # column-vectorized search over a haystack COLUMN (one needle), sparse
    # and dense planted-match corpora; per-row scalar as the comparison
    import pyarrow as pa

    from triple_accel_ray.ops.search import levenshtein_search_column
    from triple_accel_ray.kernels import levenshtein_search_simd_with_opts

    needle = b"needletext"
    for density, every in (("sparse", 100), ("dense", 7)):
        n, hlen, k = 2000, 1000, 2
        texts = []
        for i in range(n):
            t = bytearray(rand_str(rng, hlen))
            if i % every == 0:
                pos = rng.randrange(0, hlen - len(needle))
                t[pos : pos + len(needle)] = mutate(rng, needle, k)[: len(needle)]
            texts.append(t.decode("latin-1"))
        tbl = pa.table({"doc_id": list(range(n)), "text": texts})
        levenshtein_search_column(tbl, needle, k)  # warm (page faults)
        t0 = time.perf_counter()
        levenshtein_search_column(tbl, needle, k)
        dt_col = time.perf_counter() - t0
        t0 = time.perf_counter()
        for t in texts:
            list(levenshtein_search_simd_with_opts(
                needle, t.encode("latin-1"), k, SEARCH_ALL))
        dt_row = time.perf_counter() - t0
        out[f"lev_search_column_{density}"] = {
            "docs_per_sec": round(n / dt_col),
            "per_row_docs_per_sec": round(n / dt_row),
            "speedup": round(dt_row / dt_col, 1),
        }

    # multi-word needle (the reference's own search bench shape:
    # needle = len/10 = 100 for 1000-char haystacks)
    n3, hlen3, m3, k3 = 1000, 1000, 100, 10
    needle3 = rand_str(rng, m3)
    texts3 = []
    for i in range(n3):
        t = bytearray(rand_str(rng, hlen3))
        if i % 20 == 0:
            pos = rng.randrange(0, hlen3 - m3)
            t[pos : pos + m3] = mutate(rng, needle3, k3)[:m3]
        texts3.append(t.decode("latin-1"))
    tbl3 = pa.table({"doc_id": list(range(n3)), "text": texts3})
    levenshtein_search_column(tbl3, needle3, k3)  # warm
    t0 = time.perf_counter()
    levenshtein_search_column(tbl3, needle3, k3)
    dt_c3 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for t in texts3[:100]:
        list(levenshtein_search_simd_with_opts(
            needle3, t.encode("latin-1"), k3, SEARCH_ALL))
    dt_r3 = (time.perf_counter() - t0) * (n3 / 100)
    out["lev_search_column_needle100"] = {
        "docs_per_sec": round(n3 / dt_c3),
        "per_row_docs_per_sec": round(n3 / dt_r3),
        "speedup": round(dt_r3 / dt_c3, 1),
    }

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
