"""Myers bit-parallel Levenshtein distance (unit costs) — the scalar fast path.

Computes the same values as the banded DP in ``scalar.levenshtein_k_with_opts``
for unit costs (mismatch=1, gap=1, start_gap=0, no transpose), matching the
reference's ``levenshtein_simd_k`` outputs (/root/reference/src/levenshtein.rs:677-684).
The bit-vector formulation follows the published Myers (1999) / Hyyrö (2001)
algorithm; Python's arbitrary-precision ints serve as the m-bit registers, so
one update step costs O(m/word) in C regardless of pattern length.

Early exit: D[m][j] changes by at most ±1 per text position, so once
``score - (n - j) > k`` the bound can never be met and we return None.
"""

from __future__ import annotations

from typing import Dict, Optional

from .types import as_seq

__all__ = ["myers_distance", "build_peq"]


def build_peq(pattern) -> Dict[int, int]:
    """Per-symbol bitmasks: bit i set in peq[c] iff pattern[i] == c."""
    peq: Dict[int, int] = {}
    for i, c in enumerate(pattern):
        peq[c] = peq.get(c, 0) | (1 << i)
    return peq


def myers_distance(a, b, k: Optional[int] = None) -> Optional[int]:
    """Unit-cost Levenshtein distance; None if it exceeds ``k`` (when given)."""
    a = as_seq(a)
    b = as_seq(b)
    if len(a) > len(b):
        a, b = b, a
    m, n = len(a), len(b)
    if m == 0:
        return n if (k is None or n <= k) else None
    if k is not None and n - m > k:
        return None

    peq = build_peq(a)
    full = (1 << m) - 1
    high = 1 << (m - 1)
    pv = full
    mv = 0
    score = m
    get = peq.get
    j = 0
    for c in b:
        eq = get(c, 0)
        xv = eq | mv
        xh = (((eq & pv) + pv) ^ pv) | eq
        ph = mv | (~(xh | pv) & full)
        mh = pv & xh
        if ph & high:
            score += 1
        elif mh & high:
            score -= 1
        ph = ((ph << 1) | 1) & full
        mh = (mh << 1) & full
        pv = mh | (~(xv | ph) & full)
        mv = ph & xv
        j += 1
        if k is not None and score - (n - j) > k:
            return None
    return score if (k is None or score <= k) else None
