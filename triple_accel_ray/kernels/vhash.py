"""Vectorized 64-bit content hashing over string columns.

Replaces per-row ``hashlib`` calls in hot map stages with one numpy pass:
a polynomial rolling hash over the flat byte buffer (exponent-weighted
sum, segment-reduced per row) finished with a splitmix64 mixer. The same
definition is reproducible in ANSI SQL (HUGEINT mod-2^64 arithmetic), so
operators built on it keep exact DuckDB oracles — see
``queries.build_oracles()['fingerprints']``.

For 128-bit-strength equality proxies (exact dedup), two independent
64-bit hashes with different odd coefficients are computed; a collision
requires both to collide simultaneously.
"""

from __future__ import annotations

import numpy as np

from ..pipeline.blocking import _mix64

# odd multiplicative coefficients (golden-ratio / xxhash primes)
POLY_COEF = np.uint64(0x9E3779B97F4A7C15)
POLY_COEF2 = np.uint64(0xC2B2AE3D27D4EB4F)

__all__ = ["POLY_COEF", "POLY_COEF2", "polyhash_rows", "packed_windows"]


def _poly_powers(maxlen: int, coef: np.uint64) -> np.ndarray:
    """coef^0 .. coef^maxlen (mod 2^64)."""
    p = np.empty(maxlen + 1, dtype=np.uint64)
    p[0] = 1
    if maxlen:
        p[1:] = coef
        np.cumprod(p, out=p)  # uint64 wraps mod 2^64
    return p


def polyhash_rows(
    data: np.ndarray,
    offsets: np.ndarray,
    coef: np.uint64 = POLY_COEF,
    seed: int = 0,
) -> np.ndarray:
    """One uint64 hash per row: mix64(poly ^ mix64(len ^ seed)) where
    poly = sum_i byte[i] * coef^(len-1-i) mod 2^64.

    ``(data, offsets)`` as returned by :func:`..batch.to_byte_rows`
    (offsets rebased to start at 0). Fully vectorized: one exponent
    gather + multiply over the flat bytes, one segment reduction.
    """
    lens = np.diff(offsets)
    n = len(lens)
    raw = np.zeros(n, dtype=np.uint64)
    total = int(offsets[-1] - offsets[0]) if n else 0
    if total:
        powers = _poly_powers(int(lens.max()), coef)
        rows_of = np.repeat(np.arange(n), lens)
        exp = offsets[1:][rows_of] - 1 - np.arange(offsets[0], offsets[-1])
        contrib = data[offsets[0] : offsets[-1]].astype(np.uint64) * powers[exp]
        nz = lens > 0
        starts = (offsets[:-1] - offsets[0])[nz]
        raw[nz] = np.add.reduceat(contrib, starts)
    return _mix64(raw ^ _mix64(lens.astype(np.uint64) ^ np.uint64(seed)))


def packed_windows(
    data: np.ndarray, offsets: np.ndarray, gram: int
) -> tuple[np.ndarray, np.ndarray]:
    """All length-``gram`` byte windows packed injectively into uint64
    (little-endian byte order; requires gram <= 8). Returns
    (values uint64, row index per value).
    """
    assert gram <= 8, "packed windows require gram <= 8"
    lens = np.diff(offsets)
    n = len(lens)
    counts = np.maximum(0, lens - gram + 1).astype(np.int64)
    total = int(counts.sum())
    if not total:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    doc_of = np.repeat(np.arange(n), counts)
    cum = np.zeros(n, dtype=np.int64)
    np.cumsum(counts[:-1], out=cum[1:])
    pos = offsets[:-1][doc_of] + (np.arange(total) - cum[doc_of])
    v = np.zeros(total, dtype=np.uint64)
    for kk in range(gram):
        v |= data[pos + kk].astype(np.uint64) << np.uint64(8 * kk)
    return v, doc_of
