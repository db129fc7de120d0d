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


# Reusable flat scratch (grown geometrically, one copy per worker process).
# Fresh multi-MB temporaries per batch get mmap'd and returned to the OS on
# free, so every batch pays the page faults again — measured as the
# dominant cost of polyhash over large batches on this sandbox.
_SCR: dict = {}


def _scr(name: str, size: int, dtype) -> np.ndarray:
    buf = _SCR.get(name)
    if buf is None or len(buf) < size:
        cap = size if buf is None else max(size, 2 * len(buf))
        buf = np.empty(cap, dtype)
        _SCR[name] = buf
    return buf[:size]


# Flat bytes per internal polyhash chunk. The exponent/contribution
# scratch costs 16 B per text byte; sized to the whole batch it exceeds L2
# and every pass streams DRAM — and this sandbox VM sustains only ~2.4 GB/s
# of AGGREGATE memory traffic across all cores (measured: the identical
# keyer workload burned 5.4 CPU-s single-process vs 176 CPU-s split across
# 32 processes, pure memory-stall inflation; wall ~flat with core count).
# Row-aligned 64 KB chunks keep the working set (~1 MB) cache-resident, so
# only the text itself is read from DRAM and the stage scales with cores.
_POLY_CHUNK_BYTES = 1 << 16


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
    gather + multiply over the flat bytes, one segment reduction — split
    into row-aligned cache-resident chunks (see _POLY_CHUNK_BYTES)."""
    lens = np.diff(offsets)
    n = len(lens)
    raw = np.zeros(n, dtype=np.uint64)
    total = int(offsets[-1] - offsets[0]) if n else 0
    if total:
        powers = _poly_powers(int(lens.max()), coef)
        i0 = 0
        while i0 < n:
            # widest row range whose byte span stays under the chunk bound
            # (a single over-long row gets its own chunk)
            limit = int(offsets[i0]) + _POLY_CHUNK_BYTES
            i1 = int(np.searchsorted(offsets, limit, side="right")) - 1
            i1 = min(max(i1, i0 + 1), n)
            _polyhash_chunk(
                data, offsets[i0 : i1 + 1], powers, raw[i0:i1]
            )
            i0 = i1
    return _mix64(raw ^ _mix64(lens.astype(np.uint64) ^ np.uint64(seed)))


def _polyhash_chunk(
    data: np.ndarray,
    offsets: np.ndarray,
    powers: np.ndarray,
    raw: np.ndarray,
) -> None:
    """Polynomial row hashes for one row-aligned chunk; writes the raw
    (pre-mix) sums into ``raw`` (rows aligned with offsets)."""
    lens = np.diff(offsets)
    total = int(offsets[-1] - offsets[0])
    if not total:
        return
    nz = lens > 0
    starts = np.asarray(offsets[:-1] - offsets[0])[nz]
    # exponent of flat position p = (end of its row) - 1 - p, built
    # without per-position gathers or fresh temporaries: scatter the
    # row-end deltas at row starts, cumsum to broadcast, subtract the
    # cached iota (empty rows occupy no positions, so nz-row starts
    # tile the buffer exactly)
    exp = _scr("ph_exp", total, np.int64)
    exp[:] = 0
    ends = np.asarray(offsets[1:] - offsets[0])[nz].astype(np.int64)
    deltas = np.empty_like(ends)
    if len(ends):
        deltas[0] = ends[0]
        np.subtract(ends[1:], ends[:-1], out=deltas[1:])
    exp[starts] = deltas
    np.cumsum(exp, out=exp)
    exp -= _scr_iota(total)
    exp -= 1
    contrib = _scr("ph_tmp", total, np.uint64)
    np.take(powers, exp, out=contrib)
    np.multiply(
        contrib, data[offsets[0] : offsets[-1]], out=contrib,
        casting="unsafe",
    )
    raw[nz] = np.add.reduceat(contrib, starts)


def _scr_iota(size: int) -> np.ndarray:
    buf = _SCR.get("iota")
    if buf is None or len(buf) < size:
        cap = size if buf is None else max(size, 2 * len(buf))
        buf = np.arange(cap, dtype=np.int64)
        _SCR["iota"] = buf
    return buf[:size]


def row_chunks(cum: np.ndarray, cap: int):
    """Yield (i0, i1) row spans whose summed per-row work (given as a
    cumulative array with a leading 0) stays <= cap; a single over-large
    row gets its own span. Used to keep per-span scratch CACHE-RESIDENT —
    see _POLY_CHUNK_BYTES for why bounded-but-DRAM-sized is not enough on
    this host."""
    n = len(cum) - 1
    i0 = 0
    while i0 < n:
        limit = int(cum[i0]) + cap
        i1 = int(np.searchsorted(cum, limit, side="right")) - 1
        i1 = min(max(i1, i0 + 1), n)
        yield i0, i1
        i0 = i1


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
