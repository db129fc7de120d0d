"""Batched multi-word Myers bit-parallel edit distance — the long-string
unit-cost tier of ``levenshtein_k_batch``.

The banded DP in ``batch.py`` costs O(band) numpy ops per DP row; at
len≈1000 / k≈100 that is ~200 ops per row and the per-op dispatch overhead
dominates. Myers (1999) packs 64 pattern positions per machine word, so
the same work is W = ceil(m/64) word updates per text char — with the
word-serial carry loop vectorized ACROSS pairs (state is a (pairs, W)
uint64 register file), the op count per text char drops from O(band) to
O(m/64) ≈ 16 at len 1000, an order of magnitude fewer numpy dispatches.

Block carry formulation follows Hyyrö (2003): horizontal deltas propagate
between words through (P, M) carry bits; the running score tracks the cell
D[m][j] via each pair's own high bit (pairs in a chunk share W but not m).
Alphabet remapping (only bytes present in the chunk) keeps the per-chunk
PEQ table at (pairs, alphabet, W) words.

Unit costs only (mismatch=1, gap=1, start_gap=0, no transpose) — exactly
the tier the reference serves with its AVX2 anti-diagonal core
(levenshtein.rs:829-1283). Differentially tested against the banded DP
and the scalar oracle in tests/test_batch_kernels.py.
"""

from __future__ import annotations

import numpy as np

__all__ = ["myers_k_batch_rows"]


def myers_k_batch_rows(
    da: np.ndarray,
    oa: np.ndarray,
    db: np.ndarray,
    ob: np.ndarray,
    rows: np.ndarray,
    max_k: np.ndarray,
    out: np.ndarray,
    chunk_pairs: int = 2048,
) -> None:
    """Fill ``out[rows]`` with unit-cost edit distance (or -1 if > max_k).

    Pattern = the shorter string of each pair; chunks group pairs with the
    same word count W and similar text lengths.
    """
    lens_a = (oa[rows + 1] - oa[rows]).astype(np.int64)
    lens_b = (ob[rows + 1] - ob[rows]).astype(np.int64)
    m_all = np.minimum(lens_a, lens_b)
    n_all = np.maximum(lens_a, lens_b)
    W_all = (m_all + 63) >> 6

    # m == 0 pairs: distance = n
    zero = m_all == 0
    if zero.any():
        vals = n_all[zero]
        ok = vals <= max_k[zero]
        tgt = rows[zero]
        out[tgt[ok]] = vals[ok]

    live = np.nonzero(~zero)[0]
    order = live[np.lexsort((n_all[live], W_all[live]))]
    c0 = 0
    while c0 < order.size:
        W = int(W_all[order[c0]])
        c1 = c0
        while c1 < order.size and W_all[order[c1]] == W and c1 - c0 < chunk_pairs:
            c1 += 1
        sel = order[c0:c1]
        _chunk_myers(da, oa, db, ob, rows[sel], m_all[sel], n_all[sel],
                     lens_a[sel], W, max_k[sel], out)
        c0 = c1


def _gather_rows(data, starts, lens, width) -> np.ndarray:
    idx = starts[:, None] + np.arange(width, dtype=np.int64)[None, :]
    np.clip(idx, 0, max(0, data.size - 1), out=idx)
    outm = data[idx] if data.size else np.zeros((len(starts), width), np.uint8)
    outm[np.arange(width)[None, :] >= lens[:, None]] = 0
    return outm


def _chunk_myers(da, oa, db, ob, rows, m, n, lens_a, W, max_k, out) -> None:
    nr = len(rows)
    # pattern = shorter string; text = longer
    pat_is_a = m == lens_a
    pat_starts = np.where(pat_is_a, oa[rows], ob[rows])
    txt_starts = np.where(pat_is_a, ob[rows], oa[rows])
    # gather pattern/text matrices (patterns from either buffer)
    maxm = int(m.max())
    maxn = int(n.max())
    P = np.zeros((nr, maxm), dtype=np.uint8)
    T = np.zeros((nr, maxn), dtype=np.uint8)
    a_rows = np.nonzero(pat_is_a)[0]
    b_rows = np.nonzero(~pat_is_a)[0]
    if a_rows.size:
        P[a_rows] = _gather_rows(da, pat_starts[a_rows], m[a_rows], maxm)
        T[a_rows] = _gather_rows(db, txt_starts[a_rows], n[a_rows], maxn)
    if b_rows.size:
        P[b_rows] = _gather_rows(db, pat_starts[b_rows], m[b_rows], maxm)
        T[b_rows] = _gather_rows(da, txt_starts[b_rows], n[b_rows], maxn)

    # alphabet remap over bytes present in the chunk
    present = np.union1d(np.unique(P), np.unique(T))
    amap = np.zeros(256, dtype=np.int32)
    amap[present] = np.arange(len(present), dtype=np.int32)
    A = len(present)
    Pm = amap[P]
    Tm = np.ascontiguousarray(amap[T].T)  # (maxn, nr) — contiguous columns

    # PEQ flat with a pair's W words contiguous — the per-step gathers for
    # words 0..W-1 then touch consecutive addresses (cache-line sharing)
    peq = np.zeros(nr * A * W, dtype=np.uint64)
    pair_of = np.repeat(np.arange(nr), maxm)
    ppos = np.tile(np.arange(maxm), nr)
    valid = ppos < m[pair_of]
    pair_v = pair_of[valid]
    pos_v = ppos[valid]
    sym_v = Pm.ravel()[valid]
    # sort + segment-OR instead of np.bitwise_or.at (which is ~1us/elem)
    keys = (pair_v * A + sym_v) * W + (pos_v >> 6)
    bits = np.uint64(1) << (pos_v & 63).astype(np.uint64)
    korder = np.argsort(keys, kind="stable")
    ks = keys[korder]
    bs = bits[korder]
    if ks.size:
        seg = np.concatenate([[0], np.nonzero(ks[1:] != ks[:-1])[0] + 1])
        peq[ks[seg]] = np.bitwise_or.reduceat(bs, seg)

    # compacted live state: rows with decided results are dropped wholesale
    PV = np.full((W, nr), np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    MV = np.zeros((W, nr), dtype=np.uint64)
    hi = ((m - 1) & 63).astype(np.uint64)  # per-pair high bit in last word
    one = np.uint64(1)
    top = np.uint64(63)

    # --- Ukkonen band over WORDS: for unit costs |i - j| <= D[i][j], so
    # cells with |i - j| > kb can never be <= kb and may hold safe
    # OVERESTIMATES. Blocks activate at the bottom with a +1-per-row
    # gradient (D[i][j] <= D[64b][j] + (i - 64b) always, i.e. an upper
    # bound) BEFORE any of their cells can enter the band (early
    # activation is safe; late would not be), and retire at the top one
    # word late (stale blocks are never read again). The running score
    # tracks D[bottom][j] at the band's bottom edge; bottom reaches each
    # pair's m before that pair's text ends (n + kb >= m).
    kb = int(max_k.max())

    def _last_w(col: int) -> int:
        return min(W - 1, (col + kb + 63) >> 6)

    def _first_w(col: int) -> int:
        return max(0, (col - kb - 64) >> 6)

    m_u = m.astype(np.uint64).copy()
    cur_last = _last_w(1)
    bottom = np.minimum(m_u, np.uint64(64 * (cur_last + 1)))
    score = bottom.copy()  # D[i][0] = i (first column)

    rows_c = rows.copy()
    n_c = n.copy()
    mk_c = max_k.astype(np.uint64).copy()
    peq_base = np.arange(nr, dtype=np.int64) * (A * W)  # flat pair offsets
    sel = np.arange(nr)  # column index into Tm (never compacted)

    def _scratch(ln):
        return [np.empty(ln, dtype=np.uint64) for _ in range(9)]

    eq_idx = np.empty(nr, dtype=np.int64)
    eq0, eqt, t1, t2, t4, t5, hin_pos, hin_neg, hswap = _scratch(nr)
    xv = np.empty(nr, dtype=np.uint64)

    sym_scale = np.int64(W)
    maxn_c = int(n_c.max())
    j = 0
    while j < maxn_c:
        col = j + 1
        new_last = _last_w(col)
        if new_last > cur_last:
            for b in range(cur_last + 1, new_last + 1):
                PV[b][: len(sel)] = np.uint64(0xFFFFFFFFFFFFFFFF)
                MV[b][: len(sel)] = 0
            nb = np.minimum(m_u, np.uint64(64 * (new_last + 1)))
            score += nb - bottom
            bottom = nb
            cur_last = new_last
        first = _first_w(col)
        np.multiply(Tm[j, sel], sym_scale, out=eq_idx)
        np.add(eq_idx, peq_base, out=eq_idx)
        if first:
            np.add(eq_idx, np.int64(first), out=eq_idx)
        hin_pos[:] = one
        hin_neg[:] = 0
        last = cur_last
        last_shift = hi if last == W - 1 else top
        for w in range(first, last + 1):
            pv = PV[w]
            mv = MV[w]
            np.take(peq, eq_idx, out=eq0)
            if w < last:
                np.add(eq_idx, np.int64(1), out=eq_idx)
            np.bitwise_or(eq0, mv, out=xv)           # xv = eq0 | mv
            np.bitwise_or(eq0, hin_neg, out=eqt)     # eq  = eq0 | hin_neg
            np.bitwise_and(eqt, pv, out=t1)          # xh = (((eq&pv)+pv)^pv)|eq
            np.add(t1, pv, out=t1)
            np.bitwise_xor(t1, pv, out=t1)
            np.bitwise_or(t1, eqt, out=t1)           # t1 = xh
            np.bitwise_or(t1, pv, out=t2)            # ph = mv | ~(xh | pv)
            np.invert(t2, out=t2)
            np.bitwise_or(t2, mv, out=t2)            # t2 = ph
            np.bitwise_and(pv, t1, out=t1)           # t1 = mh
            if w == last:
                # delta of the band-bottom row: the pattern's own high
                # bit once the band reaches m, else bit 63 of the block
                np.right_shift(t2, last_shift, out=t4)
                np.bitwise_and(t4, one, out=t4)
                np.add(score, t4, out=score)
                np.right_shift(t1, last_shift, out=t4)
                np.bitwise_and(t4, one, out=t4)
                np.subtract(score, t4, out=score)
            np.right_shift(t2, top, out=t4)          # hout_pos
            np.bitwise_and(t4, one, out=t4)
            np.right_shift(t1, top, out=t5)          # hout_neg
            np.bitwise_and(t5, one, out=t5)
            np.left_shift(t2, one, out=t2)           # ph = (ph<<1) | hin_pos
            np.bitwise_or(t2, hin_pos, out=t2)
            np.left_shift(t1, one, out=t1)           # mh = (mh<<1) | hin_neg
            np.bitwise_or(t1, hin_neg, out=t1)
            np.bitwise_or(xv, t2, out=hswap)         # PV = mh | ~(xv | ph)
            np.invert(hswap, out=hswap)
            np.bitwise_or(t1, hswap, out=pv)
            np.bitwise_and(t2, xv, out=mv)           # MV = ph & xv
            hin_pos, t4 = t4, hin_pos
            hin_neg, t5 = t5, hin_neg
        j += 1
        # finished pairs (their text is exhausted)
        done = n_c == j
        if done.any():
            vals = score[done].astype(np.int64)
            ok = vals <= mk_c[done].astype(np.int64)
            tgt = rows_c[done]
            out[tgt[ok]] = vals[ok]
        # early exit: score can drop at most 1 per remaining char
        # (score + j > mk + n  <=>  score - (n - j) > mk, all non-negative).
        # Sound only where score is the TRUE D[m][j]: the band invariant
        # guarantees exactness for cells with |i - j| <= kb, so we require
        # per-pair j + kb >= m (the D[m][j] cell is inside the band; late
        # blocks' gradient seeding D[i][j] <= D[64b][j] + (i-64b) only
        # overestimates cells with |i-j| > kb).  cur_last == W-1 ensures
        # the band bottom has reached every pair's pattern end (bottom ==
        # min(m, 64W) == m), so score rides row m at all.
        if (j & 15) == 0 and cur_last == W - 1:
            exact = np.uint64(j + kb) >= m_u
            done = done | (
                exact & (score + np.uint64(j) > mk_c + n_c.astype(np.uint64))
            )
        if done.any():
            alive = ~done
            PV = np.ascontiguousarray(PV[:, alive])
            MV = np.ascontiguousarray(MV[:, alive])
            score = score[alive]
            hi = hi[alive]
            m_u = m_u[alive]
            bottom = bottom[alive]
            rows_c = rows_c[alive]
            n_c = n_c[alive]
            mk_c = mk_c[alive]
            peq_base = peq_base[alive]
            sel = sel[alive]
            ln = len(sel)
            if ln == 0:
                break
            maxn_c = int(n_c.max())
            eq_idx = np.empty(ln, dtype=np.int64)
            eq0, eqt, t1, t2, t4, t5, hin_pos, hin_neg, hswap = _scratch(ln)
            xv = np.empty(ln, dtype=np.uint64)


def myers_k_batch(col_a, col_b, k, chunk_pairs: int = 2048) -> np.ndarray:
    """Standalone unit-cost k-bounded batch distance (convenience/tests)."""
    from .batch import to_byte_rows, _max_k_unit_k
    from .types import LEVENSHTEIN_COSTS

    da, oa = to_byte_rows(col_a)
    db, ob = to_byte_rows(col_b)
    lens_a = np.diff(oa)
    lens_b = np.diff(ob)
    n = len(lens_a)
    out = np.full(n, -1, dtype=np.int64)
    if n == 0:
        return out
    short_len = np.minimum(lens_a, lens_b)
    long_len = np.maximum(lens_a, lens_b)
    k_arr = np.asarray(k, dtype=np.int64)
    max_k, unit_k = _max_k_unit_k(short_len, long_len, k_arr, LEVENSHTEIN_COSTS)
    feasible = (long_len - short_len) <= unit_k
    todo = np.nonzero(feasible)[0]
    if todo.size:
        myers_k_batch_rows(da, oa, db, ob, todo, max_k[todo], out, chunk_pairs)
    return out
