"""Needle-in-haystack search over document columns: the reference's search
operators (hamming_search / levenshtein_search, hamming.rs:96-146 and
levenshtein.rs:1589-1838) lifted to batch column form — one needle, a
column of haystacks, exploded Match rows out.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa

from ..kernels import (
    SEARCH_ALL,
    SEARCH_BEST,
    hamming_search_naive_with_opts,
    levenshtein_search_simd_with_opts,
)
from ..kernels.batch import to_byte_rows
from ..kernels.types import EditCosts, LEVENSHTEIN_COSTS


def hamming_search_column(batch: pa.Table, needle: bytes, k: int,
                          search_type: str = SEARCH_ALL,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> pa.Table:
    """Exploded matches (id, start, end, k). k=0 is vectorized exact
    substring scan (numpy sliding comparison); k>0 runs the scalar kernel
    per row (small-query path)."""
    ids = batch[id_col].to_pylist()
    out_id, out_s, out_e, out_k = [], [], [], []
    if k == 0 and len(needle) > 0:
        data, offsets = to_byte_rows(batch[text_col])
        L = len(needle)
        nb = np.frombuffer(needle, dtype=np.uint8)
        lens = np.diff(offsets)
        counts = np.maximum(0, lens - L + 1).astype(np.int64)
        total = int(counts.sum())
        if total:
            doc_of = np.repeat(np.arange(len(ids)), counts)
            cum = np.zeros(len(ids), dtype=np.int64)
            np.cumsum(counts[:-1], out=cum[1:])
            within = np.arange(total) - cum[doc_of]
            pos = offsets[:-1][doc_of] + within
            hit = np.ones(total, dtype=bool)
            for j in range(L):
                hit &= data[pos + j] == nb[j]
            for t in np.nonzero(hit)[0]:
                i = doc_of[t]
                s = int(within[t])
                out_id.append(ids[i])
                out_s.append(s)
                out_e.append(s + L)
                out_k.append(0)
    else:
        texts = batch[text_col].to_pylist()
        for i, t in enumerate(texts):
            for m in hamming_search_naive_with_opts(
                needle, t.encode(), k, search_type
            ):
                out_id.append(ids[i])
                out_s.append(m.start)
                out_e.append(m.end)
                out_k.append(m.k)
    return pa.table(
        {
            id_col: pa.array(out_id),
            "start": pa.array(out_s, pa.int64()),
            "end": pa.array(out_e, pa.int64()),
            "k": pa.array(out_k, pa.int64()),
        }
    )


def levenshtein_search_column(batch: pa.Table, needle: bytes, k: int,
                              search_type: str = SEARCH_ALL,
                              costs: EditCosts = LEVENSHTEIN_COSTS,
                              anchored: bool = False,
                              id_col: str = "doc_id",
                              text_col: str = "text") -> pa.Table:
    ids = batch[id_col].to_pylist()
    texts = batch[text_col].to_pylist()
    out_id, out_s, out_e, out_k = [], [], [], []
    for i, t in enumerate(texts):
        # dispatches to the Myers bit-parallel fast path for unit costs
        for m in levenshtein_search_simd_with_opts(
            needle, t.encode(), k, search_type, costs, anchored
        ):
            out_id.append(ids[i])
            out_s.append(m.start)
            out_e.append(m.end)
            out_k.append(m.k)
    return pa.table(
        {
            id_col: pa.array(out_id),
            "start": pa.array(out_s, pa.int64()),
            "end": pa.array(out_e, pa.int64()),
            "k": pa.array(out_k, pa.int64()),
        }
    )


def search_dataset(docs, needle: bytes, k: int, mode: str = "levenshtein",
                   search_type: str = SEARCH_ALL, anchored: bool = False,
                   id_col: str = "doc_id", text_col: str = "text"):
    """Dataset-level search: stateless map_batches, exploded match rows."""
    if mode == "hamming":
        fn = lambda t: hamming_search_column(  # noqa: E731
            t, needle, k, search_type, id_col, text_col
        )
    else:
        fn = lambda t: levenshtein_search_column(  # noqa: E731
            t, needle, k, search_type, LEVENSHTEIN_COSTS, anchored,
            id_col, text_col
        )
    return docs.map_batches(fn, batch_format="pyarrow")
