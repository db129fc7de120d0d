"""Zero-copy stacking of Arrow ``list<float>`` embedding columns.

The embedding ops previously round-tripped each batch's vector column
through pandas (``col.to_pandas().to_numpy()`` + ``np.stack``), which
builds one Python object per row before re-packing — pure overhead in
the kNN / near-dup hot paths. Arrow already stores a uniform-length
list column as one flat values buffer plus offsets, so when every row
has the same length (the embedding-table invariant) the matrix is a
single ``reshape`` of the flat buffer: no per-row objects at all. The
pandas path survives only as the fallback for ragged / null corner
cases so behavior is unchanged there.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def stack_list_column(col) -> np.ndarray:
    """``ChunkedArray | Array`` of ``list<numeric>`` → ``(n, d) float64``.

    Fast path (uniform row length, no nulls): reshape the flat values
    buffer — zero-copy from Arrow up to the final dtype cast. Fallback:
    the original pandas object path.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    if isinstance(col, pa.FixedSizeListArray) and col.null_count == 0:
        d = col.type.list_size
        # flatten() (not .values) so a sliced array's window is honored
        flat = col.flatten().to_numpy(zero_copy_only=False)
        return flat.astype(np.float64, copy=False).reshape(n, d)
    if isinstance(col, (pa.ListArray, pa.LargeListArray)) and col.null_count == 0:
        off = col.offsets.to_numpy()
        widths = np.diff(off)
        if widths.size and (widths == widths[0]).all() and widths[0] > 0:
            d = int(widths[0])
            flat = col.flatten().to_numpy(zero_copy_only=False)
            return flat.astype(np.float64, copy=False).reshape(n, d)
    return np.stack(col.to_pandas().to_numpy()).astype(np.float64)
