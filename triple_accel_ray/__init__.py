"""triple_accel_ray — a Ray-Data-native record-linkage / data-processing engine.

Distance & search kernels with exact output parity to the reference
triple_accel library, embedded as the pairwise-scoring inner loop of a
blocking + scoring + transitive-clustering entity-resolution pipeline over
Parquet conversation-transcript tables, plus the dedup / similarity / text
analysis operators a large-scale training-data pipeline needs.
"""

__version__ = "0.1.0"

from . import kernels  # noqa: F401
