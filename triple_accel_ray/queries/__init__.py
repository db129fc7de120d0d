"""Driver-contract query registry (round-5 split of the
monolithic queries.py): every operator exposed as a callable
(sf_dir -> Dataset/Table) plus, where ANSI-SQL-expressible, a DuckDB
oracle string computing the same result with the same column names.
Float-parity rules and the fixture contract are documented in
``_common``; the per-domain modules hold the registrations; ``_window``
holds the driver correctness-window lists."""
from typing import Callable, Dict

from ._common import (  # noqa: F401
    CLUST_DIM,
    CLUST_SIZE,
    FIXTURE_SF001,
    _clustered_emb,
    _clustered_vectors,
)
from ._window import DRIVER_WINDOW_R4, DRIVER_WINDOW_R5  # noqa: F401
from . import (
    er,
    kernels,
    dedup,
    similarity,
    text,
    windows,
    relational,
    media,
    curation,
    sketch,
    export,
    profile,
    graph,
)

_REGISTRY = [
    er,
    kernels,
    dedup,
    similarity,
    text,
    windows,
    relational,
    media,
    curation,
    sketch,
    export,
    profile,
    graph,
]


def build_queries() -> Dict[str, Callable]:
    q: Dict[str, Callable] = {}
    for mod in _REGISTRY:
        mod.register(q)
    # The driver checks the FIRST 50 keys in dict order: put the
    # current round's window first (see _window / ROTATION.md)
    ordered: Dict[str, Callable] = {}
    for name in DRIVER_WINDOW_R5:
        ordered[name] = q[name]  # KeyError => window list out of sync
    for name, fn in q.items():
        if name not in ordered:
            ordered[name] = fn
    assert len(ordered) == len(q)
    return ordered


def build_oracles() -> Dict[str, str]:
    o: Dict[str, str] = {}
    for mod in _REGISTRY:
        mod.register_sql(o)
    return o
