"""Shared kernel types: edit costs, matches, edits, search types.

Semantics mirror the reference library's public types
(/root/reference/src/lib.rs:131-174 and src/levenshtein.rs:20-89):
``Match`` spans are [start, end) byte offsets in the haystack, ``Edit``
is a run-length-encoded traceback entry, and ``EditCosts`` carries the
same validation invariants as ``EditCosts::new`` and ``check_search``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

# u32::MAX in the reference; additions saturate at this value.
U32_MAX = (1 << 32) - 1


class Match(NamedTuple):
    """A single match location: [start, end) span in the haystack + cost."""

    start: int
    end: int
    k: int


class Edit(NamedTuple):
    """A run-length-encoded traceback entry: ``count`` edits of type ``edit``."""

    edit: str  # one of EDIT_TYPES
    count: int


# EditType enum values (reference lib.rs:147-154).
MATCH = "match"
MISMATCH = "mismatch"
A_GAP = "a_gap"  # gap in a: a char of b is consumed with no char of a
B_GAP = "b_gap"  # gap in b
TRANSPOSE = "transpose"
EDIT_TYPES = (MATCH, MISMATCH, A_GAP, B_GAP, TRANSPOSE)

# SearchType enum values (reference lib.rs:170-174).
SEARCH_ALL = "all"
SEARCH_BEST = "best"


@dataclass(frozen=True)
class EditCosts:
    """Costs for mismatch / gap / gap-open / transpose edits.

    Invariants (reference levenshtein.rs:44-52):
      * ``mismatch_cost`` > 0 and ``gap_cost`` > 0
      * if transposes are allowed: ``transpose_cost`` > 0 and
        ``transpose_cost >> 1`` < both mismatch and gap cost.

    For search routines additionally (levenshtein.rs:67-71):
      * ``transpose_cost <= start_gap_cost + gap_cost``.
    """

    mismatch_cost: int = 1
    gap_cost: int = 1
    start_gap_cost: int = 0
    transpose_cost: Optional[int] = None

    def __post_init__(self) -> None:
        if not (0 < self.mismatch_cost <= 255):
            raise ValueError("mismatch_cost must be in 1..=255")
        if not (0 < self.gap_cost <= 255):
            raise ValueError("gap_cost must be in 1..=255")
        if not (0 <= self.start_gap_cost <= 255):
            raise ValueError("start_gap_cost must be in 0..=255")
        if self.transpose_cost is not None:
            t = self.transpose_cost
            if not (0 < t <= 255):
                raise ValueError("transpose_cost must be in 1..=255")
            if not ((t >> 1) < self.mismatch_cost and (t >> 1) < self.gap_cost):
                raise ValueError(
                    "transpose must be cheaper than the equivalent mismatch/gap edits"
                )

    def check_search(self) -> None:
        """Extra invariant for search routines (levenshtein.rs:67-71)."""
        if self.transpose_cost is not None:
            if self.transpose_cost > self.start_gap_cost + self.gap_cost:
                raise ValueError(
                    "transpose_cost must be <= start_gap_cost + gap_cost for search"
                )

    @property
    def allow_transpose(self) -> bool:
        return self.transpose_cost is not None

    def is_unit(self) -> bool:
        """True for plain Levenshtein costs (the bit-parallel fast path)."""
        return (
            self.mismatch_cost == 1
            and self.gap_cost == 1
            and self.start_gap_cost == 0
            and self.transpose_cost is None
        )


LEVENSHTEIN_COSTS = EditCosts(1, 1, 0, None)
RDAMERAU_COSTS = EditCosts(1, 1, 0, 1)


def saturating_add(x: int, y: int) -> int:
    """u32 saturating add, as used for gap-cost accumulation."""
    s = x + y
    return U32_MAX if s > U32_MAX else s


def as_seq(s):
    """Normalize input to an indexable sequence of comparable symbols.

    bytes/bytearray -> bytes (ints), str -> str (chars), list/tuple kept.
    Mirrors the reference's generic ``T: PartialEq`` slices.
    """
    if isinstance(s, (bytes, bytearray, memoryview)):
        return bytes(s)
    return s
