"""Vectorized trace DP == scalar kernel traces, across cost models and
swap orientations (including the reference's golden trace vectors)."""

import random

import numpy as np

from triple_accel_ray.kernels import Edit
from triple_accel_ray.kernels.batch import levenshtein_k_batch_trace
from triple_accel_ray.kernels.scalar import levenshtein_k_with_opts
from triple_accel_ray.kernels.types import (
    EditCosts,
    LEVENSHTEIN_COSTS,
    RDAMERAU_COSTS,
)


def test_reference_trace_vectors():
    d, tr = levenshtein_k_batch_trace(
        [b"abcde", b"abcde", b"abcde", b"abcde"],
        [b" ab cde", b"", b"abcce", b"acbde"],
        np.array([30, 5, 1, 2]),
        RDAMERAU_COSTS,
    )
    assert d.tolist()[0:3] == [2, 5, 1]
    assert tr[0] == [Edit("a_gap", 1), Edit("match", 2), Edit("a_gap", 1),
                     Edit("match", 3)]
    assert tr[1] == [Edit("b_gap", 5)]
    assert tr[2] == [Edit("match", 3), Edit("mismatch", 1), Edit("match", 1)]
    assert d[3] == 1
    assert tr[3] == [Edit("match", 1), Edit("transpose", 1), Edit("match", 2)]


def test_matches_scalar_random():
    rng = random.Random(77)

    def rand_str(n):
        return bytes(rng.randrange(33, 127) for _ in range(n))

    def mutate(s, k):
        b = bytearray(s)
        for _ in range(rng.randrange(0, k + 1)):
            op = rng.randrange(4)
            if op == 0 and b:
                b[rng.randrange(len(b))] = rng.randrange(33, 127)
            elif op == 1:
                b.insert(rng.randrange(len(b) + 1), rng.randrange(33, 127))
            elif op == 2 and b:
                del b[rng.randrange(len(b))]
            elif len(b) > 1:
                i = rng.randrange(len(b) - 1)
                b[i], b[i + 1] = b[i + 1], b[i]
        return bytes(b)

    for costs in [LEVENSHTEIN_COSTS, RDAMERAU_COSTS, EditCosts(2, 2, 1, 1),
                  EditCosts(1, 1, 2, None)]:
        a_col, b_col, ks = [], [], []
        for _ in range(80):
            a = rand_str(rng.randrange(0, 40))
            b = mutate(a, 6) if rng.random() < 0.8 else rand_str(
                rng.randrange(0, 40)
            )
            a_col.append(a)
            b_col.append(b)
            ks.append(rng.randrange(0, 25))
        d, tr = levenshtein_k_batch_trace(
            a_col, b_col, np.array(ks), costs
        )
        for i, (a, b, k) in enumerate(zip(a_col, b_col, ks)):
            want = levenshtein_k_with_opts(a, b, k, True, costs)
            if want is None:
                assert d[i] == -1 and tr[i] is None
            else:
                assert d[i] == want[0] and tr[i] == want[1], (a, b, k, costs)
