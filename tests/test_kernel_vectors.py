"""Golden unit vectors ported 1:1 from the reference's test suite
(/root/reference/tests/basic_tests.rs, 16 test fns). Every assertion there
appears here with the same inputs and expected outputs.
"""

from triple_accel_ray.kernels import (
    LEVENSHTEIN_COSTS,
    RDAMERAU_COSTS,
    SEARCH_ALL,
    Edit,
    EditCosts,
    Match,
    alloc_str,
    fill_str,
    hamming,
    hamming_naive,
    hamming_search_naive,
    hamming_search_naive_with_opts,
    hamming_search_simd,
    hamming_search_simd_with_opts,
    hamming_simd_movemask,
    hamming_simd_parallel,
    hamming_words_64,
    hamming_words_128,
    levenshtein,
    levenshtein_exp,
    levenshtein_naive,
    levenshtein_naive_k_with_opts,
    levenshtein_naive_with_opts,
    levenshtein_search_naive,
    levenshtein_search_naive_with_opts,
    levenshtein_search_simd,
    levenshtein_search_simd_with_opts,
    levenshtein_simd_k_with_opts,
    rdamerau,
    rdamerau_exp,
)

CK = EditCosts  # shorthand: CK(mismatch, gap, start_gap, transpose)


# basic_tests.rs:5-16
def test_basic_hamming_naive():
    assert hamming_naive(b"abc", b"abd") == 1
    assert hamming_naive(b"", b"") == 0


# basic_tests.rs:18-29
def test_basic_hamming_search_naive():
    res = hamming_search_naive_with_opts(b"abc", b"  abc  abb", 1, SEARCH_ALL)
    assert res == [Match(2, 5, 0), Match(7, 10, 1)]
    assert hamming_search_naive(b"abc", b"  abc  abb") == [Match(2, 5, 0)]


# basic_tests.rs:31-42
def test_basic_hamming_search_simd():
    hay = b"  abc  abb" + b"a" * 61
    res = hamming_search_simd_with_opts(b"abc", hay, 1, SEARCH_ALL)
    assert res == [Match(2, 5, 0), Match(7, 10, 1)]
    assert hamming_search_simd(b"abc", hay) == [Match(2, 5, 0)]


# basic_tests.rs:44-72
def test_basic_hamming_words():
    a = alloc_str(3)
    fill_str(a, b"abc")
    b = alloc_str(3)
    fill_str(b, b"abd")
    assert hamming_words_64(a, b) == 1
    assert hamming_words_128(a, b) == 1


# basic_tests.rs:74-98
def test_basic_hamming_simd():
    a = b"abc" + b"a" * 30
    b = b"abd" + b"a" * 30
    assert hamming_simd_movemask(a, b) == 1
    assert hamming_simd_movemask(b"", b"") == 0
    assert hamming_simd_parallel(a, b) == 1
    assert hamming_simd_parallel(b"", b"") == 0
    assert hamming(a, b) == 1


# basic_tests.rs:100-161
def test_basic_levenshtein_naive():
    assert levenshtein_naive(b"abcde", b" ab cde") == 2
    assert levenshtein_naive(b"abcde", b"") == 5
    assert levenshtein_naive(b"abcde", b"abcdee") == 1
    assert levenshtein_naive(b"abcde", b"acde") == 1
    assert levenshtein_naive(b"abcde", b"abbde") == 1
    assert levenshtein_naive_with_opts(b"abcde", b"acbde", False, CK(1, 1, 0, 1))[0] == 1
    assert levenshtein_naive_with_opts(b"ab", b"ba", False, CK(1, 1, 0, 1))[0] == 1
    assert levenshtein_naive_with_opts(b"abc", b"aac", False, CK(2, 3, 0, None))[0] == 2
    assert levenshtein_naive_with_opts(b"abc", b"aac", False, CK(3, 1, 0, None))[0] == 2
    assert levenshtein_naive_with_opts(b"abc", b"ac", False, CK(1, 1, 2, None))[0] == 3
    assert levenshtein_naive_with_opts(b"acde", b"abce", False, CK(2, 1, 2, None))[0] == 4
    assert levenshtein_naive_with_opts(b"abcde", b"abe", False, CK(1, 1, 2, None))[0] == 4


# basic_tests.rs:163-195
def test_trace_on_levenshtein_naive():
    d, tr = levenshtein_naive_with_opts(b"abcde", b" ab cde", True, LEVENSHTEIN_COSTS)
    assert d == 2
    assert tr == [Edit("a_gap", 1), Edit("match", 2), Edit("a_gap", 1), Edit("match", 3)]

    d, tr = levenshtein_naive_with_opts(b"abcde", b"", True, LEVENSHTEIN_COSTS)
    assert d == 5
    assert tr == [Edit("b_gap", 5)]

    d, tr = levenshtein_naive_with_opts(b"abcde", b"abcce", True, LEVENSHTEIN_COSTS)
    assert d == 1
    assert tr == [Edit("match", 3), Edit("mismatch", 1), Edit("match", 1)]

    d, tr = levenshtein_naive_with_opts(b"abcde", b"acbde", True, CK(1, 1, 0, 1))
    assert d == 1
    assert tr == [Edit("match", 1), Edit("transpose", 1), Edit("match", 2)]


# basic_tests.rs:197-223
def test_basic_levenshtein():
    assert levenshtein(b"abcde", b" ab cde") == 2
    assert levenshtein(b"abcde", b"") == 5
    assert levenshtein(b"abcde", b"abcdee") == 1
    assert levenshtein(b"abcde", b"acde") == 1
    assert levenshtein(b"abcde", b"abbde") == 1


# basic_tests.rs:225-251
def test_basic_levenshtein_exp():
    assert levenshtein_exp(b"abcde", b" ab cde") == 2
    assert levenshtein_exp(b"abcde", b"") == 5
    assert levenshtein_exp(b"abcde", b"abcdee") == 1
    assert levenshtein_exp(b"abcde", b"acde") == 1
    assert levenshtein_exp(b"abcde", b"abbde") == 1


# basic_tests.rs:253-279
def test_basic_rdamerau():
    assert rdamerau(b"abcde", b" ab dce") == 3
    assert rdamerau(b"abcde", b"") == 5
    assert rdamerau(b"abcde", b"bacdee") == 2
    assert rdamerau(b"abcde", b"acde") == 1
    assert rdamerau(b"abcde", b"abbde") == 1


# basic_tests.rs:281-307
def test_basic_rdamerau_exp():
    assert rdamerau_exp(b"abcde", b" ab dce") == 3
    assert rdamerau_exp(b"abcde", b"") == 5
    assert rdamerau_exp(b"abcde", b"bacdee") == 2
    assert rdamerau_exp(b"abcde", b"acde") == 1
    assert rdamerau_exp(b"abcde", b"abbde") == 1


# basic_tests.rs:309-393
def test_basic_levenshtein_naive_k_with_opts():
    cases = [
        (b"abcde", b" ab cde", 2, LEVENSHTEIN_COSTS, 2),
        (b"abcde", b"", 10, LEVENSHTEIN_COSTS, 5),
        (b"abcde", b"abcdee", 2, LEVENSHTEIN_COSTS, 1),
        (b"abcde", b"acde", 2, LEVENSHTEIN_COSTS, 1),
        (b"abcde", b"abbde", 2, LEVENSHTEIN_COSTS, 1),
        (b"abcde", b"abbde", 1, LEVENSHTEIN_COSTS, 1),
        (b"abcde", b"acbde", 1, CK(1, 1, 0, 1), 1),
        (b"ab", b"ba", 1, CK(1, 1, 0, 1), 1),
        (b"abc", b"aac", 5, CK(2, 3, 0, None), 2),
        (b"abc", b"aac", 5, CK(3, 1, 0, None), 2),
        (b"abc", b"ac", 5, CK(1, 1, 2, None), 3),
        (b"acde", b"abce", 5, CK(2, 1, 2, None), 4),
        (b"abcde", b"abe", 5, CK(1, 1, 2, None), 4),
    ]
    for a, b, k, costs, want in cases:
        res = levenshtein_naive_k_with_opts(a, b, k, False, costs)
        assert res is not None, (a, b, k)
        assert res[0] == want and res[1] is None, (a, b, k)

    assert levenshtein_naive_k_with_opts(b"abcde", b"hello", 1, False, RDAMERAU_COSTS) is None


# basic_tests.rs:395-427
def test_trace_on_levenshtein_naive_k_with_opts():
    res = levenshtein_naive_k_with_opts(b"abcde", b" ab cde", 2, True, LEVENSHTEIN_COSTS)
    assert res[0] == 2
    assert res[1] == [Edit("a_gap", 1), Edit("match", 2), Edit("a_gap", 1), Edit("match", 3)]

    res = levenshtein_naive_k_with_opts(b"abcde", b"", 10, True, LEVENSHTEIN_COSTS)
    assert res[0] == 5
    assert res[1] == [Edit("b_gap", 5)]

    res = levenshtein_naive_k_with_opts(b"abcde", b"abcce", 2, True, LEVENSHTEIN_COSTS)
    assert res[0] == 1
    assert res[1] == [Edit("match", 3), Edit("mismatch", 1), Edit("match", 1)]

    res = levenshtein_naive_k_with_opts(b"abcde", b"acbde", 2, True, CK(1, 1, 0, 1))
    assert res[0] == 1
    assert res[1] == [Edit("match", 1), Edit("transpose", 1), Edit("match", 2)]


# basic_tests.rs:429-543
def test_basic_levenshtein_simd_k_with_opts():
    cases = [
        (b"abcde", b" ab cde", 2, LEVENSHTEIN_COSTS, 2),
        (b"abcde", b"", 30, LEVENSHTEIN_COSTS, 5),
        (b"abcde", b"abcdee", 20, LEVENSHTEIN_COSTS, 1),
        (b"abcde", b"acde", 1, LEVENSHTEIN_COSTS, 1),
        (b"abcde", b"abbde", 2, LEVENSHTEIN_COSTS, 1),
        (b"abcde", b"acbde", 2, CK(1, 1, 0, 1), 1),
        (b"ab", b"ba", 2, CK(1, 1, 0, 1), 1),
        (b"abc", b"aac", 5, CK(2, 3, 0, None), 2),
        (b"abc", b"aac", 5, CK(3, 1, 0, None), 2),
        (b"abc", b"ac", 5, CK(1, 1, 2, None), 3),
        (b"acde", b"abce", 5, CK(2, 1, 2, None), 4),
        (b"abcde", b"abe", 5, CK(1, 1, 2, None), 4),
        (b"\0", b"", 2, LEVENSHTEIN_COSTS, 1),
        (b"ab\0de", b"a\0bde", 2, CK(1, 1, 0, 1), 1),
        (b"\0b", b"b\0", 2, CK(1, 1, 0, 1), 1),
        (b"\0", b"\0\0", 2, LEVENSHTEIN_COSTS, 1),
        (b"\0", b"\0", 2, CK(1, 1, 0, 1), 0),
        (b"\0\0b\0", b"\0b\0\0", 2, CK(1, 1, 0, 1), 1),
    ]
    for a, b, k, costs, want in cases:
        res = levenshtein_simd_k_with_opts(a, b, k, False, costs)
        assert res is not None, (a, b, k)
        assert res[0] == want and res[1] is None, (a, b, k)

    assert levenshtein_simd_k_with_opts(b"abcde", b"hello", 1, False, RDAMERAU_COSTS) is None


# basic_tests.rs:545-577
def test_trace_on_levenshtein_simd_k_with_opts():
    res = levenshtein_simd_k_with_opts(b"abcde", b" ab cde", 30, True, LEVENSHTEIN_COSTS)
    assert res[0] == 2
    assert res[1] == [Edit("a_gap", 1), Edit("match", 2), Edit("a_gap", 1), Edit("match", 3)]

    res = levenshtein_simd_k_with_opts(b"abcde", b"", 5, True, LEVENSHTEIN_COSTS)
    assert res[0] == 5
    assert res[1] == [Edit("b_gap", 5)]

    res = levenshtein_simd_k_with_opts(b"abcde", b"abcce", 1, True, LEVENSHTEIN_COSTS)
    assert res[0] == 1
    assert res[1] == [Edit("match", 3), Edit("mismatch", 1), Edit("match", 1)]

    res = levenshtein_simd_k_with_opts(b"abcde", b"acbde", 2, True, CK(1, 1, 0, 1))
    assert res[0] == 1
    assert res[1] == [Edit("match", 1), Edit("transpose", 1), Edit("match", 2)]


# basic_tests.rs:579-681
def _search_vectors(search_with_opts, search_default):
    assert search_with_opts(b"bcc", b"abcde", 1, SEARCH_ALL, LEVENSHTEIN_COSTS, False) == [
        Match(1, 3, 1), Match(1, 4, 1)]
    assert search_with_opts(b"", b"", 1, SEARCH_ALL, LEVENSHTEIN_COSTS, False) == []
    assert search_with_opts(b"tast", b"testing 123 tating!", 1, SEARCH_ALL,
                            LEVENSHTEIN_COSTS, False) == [Match(0, 4, 1), Match(12, 15, 1)]
    assert search_with_opts(b"tst", b"testing 123 tasting!", 1, SEARCH_ALL,
                            LEVENSHTEIN_COSTS, False) == [Match(0, 4, 1), Match(12, 16, 1)]
    assert search_default(b"tst", b"testing 123 tasting!") == [Match(0, 4, 1), Match(12, 16, 1)]
    assert search_with_opts(b"ab", b"ba", 1, SEARCH_ALL, CK(1, 1, 0, 1), False) == [
        Match(0, 1, 1), Match(0, 2, 1)]
    assert search_with_opts(b"test", b"...tseting!", 1, SEARCH_ALL, CK(1, 1, 0, 1), False) == [
        Match(3, 7, 1)]
    assert search_with_opts(b"test", b"...tssting!", 2, SEARCH_ALL, CK(3, 1, 0, None), False) == [
        Match(3, 5, 2), Match(3, 7, 2)]
    assert search_with_opts(b"tst", b"testing 123 tasting", 1, SEARCH_ALL,
                            LEVENSHTEIN_COSTS, False)[0] == Match(0, 4, 1)
    assert search_with_opts(b"test", b" testing 123 tasting", 1, SEARCH_ALL,
                            LEVENSHTEIN_COSTS, True) == [Match(1, 5, 1)]
    assert search_with_opts(b"test", b" etsting 123 tasting", 2, SEARCH_ALL,
                            RDAMERAU_COSTS, True) == [Match(0, 3, 2), Match(0, 4, 2), Match(1, 5, 2)]
    assert search_with_opts(b"test", b"etsting", 1, SEARCH_ALL, RDAMERAU_COSTS, True) == [
        Match(0, 4, 1)]
    assert search_with_opts(b"test", b"est", 3, SEARCH_ALL, CK(1, 1, 2, None), True) == [
        Match(0, 3, 3)]
    assert search_with_opts(b"testing", b"   teing", 4, SEARCH_ALL, CK(1, 1, 2, None), False) == [
        Match(1, 8, 4)]
    assert search_with_opts(b"testing", b"   teing", 4, SEARCH_ALL, CK(2, 1, 2, None), False) == [
        Match(3, 8, 4)]
    assert search_with_opts(b"abc", b"", 5, SEARCH_ALL, LEVENSHTEIN_COSTS, False) == [
        Match(0, 0, 3)]
    assert search_with_opts(b"", b"abc", 2, SEARCH_ALL, LEVENSHTEIN_COSTS, True) == [
        Match(0, 0, 0), Match(0, 1, 1), Match(0, 2, 2)]


def test_basic_levenshtein_search_naive():
    _search_vectors(levenshtein_search_naive_with_opts, levenshtein_search_naive)


# basic_tests.rs:683-815 (adds NUL-byte cases; SIMD search allows NULs)
def test_basic_levenshtein_search_simd():
    _search_vectors(levenshtein_search_simd_with_opts, levenshtein_search_simd)

    assert levenshtein_search_simd_with_opts(b"\0b", b"b\0", 1, SEARCH_ALL,
                                             RDAMERAU_COSTS, True) == [Match(0, 1, 1), Match(0, 2, 1)]
    assert levenshtein_search_simd_with_opts(b"\0\0", b"\0\0", 0, SEARCH_ALL,
                                             RDAMERAU_COSTS, True) == [Match(0, 2, 0)]
    assert levenshtein_search_simd_with_opts(b"testing", b"   \0esting", 1, SEARCH_ALL,
                                             LEVENSHTEIN_COSTS, False) == [Match(3, 10, 1)]
    assert levenshtein_search_simd_with_opts(b"\0\0\0", b"\0\0", 1, SEARCH_ALL,
                                             LEVENSHTEIN_COSTS, True) == [Match(0, 2, 1)]
    assert levenshtein_search_simd_with_opts(b"\0\0", b"   \0\0", 0, SEARCH_ALL,
                                             RDAMERAU_COSTS, False) == [Match(3, 5, 0)]
