"""Suffix-array LCS correctness vs a brute-force oracle."""

import numpy as np
import pytest

from kmcp_spark.operators.verify import suffix_array_lcs


def brute_lcs(a: str, b: str) -> int:
    best = 0
    for i in range(len(a)):
        for j in range(len(b)):
            k = 0
            while i + k < len(a) and j + k < len(b) and a[i + k] == b[j + k]:
                k += 1
            best = max(best, k)
    return best


@pytest.mark.parametrize(
    "a,b",
    [
        ("banana", "ananas"),
        ("hello world", "world hello"),
        ("abc", "xyz"),
        ("", "abc"),
        ("same", "same"),
        ("aaaa", "aa"),
        ("the quick brown fox", "a quick brown cat"),
    ],
)
def test_lcs_fixed_cases(a, b):
    assert suffix_array_lcs(a, b) == brute_lcs(a, b)


def test_lcs_random_vs_brute():
    rng = np.random.default_rng(13)
    alpha = "abcd "
    for _ in range(40):
        a = "".join(alpha[i] for i in rng.integers(0, len(alpha), int(rng.integers(1, 60))))
        b = "".join(alpha[i] for i in rng.integers(0, len(alpha), int(rng.integers(1, 60))))
        assert suffix_array_lcs(a, b) == brute_lcs(a, b)


def test_lcs_substring_case():
    a = "prefix COMMONCHUNK suffix"
    b = "COMMONCHUNK"
    assert suffix_array_lcs(a, b) == len(b)
