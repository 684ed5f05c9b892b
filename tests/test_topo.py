"""DAG core tests: leveling parity with the reference algorithm's semantics."""

import numpy as np
import pytest

from dagnn_tpu.dag.topo import (
    topo_levels,
    reverse_levels,
    assert_topo_order,
    longest_path_length,
    _ranges,
)


def ref_top_sort(src, dst, n):
    """Direct transcription of the reference algorithm's SEMANTICS
    (iterated frontier removal, src/utils_dag.py:8-35) as an oracle."""
    node_ids = np.arange(n)
    order = np.zeros(n, dtype=int)
    uneval = np.ones(n, dtype=bool)
    k = 0
    while uneval.any():
        unready = dst[uneval[src]]
        take = uneval & ~np.isin(node_ids, unready)
        order[take] = k
        uneval[take] = False
        k += 1
    return order


def random_dag(rng, n, p=0.3):
    """Random DAG: edges only i->j for i<j under a random permutation."""
    perm = rng.permutation(n)
    srcs, dsts = [], []
    for i in range(n):
        for j in range(i + 1, n):
            if rng.random() < p:
                srcs.append(perm[i])
                dsts.append(perm[j])
    return np.array(srcs, dtype=np.int64), np.array(dsts, dtype=np.int64)


def test_ranges():
    s = np.array([0, 5, 9])
    e = np.array([3, 5, 12])
    np.testing.assert_array_equal(_ranges(s, e), [0, 1, 2, 9, 10, 11])
    assert _ranges(np.array([2]), np.array([2])).size == 0


def test_chain():
    src = np.array([0, 1, 2])
    dst = np.array([1, 2, 3])
    np.testing.assert_array_equal(topo_levels(src, dst, 4), [0, 1, 2, 3])
    np.testing.assert_array_equal(reverse_levels(src, dst, 4), [3, 2, 1, 0])
    assert longest_path_length(src, dst, 4) == 3


def test_diamond():
    #   0 -> 1 -> 3, 0 -> 2 -> 3
    src = np.array([0, 0, 1, 2])
    dst = np.array([1, 2, 3, 3])
    np.testing.assert_array_equal(topo_levels(src, dst, 4), [0, 1, 1, 2])


def test_isolated_nodes():
    src = np.array([0])
    dst = np.array([1])
    lv = topo_levels(src, dst, 4)
    np.testing.assert_array_equal(lv, [0, 1, 0, 0])


def test_no_edges():
    lv = topo_levels(np.zeros(0, np.int64), np.zeros(0, np.int64), 3)
    np.testing.assert_array_equal(lv, [0, 0, 0])


def test_cycle_raises():
    src = np.array([0, 1, 2])
    dst = np.array([1, 2, 0])
    with pytest.raises(ValueError):
        topo_levels(src, dst, 3)


def test_matches_reference_semantics():
    rng = np.random.default_rng(0)
    for n in [2, 5, 10, 30, 80]:
        for trial in range(5):
            src, dst = random_dag(rng, n)
            if src.size == 0:
                continue
            got = topo_levels(src, dst, n)
            expect = ref_top_sort(src, dst, n)
            np.testing.assert_array_equal(got, expect)
            assert_topo_order(src, dst, got)
            got_r = reverse_levels(src, dst, n)
            expect_r = ref_top_sort(dst, src, n)
            np.testing.assert_array_equal(got_r, expect_r)


def test_assert_topo_order_catches_violation():
    src = np.array([0, 1])
    dst = np.array([1, 2])
    with pytest.raises(AssertionError):
        assert_topo_order(src, dst, np.array([1, 0, 2]))
