"""Native dagcore library: build, equivalence with numpy implementations."""

import numpy as np
import pytest

from dagnn_tpu.dag import native
from dagnn_tpu.dag.schedule import build_level_schedule

from test_topo import ref_top_sort, random_dag


@pytest.fixture(scope="module")
def lib():
    l = native.get_lib()
    if l is None:
        pytest.skip("no C++ toolchain available")
    return l


def test_native_levels_match_reference(lib):
    rng = np.random.default_rng(0)
    for n in (3, 10, 50, 200):
        for _ in range(3):
            src, dst = random_dag(rng, n)
            if src.size == 0:
                continue
            got = native.native_topo_levels(src, dst, n)
            np.testing.assert_array_equal(got, ref_top_sort(src, dst, n))


def test_native_cycle_raises(lib):
    with pytest.raises(ValueError):
        native.native_topo_levels(np.array([0, 1, 2]), np.array([1, 2, 0]), 3)


def test_native_batch_levels(lib):
    rng = np.random.default_rng(1)
    srcs, dsts, ns = [], [], []
    for n in (5, 12, 8):
        s, d = random_dag(rng, n)
        srcs.append(s); dsts.append(d); ns.append(n)
    noff = np.concatenate([[0], np.cumsum(ns)])
    eoff = np.concatenate([[0], np.cumsum([len(s) for s in srcs])])
    out = native.native_topo_levels_batch(
        np.concatenate(srcs), np.concatenate(dsts), noff, eoff)
    o = 0
    for s, d, n in zip(srcs, dsts, ns):
        np.testing.assert_array_equal(out[o:o + n], ref_top_sort(s, d, n))
        o += n


def _assert_assign_matches(row, pos, rows, s, chunk):
    assert rows == int(s.num_levels)
    # node (row, pos) from the schedule: invert node_ids
    for r in range(rows):
        for k in range(chunk):
            v = s.node_ids[r, k]
            if s.node_mask[r, k]:
                assert row[v] == r and pos[v] == k


def test_native_row_assign_matches_schedule(lib):
    rng = np.random.default_rng(2)
    src, dst = random_dag(rng, 60)
    lv = ref_top_sort(src, dst, 60).astype(np.int32)
    for chunk in (4, 16, 64):
        row, pos, rows = native.native_row_assign(lv, chunk)
        s = build_level_schedule(src, dst, lv, 60, nodes_per_level=chunk,
                                 balance=False)
        _assert_assign_matches(row, pos, rows, s, chunk)


def test_native_row_assign_balanced_matches_schedule(lib):
    rng = np.random.default_rng(4)
    src, dst = random_dag(rng, 60)
    lv = ref_top_sort(src, dst, 60).astype(np.int32)
    indeg = np.bincount(dst, minlength=60)
    outdeg = np.bincount(src, minlength=60)
    for chunk in (4, 16, 64):
        for budget in (0, 8, 32):
            row, pos, rows = native.native_row_assign_balanced(
                lv, indeg, outdeg, chunk, budget)
            s = build_level_schedule(src, dst, lv, 60, nodes_per_level=chunk,
                                     edge_budget=budget or None)
            _assert_assign_matches(row, pos, rows, s, chunk)
