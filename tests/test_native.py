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


def test_native_stagger_matches_numpy(lib):
    """The C++ greedy stagger packer reproduces the numpy implementation
    bit-for-bit (same order, cost function, and tie-breaking)."""
    from dagnn_tpu.dag.schedule import stagger_offsets
    rng = np.random.default_rng(7)
    for trial in range(6):
        ngraphs = int(rng.integers(2, 12))
        levels, node_graph, edge_dst = [], [], []
        off = 0
        for g in range(ngraphs):
            n = int(rng.integers(2, 40))
            src, dst = random_dag(rng, n)
            lv = ref_top_sort(src, dst, n)
            levels.append(lv)
            node_graph.append(np.full(n, g))
            edge_dst.append(dst + off)
            off += n
        level = np.concatenate(levels)
        node_graph = np.concatenate(node_graph)
        edge_dst = np.concatenate(edge_dst)
        for kn, eb in ((4, 0), (8, 16), (16, 8)):
            ref = stagger_offsets(level, node_graph, ngraphs, kn,
                                  edge_budget=eb, edge_dst=edge_dst,
                                  _native=False)
            got = native.native_stagger_offsets(level, node_graph, ngraphs,
                                                kn, eb, edge_dst)
            np.testing.assert_array_equal(got, ref,
                                          err_msg=f"trial {trial} kn={kn}")


def test_native_pack_rows_bit_identical():
    from dagnn_tpu.dag.native import get_lib
    from dagnn_tpu.dag.schedule import pack_rows
    if get_lib() is None:
        import pytest
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(21)
    for trial in range(5):
        n = int(rng.integers(20, 120))
        src, dst = [], []
        for i in range(n):
            for j in range(i + 1, min(i + 12, n)):
                if rng.random() < 0.25:
                    src.append(i)
                    dst.append(j)
        if not src:
            src, dst = [0], [1]
        src, dst = np.array(src), np.array(dst)
        # topo levels / remaining depth
        lvl = np.zeros(n, np.int64)
        for s_, d_ in sorted(zip(src, dst)):
            lvl[d_] = max(lvl[d_], lvl[s_] + 1)
        rd = np.zeros(n, np.int64)
        for s_, d_ in sorted(zip(src, dst), reverse=True):
            rd[s_] = max(rd[s_], rd[d_] + 1)
        kn = int(rng.integers(4, 16))
        eb = max(int(np.bincount(dst, minlength=n).max()), 8)
        a = pack_rows(lvl, rd, src, dst, kn, eb, eb, _native=False)
        b = pack_rows(lvl, rd, src, dst, kn, eb, eb, _native=True)
        np.testing.assert_array_equal(a, b)
