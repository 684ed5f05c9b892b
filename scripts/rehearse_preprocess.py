"""Full-scale ogbg-code2 preprocessing rehearsal.

Generates a synthetic raw tree at the REAL corpus's scale (452,741 graphs,
lognormal size distribution matching the published avg ~125 nodes/graph,
~1.1 edges/node after AST+next-token augmentation) and drives the entire
production pipeline end-to-end, timing every stage and recording peak RSS:

  1. raw csv.gz generation (not a pipeline stage - fixture cost only)
  2. Code2Dataset first construction  -> process_raw (csv.gz -> npz cache)
     (reference: ogb/graphproppred/dataset_pyg.py:106-166 process step)
  3. Code2Dataset reconstruction      -> cache load only
  4. vocab build over the train split (ogbg-code/utils.py:32-86)
  5. raw_to_dag conversion of EVERY graph (augment_edge2 + y encoding)
  6. batched topological leveling of the full corpus (the fork's
     add_order_info_01-at-process-time analog, ogb/io/read_graph_pyg.py:51)

SURVEY.md §7 hard part 6 claims the preprocessing is vectorized; this
script is the evidence run (results/preprocess_rehearsal/REPORT.md).

Usage:
  python scripts/rehearse_preprocess.py [--graphs 452741] [--root DIR]
"""

import argparse
import gzip
import sys
import os
import os.path as osp
import resource
import shutil
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def gen_raw(root: str, n_graphs: int, seed: int = 0):
    """Vectorized synthetic raw tree in the official csv.gz layout."""
    from dagnn_tpu.dag.native import native_topo_levels_batch

    rng = np.random.default_rng(seed)
    # Code2Dataset layout: <root>/ogbg_code2/{raw, split/project}
    ddir = osp.join(root, "ogbg_code2")
    raw = osp.join(ddir, "raw")
    split = osp.join(ddir, "split", "project")
    os.makedirs(raw, exist_ok=True)
    os.makedirs(split, exist_ok=True)

    # sizes: lognormal clipped to [4, 30000], mean ~125 (real corpus stats)
    sizes = np.clip(rng.lognormal(4.35, 0.85, n_graphs), 4, 30000).astype(
        np.int64)
    n_total = int(sizes.sum())
    offs = np.zeros(n_graphs + 1, np.int64)
    np.cumsum(sizes, out=offs[1:])

    # random trees: parent(local i) uniform in [0, i)
    local = np.arange(n_total, dtype=np.int64) - np.repeat(offs[:-1], sizes)
    parent = (rng.random(n_total) * np.maximum(local, 1)).astype(np.int64)
    root_mask = local == 0
    src_l = parent[~root_mask]
    dst_l = local[~root_mask]
    e_per_g = sizes - 1

    # node depth == topo level of a tree (native batched Kahn)
    e_offs = np.zeros(n_graphs + 1, np.int64)
    np.cumsum(e_per_g, out=e_offs[1:])
    depth = native_topo_levels_batch(src_l, dst_l, offs, e_offs)
    if depth is None:  # no toolchain: per-graph numpy fallback is too slow
        raise RuntimeError("native dagcore unavailable; rehearsal needs it")

    def write_gz(name, arr, fmt="%d"):
        t0 = time.perf_counter()
        with gzip.open(osp.join(raw, name), "wt", compresslevel=1) as f:
            np.savetxt(f, arr, fmt=fmt, delimiter=",")
        return time.perf_counter() - t0

    times = {}
    times["edge.csv.gz"] = write_gz(
        "edge.csv.gz", np.stack([src_l, dst_l], 1))
    times["num-node-list.csv.gz"] = write_gz("num-node-list.csv.gz",
                                             sizes[:, None])
    times["num-edge-list.csv.gz"] = write_gz("num-edge-list.csv.gz",
                                             e_per_g[:, None])
    feat = np.stack([rng.integers(0, 98, n_total),
                     rng.integers(0, 10030, n_total)], 1)
    times["node-feat.csv.gz"] = write_gz("node-feat.csv.gz", feat)
    times["node_is_attributed.csv.gz"] = write_gz(
        "node_is_attributed.csv.gz",
        rng.integers(0, 2, n_total)[:, None])
    times["node_dfs_order.csv.gz"] = write_gz("node_dfs_order.csv.gz",
                                              local[:, None])
    times["node_depth.csv.gz"] = write_gz("node_depth.csv.gz",
                                          depth.astype(np.int64)[:, None])

    # labels: 1-5 zipf-ish subtokens per graph
    toks = np.array([f"tok{i}" for i in range(9000)])
    t0 = time.perf_counter()
    nt = rng.integers(1, 6, n_graphs)
    tok_idx = (rng.pareto(1.2, int(nt.sum())) * 37).astype(np.int64) % 9000
    labels, pos = [], 0
    for k in nt:
        # official format: ONE csv field of space-separated subtokens
        # (reference ogb/io/read_graph_raw.py:137-138 splits on ' ')
        labels.append(" ".join(toks[tok_idx[pos:pos + k]]))
        pos += k
    with gzip.open(osp.join(raw, "graph-label.csv.gz"), "wt",
                   compresslevel=1) as f:
        f.write("\n".join(labels) + "\n")
    times["graph-label.csv.gz"] = time.perf_counter() - t0

    # project split ~ 90/4.5/5.5 like the real corpus
    perm = rng.permutation(n_graphs)
    a, b = int(n_graphs * 0.90), int(n_graphs * 0.945)
    for name, idx in (("train", perm[:a]), ("valid", perm[a:b]),
                      ("test", perm[b:])):
        with gzip.open(osp.join(split, f"{name}.csv.gz"), "wt",
                       compresslevel=1) as f:
            np.savetxt(f, np.sort(idx)[:, None], fmt="%d")
    return sizes, times


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--graphs", type=int, default=452741)
    ap.add_argument("--root", default="/tmp/code2_rehearsal")
    ap.add_argument("--report",
                    default="results/preprocess_rehearsal/REPORT.md")
    ap.add_argument("--keep-root", action="store_true")
    args = ap.parse_args()

    from dagnn_tpu.data import code2
    from dagnn_tpu.data.code2_dataset import Code2Dataset
    from dagnn_tpu.dag.native import native_topo_levels_batch

    report = [f"# Preprocessing rehearsal — {args.graphs} graphs",
              "", "| stage | wall s | peak RSS GB |", "|---|---|---|"]

    if osp.isdir(args.root):
        shutil.rmtree(args.root)
    t0 = time.perf_counter()
    sizes, gen_times = gen_raw(args.root, args.graphs)
    t_gen = time.perf_counter() - t0
    report.append(f"| raw fixture generation (ours, not a pipeline stage) "
                  f"| {t_gen:.1f} | {rss_gb():.2f} |")
    report.append(f"|   - nodes total {int(sizes.sum())}, "
                  f"mean {sizes.mean():.1f}, max {sizes.max()} | | |")

    t0 = time.perf_counter()
    ds = Code2Dataset(args.root)
    report.append(f"| Code2Dataset first build (process_raw: csv.gz->npz) "
                  f"| {time.perf_counter() - t0:.1f} | {rss_gb():.2f} |")

    t0 = time.perf_counter()
    ds = Code2Dataset(args.root)
    report.append(f"| Code2Dataset reload (npz cache) "
                  f"| {time.perf_counter() - t0:.1f} | {rss_gb():.2f} |")

    split = ds.split_idx
    t0 = time.perf_counter()
    vocab2idx, idx2vocab = code2.get_vocab_mapping(
        [ds[i]["y"] for i in split["train"]], 5000)
    report.append(f"| vocab build over {len(split['train'])} train ys "
                  f"| {time.perf_counter() - t0:.1f} | {rss_gb():.2f} |")

    t0 = time.perf_counter()
    graphs = []
    for i in range(len(ds)):
        graphs.append(code2.raw_to_dag(ds[i], vocab2idx, 5))
    t_conv = time.perf_counter() - t0
    report.append(f"| raw_to_dag x {len(ds)} (augment_edge2 + y encode) "
                  f"| {t_conv:.1f} | {rss_gb():.2f} |")

    # batched topo leveling of the WHOLE corpus (both directions)
    t0 = time.perf_counter()
    n_off = np.zeros(len(graphs) + 1, np.int64)
    np.cumsum([g.num_nodes for g in graphs], out=n_off[1:])
    e_off = np.zeros(len(graphs) + 1, np.int64)
    np.cumsum([g.num_edges for g in graphs], out=e_off[1:])
    src = np.concatenate([g.edge_src for g in graphs])
    dst = np.concatenate([g.edge_dst for g in graphs])
    lv_f = native_topo_levels_batch(src, dst, n_off, e_off)
    lv_r = native_topo_levels_batch(dst, src, n_off, e_off)
    assert lv_f is not None and lv_r is not None
    report.append(f"| batched topo leveling, both dirs, {len(src)} edges "
                  f"| {time.perf_counter() - t0:.1f} | {rss_gb():.2f} |")

    report += ["", f"csv.gz write breakdown (fixture): " + ", ".join(
        f"{k} {v:.1f}s" for k, v in gen_times.items()), ""]

    os.makedirs(osp.dirname(args.report), exist_ok=True)
    with open(args.report, "w") as f:
        f.write("\n".join(report) + "\n")
    print("\n".join(report))
    if not args.keep_root:
        shutil.rmtree(args.root, ignore_errors=True)


if __name__ == "__main__":
    main()
