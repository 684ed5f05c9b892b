"""Code2Dataset acquisition pipeline: zip download/extract (file:// URL),
raw -> processed npz cache, cache reload parity, driver integration.

The build environment has no network, so the download path is exercised
against a locally built archive — the exact same code that would fetch the
official zip (reference: ogb/graphproppred/dataset_pyg.py:106-166)."""

import gzip
import os
import zipfile

import numpy as np
import pytest

from dagnn_tpu.data import code2
from dagnn_tpu.data import code2_dataset as c2d


def _write_csv_gz(path, rows):
    with gzip.open(path, "wt") as f:
        for r in rows:
            f.write(",".join(str(x) for x in r) + "\n")


def make_raw_tree(ddir, n_graphs=6, seed=0):
    """Official-format dataset dir: raw/ + split/project/."""
    rnd = np.random.default_rng(seed)
    raw = os.path.join(ddir, "raw")
    spl = os.path.join(ddir, "split", "project")
    os.makedirs(raw), os.makedirs(spl)
    edges, nn, ne, feats, attrib, dfs, depth, labels = [], [], [], [], [], [], [], []
    for g in range(n_graphs):
        n = int(rnd.integers(4, 9))
        nn.append((n,))
        es = [(i, int(rnd.integers(i + 1, n))) for i in range(n - 1)]
        ne.append((len(es),))
        edges += es
        feats += [(int(rnd.integers(0, 9)), int(rnd.integers(0, 11)))
                  for _ in range(n)]
        attrib += [(int(i >= n // 2),) for i in range(n)]
        dfs += [(i,) for i in range(n)]
        depth += [(min(i, 3),) for i in range(n)]
        labels.append((" ".join(
            rnd.choice(["get", "set", "value", "name", "idx"],
                       rnd.integers(1, 4)).tolist()),))
    _write_csv_gz(os.path.join(raw, "edge.csv.gz"), edges)
    _write_csv_gz(os.path.join(raw, "num-node-list.csv.gz"), nn)
    _write_csv_gz(os.path.join(raw, "num-edge-list.csv.gz"), ne)
    _write_csv_gz(os.path.join(raw, "node-feat.csv.gz"), feats)
    _write_csv_gz(os.path.join(raw, "node_is_attributed.csv.gz"), attrib)
    _write_csv_gz(os.path.join(raw, "node_dfs_order.csv.gz"), dfs)
    _write_csv_gz(os.path.join(raw, "node_depth.csv.gz"), depth)
    _write_csv_gz(os.path.join(raw, "graph-label.csv.gz"), labels)
    perm = rnd.permutation(n_graphs)
    k = n_graphs // 3
    _write_csv_gz(os.path.join(spl, "train.csv.gz"),
                  [(int(i),) for i in perm[: n_graphs - 2 * k]])
    _write_csv_gz(os.path.join(spl, "valid.csv.gz"),
                  [(int(i),) for i in perm[n_graphs - 2 * k: n_graphs - k]])
    _write_csv_gz(os.path.join(spl, "test.csv.gz"),
                  [(int(i),) for i in perm[n_graphs - k:]])


def test_process_and_reload_parity(tmp_path):
    root = str(tmp_path)
    ddir = os.path.join(root, "ogbg_code2")
    make_raw_tree(ddir)
    ds = c2d.Code2Dataset(root, download=False)
    ref = code2.read_code2_raw(os.path.join(ddir, "raw"))
    assert len(ds) == len(ref)
    for i in range(len(ds)):
        g, r = ds[i], ref[i]
        for k in ("edge_src", "edge_dst", "node_feat", "node_is_attributed",
                  "node_dfs_order", "node_depth"):
            np.testing.assert_array_equal(g[k], r[k], err_msg=f"graph {i} {k}")
        assert g["num_nodes"] == r["num_nodes"] and g["y"] == r["y"]
    # cache-only reload: remove raw, must still load identically
    import shutil
    shutil.rmtree(os.path.join(ddir, "raw"))
    ds2 = c2d.Code2Dataset(root, download=False)
    np.testing.assert_array_equal(ds2.edge, ds.edge)
    assert ds2.labels == ds.labels
    for k in ("train", "valid", "test"):
        np.testing.assert_array_equal(ds2.split_idx[k], ds.split_idx[k])


def test_download_extract_via_file_url(tmp_path, monkeypatch):
    # build the official-archive shape: code2.zip containing code2/{raw,split}
    src = tmp_path / "srcdata" / "code2"
    make_raw_tree(str(src), n_graphs=4, seed=3)
    zpath = tmp_path / "srcdata" / "code2_official.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for dirp, _, files in os.walk(src):
            for f in files:
                full = os.path.join(dirp, f)
                z.write(full, os.path.relpath(full, tmp_path / "srcdata"))
    monkeypatch.setitem(
        c2d.META["ogbg-code2"], "url", "file://" + str(zpath))
    root = str(tmp_path / "dataset")
    ds = c2d.Code2Dataset(root)  # downloads (file://), extracts, processes
    assert len(ds) == 4
    assert os.path.exists(os.path.join(root, "ogbg_code2", "processed",
                                       "data.npz"))


def test_download_failure_message(tmp_path):
    with pytest.raises((RuntimeError, FileNotFoundError)):
        c2d.download_and_extract(str(tmp_path / "nowhere"))


def test_zip_placed_manually_is_sufficient(tmp_path):
    """The offline hand-off (scripts/fetch_code2.md Option A): placing the
    official zip at <root>/code2.zip must be enough — no network touched,
    no code edits."""
    src = tmp_path / "build" / "code2"
    make_raw_tree(str(src), n_graphs=5, seed=7)
    root = tmp_path / "dataset"
    os.makedirs(root)
    with zipfile.ZipFile(root / "code2.zip", "w") as z:
        for dirp, _, files in os.walk(src):
            for f in files:
                full = os.path.join(dirp, f)
                z.write(full, os.path.relpath(full, tmp_path / "build"))
    ds = c2d.Code2Dataset(str(root))   # download=True, but zip pre-placed
    assert len(ds) == 5


def test_zip_slip_member_rejected(tmp_path):
    root = tmp_path / "dataset"
    os.makedirs(root)
    with zipfile.ZipFile(root / "code2.zip", "w") as z:
        z.writestr("../evil.txt", "pwn")
    with pytest.raises(RuntimeError, match="unsafe zip member"):
        c2d.download_and_extract(str(root))
    assert not (tmp_path / "evil.txt").exists()


def test_driver_smoke_fold_on_constructed_raw(tmp_path):
    """One smoke TOK fold of the real driver against a constructed dataset
    tree — the full real-data path (load -> vocab -> folds -> F1 CSV)."""
    import argparse
    from dagnn_tpu.cli import ogb_driver
    root = str(tmp_path / "ds")
    make_raw_tree(os.path.join(root, "ogbg_code2"), n_graphs=12, seed=5)
    res = str(tmp_path / "results")
    p = ogb_driver.add_common_args(argparse.ArgumentParser())
    args = p.parse_args([
        "--data_root", root, "--epochs", "1", "--folds", "1",
        "--batch_size", "4", "--emb_dim", "16", "--num_vocab", "10",
        "--chunk_size", "32", "--dir_results", res,
        "--dir_save", str(tmp_path / "saved"), "--cpu",
        "--checkpointing", "0"])
    ogb_driver.run(args, task="tok")
    import csv
    with open(os.path.join(res, "dagnn_tok_train.csv")) as f:
        rows = list(csv.reader(f))
    assert len(rows) >= 2  # header + >=1 epoch row with F1 columns


def test_basic_driver_smoke(tmp_path):
    """Eval-only trivial-baseline driver (reference main_pyg_basic.py):
    runs all three baselines, writes the CSV, perfect model scores F1=1."""
    import csv
    from dagnn_tpu.cli import main_basic
    res = str(tmp_path / "r")
    main_basic.main(["--synthetic", "60", "--num_vocab", "30",
                     "--batch_size", "20", "--dir_results", res])
    with open(os.path.join(res, "baselines_basic.csv")) as f:
        rows = {(r["model"], r["split"]): float(r["F1"])
                for r in csv.DictReader(f)}
    assert rows[("perfect", "test")] == 1.0
    assert 0.0 <= rows[("guess1", "valid")] <= 1.0
