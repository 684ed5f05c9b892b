"""ogbg-code2 pipeline tests: vocab, codecs, augmentation, evaluators,
raw reader round-trip on a generated fixture."""

import gzip
import os

import numpy as np
import pytest

from dagnn_tpu.data import code2


def test_vocab_mapping():
    seqs = [["a", "b", "a"], ["b", "a", "c"], ["d"]]
    v2i, i2v = code2.get_vocab_mapping(seqs, 2)
    # a (3) and b (2) survive; order by count
    assert i2v[:2] == ["a", "b"]
    assert v2i[code2.UNK] == 2 and v2i[code2.EOS] == 3
    assert len(i2v) == 4


def test_vocab_stable_tiebreak():
    # equal counts: first-appearance order (np.argsort stable on -counts)
    seqs = [["x", "y", "z"]]
    _, i2v = code2.get_vocab_mapping(seqs, 3)
    assert i2v[:3] == ["x", "y", "z"]


def test_seq_codec_roundtrip():
    v2i, i2v = code2.get_vocab_mapping([["f", "g"]], 5)
    arr = code2.encode_seq_to_arr(["f", "oov", "g"], v2i, 5)
    assert arr.tolist() == [v2i["f"], v2i[code2.UNK], v2i["g"],
                            v2i[code2.EOS], v2i[code2.EOS]]
    # decode clips at first EOS
    assert code2.decode_arr_to_seq(arr, i2v) == ["f", code2.UNK, "g"]
    # no EOS at all
    assert code2.decode_arr_to_seq(np.array([0, 1]), i2v) == ["f", "g"]


def test_augment_edge2_dag_and_attrs():
    src = np.array([0, 0, 1])
    dst = np.array([1, 2, 3])
    attributed = np.array([0, 1, 1, 1])
    s, d, a = code2.augment_edge2(src, dst, attributed)
    # 3 AST + 2 next-token (nodes 1->2, 2->3)
    assert len(s) == 5
    np.testing.assert_array_equal(s[3:], [1, 2])
    np.testing.assert_array_equal(d[3:], [2, 3])
    np.testing.assert_array_equal(a[:3, 0], 0)
    np.testing.assert_array_equal(a[3:, 0], 1)
    np.testing.assert_array_equal(a[:, 1], 0)  # no inverse edges


def test_augment_edge_four_way():
    src = np.array([0])
    dst = np.array([1])
    attributed = np.array([1, 1])
    s, d, a = code2.augment_edge(src, dst, attributed)
    assert len(s) == 4  # ast, inverse, next-token, inverse-next-token
    np.testing.assert_array_equal(a, [[0, 0], [0, 1], [1, 0], [1, 1]])


def test_eval_f1_exact():
    out = code2.eval_f1([["a", "b"]], [["a", "c"]])
    assert out["precision"] == 0.5 and out["recall"] == 0.5 and out["F1"] == 0.5
    perfect = code2.eval_f1([["x"]], [["x"]])
    assert perfect["F1"] == 1.0
    empty_pred = code2.eval_f1([["x"]], [[]])
    assert empty_pred["F1"] == 0.0


def test_eval_acc():
    assert code2.eval_acc([1, 2, 3], [1, 2, 4])["acc"] == pytest.approx(2 / 3)


def _write_csv_gz(path, rows):
    with gzip.open(path, "wt") as f:
        for r in rows:
            f.write(",".join(str(x) for x in r) + "\n")


def test_raw_reader_fixture(tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    # two graphs: 3 nodes / 2 edges, 2 nodes / 1 edge
    _write_csv_gz(raw / "edge.csv.gz", [(0, 1), (0, 2), (0, 1)])
    _write_csv_gz(raw / "num-node-list.csv.gz", [(3,), (2,)])
    _write_csv_gz(raw / "num-edge-list.csv.gz", [(2,), (1,)])
    _write_csv_gz(raw / "node-feat.csv.gz",
                  [(1, 10), (2, 20), (3, 30), (4, 40), (5, 50)])
    for name, col in (("node_is_attributed", [0, 1, 1, 1, 1]),
                      ("node_dfs_order", [0, 1, 2, 0, 1]),
                      ("node_depth", [0, 1, 1, 0, 1])):
        _write_csv_gz(raw / f"{name}.csv.gz", [(v,) for v in col])
    _write_csv_gz(raw / "graph-label.csv.gz", [("get value",), ("set",)])

    gs = code2.read_code2_raw(str(raw))
    assert len(gs) == 2
    assert gs[0]["num_nodes"] == 3 and gs[0]["y"] == ["get", "value"]
    np.testing.assert_array_equal(gs[1]["edge_src"], [0])
    v2i, i2v = code2.get_vocab_mapping([g["y"] for g in gs], 10)
    dag = code2.raw_to_dag(gs[0], v2i, 5)
    assert dag.num_nodes == 3
    assert dag.num_edges == 3  # 2 AST + 1 next-token (nodes 1->2)
    assert "len_longest_path" in dag.y
    assert dag.y["y_arr"].shape == (5,)
