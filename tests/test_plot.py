"""DAG plotting (reference plot_DAG, dvae/util.py:470-572)."""

import os

import numpy as np

from dagnn_tpu.data.na import NAGraph, parse_enas_row, synthetic_bn_rows, parse_bn_row
from dagnn_tpu.utils.plot import plot_dag


def test_plot_enas(tmp_path):
    g = parse_enas_row([[2], [3, 1], [4, 0, 1]])
    p = plot_dag(g, str(tmp_path), "arc", data_type="ENAS")
    assert os.path.exists(p) and os.path.getsize(p) > 0
    p2 = plot_dag(g, str(tmp_path), "arc_bb", backbone=True)
    assert os.path.exists(p2)


def test_plot_bn_and_invalid(tmp_path):
    import ast
    row, _y = ast.literal_eval(synthetic_bn_rows(1, seed=3)[0])
    g = parse_bn_row(row)
    p = plot_dag(g, str(tmp_path), "bn", data_type="BN")
    assert os.path.exists(p) and os.path.getsize(p) > 0
    # g=None renders the 'invalid' placeholder (util.py:485-490)
    p3 = plot_dag(None, str(tmp_path), "bad", data_type="ENAS", pdf=True)
    assert p3.endswith(".pdf") and os.path.exists(p3)
