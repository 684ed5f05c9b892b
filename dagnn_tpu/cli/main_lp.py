"""ogbg-code2 LP driver: classify the longest-path length of the AST DAG.

Equivalent of the reference LP driver (reference: ogbg-code/main_pyg_lp.py):
275-way classification of len_longest_path (precomputed at dataset load,
ogb/io/read_graph_pyg.py:54), accuracy metric, DAGNN defaults gated_sum /
unidirectional (main_pyg_lp.py:140-148).
"""

import argparse

from dagnn_tpu.cli.ogb_driver import add_common_args, run


def main():
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.set_defaults(dagnn_agg="gated_sum", dagnn_bidir=0)
    args = p.parse_args()
    run(args, task="lp")


if __name__ == "__main__":
    main()
