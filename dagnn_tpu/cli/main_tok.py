"""ogbg-code2 TOK driver: predict 5 sub-tokens of a Python function name.

Equivalent of the reference TOK driver (reference: ogbg-code/main_pyg.py),
metric = per-sample set F1. Run:

    python -m dagnn_tpu.cli.main_tok --synthetic 300 --epochs 3 --smoke
    python -m dagnn_tpu.cli.main_tok --data_root /path/to/ogbg_code2 \
        --train_idx /path/to/train15.csv.gz
"""

import argparse

from dagnn_tpu.cli.ogb_driver import add_common_args, run


def main():
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    args = p.parse_args()
    run(args, task="tok")


if __name__ == "__main__":
    main()
