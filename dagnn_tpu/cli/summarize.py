"""Aggregate BO results across seeds.

Equivalent of the reference summarizer (reference:
dvae/bayesian_optimization/summarize.py): parse Test_RMSE_ll.txt ->
mean±std RMSE / log-likelihood / Pearson r tables; list best architecture
scores per round from best_arc_scores.txt.

    python -m dagnn_tpu.cli.summarize --res_dir results/bo
"""

from __future__ import annotations

import argparse
import os
import re

import numpy as np


def parse_rmse_ll(path):
    pat = re.compile(r"Test RMSE: ([-\d.]+), ll: ([-\d.]+), Pearson r: ([-\d.]+)")
    rows = []
    with open(path) as f:
        for line in f:
            m = pat.search(line)
            if m:
                rows.append(tuple(float(g) for g in m.groups()))
    return np.asarray(rows)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--res_dir", default="results/bo")
    args = p.parse_args(argv)

    path = os.path.join(args.res_dir, "Test_RMSE_ll.txt")
    if os.path.exists(path):
        rows = parse_rmse_ll(path)
        if len(rows):
            mean, std = rows.mean(0), rows.std(0)
            print(f"{len(rows)} seeds")
            print(f"RMSE      {mean[0]:.4f} ± {std[0]:.4f}")
            print(f"log-lik   {mean[1]:.4f} ± {std[1]:.4f}")
            print(f"Pearson r {mean[2]:.4f} ± {std[2]:.4f}")
    arcs = os.path.join(args.res_dir, "best_arc_scores.txt")
    if os.path.exists(arcs):
        print("\nbest architecture scores:")
        with open(arcs) as f:
            for line in f:
                print(" ", line.strip())


if __name__ == "__main__":
    main()
