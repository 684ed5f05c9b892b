"""BN latent-quality diagnosis: GP on RAW structure features as a
predictability ceiling.

The 10-seed sparse-GP scoring of DAGNN_BN latents reaches Pearson r 0.57
on BIC (results/bo_bn) vs 0.966 for ENAS accuracy. Two hypotheses:
(a) the synthetic asia corpus's BIC is intrinsically hard to predict from
any fixed-dim embedding, or (b) the BN VAE underfits. This script settles
it by fitting the SAME sparse GP (same protocol as cli/run_bo: y sign +
standardization, M=500, identical scoring) directly on lossless raw
structure features — flattened adjacency (100 bits) + one-hot node types
(100 bits) — i.e., an upper bound on what any encoder could expose.

Writes results/bo_bn/ceiling_raw_features.txt.

Usage: JAX_PLATFORMS=cpu python scripts/bn_ceiling.py [--seeds 5]
"""

import argparse
import os.path as osp
import pickle
import sys

import numpy as np
import scipy.stats as sps

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def features(graphs):
    feats = []
    for g in graphs:
        n = len(g.types)
        onehot = np.zeros((n, n), np.float64)
        onehot[np.arange(n), np.asarray(g.types) % n] = 1.0
        feats.append(np.concatenate(
            [np.asarray(g.adj, np.float64).ravel(), onehot.ravel()]))
    return np.stack(feats)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pkl", default="results/bn/asia_200k.pkl")
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--out", default="results/bo_bn/ceiling_raw_features.txt")
    args = ap.parse_args()

    from dagnn_tpu.vae.sparse_gp import fit_sparse_gp, predict

    with open(args.pkl, "rb") as f:
        train_g, test_g, _ = pickle.load(f)
    X_train, X_test = features(train_g), features(test_g)
    # mirror run_bo's protocol exactly (sign + train standardization)
    y_train = -np.array([g.y for g in train_g]).reshape(-1, 1)
    y_test = -np.array([g.y for g in test_g]).reshape(-1, 1)
    mean_y, std_y = float(np.mean(y_train)), float(np.std(y_train)) or 1.0
    y_train = (y_train - mean_y) / std_y
    y_test = (y_test - mean_y) / std_y

    lines = [f"# sparse GP on raw structure features "
             f"({X_train.shape[1]}-d adj+type one-hot), protocol of "
             f"cli/run_bo (M=500, iters=100)"]
    for seed in range(args.seeds):
        gp = fit_sparse_gp(X_train, y_train, M=500, iters=100, lr=5e-3,
                           seed=seed)
        pred, var = predict(gp, X_test)
        err = float(np.sqrt(np.mean((pred - y_test.reshape(-1)) ** 2)))
        ll = float(np.mean(sps.norm.logpdf(
            pred - y_test.reshape(-1),
            scale=np.sqrt(var + np.exp(gp.params["log_sn2"])))))
        r = float(sps.pearsonr(pred, y_test.reshape(-1))[0])
        line = f"Test RMSE: {err:.4f}, ll: {ll:.4f}, Pearson r: {r:.4f}"
        print("seed", seed, line)
        lines.append(line)
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("->", args.out)


if __name__ == "__main__":
    main()
