"""Latent-space scoring + Bayesian optimization.

Equivalent of the reference BO evaluator (reference:
dvae/bayesian_optimization/bo.py): load the saved latent .mat of a trained
VAE, run `--seeds` independent sparse-GP fits (M=500 inducing points)
reporting test RMSE / log-likelihood / Pearson r to Test_RMSE_ll.txt, and
optionally run BO rounds: batched greedy-EI candidate selection, decoding
with majority vote over repeated attempts (dvae/util.py:408-466), validity
checking, and scoring — ENAS architectures by corpus lookup (the reference's
ENAS evaluator is commented out upstream, bo.py:154), BNs by the native BIC
scorer (the reference's compute_score.R is absent upstream).

    python -m dagnn_tpu.cli.run_bo --latent results/vae/..._latent_epoch5.mat \
        --checkpoint results/vae/DAGNN_0_5.ckpt --data-type ENAS --seeds 3
"""

from __future__ import annotations

import argparse
import os
import pickle
from collections import Counter
from typing import List, Optional

import numpy as np
import scipy.io
import scipy.stats as sps

import jax
import jax.numpy as jnp

from dagnn_tpu.data.na import (NAGraph, graph_to_enas_row, graph_to_bn_adj_str,
                               is_valid_enas, is_valid_bn, load_enas)
from dagnn_tpu.vae.sparse_gp import fit_sparse_gp, predict, batched_greedy_ei
from dagnn_tpu.vae.bn_score import EvalBN


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--latent", required=True, help="latent .mat from train_vae")
    p.add_argument("--checkpoint", default=None, help="VAE ckpt (needed for --bo)")
    p.add_argument("--model", default="DAGNN")
    p.add_argument("--data-type", default="ENAS", choices=["ENAS", "BN"])
    p.add_argument("--res_dir", default="results/bo")
    p.add_argument("--seeds", type=int, default=10)
    p.add_argument("--M", type=int, default=500)
    p.add_argument("--gp-iters", type=int, default=100)
    p.add_argument("--gp-lr", type=float, default=5e-4)
    p.add_argument("--bo", action="store_true")
    p.add_argument("--BO_rounds", type=int, default=10)
    p.add_argument("--bo-batch", type=int, default=50)
    p.add_argument("--decode-attempts", type=int, default=100)
    p.add_argument("--sample-dist", default="normal")
    p.add_argument("--refine-iters", type=int, default=50,
                   help="EI gradient-refinement steps; 0 keeps candidates "
                        "on the sampled grid. A/B on the committed ENAS "
                        "run (results/bo_enas_bo vs _refine50): refined "
                        "candidates decode 50/50 valid and score HIGHER "
                        "(best 0.7502 = corpus max, vs 0.7496; per-round "
                        "mean 0.7477 vs 0.7468) — 50 is the justified "
                        "default")
    p.add_argument("--enas-corpus", default=os.path.join(
        os.path.dirname(__file__), "..", "..", "data",
        "final_structures6.txt.gz"))
    p.add_argument("--scorer", default="surrogate",
                   choices=["surrogate", "lookup"],
                   help="ENAS arc scorer: corpus lookup + learned "
                        "surrogate for unseen architectures (the "
                        "reference's external Eval_NN is commented out "
                        "upstream, bo.py:151-154; decoded candidates hit "
                        "the 20k corpus ~never), or strict lookup-only")
    p.add_argument("--hs", type=int, default=501)
    p.add_argument("--nz", type=int, default=56)
    p.add_argument("--dagnn_layers", type=int, default=2)
    p.add_argument("--dagnn_agg", default="attn_h")
    p.add_argument("--bidirectional", action="store_true")
    p.add_argument("--cpu", action="store_true")
    return p.parse_args(argv)


def enas_lookup_scorer(corpus_path):
    """Score an ENAS flat row by exact corpus lookup (the only oracle the
    repo ships: final_structures6.txt maps architectures to accuracies)."""
    table = {}
    if os.path.exists(corpus_path):
        train, test, _ = load_enas(corpus_path, burn_in=0)
        for g in train + test:
            table[str(graph_to_enas_row(g))] = g.y

    def score(arc_key: str) -> Optional[float]:
        return table.get(arc_key)

    return score


def decode_from_latent(model_bundle, z, attempts, data_type, rng):
    """Majority-vote decoding (dvae/util.py:408-466): decode each latent
    `attempts` times, keep valid graphs, return the most common encoding."""
    from dagnn_tpu.vae.dagnn_vae import DAGNNVAEConfig, dagnn_vae_decode
    from dagnn_tpu.vae.dvae import dvae_decode
    cfg, params = model_bundle
    n = len(z)
    votes: List[Counter] = [Counter() for _ in range(n)]
    # All attempts ride one device dispatch: tile z to [attempts * n] rows
    # (decode is fully device-resident, so the batch axis is free parallelism).
    z_tiled = jnp.tile(jnp.asarray(z), (attempts, 1))
    if isinstance(cfg, DAGNNVAEConfig):
        types, adj, nv = dagnn_vae_decode(params, cfg, z_tiled, rng)
    else:  # base D-VAE bundle (gated_sum decoder, no attention params)
        types, adj, nv = dvae_decode(params["dec"], cfg, z_tiled, rng)
    for a in range(attempts):
        for i in range(n):
            r = a * n + i
            g = NAGraph(types=types[r][: nv[r]],
                        adj=adj[r][: nv[r], : nv[r]].astype(np.uint8))
            if data_type == "ENAS":
                if is_valid_enas(g) and g.num_nodes == cfg.max_n:
                    votes[i][str(graph_to_enas_row(g))] += 1
            else:
                if is_valid_bn(g, nvt=cfg.nvt):
                    votes[i][graph_to_bn_adj_str(g)] += 1
    return [v.most_common(1)[0][0] if v else None for v in votes]


def load_model(args):
    """Rebuild the trained VAE bundle (reference bo.py:184-209 re-parses
    cmd_input.txt; here hyperparameters come from flags).

    Supports the DAGNN-coupled VAEs and the base D-VAE family — the models
    whose decoders emit DAGs that the BO loop can validity-check and score.
    SVAE* string decoders and the DVAE_GCN/fast/DeepGMG variants
    (vae/svae.py, vae/dvae_variants.py) are latent-scored via the GP path
    (no --bo) but are not rebuildable here; asking for BO with one raises.
    """
    if not args.checkpoint:
        return None
    known = ("DAGNN", "DVAE", "DVAE_BN")
    if args.model not in known:
        raise SystemExit(
            f"--bo supports models {known}; {args.model!r} checkpoints can "
            f"only be latent-scored (omit --bo)")
    from dagnn_tpu.train import checkpoint as ckpt
    from dagnn_tpu.train.optim import make_optimizer
    nvt = 8 if args.data_type == "ENAS" else 10
    if args.model.startswith("DVAE"):
        from dagnn_tpu.vae.dvae import DVAEConfig, dvae_base_init
        cfg = DVAEConfig(max_n=nvt, nvt=nvt, hs=args.hs, nz=args.nz,
                         num_layers=1, bidirectional=args.bidirectional,
                         vid=args.model == "DVAE", bn=args.model == "DVAE_BN",
                         dec_agg="gated_sum",
                         pred_source="x" if args.model == "DVAE_BN" else "h")
        params = dvae_base_init(jax.random.PRNGKey(0), cfg)
    else:
        from dagnn_tpu.vae.dagnn_vae import DAGNNVAEConfig, dagnn_vae_init
        cfg = DAGNNVAEConfig(max_n=nvt, nvt=nvt, hs=args.hs, nz=args.nz,
                             num_layers=args.dagnn_layers, agg=args.dagnn_agg,
                             bidirectional=args.bidirectional,
                             bn=args.data_type == "BN")
        params = dagnn_vae_init(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer()
    _, _, params, _ = ckpt.load_checkpoint(args.checkpoint, params,
                                           opt.init(params))
    return cfg, params


def main(argv=None):
    args = parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from dagnn_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    os.makedirs(args.res_dir, exist_ok=True)
    mat = scipy.io.loadmat(args.latent)
    X_train, X_test = mat["Z_train"], mat["Z_test"]
    y_train = -mat["Y_train"].reshape(-1, 1)   # bo.py:213 sign convention
    y_test = -mat["Y_test"].reshape(-1, 1)
    mean_y, std_y = float(np.mean(y_train)), float(np.std(y_train)) or 1.0
    y_train = (y_train - mean_y) / std_y
    y_test = (y_test - mean_y) / std_y

    rmse_file = os.path.join(args.res_dir, "Test_RMSE_ll.txt")
    arcs_file = os.path.join(args.res_dir, "best_arc_scores.txt")
    for f in (rmse_file, arcs_file):
        if os.path.exists(f):
            os.remove(f)

    model_bundle = load_model(args) if args.bo else None
    scorer = None
    if args.data_type == "ENAS":
        if args.scorer == "surrogate" and args.bo:
            from dagnn_tpu.vae.enas_eval import EvalENAS
            eva_enas = EvalENAS(args.enas_corpus)
            print("ENAS scorer:", eva_enas.quality())
            with open(os.path.join(args.res_dir, "scorer_quality.txt"),
                      "w") as f:
                f.write(eva_enas.quality() + "\n")
            scorer = eva_enas.score
        else:
            scorer = enas_lookup_scorer(args.enas_corpus)
    eva = EvalBN() if args.data_type == "BN" else None

    for seed in range(args.seeds):
        gp = fit_sparse_gp(X_train, y_train, M=args.M, iters=args.gp_iters,
                           lr=args.gp_lr, seed=seed)
        pred, var = predict(gp, X_test)
        err = float(np.sqrt(np.mean((pred - y_test.reshape(-1)) ** 2)))
        testll = float(np.mean(sps.norm.logpdf(
            pred - y_test.reshape(-1), scale=np.sqrt(var + np.exp(gp.params["log_sn2"])))))
        pearson = float(sps.pearsonr(pred, y_test.reshape(-1))[0])
        print(f"seed {seed}: Test RMSE {err:.4f}, ll {testll:.4f}, "
              f"Pearson r {pearson:.4f}")
        with open(rmse_file, "a") as f:
            f.write(f"Test RMSE: {err:.4f}, ll: {testll:.4f}, "
                    f"Pearson r: {pearson:.4f}\n")

        if not args.bo:
            continue

        # --- BO rounds (bo.py:248-328) ---
        Xa, ya = gp.X.copy(), gp.y.reshape(-1, 1).copy()
        best_score, best_arc = 1e15, None
        rng = jax.random.PRNGKey(seed)
        # one padded shape for every refit of the growing set -> one compile
        pad_rows = len(Xa) + args.BO_rounds * args.bo_batch
        for it in range(args.BO_rounds):
            gp_it = fit_sparse_gp(Xa, ya, M=args.M, iters=args.gp_iters,
                                  lr=args.gp_lr, seed=seed * 100 + it,
                                  pad_to=pad_rows)
            cand = batched_greedy_ei(
                gp_it, args.bo_batch,
                Xa.min(0), Xa.max(0), Xa.mean(0), Xa.std(0),
                sample=args.sample_dist, seed=seed * 100 + it,
                refine_iters=args.refine_iters)
            rng, k = jax.random.split(rng)
            arcs = decode_from_latent(model_bundle, cand,
                                      args.decode_attempts, args.data_type, k)
            scores = []
            for arc in arcs:
                raw = None
                if arc is not None:
                    raw = (scorer(arc) if args.data_type == "ENAS"
                           else eva.eval(arc))
                if raw is None:
                    s = float(np.max(ya))  # invalid/unknown -> worst
                else:
                    s = (-raw - mean_y) / std_y
                    if s < best_score:
                        best_score, best_arc = s, arc
                scores.append(s)
            Xa = np.concatenate([Xa, cand], 0)
            ya = np.concatenate([ya, np.asarray(scores)[:, None]], 0)
            if best_arc is not None:
                with open(arcs_file, "a") as f:
                    f.write(f"{best_arc}, {-best_score * std_y - mean_y:.4f}\n")
            print(f"  BO round {it}: {sum(a is not None for a in arcs)}"
                  f"/{len(arcs)} valid, best {-best_score * std_y - mean_y:.4f}"
                  if best_arc else f"  BO round {it}: no valid arcs yet")


if __name__ == "__main__":
    main()
