"""NA/BN VAE training driver.

Equivalent of the reference dvae driver (reference: dvae/train.py): load
ENAS/BN graphs (cached), train a DAGNN/DAGNN_BN/DVAE/DVAE_BN VAE with Adam +
ReduceLROnPlateau(0.1, 10) and grad clipping, checkpoint + extract latent
representations every save-interval (.pkl and .mat — consumed by the
sparse-GP/BO evaluator), report test reconstruction NLL, resume from the
latest checkpoint.

    python -m dagnn_tpu.cli.train_vae --cpu --data-name final_structures6 \
        --model DAGNN --epochs 5 --save-interval 5
"""

from __future__ import annotations

import argparse
import os
import pickle
import time
from typing import List

import numpy as np
import jax
import jax.numpy as jnp
import scipy.io

from dagnn_tpu.data.na import (GraphArgs, NAGraph, load_enas, load_bn,
                               parse_bn_row, synthetic_bn_rows)
from dagnn_tpu.train import checkpoint as ckpt
from dagnn_tpu.train.metrics import CSVLogger
from dagnn_tpu.train.optim import make_optimizer, PlateauScheduler
from dagnn_tpu.vae.dagnn_vae import (DAGNNVAEConfig, dagnn_vae_init,
                                     dagnn_vae_encode, dagnn_vae_loss,
                                     na_collate, na_dense_views)
from dagnn_tpu.vae.dvae import (DVAEConfig, dvae_base_init,
                                dvae_encode_sequential, dvae_teacher_loss,
                                kld, reparameterize)
from dagnn_tpu.vae.svae import (SVAEConfig, svae_init, svae_encode,
                                svae_loss, graph_to_string_tensor)
from dagnn_tpu.vae.dvae_variants import (
    DVAEGCNConfig, dvae_gcn_init, dvae_gcn_encode, dvae_gcn_loss,
    dvae_fast_init, dvae_fast_loss,
    DeepGMGConfig, deepgmg_init, deepgmg_encode, deepgmg_loss)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    # mirrors dvae/train.py:25-98
    p.add_argument("--data-name", default="final_structures6")
    p.add_argument("--data-path", default=None,
                   help="graph corpus txt; defaults by data-type")
    p.add_argument("--data-type", default="ENAS", choices=["ENAS", "BN"])
    p.add_argument("--nvt", type=int, default=6)
    p.add_argument("--model", default="DAGNN",
                   choices=["DAGNN", "DAGNN_BN", "DVAE", "DVAE_BN",
                            "SVAE", "SVAE_oneshot", "SVAE_GraphRNN",
                            "SVAE_GraphRNN_BFS", "DVAE_GCN", "DVAE_fast",
                            "DVAE_DeepGMG"])
    p.add_argument("--hs", type=int, default=501)
    p.add_argument("--nz", type=int, default=56)
    p.add_argument("--bidirectional", action="store_true")
    p.add_argument("--dagnn_layers", type=int, default=2)
    p.add_argument("--dagnn_agg", default="attn_h")
    p.add_argument("--dagnn_out_pool_all", type=int, default=0)
    p.add_argument("--dagnn_out_pool", default="max")
    p.add_argument("--dagnn_dropout", type=float, default=0.0)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--infer-batch-size", type=int, default=128)
    p.add_argument("--clip", type=float, default=0.25)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--save-interval", type=int, default=10)
    p.add_argument("--res_dir", default="results/vae")
    p.add_argument("--load-latest-model", action="store_true")
    p.add_argument("--continue-from", type=int, default=None)
    p.add_argument("--load-partial", default=None, metavar="CKPT",
                   help="partial state load from a checkpoint with a "
                        "possibly different architecture (reference "
                        "load_module_state, dvae/util.py:41-63)")
    p.add_argument("--no-test", action="store_true")
    p.add_argument("--small-train", action="store_true")
    p.add_argument("--scan-chunk", type=int, default=128,
                   help="optimizer steps fused into one device dispatch")
    p.add_argument("--max-count", type=int, default=None)
    p.add_argument("--cpu", action="store_true")
    return p.parse_args(argv)


def load_data(args):
    """Load + cache the corpus (dvae/train.py:119-142 pkl-cache behavior)."""
    os.makedirs(args.res_dir, exist_ok=True)
    cache = os.path.join(args.res_dir, f"{args.data_name}.pkl")
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            return pickle.load(f)
    if args.data_type == "ENAS":
        # the ENAS corpus ships with the repo (gzipped dataset asset)
        path = args.data_path or os.path.join(
            os.path.dirname(__file__), "..", "..", "data",
            "final_structures6.txt.gz")
        tr, te, ga = load_enas(path, n_types=args.nvt, max_count=args.max_count)
    else:
        path = args.data_path
        if path and os.path.exists(path):
            tr, te, ga = load_bn(path, n_types=args.nvt, max_count=args.max_count)
        else:
            # asia_200k.txt is a stripped blob in the reference checkout:
            # fall back to a synthetic corpus in the same format
            import ast as ast_mod
            rows = synthetic_bn_rows(args.max_count or 2000, n_types=args.nvt,
                                     seed=args.seed)
            gs = []
            for r in rows:
                row, y = ast_mod.literal_eval(r)
                g = parse_bn_row(row)
                g.y = y
                gs.append(g)
            cut = int(len(gs) * 0.9)
            tr, te = gs[:cut], gs[cut:]
            ga = GraphArgs(num_vertex_type=args.nvt + 2,
                           max_n=max(g.num_nodes for g in gs))
    data = (tr, te, ga)
    with open(cache, "wb") as f:
        pickle.dump(data, f)
    return data


class VAEModel:
    """Uniform facade over the DAGNN-coupled and base D-VAE variants."""

    def __init__(self, args, ga: GraphArgs):
        self.kind = args.model
        self.ga = ga
        if args.model.startswith("SVAE"):
            self.cfg = SVAEConfig(
                max_n=ga.max_n, nvt=ga.num_vertex_type, hs=args.hs,
                nz=args.nz, bidirectional=args.bidirectional,
                oneshot="oneshot" in args.model,
                graphrnn="GraphRNN" in args.model,
                bfs="BFS" in args.model)
            self.init = lambda key: svae_init(key, self.cfg)
            self._host_rng = np.random.default_rng(0)
        elif args.model == "DVAE_GCN":
            self.cfg = DVAEGCNConfig(
                max_n=ga.max_n, nvt=ga.num_vertex_type, hs=args.hs,
                nz=args.nz, bidirectional=args.bidirectional)
            self.init = lambda key: dvae_gcn_init(key, self.cfg)
        elif args.model == "DVAE_DeepGMG":
            self.cfg = DeepGMGConfig(
                max_n=ga.max_n, nvt=ga.num_vertex_type, hs=args.hs,
                nz=args.nz, bidirectional=args.bidirectional)
            self.init = lambda key: deepgmg_init(key, self.cfg)
        elif args.model == "DVAE_fast":
            self.cfg = DVAEConfig(
                max_n=ga.max_n, nvt=ga.num_vertex_type, hs=args.hs,
                nz=args.nz, num_layers=1,
                bidirectional=args.bidirectional, vid=True)
            self.init = lambda key: dvae_fast_init(key, self.cfg)
        elif args.model.startswith("DAGNN"):
            self.cfg = DAGNNVAEConfig(
                max_n=ga.max_n, nvt=ga.num_vertex_type, hs=args.hs, nz=args.nz,
                num_layers=args.dagnn_layers, bidirectional=args.bidirectional,
                agg=args.dagnn_agg,
                out_pool_all=bool(args.dagnn_out_pool_all),
                out_pool=args.dagnn_out_pool, dropout=args.dagnn_dropout,
                bn=args.model == "DAGNN_BN")
            self.init = lambda key: dagnn_vae_init(key, self.cfg)
        else:
            self.cfg = DVAEConfig(
                max_n=ga.max_n, nvt=ga.num_vertex_type, hs=args.hs, nz=args.nz,
                num_layers=1, bidirectional=args.bidirectional,
                vid=args.model == "DVAE", bn=args.model == "DVAE_BN",
                dec_agg="gated_sum",
                pred_source="x" if args.model == "DVAE_BN" else "h")
            self.init = lambda key: dvae_base_init(key, self.cfg)

    def prepare(self, graphs: List[NAGraph]):
        if self.kind.startswith("SVAE"):
            G = np.stack([graph_to_string_tensor(
                g, self.cfg, getattr(self, "_host_rng", None))
                for g in graphs])
            return (None, G, None, np.zeros(len(graphs), np.int32))
        if self.kind.startswith("DAGNN"):
            return na_collate(graphs, self.cfg, pad_graphs=None)
        types, adj, nv = na_dense_views(graphs, self.cfg.max_n)
        return None, types, adj, nv

    def loss(self, params, prepared, rng, training=True):
        batch, types, adj, nv = prepared
        if self.kind.startswith("SVAE"):
            return svae_loss(params, self.cfg, jnp.asarray(types), rng, training)
        types, adj, nv = jnp.asarray(types), jnp.asarray(adj), jnp.asarray(nv)
        if self.kind.startswith("DAGNN"):
            return dagnn_vae_loss(params, self.cfg, batch, types, adj, nv, rng,
                                  training)
        if self.kind == "DVAE_GCN":
            return dvae_gcn_loss(params, self.cfg, types, adj, nv, rng, training)
        if self.kind == "DVAE_DeepGMG":
            return deepgmg_loss(params, self.cfg, types, adj, nv, rng, training)
        if self.kind == "DVAE_fast":
            return dvae_fast_loss(params, self.cfg, types, adj, nv, rng,
                                  training)
        mu, logvar = dvae_encode_sequential(params, self.cfg, types, adj, nv)
        z = reparameterize(rng, mu, logvar, self.cfg.eps_scale, training)
        recon, _ = dvae_teacher_loss(params["dec"], self.cfg, z, types, adj, nv)
        k = kld(mu, logvar)
        return recon + self.cfg.beta * k, recon, k

    def encode_mu(self, params, prepared):
        batch, types, adj, nv = prepared
        if self.kind.startswith("SVAE"):
            mu, _ = svae_encode(params, self.cfg, jnp.asarray(types))
            return mu
        if self.kind.startswith("DAGNN"):
            mu, _ = dagnn_vae_encode(params, self.cfg, batch)
            return mu[: len(types)]
        types, adj, nv = jnp.asarray(types), jnp.asarray(adj), jnp.asarray(nv)
        if self.kind == "DVAE_GCN":
            return dvae_gcn_encode(params, self.cfg, types, adj, nv)[0]
        if self.kind == "DVAE_DeepGMG":
            return deepgmg_encode(params, self.cfg, types, adj, nv)[0]
        mu, _ = dvae_encode_sequential(params, self.cfg, types, adj, nv)
        return mu


def main(argv=None):
    args = parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from dagnn_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    train_data, test_data, ga = load_data(args)
    if args.small_train:
        train_data = train_data[:100]
    print(f"{len(train_data)} train / {len(test_data)} test, "
          f"nvt={ga.num_vertex_type} max_n={ga.max_n}")

    model = VAEModel(args, ga)
    params = model.init(jax.random.PRNGKey(args.seed))
    opt = make_optimizer(args.lr, args.clip)
    opt_state = opt.init(params)
    sched = PlateauScheduler(factor=0.1, patience=10)
    loss_log = CSVLogger(os.path.join(args.res_dir, "train_loss.txt"),
                         ["epoch", "loss", "recon", "kld"])
    name = args.model

    start_epoch = 1
    if args.load_partial:
        params, n_ok, n_skip = ckpt.load_partial_state(args.load_partial,
                                                       params)
        print(f"partial load from {args.load_partial}: "
              f"{n_ok} leaves restored, {n_skip} kept from init")
    if args.continue_from is not None:
        path = ckpt.checkpoint_name(args.res_dir, name, 0, args.continue_from)
        _, ep, params, opt_state = ckpt.load_checkpoint(path, params, opt_state)
        start_epoch = ep + 1
    elif args.load_latest_model:
        path = ckpt.find_latest_checkpoint(args.res_dir, name)
        if path:
            _, ep, params, opt_state = ckpt.load_checkpoint(path, params, opt_state)
            start_epoch = ep + 1
            print(f"resumed from {path}")

    def loss_fn(p, prepared, rng):
        total, recon, k = model.loss(p, prepared, rng)
        return total, (recon, k)

    def _one_step(p, s, prepared, rng, lr_scale):
        (total, (recon, k)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, prepared, rng)
        grads = jax.tree.map(lambda g: g * lr_scale, grads)
        updates, s = opt.update(grads, s, p)
        p = jax.tree.map(lambda a, u: a + u, p, updates)
        return p, s, total, recon, k

    step = jax.jit(_one_step)

    @jax.jit
    def step_scan(p, s, stacked, keys, lr_scale):
        # many optimizer steps in ONE dispatch: with a remote/tunneled TPU
        # every dispatch costs ~1s of round-trip latency, so stepping the
        # host loop per batch is ~30x slower than the compute itself
        def body(carry, xs):
            p, s = carry
            prepared, k = xs
            p, s, total, recon, kld_v = _one_step(p, s, prepared, k, lr_scale)
            return (p, s), jnp.stack([total, recon, kld_v])
        (p, s), stats = jax.lax.scan(body, (p, s), (stacked, keys))
        return p, s, stats  # [K, 3]

    rng = jax.random.PRNGKey(args.seed + 1)
    rnd = np.random.default_rng(args.seed)
    for epoch in range(start_epoch, args.epochs + 1):
        t0 = time.time()
        order = rnd.permutation(len(train_data))
        n_steps = (len(order) + args.batch_size - 1) // args.batch_size
        rng, sub = jax.random.split(rng)
        keys = jax.random.split(sub, n_steps)
        scale = jnp.asarray(sched.scale)
        # Exact batches like the reference (dvae/train.py:228-235), but
        # optimizer steps ride the device in scan CHUNKS: full-size batches
        # stack into [K, ...] pytrees consumed by step_scan (at most two
        # distinct K shapes per run -> two compiles), the short tail batch
        # runs the single-step path. No per-step host sync anywhere.
        starts = list(range(0, len(order), args.batch_size))
        full = [i for i in starts if i + args.batch_size <= len(order)]
        tail = [i for i in starts if i + args.batch_size > len(order)]
        K = max(1, min(args.scan_chunk, len(full)))
        stat_chunks = []
        si = 0
        for c in range(0, len(full), K):
            group = full[c:c + K]
            prepared = [model.prepare(
                [train_data[j] for j in order[i:i + args.batch_size]])
                for i in group]
            stacked = jax.tree.map(lambda *a: np.stack(a), *prepared)
            params, opt_state, stats = step_scan(
                params, opt_state, stacked, keys[si:si + len(group)], scale)
            stat_chunks.append(jnp.sum(stats, axis=0))
            si += len(group)
            print(f"  epoch {epoch} step {si}/{n_steps} "
                  f"[{time.time() - t0:.0f}s]", flush=True)
        for i in tail:
            batch_graphs = [train_data[j] for j in order[i:i + args.batch_size]]
            prepared = model.prepare(batch_graphs)
            params, opt_state, l, r, kld_v = step(
                params, opt_state, prepared, keys[si], scale)
            si += 1
            stat_chunks.append(jnp.stack([l, r, kld_v]))
        tot, rec, kl = (float(x) for x in np.asarray(
            jnp.sum(jnp.stack(stat_chunks), axis=0)))
        n = len(train_data)
        print(f"====> Epoch: {epoch} Average loss: {tot / n:.4f} "
              f"(recon {rec / n:.4f}, kld {kl / n:.4f}) [{time.time() - t0:.1f}s]")
        loss_log.append([epoch, tot / n, rec / n, kl / n])
        sched.step(tot / n)

        if epoch % args.save_interval == 0 or epoch == args.epochs:
            path = ckpt.checkpoint_name(args.res_dir, name, 0, epoch)
            ckpt.create_checkpoint(path, epoch, params, opt_state, {})
            save_latent_representations(args, model, params, train_data,
                                        test_data, epoch)

    if not args.no_test:
        nll = test_nll(args, model, params, test_data)
        with open(os.path.join(args.res_dir, "test_results.txt"), "a") as f:
            f.write(f"epoch {args.epochs} Test average recon loss: {nll}\n")
    return params


def _batched(graphs, size):
    for i in range(0, len(graphs), size):
        yield graphs[i: i + size]


def extract_latent(args, model, params, data):
    Z, Y = [], []
    for chunk in _batched(data, args.infer_batch_size):
        prepared = model.prepare(chunk)
        Z.append(np.asarray(model.encode_mu(params, prepared)))
        Y.extend(g.y for g in chunk)
    return np.concatenate(Z, 0), np.asarray(Y)


def save_latent_representations(args, model, params, train_data, test_data,
                                epoch):
    """.pkl + .mat latent dumps (dvae/train.py:338-355)."""
    Z_train, Y_train = extract_latent(args, model, params, train_data)
    Z_test, Y_test = extract_latent(args, model, params, test_data)
    base = os.path.join(args.res_dir, f"{args.data_name}_latent_epoch{epoch}")
    with open(base + ".pkl", "wb") as f:
        pickle.dump((Z_train, Y_train, Z_test, Y_test), f)
    scipy.io.savemat(base + ".mat", mdict={
        "Z_train": Z_train, "Z_test": Z_test,
        "Y_train": Y_train, "Y_test": Y_test,
    })
    print(f"saved latent representations to {base}.pkl/.mat")


def test_nll(args, model, params, test_data):
    """Held-out teacher-forced reconstruction NLL (dvae/train.py:276-311)."""
    nll = 0.0
    rng = jax.random.PRNGKey(0)
    for chunk in _batched(test_data, args.infer_batch_size):
        prepared = model.prepare(chunk)
        _, recon, _ = model.loss(params, prepared, rng, training=False)
        nll += float(recon)
    nll /= len(test_data)
    print(f"Test average recon loss: {nll}")
    return nll


if __name__ == "__main__":
    main()
