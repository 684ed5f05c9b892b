"""DAGNN-encoder VAE: the coupled model for NA/BN scoring.

Re-designs the reference DAGNN / DAGNN_BN VAE models (reference:
dvae/dagnn.py:18-239, dvae/dagnn_bn.py:19-233): a wavefront DAGNN encoder
(with one-hot vertex-id augmentation for NA) feeding D-VAE latent heads, and
the autoregressive D-VAE decoder with the encoder-shared aggregation
parameters:

  * agg == gated_sum: the encoder's gate/mapper ARE the decoder's
    gate_f/mapper_f (dvae/dagnn.py:62-66) — stored once in the decoder
    subtree, plumbed into the encoder at apply time;
  * attention aggs: the decoder reuses the encoder's forward-direction
    layer-0 aggregator (dvae/dagnn.py:236-237 node_aggr_0[0] — upper layers
    reuse layer-0's message, see vae/dvae.py docstring).

Readout (fixed-size graphs, dvae/dagnn.py:147-170): last-vertex states
(+ first-vertex for bidirectional, merged by hg_unify), or out_linear over
concatenated layer states; pooled variants project node states BEFORE
pooling, unlike the canonical OGB model.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dagnn_tpu.dag.batch import DAGBatch, DAGGraph, PadConfig, collate
from dagnn_tpu.data.na import NAGraph, na_graph_to_dag
from dagnn_tpu.nn.dagnn import DAGNNConfig, dagnn_init, dagnn_node_states
from dagnn_tpu.nn.encoders import EncoderSpec
from dagnn_tpu.nn.readout import pool_nodes
from dagnn_tpu.ops.linear import linear, linear_init
from dagnn_tpu.vae.dvae import (
    DVAEConfig,
    dvae_decoder_init,
    dvae_teacher_loss,
    dvae_decode,
    kld,
    reparameterize,
)

NA_GATED_SUM = "gated_sum"


@dataclasses.dataclass(frozen=True)
class DAGNNVAEConfig:
    max_n: int
    nvt: int                     # total vertex types (incl. start/end)
    hs: int = 501
    nz: int = 56
    num_layers: int = 2
    bidirectional: bool = False
    agg: str = "attn_h"
    out_wx: bool = False
    out_pool_all: bool = False
    out_pool: str = "max"
    dropout: float = 0.0
    bn: bool = False             # DAGNN_BN variant
    beta: float = 0.005
    eps_scale: float = 0.01

    @property
    def num_nodes(self) -> int:
        # fixed graph size == nvt for these corpora (train.py:169 num_nodes=nvt+2)
        return self.max_n

    @property
    def vid(self) -> bool:
        return not self.bn       # BN variant drops vertex-id augmentation

    @property
    def dvae(self) -> DVAEConfig:
        return DVAEConfig(
            max_n=self.max_n,
            nvt=self.nvt,
            hs=self.hs,
            nz=self.nz,
            num_layers=self.num_layers,
            bidirectional=self.bidirectional,
            vid=self.vid,
            bn=self.bn,
            dec_agg=self.agg if "attn" in self.agg else NA_GATED_SUM,
            pred_source="h",
            beta=self.beta,
            eps_scale=self.eps_scale,
        )

    @property
    def encoder_cfg(self) -> DAGNNConfig:
        return DAGNNConfig(
            num_vocab=0,
            max_seq_len=1,
            emb_dim=self.nvt,
            hidden_dim=self.hs,
            num_rels=1,
            w_edge_attr=False,
            num_layers=self.num_layers,
            bidirectional=self.bidirectional,
            mapper_bias=False,
            agg=self.agg,
            out_wx=self.out_wx,
            out_pool_all=self.out_pool_all,
            out_pool=self.out_pool,
            num_class=1,          # dummy head, unused
            encoder=EncoderSpec("identity"),
            vid_dim=self.num_nodes if self.vid else 0,
            # the dvae model fixes the shared-AggConv reverse bug upstream
            # (dvae/dagnn.py:67-70: separate reverse=True conv), so the VAE
            # coupling uses the intended reverse aggregation
            ref_shared_agg_quirk=False,
        )

    @property
    def out_hidden_dim(self) -> int:
        return (self.nvt + self.hs * self.num_layers if self.out_wx
                else self.hs * self.num_layers)


def dagnn_vae_init(key, cfg: DAGNNVAEConfig, dtype=jnp.float32) -> Dict[str, Any]:
    ks = jax.random.split(key, 8)
    enc = dagnn_init(ks[0], cfg.encoder_cfg, dtype)
    dec = dvae_decoder_init(ks[1], cfg.dvae, dtype)
    if cfg.agg == NA_GATED_SUM:
        # encoder aggregators are aliases of decoder gate/mapper — drop the
        # separately initialized copies (single source of truth: dec)
        enc["aggr"] = [[{} for _ in range(cfg.num_layers)]
                       for _ in cfg.encoder_cfg.dirs]
    p = {
        "enc": enc,
        "dec": dec,
        "fc1": linear_init(ks[2], cfg.hs, cfg.nz, dtype=dtype),
        "fc2": linear_init(ks[3], cfg.hs, cfg.nz, dtype=dtype),
    }
    if cfg.bidirectional:
        p["hg_unify"] = linear_init(
            ks[4], cfg.hs * 2 * cfg.num_layers, cfg.hs, dtype=dtype)
    if cfg.num_layers > 1:
        p["out_linear"] = linear_init(
            ks[5], cfg.out_hidden_dim, cfg.hs, dtype=dtype)
    if cfg.out_pool == "attn":
        p["pool_attn"] = linear_init(ks[6], cfg.hs, 1, dtype=dtype)
    return p


def _effective_enc_params(params, cfg: DAGNNVAEConfig):
    """Plumb shared decoder gate/mapper into encoder aggregator slots."""
    enc = params["enc"]
    if cfg.agg != NA_GATED_SUM:
        return enc
    dec = params["dec"]
    aggr = []
    for di, d in enumerate(cfg.encoder_cfg.dirs):
        suff = "f" if d == 0 else "b"
        aggr.append([
            {"gate": dec[f"gate_{suff}"][l], "mapper": dec[f"mapper_{suff}"][l]}
            for l in range(cfg.num_layers)
        ])
    return {**enc, "aggr": aggr}


def _decoder_attn_params(params, cfg: DAGNNVAEConfig):
    if "attn" in cfg.agg:
        return _effective_enc_params(params, cfg)["aggr"][0][0]
    return None


def dagnn_vae_embed(params, cfg: DAGNNVAEConfig, batch: DAGBatch) -> jnp.ndarray:
    """Encoder forward producing the graph embedding Hg [G, hs]
    (dvae/dagnn.py:104-175)."""
    ecfg = cfg.encoder_cfg
    enc = _effective_enc_params(params, cfg)
    x, h_dirs = dagnn_node_states(enc, ecfg, batch)
    G = batch.num_graph_slots
    nn_sz = cfg.num_nodes

    if not cfg.out_pool_all:
        # fixed-size index arithmetic (dvae/dagnn.py:147-161)
        gidx = jnp.arange(G)
        last = gidx * nn_sz + (nn_sz - 1)
        first = gidx * nn_sz
        h_last = jnp.concatenate(
            [h_dirs[0][l][last] for l in range(cfg.num_layers)], axis=-1)
        if cfg.bidirectional:
            h_first = jnp.concatenate(
                [h_dirs[1][l][first] for l in range(cfg.num_layers)], axis=-1)
            return linear(params["hg_unify"],
                          jnp.concatenate([h_last, h_first], axis=-1))
        if cfg.num_layers > 1:
            return linear(params["out_linear"], h_last)
        return h_last
    # pooled-all: project node states, then pool (dvae/dagnn.py:162-170)
    layers = [h_dirs[di][l] for di in range(len(ecfg.dirs))
              for l in range(cfg.num_layers)]
    hcat = jnp.concatenate(([x] if cfg.out_wx else []) + layers, axis=-1)
    if cfg.bidirectional:
        hcat = linear(params["hg_unify"], hcat)
    elif cfg.num_layers > 1:
        hcat = linear(params["out_linear"], hcat)
    return pool_nodes(hcat, batch.graph_id, G, cfg.out_pool,
                      mask=batch.node_mask,
                      attn_params=params.get("pool_attn"))


def dagnn_vae_encode(params, cfg: DAGNNVAEConfig, batch: DAGBatch):
    hg = dagnn_vae_embed(params, cfg, batch)
    return linear(params["fc1"], hg), linear(params["fc2"], hg)


def dagnn_vae_loss(params, cfg: DAGNNVAEConfig, batch: DAGBatch,
                   types, adj, nv, rng, training: bool = True):
    """Full VAE loss = teacher-forced recon + beta * KLD
    (models_pyg.py:398-456). types/adj/nv are the dense decoder views of the
    same graphs in `batch` (see na_dense_views).
    """
    mu, logvar = dagnn_vae_encode(params, cfg, batch)
    mu = mu[: types.shape[0]]
    logvar = logvar[: types.shape[0]]
    z = reparameterize(rng, mu, logvar, cfg.eps_scale, training)
    recon, _ = dvae_teacher_loss(
        params["dec"], cfg.dvae, z, types, adj, nv,
        attn_params=_decoder_attn_params(params, cfg))
    k = kld(mu, logvar)
    return recon + cfg.beta * k, recon, k


def dagnn_vae_decode(params, cfg: DAGNNVAEConfig, z, rng=None, stochastic=True):
    return dvae_decode(params["dec"], cfg.dvae, z, rng, stochastic,
                       attn_params=_decoder_attn_params(params, cfg))


# --- host-side helpers -----------------------------------------------------

def na_dense_views(graphs: Sequence[NAGraph], max_n: int):
    """Dense decoder tensors (types, adj, nv) for a list of NAGraphs."""
    B = len(graphs)
    types = np.zeros((B, max_n), np.int32)
    adj = np.zeros((B, max_n, max_n), np.float32)
    nv = np.zeros(B, np.int32)
    for i, g in enumerate(graphs):
        n = g.num_nodes
        types[i, :n] = g.types
        adj[i, :n, :n] = g.adj
        nv[i] = n
    return types, adj, nv


def na_collate(graphs: Sequence[NAGraph], cfg: DAGNNVAEConfig,
               pad_graphs: Optional[int] = None):
    """Collate NAGraphs into (DAGBatch, types, adj, nv) for encode+loss."""
    dags = [na_graph_to_dag(g, cfg.nvt) for g in graphs]
    nb = pad_graphs or len(graphs)
    nn_sz = cfg.num_nodes
    pad = PadConfig(
        max_nodes=nb * nn_sz,
        max_edges=max(1, nb * nn_sz * nn_sz // 2),
        max_graphs=nb,
        max_levels=nn_sz,
        nodes_per_level=nb * nn_sz,
        edges_per_level=max(1, nb * nn_sz * nn_sz // 2),
        # static bound (all edges could source from one row) so every
        # same-size batch shares one shape — required for scan-stacking
        # batches in the training driver
        tgrad_per_level=max(1, nb * nn_sz * nn_sz // 2),
    )
    batch = collate(dags, pad)
    types, adj, nv = na_dense_views(graphs, cfg.max_n)
    return batch, types, adj, nv
