"""VAE tests: decoder-loss parity vs numpy oracle, coupled model smoke."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dagnn_tpu.data.na import parse_enas_row, synthetic_bn_rows, parse_bn_row
from dagnn_tpu.vae.dvae import (
    DVAEConfig, dvae_decoder_init, dvae_base_init, dvae_teacher_loss,
    dvae_encode_sequential, dvae_decode, kld,
)
from dagnn_tpu.vae.dagnn_vae import (
    DAGNNVAEConfig, dagnn_vae_init, dagnn_vae_encode, dagnn_vae_loss,
    dagnn_vae_decode, na_collate, na_dense_views,
)
from dagnn_tpu.nn.aggregators import AggregatorSpec, aggregator_init

from oracle_dvae import oracle_teacher_loss

ROWS = [
    "[[4], [0, 1], [3, 1, 0], [3, 0, 1, 1], [1, 1, 1, 1, 1], [2, 1, 1, 0, 1, 1]]",
    "[[2], [2, 0], [4, 1, 0], [0, 1, 0, 0], [2, 1, 0, 0, 1], [3, 1, 0, 0, 0, 0]]",
    "[[1], [5, 1], [0, 0, 1], [2, 1, 1, 1], [4, 0, 1, 0, 0], [1, 0, 0, 1, 1, 0]]",
]


def enas_dense(max_n=8):
    gs = [parse_enas_row(r) for r in ROWS]
    return na_dense_views(gs, max_n), gs


def _mk_attn_params(key, cfg: DVAEConfig):
    spec = AggregatorSpec("attn", value_dim=cfg.hs,
                          key_dim=cfg.vs, query_dim=cfg.nvt)
    return aggregator_init(key, spec)


@pytest.mark.parametrize("dec_agg,vid,bn,L", [
    ("gated_sum", True, False, 1),
    ("gated_sum", True, False, 2),
    ("attn", True, False, 2),
    ("attn", False, True, 2),
    ("gated_sum", False, True, 1),
])
def test_teacher_loss_matches_oracle(dec_agg, vid, bn, L):
    (types, adj, nv), _ = enas_dense()
    cfg = DVAEConfig(max_n=8, nvt=8, hs=10, nz=4, num_layers=L,
                     vid=vid, bn=bn, dec_agg=dec_agg, pred_source="h")
    key = jax.random.PRNGKey(0)
    dec = dvae_decoder_init(key, cfg)
    attn = _mk_attn_params(jax.random.PRNGKey(5), cfg) if dec_agg == "attn" else None
    z = jax.random.normal(jax.random.PRNGKey(1), (3, cfg.nz))

    got, _ = dvae_teacher_loss(dec, cfg, z, jnp.asarray(types),
                               jnp.asarray(adj), jnp.asarray(nv),
                               attn_params=attn)
    want = oracle_teacher_loss(dec, cfg, np.asarray(z), types, adj, nv,
                               attn_params=attn)
    np.testing.assert_allclose(float(got), want, rtol=2e-4)


def test_teacher_loss_padded_graphs():
    """Variable-size graphs: padded steps contribute START-type ll and
    zero-target BCE, exactly as the oracle."""
    (types, adj, nv), _ = enas_dense()
    nv = nv.copy()
    nv[1] = 6  # pretend graph 1 is shorter
    types[1, 6:] = 0
    adj[1, :, 6:] = 0
    adj[1, 6:, :] = 0
    cfg = DVAEConfig(max_n=8, nvt=8, hs=7, nz=4, num_layers=1,
                     vid=True, dec_agg="gated_sum")
    dec = dvae_decoder_init(jax.random.PRNGKey(2), cfg)
    z = jax.random.normal(jax.random.PRNGKey(3), (3, cfg.nz))
    got, _ = dvae_teacher_loss(dec, cfg, z, jnp.asarray(types),
                               jnp.asarray(adj), jnp.asarray(nv))
    want = oracle_teacher_loss(dec, cfg, np.asarray(z), types, adj, nv)
    np.testing.assert_allclose(float(got), want, rtol=2e-4)


def test_base_dvae_encode_and_loss():
    (types, adj, nv), _ = enas_dense()
    cfg = DVAEConfig(max_n=8, nvt=8, hs=12, nz=4, bidirectional=True)
    p = dvae_base_init(jax.random.PRNGKey(0), cfg)
    mu, logvar = dvae_encode_sequential(p, cfg, jnp.asarray(types),
                                        jnp.asarray(adj), jnp.asarray(nv))
    assert mu.shape == (3, 4) and np.isfinite(np.asarray(mu)).all()
    loss, _ = dvae_teacher_loss(p["dec"], cfg, mu, jnp.asarray(types),
                                jnp.asarray(adj), jnp.asarray(nv))
    assert np.isfinite(float(loss))


def test_dagnn_vae_end_to_end_and_training():
    gs = [parse_enas_row(r) for r in ROWS]
    cfg = DAGNNVAEConfig(max_n=8, nvt=8, hs=16, nz=6, num_layers=2,
                         bidirectional=False, agg="attn_h")
    params = dagnn_vae_init(jax.random.PRNGKey(0), cfg)
    batch, types, adj, nv = na_collate(gs, cfg)
    mu, logvar = dagnn_vae_encode(params, cfg, batch)
    assert mu.shape[0] >= 3

    def loss_fn(p, rng):
        total, recon, k = dagnn_vae_loss(p, cfg, batch, jnp.asarray(types),
                                         jnp.asarray(adj), jnp.asarray(nv), rng)
        return total
    rng = jax.random.PRNGKey(1)
    l0 = float(loss_fn(params, rng))
    assert np.isfinite(l0)
    # a few SGD steps must reduce the loss
    g = jax.jit(jax.value_and_grad(loss_fn))
    p = params
    lr = 1e-3
    for i in range(12):
        val, grads = g(p, jax.random.fold_in(rng, i))
        p = jax.tree.map(lambda a, b: a - lr * b, p, grads)
    l1 = float(loss_fn(p, rng))
    assert l1 < l0, (l0, l1)


def test_dagnn_vae_gated_sum_sharing():
    """gated_sum couples encoder aggregators to decoder gate/mapper — a grad
    step through the ENCODER must move the shared decoder parameters."""
    gs = [parse_enas_row(r) for r in ROWS]
    cfg = DAGNNVAEConfig(max_n=8, nvt=8, hs=8, nz=4, num_layers=1,
                         agg="gated_sum")
    params = dagnn_vae_init(jax.random.PRNGKey(0), cfg)
    batch, *_ = na_collate(gs, cfg)

    def enc_only(p):
        mu, _ = dagnn_vae_encode(p, cfg, batch)
        return (mu ** 2).sum()
    grads = jax.grad(enc_only)(params)
    gm = float(jnp.abs(grads["dec"]["mapper_f"][0]["w"]).sum())
    assert gm > 0.0, "shared gate/mapper got no encoder gradient"


def test_decode_produces_valid_shapes():
    cfg = DVAEConfig(max_n=8, nvt=8, hs=10, nz=4, vid=True, dec_agg="gated_sum")
    dec = dvae_decoder_init(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (4, cfg.nz))
    types, adj, nv = dvae_decode(dec, cfg, z, jax.random.PRNGKey(2))
    assert types.shape == (4, 8) and adj.shape == (4, 8, 8)
    assert (types[:, 0] == 0).all()
    assert ((nv >= 2) & (nv <= 8)).all()
    # finished graphs end with END type
    for b in range(4):
        assert types[b, nv[b] - 1] == 1
        # edges only to existing vertices, strictly forward
        s, d = np.nonzero(adj[b])
        assert (s < d).all()
        assert (d < nv[b]).all()


def test_decode_device_matches_host():
    """The jitted device-resident decode reproduces the host-driven loop
    bit-for-bit (identical rng split order), stochastic and greedy, for
    gated_sum and attention decoders."""
    from oracle_dvae import dvae_decode_host
    for dec_agg, stoch in (("gated_sum", True), ("gated_sum", False),
                           ("attn", True)):
        cfg = DVAEConfig(max_n=8, nvt=8, hs=10, nz=4, vid=True,
                         dec_agg=dec_agg)
        dec = dvae_decoder_init(jax.random.PRNGKey(3), cfg)
        attn = None
        if dec_agg == "attn":
            from dagnn_tpu.ops.linear import linear_init
            attn = {"attn_lin": linear_init(jax.random.PRNGKey(9),
                                            cfg.nvt + cfg.vs, 1)}
        z = jax.random.normal(jax.random.PRNGKey(4), (6, cfg.nz))
        t_h, a_h, n_h = dvae_decode_host(dec, cfg, z, jax.random.PRNGKey(5),
                                         stochastic=stoch, attn_params=attn)
        t_d, a_d, n_d = dvae_decode(dec, cfg, z, jax.random.PRNGKey(5),
                                    stochastic=stoch, attn_params=attn)
        assert (t_h == t_d).all(), (dec_agg, stoch)
        assert (a_h == a_d).all(), (dec_agg, stoch)
        assert (n_h == n_d).all(), (dec_agg, stoch)


def test_teacher_loss_scan_matches_unrolled():
    """The lax.scan teacher loss reproduces the unrolled trace (values and
    gradients) for the gated-sum and attention decoders, incl. graphs
    shorter than max_n."""
    from dagnn_tpu.vae.dvae import dvae_teacher_loss
    from dagnn_tpu.ops.linear import linear_init
    for dec_agg in ("gated_sum", "attn"):
        cfg = DVAEConfig(max_n=6, nvt=8, hs=12, nz=5, vid=True,
                         dec_agg=dec_agg)
        dec = dvae_decoder_init(jax.random.PRNGKey(0), cfg)
        attn = None
        if dec_agg == "attn":
            attn = {"attn_lin": linear_init(jax.random.PRNGKey(9),
                                            cfg.nvt + cfg.vs, 1)}
        rnd = np.random.default_rng(4)
        B = 5
        nv = np.array([6, 4, 2, 6, 3], np.int32)
        types = rnd.integers(0, cfg.nvt, (B, cfg.max_n)).astype(np.int32)
        adj = np.zeros((B, cfg.max_n, cfg.max_n), np.float32)
        for b in range(B):
            for j in range(1, nv[b]):
                i = int(rnd.integers(0, j))
                adj[b, i, j] = 1.0
        z = jax.random.normal(jax.random.PRNGKey(2), (B, cfg.nz))

        def f(dc, z_, unroll):
            return dvae_teacher_loss(dc, cfg, z_, jnp.asarray(types),
                                     jnp.asarray(adj), jnp.asarray(nv),
                                     attn_params=attn, unroll=unroll)[0]

        lu = float(f(dec, z, True))
        ls = float(f(dec, z, False))
        assert abs(lu - ls) < 1e-3 * max(1.0, abs(lu)), (dec_agg, lu, ls)
        gu = jax.grad(lambda dc: f(dc, z, True))(dec)
        gs = jax.grad(lambda dc: f(dc, z, False))(dec)
        for (pa, a), (pb, b) in zip(
                jax.tree_util.tree_flatten_with_path(gu)[0],
                jax.tree_util.tree_flatten_with_path(gs)[0]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
                err_msg=f"{dec_agg} {jax.tree_util.keystr(pa)}")


def test_bn_synthetic_loss():
    import ast
    rows = [ast.literal_eval(r)[0] for r in synthetic_bn_rows(3, seed=1)]
    gs = [parse_bn_row(r) for r in rows]
    cfg = DAGNNVAEConfig(max_n=10, nvt=10, hs=12, nz=4, num_layers=2,
                         bidirectional=True, agg="attn_h", bn=True)
    params = dagnn_vae_init(jax.random.PRNGKey(0), cfg)
    batch, types, adj, nv = na_collate(gs, cfg)
    total, recon, k = dagnn_vae_loss(params, cfg, batch, jnp.asarray(types),
                                     jnp.asarray(adj), jnp.asarray(nv),
                                     jax.random.PRNGKey(1))
    assert np.isfinite(float(total))
