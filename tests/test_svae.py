"""SVAE baseline tests: codec, loss training, decode structure."""

import numpy as np
import jax
import jax.numpy as jnp

from dagnn_tpu.data.na import parse_enas_row, is_valid_dag
from dagnn_tpu.vae.svae import (SVAEConfig, svae_init, svae_encode,
                                svae_loss, svae_decode, graph_to_string_tensor)

ROW = "[[4], [0, 1], [3, 1, 0], [3, 0, 1, 1], [1, 1, 1, 1, 1], [2, 1, 1, 0, 1, 1]]"


def test_string_codec():
    g = parse_enas_row(ROW)
    cfg = SVAEConfig(max_n=8, nvt=8, hs=16, nz=4)
    t = graph_to_string_tensor(g, cfg)
    assert t.shape == (7, 15)
    # row 0 = vertex 1: type 6, single pred vertex 0
    assert t[0, 6] == 1 and t[0, 8] == 1 and t[0].sum() == 2
    # last row = END vertex with pred = vertex 6
    assert t[6, 1] == 1 and t[6, 8 + 6] == 1


def test_svae_roundtrip_types():
    """The codec preserves enough to recover types/edges via argmax."""
    g = parse_enas_row(ROW)
    cfg = SVAEConfig(max_n=8, nvt=8, hs=16, nz=4)
    t = graph_to_string_tensor(g, cfg)
    types = t[:, :8].argmax(-1)
    np.testing.assert_array_equal(types, g.types[1:])
    adj = (t[:, 8:] > 0).T  # [max_n-1 preds, max_n-1 vertices]
    np.testing.assert_array_equal(adj[:7], np.asarray(g.adj)[:7, 1:])


def _train_few_steps(cfg):
    gs = [parse_enas_row(ROW)]
    G = jnp.asarray(np.stack([graph_to_string_tensor(g, cfg) for g in gs * 4]))
    p = svae_init(jax.random.PRNGKey(0), cfg)

    def loss(p, rng):
        total, _, _ = svae_loss(p, cfg, G, rng)
        return total

    step = jax.jit(jax.value_and_grad(loss))
    l0 = float(loss(p, jax.random.PRNGKey(9)))
    for i in range(15):
        v, g = step(p, jax.random.PRNGKey(i))
        p = jax.tree.map(lambda a, b: a - 1e-3 * b, p, g)
    l1 = float(loss(p, jax.random.PRNGKey(9)))
    assert np.isfinite(l1) and l1 < l0
    return p


def test_svae_trains():
    _train_few_steps(SVAEConfig(max_n=8, nvt=8, hs=24, nz=6))


def test_svae_bidir_and_oneshot_train():
    _train_few_steps(SVAEConfig(max_n=8, nvt=8, hs=24, nz=6, bidirectional=True))
    _train_few_steps(SVAEConfig(max_n=8, nvt=8, hs=24, nz=6, oneshot=True))


def test_svae_decode_structure():
    cfg = SVAEConfig(max_n=8, nvt=8, hs=16, nz=4)
    p = svae_init(jax.random.PRNGKey(1), cfg)
    z = jax.random.normal(jax.random.PRNGKey(2), (5, 4))
    gs = svae_decode(p, cfg, z, jax.random.PRNGKey(3))
    assert len(gs) == 5
    for g in gs:
        assert g.types[0] == 0 and g.types[-1] == 1
        s, d = g.edges()
        assert (s < d).all()  # forward edges only
