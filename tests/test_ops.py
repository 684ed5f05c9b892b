"""Ops tests: segment semantics vs dense oracles; GRU parity vs torch."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dagnn_tpu.ops import (
    segment_sum,
    segment_max,
    segment_softmax,
    edge_softmax_aggregate,
    gru_cell,
    gru_init,
    linear,
    linear_init,
)


def test_segment_sum_mask():
    v = jnp.array([[1.0], [2.0], [4.0], [8.0]])
    seg = jnp.array([0, 0, 1, 2])
    mask = jnp.array([True, True, True, False])
    out = segment_sum(v, seg, 3, mask)
    np.testing.assert_allclose(out, [[3.0], [4.0], [0.0]])


def test_segment_max_empty_segment_is_zero():
    v = jnp.array([[-5.0], [-2.0]])
    seg = jnp.array([0, 0])
    out = segment_max(v, seg, 2)
    np.testing.assert_allclose(out, [[-2.0], [0.0]])


def test_segment_softmax_matches_dense():
    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.normal(size=12).astype(np.float32))
    seg = jnp.asarray(np.sort(rng.integers(0, 4, size=12)))
    alpha = segment_softmax(scores, seg, 5)
    alpha = np.asarray(alpha)
    for s in range(4):
        idx = np.asarray(seg) == s
        if idx.any():
            expect = np.exp(np.asarray(scores)[idx] - np.asarray(scores)[idx].max())
            expect = expect / (expect.sum() + 1e-16)
            np.testing.assert_allclose(alpha[idx], expect, rtol=1e-6)
    # each non-empty segment sums to ~1
    np.testing.assert_allclose(
        np.bincount(np.asarray(seg), weights=alpha, minlength=5)[np.bincount(np.asarray(seg), minlength=5) > 0],
        1.0, rtol=1e-5,
    )


def test_segment_softmax_mask_excluded():
    scores = jnp.array([100.0, 1.0, 1.0])
    seg = jnp.array([0, 0, 0])
    mask = jnp.array([False, True, True])
    alpha = np.asarray(segment_softmax(scores, seg, 1, mask))
    np.testing.assert_allclose(alpha, [0.0, 0.5, 0.5], atol=1e-6)


def test_edge_softmax_aggregate():
    scores = jnp.array([0.0, 0.0, 2.0])
    values = jnp.array([[1.0, 0.0], [0.0, 1.0], [10.0, 10.0]])
    seg = jnp.array([0, 0, 1])
    out = np.asarray(edge_softmax_aggregate(scores, values, seg, 2))
    np.testing.assert_allclose(out[0], [0.5, 0.5], atol=1e-6)
    np.testing.assert_allclose(out[1], [10.0, 10.0], atol=1e-5)


def test_gru_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    in_dim, hid, b = 7, 5, 4
    cell = torch.nn.GRUCell(in_dim, hid)
    params = {k: jnp.asarray(v.detach().numpy()) for k, v in {
        "w_ih": cell.weight_ih, "w_hh": cell.weight_hh,
        "b_ih": cell.bias_ih, "b_hh": cell.bias_hh,
    }.items()}
    x = rng.normal(size=(b, in_dim)).astype(np.float32)
    h = rng.normal(size=(b, hid)).astype(np.float32)
    want = cell(torch.from_numpy(x), torch.from_numpy(h)).detach().numpy()
    got = np.asarray(gru_cell(params, jnp.asarray(x), jnp.asarray(h)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_linear_matches_torch():
    torch = pytest.importorskip("torch")
    lin = torch.nn.Linear(6, 3)
    p = {"w": jnp.asarray(lin.weight.detach().numpy()),
         "b": jnp.asarray(lin.bias.detach().numpy())}
    x = np.random.default_rng(0).normal(size=(5, 6)).astype(np.float32)
    want = lin(torch.from_numpy(x)).detach().numpy()
    got = np.asarray(linear(p, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_inits_shapes():
    k = jax.random.PRNGKey(0)
    p = gru_init(k, 4, 8)
    assert p["w_ih"].shape == (24, 4) and p["b_hh"].shape == (24,)
    q = linear_init(k, 4, 2, bias=False)
    assert "b" not in q and q["w"].shape == (2, 4)
