"""Sparse GP + BIC scorer tests."""

import numpy as np
import pytest

from dagnn_tpu.vae.sparse_gp import fit_sparse_gp, predict, batched_greedy_ei
from dagnn_tpu.vae.bn_score import EvalBN, bic_score, sample_asia, _ASIA_EDGES


def test_sparse_gp_learns_smooth_function():
    rng = np.random.default_rng(0)
    X = rng.uniform(-3, 3, (400, 2))
    y = np.sin(X[:, 0]) + 0.5 * np.cos(2 * X[:, 1]) + 0.05 * rng.standard_normal(400)
    gp = fit_sparse_gp(X, y, M=64, iters=300, lr=2e-2)
    Xs = rng.uniform(-3, 3, (100, 2))
    ys = np.sin(Xs[:, 0]) + 0.5 * np.cos(2 * Xs[:, 1])
    mu, var = predict(gp, Xs)
    rmse = np.sqrt(np.mean((mu - ys) ** 2))
    assert rmse < 0.25, rmse
    assert (var > 0).all()
    # predictions correlate strongly
    assert np.corrcoef(mu, ys)[0, 1] > 0.95


def test_ei_selection_prefers_low_regions():
    rng = np.random.default_rng(1)
    X = rng.uniform(-2, 2, (200, 1))
    y = (X[:, 0] - 1.0) ** 2  # min at x=1
    gp = fit_sparse_gp(X, y, M=32, iters=300, lr=2e-2)
    cand = batched_greedy_ei(gp, 5, X.min(0), X.max(0), X.mean(0), X.std(0),
                             grid_size=500, refine_iters=25)
    assert cand.shape == (5, 1)
    # candidates should cluster near the minimum region
    assert np.abs(cand - 1.0).min() < 0.5


def test_bic_prefers_true_asia_structure():
    data = sample_asia(5000, seed=0)
    true_adj = np.zeros((8, 8))
    for s, d in _ASIA_EDGES:
        true_adj[s, d] = 1
    empty = np.zeros((8, 8))
    rng = np.random.default_rng(0)
    s_true = bic_score(true_adj, data)
    s_empty = bic_score(empty, data)
    assert s_true > s_empty
    # random DAGs shouldn't beat the truth
    for _ in range(5):
        r = np.triu((rng.random((8, 8)) < 0.3).astype(float), 1)
        assert bic_score(r, data) <= s_true + 1e-6


def test_eval_bn_interface():
    eva = EvalBN(n=2000)
    adj = np.zeros((8, 8), int)
    adj[0, 1] = 1
    s = eva.eval(" ".join(str(v) for v in adj.reshape(-1)))
    assert np.isfinite(s)


def test_pad_to_mask_matches_unpadded():
    """Masked padding must not change the fit: same data, same seed, with
    and without pad rows -> near-identical predictions."""
    import numpy as np
    from dagnn_tpu.vae.sparse_gp import fit_sparse_gp, predict
    rng = np.random.default_rng(3)
    X = rng.standard_normal((300, 6))
    y = np.sin(X[:, 0]) + 0.1 * rng.standard_normal(300)
    Xs = rng.standard_normal((40, 6))
    g1 = fit_sparse_gp(X, y, M=50, iters=40, lr=1e-2, seed=0)
    g2 = fit_sparse_gp(X, y, M=50, iters=40, lr=1e-2, seed=0, pad_to=420)
    p1, _ = predict(g1, Xs)
    p2, _ = predict(g2, Xs)
    np.testing.assert_allclose(p1, p2, rtol=1e-4, atol=1e-5)
