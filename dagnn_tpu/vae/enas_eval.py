"""ENAS architecture evaluator: exact corpus lookup + learned surrogate.

The reference's BO chain scores decoded ENAS architectures with an
external weight-sharing evaluator that is COMMENTED OUT upstream and whose
code is not shipped (reference: dvae/bayesian_optimization/bo.py:151-154 —
`eva = Eval_NN()` from `../software/enas/`, absent), so the reference's
ENAS best-arc loop cannot run as checked in. The only architecture->score
oracle this repo ships is the 20k-row corpus itself
(data/final_structures6.txt: weight-sharing accuracies per architecture,
format at dvae/util.py:71-91).

Decoded BO candidates practically never hit the corpus exactly (measured
0/5000 stochastic decodes), so this module plays Eval_NN's role offline:

* exact corpus lookup when the architecture is in the table (ground truth),
* otherwise a SURROGATE network trained on the full corpus —
  structure features (op-type one-hots + connection bits) -> accuracy —
  entirely independent of the VAE/GP latent space being optimized, so BO
  still optimizes an external function of the DECODED STRUCTURE, exactly
  like the reference's evaluator. Fit quality is reported alongside every
  artifact so the stand-in is never mistaken for chip-trained accuracy.
"""

from __future__ import annotations

import ast
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp


def featurize_row(row, n: int = 6, n_types: int = 6) -> np.ndarray:
    """Nested ENAS row -> flat feature vector (type one-hots + edge bits)."""
    if isinstance(row, str):
        row = ast.literal_eval(row)
    f_types = np.zeros((n, n_types), np.float32)
    bits = np.zeros(n * (n - 1) // 2, np.float32)
    k = 0
    for i, node in enumerate(row):
        f_types[i, int(node[0]) % n_types] = 1.0
        for flag in node[1:]:
            bits[k] = float(flag)
            k += 1
    return np.concatenate([f_types.ravel(), bits])


class EvalENAS:
    """Corpus-lookup + surrogate ENAS scorer (Eval_NN stand-in).

    score(arc_key) returns the weight-sharing accuracy for a stringified
    nested row: exact where known, surrogate elsewhere, None only if the
    row fails to parse.
    """

    def __init__(self, corpus_path: str, hidden: int = 256,
                 epochs: int = 400, seed: int = 0, val_frac: float = 0.1):
        from dagnn_tpu.data.na import load_enas, graph_to_enas_row
        train, test, _ = load_enas(corpus_path, burn_in=0)
        rows, ys = [], []
        self.table = {}
        for g in train + test:
            row = graph_to_enas_row(g)
            self.table[str(row)] = float(g.y)
            rows.append(featurize_row(row))
            ys.append(float(g.y))
        X = np.stack(rows).astype(np.float32)
        y = np.asarray(ys, np.float32)[:, None]
        rng = np.random.RandomState(seed)
        perm = rng.permutation(len(X))
        n_val = max(1, int(len(X) * val_frac))
        vi, ti = perm[:n_val], perm[n_val:]
        self._fit(X[ti], y[ti], X[vi], y[vi], hidden, epochs, seed)

    def _fit(self, Xt, yt, Xv, yv, hidden, epochs, seed):
        key = jax.random.PRNGKey(seed)
        k1, k2, k3 = jax.random.split(key, 3)
        d = Xt.shape[1]
        params = {
            "w1": jax.random.normal(k1, (d, hidden)) * (2.0 / d) ** 0.5,
            "b1": jnp.zeros(hidden),
            "w2": jax.random.normal(k2, (hidden, hidden)) * (2.0 / hidden) ** 0.5,
            "b2": jnp.zeros(hidden),
            "w3": jax.random.normal(k3, (hidden, 1)) * (1.0 / hidden) ** 0.5,
            "b3": jnp.zeros(1),
        }
        self.mu, self.sd = float(yt.mean()), float(yt.std()) or 1.0

        def mlp(p, x):
            h = jax.nn.relu(x @ p["w1"] + p["b1"])
            h = jax.nn.relu(h @ p["w2"] + p["b2"])
            return h @ p["w3"] + p["b3"]

        yt_n = (yt - self.mu) / self.sd

        def loss(p, x, y):
            return jnp.mean((mlp(p, x) - y) ** 2)

        import optax
        opt = optax.adam(1e-3)
        state = opt.init(params)
        Xt_j, yt_j = jnp.asarray(Xt), jnp.asarray(yt_n)

        @jax.jit
        def step(p, s):
            g = jax.grad(loss)(p, Xt_j, yt_j)
            u, s = opt.update(g, s, p)
            return jax.tree.map(lambda a, b: a + b, p, u), s

        for _ in range(epochs):
            params, state = step(params, state)
        self._params = params
        self._mlp = jax.jit(mlp)
        pv = np.asarray(self._mlp(params, jnp.asarray(Xv))).ravel() * self.sd + self.mu
        self.val_rmse = float(np.sqrt(np.mean((pv - yv.ravel()) ** 2)))
        self.val_pearson = float(np.corrcoef(pv, yv.ravel())[0, 1])

    def quality(self) -> str:
        return (f"surrogate val RMSE {self.val_rmse:.4f}, "
                f"Pearson r {self.val_pearson:.4f}")

    def score(self, arc_key: str) -> Optional[float]:
        exact = self.table.get(arc_key)
        if exact is not None:
            return exact
        try:
            f = featurize_row(arc_key)
        except (ValueError, SyntaxError, IndexError):
            return None
        p = np.asarray(self._mlp(self._params, jnp.asarray(f[None])))
        return float(p[0, 0] * self.sd + self.mu)
