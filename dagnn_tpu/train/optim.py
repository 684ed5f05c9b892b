"""Optimizers matching the reference training recipes.

OGB drivers: Adam(lr) + grad-norm clip 0.25 (main_pyg.py:63-64, 297).
dvae driver: Adam(1e-4) + ReduceLROnPlateau(factor 0.1, patience 10)
(dvae/train.py:193-194) — the plateau schedule is driven host-side via
optax.scale_by_learning_rate with an injectable scale.
"""

from __future__ import annotations

import optax


def make_optimizer(lr: float = 1e-3, clip: float = 0.25):
    tx = []
    if clip and clip > 0:
        tx.append(optax.clip_by_global_norm(clip))
    tx.append(optax.inject_hyperparams(optax.adam)(learning_rate=lr))
    return optax.chain(*tx)


class PlateauScheduler:
    """Host-side ReduceLROnPlateau: factor/patience semantics of
    torch.optim.lr_scheduler.ReduceLROnPlateau(mode='min')."""

    def __init__(self, factor: float = 0.1, patience: int = 10,
                 min_lr: float = 0.0):
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.best = float("inf")
        self.bad_epochs = 0
        self.scale = 1.0

    def step(self, metric: float) -> float:
        if metric < self.best:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.scale = max(self.scale * self.factor, self.min_lr)
                self.bad_epochs = 0
        return self.scale
