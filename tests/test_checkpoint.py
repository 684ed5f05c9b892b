"""Checkpoint rotation/resume + partial (model-surgery) state loading."""

import numpy as np
import jax.numpy as jnp
import pytest

from dagnn_tpu.train import checkpoint as ckpt


def _params(h, extra=False):
    p = {"enc": {"w": jnp.arange(h * 4, dtype=jnp.float32).reshape(h, 4),
                 "b": jnp.ones((h,))},
         "cells": [{"w_ih": jnp.full((3 * h, h), 2.0)},
                   {"w_ih": jnp.full((3 * h, h), 3.0)}]}
    if extra:
        p["head"] = {"w": jnp.zeros((h, 7))}
    return p


def test_checkpoint_roundtrip(tmp_path):
    p = _params(3)
    path = str(tmp_path / "m_1_5.ckpt")
    ckpt.create_checkpoint(path, 5, p, {"opt": jnp.zeros(2)}, {"hist": [1]})
    res, ep, p2, o2 = ckpt.load_checkpoint(path, p, {"opt": jnp.zeros(2)})
    assert ep == 5 and res == {"hist": [1]}
    np.testing.assert_array_equal(p2["enc"]["w"], p["enc"]["w"])


def test_partial_load_matching_subset(tmp_path):
    """load_partial_state (reference dvae/util.py:41-63): restore leaves
    whose path+shape match; keep fresh init for new/resized leaves."""
    old = _params(3)
    path = str(tmp_path / "m_0_1.ckpt")
    ckpt.create_checkpoint(path, 1, old, {"o": jnp.zeros(1)}, {})

    # new model: extra head (absent from ckpt) + resized enc.b
    new = _params(3, extra=True)
    new["enc"]["b"] = jnp.zeros((5,))
    loaded, n_loaded, n_skipped = ckpt.load_partial_state(path, new)
    # matched: enc.w, cells[0].w_ih, cells[1].w_ih
    np.testing.assert_array_equal(loaded["enc"]["w"], old["enc"]["w"])
    np.testing.assert_array_equal(loaded["cells"][1]["w_ih"],
                                  old["cells"][1]["w_ih"])
    # unmatched keep template values
    np.testing.assert_array_equal(loaded["enc"]["b"], jnp.zeros((5,)))
    np.testing.assert_array_equal(loaded["head"]["w"], jnp.zeros((3, 7)))
    assert n_loaded == 3 and n_skipped == 2


def test_partial_load_full_match_equals_full_load(tmp_path):
    p = _params(4)
    path = str(tmp_path / "m_0_2.ckpt")
    ckpt.create_checkpoint(path, 2, p, {"o": jnp.zeros(1)}, {})
    loaded, n_loaded, n_skipped = ckpt.load_partial_state(path, _params(4))
    assert n_skipped == 0
    np.testing.assert_array_equal(loaded["cells"][0]["w_ih"],
                                  p["cells"][0]["w_ih"])
