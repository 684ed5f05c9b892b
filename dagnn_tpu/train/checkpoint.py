"""Checkpointing with the reference's rotation + resume semantics.

One rotating file per run holding {epoch, params, opt_state, results}
(reference: ogbg-code/utils2.py:86-108; main_pyg.py:334-338 writes every
epoch and deletes the previous; resume fast-forwards completed folds,
main_pyg.py:254-266). Serialized with flax msgpack (host-independent,
works for arbitrary pytrees).
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Optional, Tuple

from flax import serialization


def checkpoint_name(directory: str, name: str, fold: int, epoch: int) -> str:
    return os.path.join(directory, f"{name}_{fold}_{epoch}.ckpt")


def create_checkpoint(path: str, epoch: int, params, opt_state, results) -> None:
    payload = {
        "epoch": epoch,
        "params": serialization.to_bytes(params),
        "opt_state": serialization.to_bytes(opt_state),
        "results": results,
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)


def load_checkpoint(path: str, params_template, opt_state_template
                    ) -> Tuple[Any, int, Any, Any]:
    with open(path, "rb") as f:
        payload = pickle.load(f)
    params = serialization.from_bytes(params_template, payload["params"])
    opt_state = serialization.from_bytes(opt_state_template, payload["opt_state"])
    return payload["results"], payload["epoch"], params, opt_state


def load_checkpoint_results(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)["results"]


def load_partial_state(path: str, params_template):
    """Model-surgery-tolerant load (reference load_module_state,
    dvae/util.py:41-63): restore every leaf whose tree path exists in the
    checkpoint with a matching shape; keep the template's value (e.g. fresh
    init) everywhere else. Returns (params, n_loaded, n_skipped)."""
    import jax
    import numpy as np

    with open(path, "rb") as f:
        payload = pickle.load(f)
    saved = serialization.msgpack_restore(payload["params"])

    flat_t = jax.tree_util.tree_flatten_with_path(params_template)[0]
    n_loaded = n_skipped = 0
    out = {}

    def _get(tree, path):
        cur = tree
        for p in path:
            key = getattr(p, "key", getattr(p, "idx", None))
            if isinstance(cur, dict):
                key = str(key) if not isinstance(key, str) and str(key) in cur else key
                if key not in cur:
                    return None
                cur = cur[key]
            elif isinstance(cur, (list, tuple)):
                i = int(key)
                if i >= len(cur):
                    return None
                cur = cur[i]
            else:
                return None
        return cur

    leaves = []
    for path, leaf in flat_t:
        cand = _get(saved, path)
        if (cand is not None and hasattr(cand, "shape")
                and tuple(np.shape(cand)) == tuple(np.shape(leaf))):
            leaves.append(np.asarray(cand).astype(leaf.dtype)
                          if hasattr(leaf, "dtype") else cand)
            n_loaded += 1
        else:
            leaves.append(leaf)
            n_skipped += 1
    treedef = jax.tree_util.tree_structure(params_template)
    return jax.tree_util.tree_unflatten(treedef, leaves), n_loaded, n_skipped


def remove_checkpoint(path: str) -> None:
    if os.path.exists(path):
        os.remove(path)


def find_latest_checkpoint(directory: str, name: str) -> Optional[str]:
    """Checkpoint auto-discovery (scripts/ogb_tok.sh:53-60 glob): pick the
    `name_<fold>_<epoch>.ckpt` with the largest (fold, epoch)."""
    if not os.path.isdir(directory):
        return None
    best = None
    best_key = (-1, -1)
    for fn in os.listdir(directory):
        if not (fn.startswith(name + "_") and fn.endswith(".ckpt")):
            continue
        parts = fn[len(name) + 1: -5].split("_")
        if len(parts) != 2:
            continue
        try:
            key = (int(parts[0]), int(parts[1]))
        except ValueError:
            continue
        if key > best_key:
            best_key = key
            best = os.path.join(directory, fn)
    return best


def parse_fold_epoch(path: str) -> Tuple[int, int]:
    """Recover (fold, epoch) from `name_<fold>_<epoch>.ckpt`
    (main_pyg.py:257-259)."""
    stem = os.path.basename(path)[:-5]
    fold, epoch = stem.rsplit("_", 2)[-2:]
    return int(fold), int(epoch)
