"""Training losses for the OGB drivers.

tok: per-position cross entropy averaged over the sequence positions
(reference: ogbg-code/main_pyg.py:55-60 — one CE per position, summed, / S).
class: single softmax CE (main_pyg_lp.py:56-60).
Padded graph slots are masked out; the mean is over real graphs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def tok_loss(logits: jnp.ndarray, y_arr: jnp.ndarray, graph_mask: jnp.ndarray):
    """logits [G, S, V]; y_arr [G, S] int targets; graph_mask [G].

    Double-where NaN safety: pad graphs can carry non-finite logits
    (empty-readout -inf in bf16). Sanitizing the logits BEFORE the CE —
    not only masking the CE after — keeps the backward clean too: the CE
    VJP multiplies the (zero) cotangent by softmax(logits), and
    0 * softmax(non-finite) = NaN would otherwise poison shared head
    weights through the gradient.
    """
    safe = jnp.where(graph_mask[:, None, None], logits, 0.0)
    ce = optax.softmax_cross_entropy_with_integer_labels(safe, y_arr)  # [G, S]
    per_graph = jnp.where(graph_mask, ce.mean(axis=-1), 0.0)
    m = graph_mask.astype(logits.dtype)
    return per_graph.sum() / jnp.maximum(m.sum(), 1.0)


def class_loss(logits: jnp.ndarray, y: jnp.ndarray, graph_mask: jnp.ndarray):
    """logits [G, C]; y [G] int; graph_mask [G]. NaN-safe like tok_loss."""
    safe = jnp.where(graph_mask[:, None], logits, 0.0)
    ce = optax.softmax_cross_entropy_with_integer_labels(safe, y)
    ce = jnp.where(graph_mask, ce, 0.0)
    m = graph_mask.astype(logits.dtype)
    return ce.sum() / jnp.maximum(m.sum(), 1.0)
