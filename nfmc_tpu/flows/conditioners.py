"""Conditioner networks as pure (init, apply) function pairs.

MLP sizes default to MXU-friendly multiples of 128; the final layer is
zero-initialized so every flow starts at the identity map — this keeps early
MLE / reverse-KL steps numerically tame (the reference relies on torchflows'
equivalents plus ValueError-rollback for the same reason).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def mlp_init(key: jax.Array, in_dim: int, hidden: Sequence[int], out_dim: int):
    """He-initialized tanh MLP with a zero-initialized final layer."""
    sizes = [max(in_dim, 1)] + list(hidden) + [out_dim]
    n_layers = len(sizes) - 1
    keys = jax.random.split(key, n_layers)
    ws, bs = [], []
    for i in range(n_layers):
        fan_in = sizes[i]
        if i == n_layers - 1:
            w = jnp.zeros((sizes[i], sizes[i + 1]), dtype=jnp.float32)
        else:
            w = jax.random.normal(keys[i], (sizes[i], sizes[i + 1]), dtype=jnp.float32)
            w = w * jnp.sqrt(2.0 / fan_in)
        ws.append(w)
        bs.append(jnp.zeros((sizes[i + 1],), dtype=jnp.float32))
    return {"w": ws, "b": bs}


def mlp_apply(params, x: jax.Array) -> jax.Array:
    n_layers = len(params["w"])
    h = x
    for i in range(n_layers - 1):
        h = jnp.tanh(h @ params["w"][i] + params["b"][i])
    return h @ params["w"][-1] + params["b"][-1]


# ---------------------------------------------------------------------------
# MADE: masked dense network for autoregressive conditioners (MAF/IAF).
# ---------------------------------------------------------------------------

def made_masks(d: int, hidden: Sequence[int], n_params_per_dim: int):
    """Binary masks enforcing output_i depends only on inputs < i.
    Fully deterministic (fixed cyclic degrees, no random degree assignment).

    Degrees: inputs 1..d; hidden units cycle 1..d-1 (or 1 when d == 1);
    outputs have degree of the unit they parameterize. The strict inequality
    on the output layer gives x_i conditioned on x_<i only.
    """
    in_deg = np.arange(1, d + 1)
    degrees = [in_deg]
    for h in hidden:
        if d > 1:
            deg = (np.arange(h) % (d - 1)) + 1
        else:
            deg = np.ones(h, dtype=np.int64)
        degrees.append(deg)
    # dim-major layout: output[i * n_params + k] parameterizes dim i, matching
    # the (..., d, n_params_per_dim) reshape at the call sites
    out_deg = np.repeat(np.arange(1, d + 1), n_params_per_dim)
    masks = []
    for i in range(len(hidden)):
        masks.append((degrees[i][:, None] <= degrees[i + 1][None, :]).astype(np.float32))
    masks.append((degrees[-1][:, None] < out_deg[None, :]).astype(np.float32))
    return masks


def made_init(key: jax.Array, d: int, hidden: Sequence[int], n_params_per_dim: int):
    """Masks are static config (kept out of the trainable pytree)."""
    sizes = [d] + list(hidden) + [d * n_params_per_dim]
    n_layers = len(sizes) - 1
    keys = jax.random.split(key, n_layers)
    ws, bs = [], []
    for i in range(n_layers):
        if i == n_layers - 1:
            w = jnp.zeros((sizes[i], sizes[i + 1]), dtype=jnp.float32)
        else:
            w = jax.random.normal(keys[i], (sizes[i], sizes[i + 1]), dtype=jnp.float32)
            w = w * jnp.sqrt(2.0 / sizes[i])
        ws.append(w)
        bs.append(jnp.zeros((sizes[i + 1],), dtype=jnp.float32))
    return {"w": ws, "b": bs}


def made_apply(params, masks, x: jax.Array) -> jax.Array:
    """(B, d) -> (B, d * n_params_per_dim), autoregressively masked."""
    n_layers = len(params["w"])
    h = x
    for i in range(n_layers - 1):
        h = jnp.tanh(h @ (params["w"][i] * masks[i]) + params["b"][i])
    return h @ (params["w"][-1] * masks[-1]) + params["b"][-1]
