"""First-class checkpoint/resume for sampler state.

The reference has no checkpointing (SURVEY.md section 5: only in-memory flow
``state_dict`` snapshots). Here all sampler state is explicit pytrees
(positions, kernel params, flow params, RNG key, counters), so a checkpoint
is a flat dict of arrays + a JSON-serializable metadata dict, written with
``numpy.savez`` — no framework dependencies, portable across hosts.
"""
from __future__ import annotations

import json
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def save_checkpoint(path: str, state: Any, metadata: Optional[Dict] = None) -> None:
    """Save a pytree of arrays (+ JSON metadata) to ``path`` (.npz)."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(jax.device_get(l)) for i, l in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        json.dumps(jax.tree_util.tree_structure(state).__repr__()).encode(), dtype=np.uint8
    )
    arrays["__meta__"] = np.frombuffer(
        json.dumps(metadata or {}).encode(), dtype=np.uint8
    )
    np.savez(path, **arrays)


def load_checkpoint(path: str, like: Any) -> Tuple[Any, Dict]:
    """Load a checkpoint written by :func:`save_checkpoint`.

    ``like`` is a pytree with the same structure (e.g. a freshly built state);
    its structure is used to rebuild the tree, its leaves are replaced.
    """
    if not str(path).endswith(".npz"):
        path = str(path) + ".npz"
    data = np.load(path)
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    n = len(leaves_like)
    leaves = [data[f"leaf_{i}"] for i in range(n)]
    meta = json.loads(bytes(data["__meta__"].tobytes()).decode())
    return jax.tree_util.tree_unflatten(treedef, leaves), meta


def sampler_state(sampler, x, key) -> Dict[str, Any]:
    """Canonical resumable state for a sampler mid-run.

    Walks nested samplers (NeuTra/Jump hold the tuned Metropolis state on
    ``sampler.inner_sampler.kernel`` — dropping it would silently resume with
    untuned step sizes).
    """
    state: Dict[str, Any] = {
        "x": x,
        "key": jax.random.key_data(key),
    }
    kernel = sampler.kernel
    if hasattr(kernel, "make_state"):
        state["kernel"] = kernel.make_state()
    flow = getattr(kernel, "flow", None)
    if flow is not None:
        state["flow_params"] = flow.params
    inner = getattr(sampler, "inner_sampler", None)
    if inner is not None:
        state["inner"] = sampler_state(inner, x, key)
        # x/key are stored at the top level only
        state["inner"].pop("x", None)
        state["inner"].pop("key", None)
    return state


def _apply_sampler_level(sampler, state: Dict[str, Any]) -> None:
    """Apply one level of saved kernel/flow state, then recurse into
    ``state['inner']`` — symmetric with :func:`sampler_state`'s walk, so
    arbitrarily nested samplers restore every tuned level."""
    kernel = sampler.kernel
    if "kernel" in state and hasattr(kernel, "sync_from_state"):
        fresh = kernel.make_state()
        restored = jax.tree_util.tree_map(lambda _, s: s, fresh, state["kernel"])
        kernel.sync_from_state(restored)
    if "flow_params" in state and getattr(kernel, "flow", None) is not None:
        kernel.flow.params = jax.tree_util.tree_map(
            lambda p, s: s, kernel.flow.params, state["flow_params"]
        )
    inner = getattr(sampler, "inner_sampler", None)
    if inner is not None and "inner" in state:
        _apply_sampler_level(inner, state["inner"])


def restore_sampler_state(sampler, state: Dict[str, Any]):
    """Apply a saved state back onto a sampler; returns (x, key)."""
    _apply_sampler_level(sampler, state)
    key = jax.random.wrap_key_data(np.asarray(state["key"]))
    return state["x"], key


# --------------------------------------------------------------------------
# Orbax backend: the production JAX checkpointing stack (async-capable,
# multi-host-aware, sharding-preserving). Optional — the npz backend above
# has no dependencies; prefer orbax for large states or multi-chip runs.
# --------------------------------------------------------------------------

def save_checkpoint_orbax(path: str, state: Any, metadata: Optional[Dict] = None) -> None:
    """Save a sampler-state pytree with ``orbax.checkpoint``.

    ``path`` must be a directory path (orbax layout). Metadata is stored as a
    JSON sidecar next to it.
    """
    import os

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, jax.tree_util.tree_map(np.asarray, state), force=True)
    with open(path + ".meta.json", "w") as f:
        json.dump(metadata or {}, f)


def load_checkpoint_orbax(path: str, like: Any) -> Tuple[Any, Dict]:
    """Load an orbax checkpoint written by :func:`save_checkpoint_orbax`."""
    import os

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path, item=jax.tree_util.tree_map(np.asarray, like))
    meta_path = path + ".meta.json"
    meta: Dict = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return restored, meta
