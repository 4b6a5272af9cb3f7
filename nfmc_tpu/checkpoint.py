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
import jax.numpy as jnp
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
# Preemption-safe sampling: segment the run, checkpoint between segments,
# resume bit-exactly after a crash.
# --------------------------------------------------------------------------

import dataclasses as _dataclasses
import os as _os


def _numeric_stats(stats) -> Dict[str, float]:
    """The additive numeric fields of an ``MCMCStatistics``(-subclass):
    counters + elapsed time. Jump/PT subclasses contribute their extra
    counters automatically."""
    out = {}
    for f in _dataclasses.fields(stats):
        v = getattr(stats, f.name)
        if isinstance(v, (int, float)):
            out[f.name] = v
    return out


def _merge_segment_stats(combined: Optional[Dict], stats, event_shape) -> Dict:
    """Fold one segment's statistics into the running ``combined`` dict."""
    fm = stats.expectations["first_moment"]
    sm = stats.expectations["second_moment"]
    seg = {
        "counters": _numeric_stats(stats),
        "fm": np.broadcast_to(
            np.asarray(fm.running_value, dtype=np.float64), event_shape
        ).copy(),
        "sm": np.broadcast_to(
            np.asarray(sm.running_value, dtype=np.float64), event_shape
        ).copy(),
        "n_seen": int(fm.n_seen),
    }
    if combined is None:
        return seg
    total = combined["n_seen"] + seg["n_seen"]
    if total > 0:
        w0, w1 = combined["n_seen"] / total, seg["n_seen"] / total
        combined["fm"] = w0 * combined["fm"] + w1 * seg["fm"]
        combined["sm"] = w0 * combined["sm"] + w1 * seg["sm"]
        combined["n_seen"] = total
    for k, v in seg["counters"].items():
        combined["counters"][k] = combined["counters"].get(k, 0) + v
    return combined


def _load_combined_into(stats, combined) -> None:
    """Overwrite a statistics object's counters/moments from ``combined``."""
    for k, v in combined["counters"].items():
        if hasattr(stats, k):
            setattr(stats, k, type(getattr(stats, k))(v))
    for name, key in (("first_moment", "fm"), ("second_moment", "sm")):
        exp = stats.expectations[name]
        exp.running_value = np.asarray(combined[key], dtype=np.float64)
        exp.n_seen = int(combined["n_seen"])


def sample_resumable(
    sampler,
    x0,
    checkpoint_path: str,
    *,
    segment_iterations: Optional[int] = None,
    key: Optional[jax.Array] = None,
    seed: Optional[int] = None,
    show_progress: bool = False,
    save_samples: bool = False,
):
    """Run ``sampler.sample`` as checkpointed segments; resume after a crash.

    Production long runs die (preemption, OOM elsewhere, tunnel flaps); the
    reference has no recovery story (SURVEY.md section 5). Here the total
    ``sampler.params.n_iterations`` budget is split into segments of
    ``segment_iterations`` (default: ~10 segments); after each segment the
    full resumable state — chain positions, tuned kernel + flow params
    (:func:`sampler_state`), combined statistics, and optionally the stored
    samples — is written to ``checkpoint_path`` (one ``.npz``). Calling this
    function again with the same arguments resumes from the last completed
    segment and, because segment i draws its PRNG key as
    ``fold_in(base_key, i)``, the resumed run is BIT-EXACT equal to an
    uninterrupted one.

    ``save_samples=False`` (default) keeps checkpoints small: on resume the
    pre-crash segments' stored samples are absent from the final output
    (statistics/moments still cover the full run). With ``save_samples=True``
    the stored draws are round-tripped too (mind the size: draws dominate).

    Returns the final segment's ``MCMCOutput`` with statistics (and, with
    ``save_samples``, stored samples) covering ALL completed segments.
    Thinning/max-samples policies apply per segment. The checkpoint file is
    left on disk after completion (delete it to start fresh).
    """
    from .core.rng import resolve_key

    n_total = int(sampler.params.n_iterations)
    if segment_iterations is None:
        segment_iterations = max(1, -(-n_total // 10))
    n_segments = -(-n_total // segment_iterations)
    base_key = resolve_key(key, seed)
    event_shape = tuple(sampler.event_shape)

    path = str(checkpoint_path)
    if not path.endswith(".npz"):
        path += ".npz"

    x = jnp.asarray(x0, dtype=jnp.float32) if not isinstance(x0, jax.Array) else x0
    start_segment = 0
    combined: Optional[Dict] = None
    prior_samples = None

    if _os.path.exists(path):
        data = np.load(path, allow_pickle=False)
        meta = json.loads(bytes(data["__meta__"].tobytes()).decode())
        like = sampler_state(sampler, x, base_key)
        leaves_like, treedef = jax.tree_util.tree_flatten(like)
        state = jax.tree_util.tree_unflatten(
            treedef, [data[f"leaf_{i}"] for i in range(len(leaves_like))]
        )
        x, _ = restore_sampler_state(sampler, state)
        x = jnp.asarray(x, dtype=jnp.float32)
        start_segment = int(meta["segment"])
        combined = {
            "counters": meta["counters"],
            "fm": data["fm"],
            "sm": data["sm"],
            "n_seen": int(meta["n_seen"]),
        }
        if "samples" in data.files:
            prior_samples = data["samples"]

    out = None
    for i in range(start_segment, n_segments):
        seg_iters = min(segment_iterations, n_total - i * segment_iterations)
        sampler.params.n_iterations = seg_iters
        try:
            seg_key = jax.random.fold_in(base_key, i)
            out = sampler.sample(
                x, show_progress=show_progress, key=seg_key
            )
        finally:
            sampler.params.n_iterations = n_total
        x = jnp.asarray(out.running_samples.last_sample, dtype=jnp.float32)
        combined = _merge_segment_stats(combined, out.statistics, event_shape)

        state = sampler_state(sampler, x, base_key)
        leaves, _ = jax.tree_util.tree_flatten(state)
        arrays = {
            f"leaf_{j}": np.asarray(jax.device_get(l)) for j, l in enumerate(leaves)
        }
        arrays["fm"] = combined["fm"]
        arrays["sm"] = combined["sm"]
        if save_samples and out.running_samples.n_samples > 0:
            seg_draws = np.asarray(jax.device_get(out.running_samples.as_tensor()))
            prior_samples = (
                seg_draws
                if prior_samples is None
                else np.concatenate([prior_samples, seg_draws], axis=0)
            )
        if save_samples and prior_samples is not None:
            arrays["samples"] = prior_samples
        arrays["__meta__"] = np.frombuffer(
            json.dumps(
                {
                    "segment": i + 1,
                    "n_segments": n_segments,
                    "counters": combined["counters"],
                    "n_seen": combined["n_seen"],
                }
            ).encode(),
            dtype=np.uint8,
        )
        tmp = path + ".tmp.npz"
        np.savez(tmp, **arrays)
        _os.replace(tmp, path)  # atomic: a crash mid-save keeps the old file

    if out is None:
        # everything was already complete in the checkpoint: re-run the last
        # segment? No — report completion by rebuilding a minimal output.
        raise RuntimeError(
            "checkpoint already covers all %d segments; delete %s to rerun"
            % (n_segments, path)
        )

    _load_combined_into(out.statistics, combined)
    if save_samples and prior_samples is not None:
        rs = out.running_samples
        rs._running = (
            [jnp.asarray(prior_samples)] if rs.on_device else list(prior_samples)
        )
        rs.n_samples = len(prior_samples)
    return out


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
