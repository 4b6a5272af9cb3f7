"""Flow training: forward-KL MLE ``fit`` and reverse-KL ``variational_fit``.

API parity with the torchflows surface the reference consumes (SURVEY.md
section 2.9; kwargs observed at reference ``base.py:55-61``,
``jump.py:30-38,139-149``, ``imh.py:27-36,67-72,173``, ``neutra.py:24-33``):
``early_stopping``, ``early_stopping_threshold``, ``keep_best_weights``,
``batch_size='adaptive'``, ``time_limit_seconds``, ``check_for_divergences``,
``n_samples``/``n_epochs``/``lr``.

TPU-native: one jitted Adam train step; epochs run in jitted blocks of
``check_every`` epochs with best-weight tracking *inside* the scan, so a 50k
epoch NeuTra warmup (reference default, ``neutra.py:24-33``) costs ~50k/128
host round trips instead of 50k. Training failures surface as ``ValueError``
(detected from non-finite losses) to preserve the reference's
rollback-on-ValueError contract (``jump.py:130,150-151``, ``imh.py:171-175``).
"""
from __future__ import annotations

import math
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.rng import resolve_key
from ..utils import tqdm  # shared fallback shim


def _finite_update(loss, grads):
    """True iff the loss AND every gradient leaf are finite. A finite loss
    does not imply finite grads (boundary sqrt/log/where gradients, overflow
    only in the backward pass) — gating a skip-this-update guard on the loss
    alone still lets NaN grads reach ``opt.update`` and poison the Adam
    moments."""
    leaves_ok = [jnp.all(jnp.isfinite(g)) for g in jax.tree_util.tree_leaves(grads)]
    return jnp.isfinite(loss) & jnp.stack(leaves_ok).all()


def _adaptive_batch_size(n_train: int) -> int:
    """'adaptive' rule: ~n/10 clamped to [32, 4096], rounded to a power of two."""
    if n_train <= 32:
        return max(n_train, 1)
    target = max(32, min(4096, n_train // 10 if n_train >= 320 else n_train))
    return 1 << int(math.floor(math.log2(target)))


def _pad_to_multiple(x: np.ndarray, multiple: int):
    n = len(x)
    n_pad = (-n) % multiple
    if n_pad:
        pad = np.repeat(x[-1:], n_pad, axis=0)
        x = np.concatenate([x, pad], axis=0)
    weights = np.ones(len(x), dtype=np.float32)
    weights[n:] = 0.0
    return x, weights


def fixed_effort_fit_config(fit_kwargs):
    """Static config tuple when ``fit_kwargs`` describe a fixed-effort fit
    that can run INSIDE a compiled scan (no early stopping / time limit /
    unknown kwargs), else ``None``. Shared gate for the fused refit paths
    (DLMC iterations, AdaptiveIMH adaptation, TESS warmup)."""
    kw = dict(fit_kwargs or {})
    if kw.get("early_stopping", False) or kw.get("time_limit_seconds") is not None:
        return None
    allowed = {
        "n_epochs", "lr", "batch_size", "keep_best_weights", "shuffle",
        "early_stopping", "early_stopping_threshold", "show_progress",
        "check_for_divergences", "time_limit_seconds",  # explicit None is fixed-effort
    }
    if set(kw) - allowed:
        return None
    return (
        int(kw.get("n_epochs", 500)),
        float(kw.get("lr", 5e-3)),
        kw.get("batch_size", "adaptive"),
        bool(kw.get("keep_best_weights", True)),
        bool(kw.get("shuffle", True)),
    )


def make_scan_fit(flow, n_rows: int, n_epochs: int, lr: float = 0.005,
                  batch_size="adaptive", shuffle: bool = True,
                  keep_best_weights: bool = False, train_pct: float = None,
                  max_train_size: int = 4096, max_val_size: int = 4096):
    """Fixed-effort MLE fit as a pure function for use INSIDE compiled scans:
    ``fit(params, data, key) -> params`` with ``data: (n_rows, *event)``.

    Mirrors :func:`fit` without host control flow: fresh Adam per call (the
    host path builds a new optimizer per ``fit``), ``n_epochs`` of shuffled
    minibatch steps, optional per-epoch best-weight tracking, and
    rollback-on-divergence via a finite-loss guard in place of the ValueError
    contract. With ``train_pct`` set, the data shuffles into a train/val
    split (capped at the max sizes, matching ``core.tuning.train_val_split``)
    and best weights track the val loss. Deviation (documented): the train
    set truncates to a multiple of the batch size instead of padding the last
    batch. Used by the fused refits in DLMC, AdaptiveIMH, and TESS warmup."""
    import optax

    event_shape = flow.event_shape
    if train_pct is not None:
        n_train = max(1, min(int(n_rows * train_pct), max_train_size))
        n_val = min(n_rows - n_train, max_val_size)
    else:
        n_train = n_rows
        n_val = 0
    if batch_size in ("adaptive", None):
        bs = _adaptive_batch_size(n_train)
    else:
        bs = min(int(batch_size), n_train)
    n_eff = max(bs, (n_train // bs) * bs)
    n_batches = n_eff // bs
    keep_best = keep_best_weights and n_val > 0
    opt = optax.adam(lr)

    def nll_loss(p, xb):
        return -jnp.mean(flow.log_prob_fn(p, xb))

    def scan_fit(params, data, key):
        k_split, k_epochs = jax.random.split(key)
        if train_pct is not None:
            perm = jax.random.permutation(k_split, data.shape[0])
            xt = data[perm[:n_eff]]
            xv = data[perm[n_train:n_train + n_val]] if n_val else data[perm[:bs]]
        else:
            xt = data
            xv = data[:bs]
        opt_state = opt.init(params)

        def epoch(carry, ek):
            p, os, bp, bl = carry
            xs = jax.random.permutation(ek, xt)[:n_eff] if shuffle else xt[:n_eff]
            xs = xs.reshape(n_batches, bs, *event_shape)

            def bstep(c, xb):
                p, os = c
                loss, g = jax.value_and_grad(nll_loss)(p, xb)
                # skip non-finite batches (params AND opt state) so one bad
                # batch doesn't NaN the rest of the compiled fit
                finite = _finite_update(loss, g)
                u, os_new = opt.update(g, os, p)
                p_new = optax.apply_updates(p, u)
                p = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(finite, new, old), p_new, p
                )
                os = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(finite, new, old), os_new, os
                )
                return (p, os), loss

            (p, os), losses = jax.lax.scan(bstep, (p, os), xs)
            vl = nll_loss(p, xv) if keep_best else jnp.mean(losses)
            better = vl < bl
            bl = jnp.where(better, vl, bl)
            if keep_best:
                bp = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(better, new, old), p, bp
                )
            return (p, os, bp, bl), None

        init = (params, opt_state, params, jnp.asarray(jnp.inf, jnp.float32))
        (p, _os, bp, _bl), _ = jax.lax.scan(
            epoch, init, jax.random.split(k_epochs, n_epochs)
        )
        fitted = bp if keep_best else p
        ok = jnp.isfinite(nll_loss(fitted, xv))
        return jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), fitted, params
        )

    return scan_fit


def fit(
    flow,
    x_train,
    x_val=None,
    n_epochs: int = 500,
    lr: float = 0.005,  # reference/torchflows default 0.05 diverges with He-init tanh conditioners
    batch_size="adaptive",
    shuffle: bool = True,
    early_stopping: bool = False,
    early_stopping_threshold: int = 50,
    keep_best_weights: bool = True,
    show_progress: bool = False,
    time_limit_seconds: Optional[float] = None,
    check_for_divergences: bool = False,
    mesh=None,
    key=None,
    seed=None,
) -> None:
    """Forward-KL MLE on samples; mutates ``flow.params`` in place.

    ``mesh``: optional ``jax.sharding.Mesh`` — training batches shard over
    its first axis (data parallel); GSPMD inserts the gradient all-reduces.
    """
    t_start = time.time()
    key = resolve_key(key, seed)

    x_train = np.asarray(jax.device_get(x_train), dtype=np.float32)
    x_train = x_train.reshape(len(x_train), *flow.event_shape)
    n_train = len(x_train)
    if n_train == 0:
        raise ValueError("empty training set")
    if batch_size == "adaptive" or batch_size is None:
        bs = _adaptive_batch_size(n_train)
    else:
        bs = min(int(batch_size), n_train)
    if mesh is not None:
        ndev = mesh.devices.size
        bs = max(ndev, (bs // ndev) * ndev)  # batch must tile over devices

    x_train_p, w_train = _pad_to_multiple(x_train, bs)
    n_batches = len(x_train_p) // bs
    data = jnp.asarray(x_train_p)
    w_data = jnp.asarray(w_train)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        axis = mesh.axis_names[0]
        data = jax.device_put(
            data, NamedSharding(mesh, P(axis, *([None] * (data.ndim - 1))))
        )
        w_data = jax.device_put(w_data, NamedSharding(mesh, P(axis)))

    has_val = x_val is not None and len(np.asarray(x_val)) > 0
    if has_val:
        x_val = np.asarray(jax.device_get(x_val), dtype=np.float32)
        x_val = x_val.reshape(len(x_val), *flow.event_shape)
        # pad val to a power-of-two bucket so repeated fits with drifting val
        # sizes reuse one compiled trainer
        n_val_bucket = 1 << max(0, (len(x_val) - 1)).bit_length()
        val_p, val_w = _pad_to_multiple(x_val, max(1, n_val_bucket))
        val_data = jnp.asarray(val_p)
        val_weights = jnp.asarray(val_w)
    else:
        val_data = data
        val_weights = w_data

    opt = optax.adam(lr)
    params = flow.params
    opt_state = opt.init(params)

    # Compiled trainers are cached on the Flow keyed by static config: callers
    # that refit per sampling iteration (DLMC, TESS warmup, AdaptiveIMH's
    # 1-epoch fits) must not recompile every call.
    reg_weight = float(getattr(flow.bijection, "regularization_weight", 0.0))

    cache = flow.__dict__.setdefault("_fit_runner_cache", {})
    # id(flow.bijection): the trainer bakes log_prob_fn/regularization_fn at
    # first trace, so swapping a same-pytree-shaped but differently
    # configured bijection onto the flow must miss the cache (the sampler-
    # side caches key on the bijection identity for the same reason)
    cache_key = ("mle", bs, n_batches, val_data.shape[0], lr, keep_best_weights,
                 shuffle, reg_weight, id(flow.bijection),
                 id(flow._base_log_prob_override),
                 None if mesh is None else (mesh.axis_names, mesh.devices.size))
    if cache_key not in cache:
        log_prob_fn = flow.log_prob_fn
        regularization_fn = flow.bijection.regularization
        event_shape = flow.event_shape
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            batch_sharding = NamedSharding(
                mesh, P(None, mesh.axis_names[0], *([None] * len(event_shape)))
            )
        else:
            batch_sharding = None

        def loss_fn(p, xb, wb):
            lp = log_prob_fn(p, xb)
            loss = -jnp.sum(lp * wb) / jnp.maximum(jnp.sum(wb), 1.0)
            if reg_weight:
                # RNODE-style training regularizer (flows/base.py
                # Bijection.regularization); weight 0 compiles it away.
                # Per-sample regularizers get the padding weights so
                # duplicated pad rows don't bias the gradient.
                reg = regularization_fn(p, xb)
                if reg.ndim:
                    reg = jnp.sum(reg * wb) / jnp.maximum(jnp.sum(wb), 1.0)
                loss = loss + reg_weight * reg
            return loss

        def run_block(params, opt_state, best_params, best_loss, keys,
                      data, w_data, val_data, val_weights):
            def train_epoch(carry, epoch_key):
                p, os = carry
                if shuffle:
                    perm = jax.random.permutation(epoch_key, data.shape[0])
                    xs = data[perm].reshape(n_batches, bs, *event_shape)
                    ws = w_data[perm].reshape(n_batches, bs)
                else:
                    xs = data.reshape(n_batches, bs, *event_shape)
                    ws = w_data.reshape(n_batches, bs)
                if batch_sharding is not None:
                    # keep the per-batch axis (not the scan axis) sharded
                    xs = jax.lax.with_sharding_constraint(xs, batch_sharding)

                def batch_step(c, batch):
                    p, os = c
                    xb, wb = batch
                    loss, grads = jax.value_and_grad(loss_fn)(p, xb, wb)
                    # skip non-finite batches (params AND opt state) so one
                    # bad batch doesn't NaN the rest of the compiled fit
                    finite = _finite_update(loss, grads)
                    updates, os_new = opt.update(grads, os, p)
                    p_new = optax.apply_updates(p, updates)
                    p = jax.tree_util.tree_map(
                        lambda new, old: jnp.where(finite, new, old), p_new, p
                    )
                    os = jax.tree_util.tree_map(
                        lambda new, old: jnp.where(finite, new, old), os_new, os
                    )
                    return (p, os), loss

                (p, os), losses = jax.lax.scan(batch_step, (p, os), (xs, ws))
                return (p, os), jnp.mean(losses)

            def body(carry, ek):
                p, os, bp, bl = carry
                (p, os), _train_loss = train_epoch((p, os), ek)
                vl = loss_fn(p, val_data, val_weights)
                better = vl < bl
                bl = jnp.where(better, vl, bl)
                if keep_best_weights:
                    bp = jax.tree_util.tree_map(
                        lambda new, old: jnp.where(better, new, old), p, bp
                    )
                return (p, os, bp, bl), vl

            (params, opt_state, best_params, best_loss), vls = jax.lax.scan(
                body, (params, opt_state, best_params, best_loss), keys
            )
            return params, opt_state, best_params, best_loss, vls

        # keepalive: BOTH objects backing id()s in the key — hold references
        # so a freed object's recycled id can't collide with a trainer
        # compiled against the OLD base log-prob / OLD bijection config
        # (id(bijection) without a keepalive had the exact collision the
        # override keepalive was added for — round-3 review)
        cache[cache_key] = (
            jax.jit(run_block), flow._base_log_prob_override, flow.bijection,
        )
    run_block_fn = cache[cache_key][0]

    def run_block(params, opt_state, best_params, best_loss, keys):
        return run_block_fn(params, opt_state, best_params, best_loss, keys,
                            data, w_data, val_data, val_weights)

    check_every = max(1, min(64, early_stopping_threshold if early_stopping else 64, n_epochs))
    best_params = params
    best_loss = jnp.asarray(jnp.inf, dtype=jnp.float32)
    epochs_done = 0
    epochs_since_best = 0
    global_best = math.inf

    # Block-level progress (reference/torchflows show a per-epoch bar,
    # ``jump.py:30-38``; epochs here run in jitted blocks so the bar advances
    # per block with the block's last val loss).
    pbar = tqdm(total=n_epochs, desc="Fitting NF", disable=not show_progress)
    try:
        while epochs_done < n_epochs:
            if time_limit_seconds is not None and time.time() - t_start > time_limit_seconds:
                break
            block = min(check_every, n_epochs - epochs_done)
            key, sub = jax.random.split(key)
            keys = jax.random.split(sub, block)
            params, opt_state, best_params, best_loss, vls = run_block(
                params, opt_state, best_params, best_loss, keys
            )
            vls = np.asarray(vls)
            epochs_done += block
            pbar.update(block)
            if not np.all(np.isfinite(vls)):
                # Preserve the reference's ValueError contract so callers roll back.
                if check_for_divergences or not np.isfinite(vls[-1]):
                    flow.params = best_params if keep_best_weights else params
                    raise ValueError("flow training diverged (non-finite loss)")
            # host-side early stopping on the block's val losses
            for vl in vls:
                if vl < global_best - 0.0:
                    global_best = float(vl)
                    epochs_since_best = 0
                else:
                    epochs_since_best += 1
            if show_progress:
                pbar.set_postfix_str(f"val loss: {vls[-1]:.4f} (best {global_best:.4f})")
            if early_stopping and epochs_since_best >= early_stopping_threshold:
                break
    finally:
        pbar.close()

    flow.params = best_params if keep_best_weights else params


def variational_fit(
    flow,
    target_log_prob: Callable,
    n_samples: int = 128,
    n_epochs: int = 500,
    lr: float = 0.005,  # reference/torchflows default 0.05 diverges with He-init tanh conditioners
    early_stopping: bool = False,
    early_stopping_threshold: int = 50,
    keep_best_weights: bool = True,
    show_progress: bool = False,
    time_limit_seconds: Optional[float] = None,
    check_for_divergences: bool = False,
    mesh=None,
    key=None,
    seed=None,
) -> None:
    """Reverse-KL fit to an unnormalized ``target_log_prob`` (= -U).

    loss = E_z[ -target_log_prob(x) - log_det_inv ], x = bijection.inverse(z);
    the base entropy is constant and dropped. Mutates ``flow.params``.
    ``mesh``: optional ``jax.sharding.Mesh`` — the per-step sample batch
    shards over its first axis (data parallel, psum'd gradients via GSPMD).
    """
    t_start = time.time()
    key = resolve_key(key, seed)
    n_samples = max(1, int(n_samples))
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        ndev = mesh.devices.size
        n_samples = max(ndev, (n_samples // ndev) * ndev)
        z_sharding = NamedSharding(
            mesh, P(mesh.axis_names[0], *([None] * len(flow.event_shape)))
        )
    else:
        z_sharding = None

    opt = optax.adam(lr)
    params = flow.params
    opt_state = opt.init(params)
    bijection = flow.bijection
    event_shape = flow.event_shape

    reg_weight = float(getattr(bijection, "regularization_weight", 0.0))

    # Memoize the compiled trainer on the Flow (same reason as fit()'s cache:
    # samplers that refit per warmup round — NeuTra, TESS — must not pay a
    # full re-trace each call). Keyed on everything the closure bakes in;
    # id()-keyed objects are kept alive in the cache entry so a recycled id
    # cannot hit a trainer compiled against a freed object.
    cache = flow.__dict__.setdefault("_vfit_runner_cache", {})
    cache_key = ("rkl", n_samples, lr, keep_best_weights, reg_weight,
                 id(bijection), id(target_log_prob),
                 None if mesh is None else (mesh.axis_names, mesh.devices.size))
    if cache_key not in cache:
        def loss_fn(p, k):
            z = jax.random.normal(k, (n_samples, *event_shape))
            if z_sharding is not None:
                z = jax.lax.with_sharding_constraint(z, z_sharding)
            x, log_det_inv = bijection.inverse_fn(p, z)
            loss = jnp.mean(-target_log_prob(x) - log_det_inv)
            if reg_weight:
                loss = loss + reg_weight * jnp.mean(bijection.regularization(p, x))
            return loss

        def run_block(params, opt_state, best_params, best_loss, keys):
            def body(carry, k):
                p, os, bp, bl = carry
                loss, grads = jax.value_and_grad(loss_fn)(p, k)
                finite = _finite_update(loss, grads)
                # best-weight tracking BEFORE the update: ``loss`` was
                # measured at ``p``, so these are the params the recorded
                # best loss belongs to (storing the post-update params paired
                # a loss with weights one Adam step past it — round-3 review
                # fix). Gated on the LOSS only: a finite loss at p is a valid
                # best candidate even when the grads at p are not finite.
                better = jnp.isfinite(loss) & (loss < bl)
                bl = jnp.where(better, loss, bl)
                if keep_best_weights:
                    bp = jax.tree_util.tree_map(
                        lambda new, old: jnp.where(better, new, old), p, bp
                    )
                updates, os_new = opt.update(grads, os, p)
                p_new = optax.apply_updates(p, updates)
                # skip non-finite updates entirely — params AND optimizer
                # state (NaN grads fed to opt.update would poison Adam's
                # moments and NaN the params on the NEXT, otherwise-finite
                # step)
                p = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(finite, new, old), p_new, p
                )
                os = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(finite, new, old), os_new, os
                )
                return (p, os, bp, bl), loss

            (params, opt_state, best_params, best_loss), losses = jax.lax.scan(
                body, (params, opt_state, best_params, best_loss), keys
            )
            return params, opt_state, best_params, best_loss, losses

        cache[cache_key] = (jax.jit(run_block), bijection, target_log_prob)
    run_block = cache[cache_key][0]

    check_every = max(1, min(128, n_epochs))
    best_params = params
    best_loss = jnp.asarray(jnp.inf, dtype=jnp.float32)
    epochs_done = 0
    epochs_since_best = 0
    global_best = math.inf
    n_nonfinite = 0

    pbar = tqdm(total=n_epochs, desc="Fitting NF (variational)", disable=not show_progress)
    try:
        while epochs_done < n_epochs:
            if time_limit_seconds is not None and time.time() - t_start > time_limit_seconds:
                break
            block = min(check_every, n_epochs - epochs_done)
            key, sub = jax.random.split(key)
            keys = jax.random.split(sub, block)
            params, opt_state, best_params, best_loss, losses = run_block(
                params, opt_state, best_params, best_loss, keys
            )
            losses = np.asarray(losses)
            epochs_done += block
            pbar.update(block)
            n_nonfinite += int(np.sum(~np.isfinite(losses)))
            if check_for_divergences and n_nonfinite > block:
                break  # persistent divergence: stop early, keep best weights
            for l in losses:
                if np.isfinite(l) and l < global_best:
                    global_best = float(l)
                    epochs_since_best = 0
                else:
                    epochs_since_best += 1
            if show_progress:
                pbar.set_postfix_str(f"loss: {losses[-1]:.4f} (best {global_best:.4f})")
            if early_stopping and epochs_since_best >= early_stopping_threshold:
                break
    finally:
        pbar.close()

    flow.params = best_params if keep_best_weights else params
